"""Benchmark: spectral MCM throughput on the current device.

Prints ONE JSON line. The headline metric is the BASELINE.json workload —
**fwd+bwd Mpaths/s/chip at 512^2 x 64 spp**, density gradients — measured
on the PRODUCTION estimator: the hand-derived packed-adjoint window
backward with scatter_stride=4 thinning (kernels/spectral_backward.py).
The exact (stride=1) estimator and forward-only throughput ride as
auxiliary fields:

    {"metric": "spectral_mcm_fwdbwd_thinned_s4_512x512_64spp", "value": ...,
     "unit": "Mpaths/s/chip", "vs_baseline": ...,
     "fwd_mpaths_per_s": ..., "fwdbwd_exact_stride1": ...}

Round 5 adds speed-of-light occupancy (VERDICT r4 #7): lane-step rates
for fwd and exact fwd+bwd against gather/scatter ceilings measured on
the current device at the bench's own table sizes
(fwd_fraction_of_gather_ceiling, fwdbwd_fraction_of_ceiling), plus the
on-chip kernel-level u8 bit-exactness guard (u8_dequantize_bit_exact,
ADVICE r4 #1).

Why stride-4 is the headline (VERDICT r2 #1 asked for this promotion with
evidence): thinning is unbiased (phase-partition identity,
tests/test_prb_packed.py::test_scatter_stride_partition_identity) and the
config-4 convergence study (tools/convergence_stride.py, results in
CONFIGS.md "stride convergence") shows stride 4 reaches every eval-loss
threshold fastest in WALL-CLOCK on the canonical dense-gradient recovery
(sphere_in_cube; replicated across seeds in r4) — gradient noise is
already Monte-Carlo dominated, so ~4x table-grad variance is nearly free
while scatter indices (the measured wall, ~22-95 ns/index,
ARCHITECTURE.md "The scatter wall") drop 4x. The r4 replicates also
found the trade's limit: on a sparse-live-voxel recovery (two_spheres,
16x-smoothed init) thinning stalls and stride 1 wins — the estimator
choice is a documented, scene-dependent knob, not a universal win.

``vs_baseline`` grades against BENCH_BASELINE.json: the same workload
measured with the round-1 differentiable path (12.99 Mpaths/s) — i.e. it
tracks this build's own progress; the reference publishes no numbers
(BASELINE.md). A "path" is one completed photon sample. History: r1 12.99
exact; r2 12.78 exact (flat — the scatter wall); r3 promotes the
convergence-proven thinned estimator AND fixes the window backward's
dispatch-boundary cotangent truncation (the exact number is unchanged at
12.78 with tape-storage windows paying for the fix); r4 moves the
forward wall for the first time — flat-u8 packed tables (bit-exact for
u8-quantized sources) lift forward 74.9 -> 89.6 Mpaths/s, exact fwd+bwd
12.79 -> 13.15 (above the r1 anchor), thinned 32.2 -> 34.6.

BENCH_MODE=fwd prints only the legacy forward-throughput line.
"""

import json
import os
import sys
import time

import numpy as np


def _scene(resolution, volume_size, steps, streams):
    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import (
        LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
    )

    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.9
    table[..., 1] = np.where(dens > 0.3, (dens - 0.3) / 0.7, 0.0)
    table[..., 2] = 0.5

    renderer = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(volume_size),
        MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)),
        SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=steps),
        resolution=resolution,
        streams=streams,
    )
    return renderer, Camera()


def measure_forward(resolution, volume_size, steps, streams, batch, reps):
    """Forward-only Mpaths/s via render_many (scan-batched dispatches)."""
    import jax
    import jax.numpy as jnp
    from vpt_tpu.models import mcm_spectral as M

    renderer, camera = _scene(resolution, volume_size, steps, streams)
    ctx = renderer.ctx(camera, 1)

    def seeds(lo):
        return jnp.asarray(
            [(lo + k) * 2654435761 % 2**32 for k in range(batch)], jnp.uint32
        )

    state = renderer.reset(camera, seed=1)
    state, img = M.render_many(state, ctx, seeds(0), steps=steps, n_bins=12)
    jax.block_until_ready(img)
    samples_before = int(jnp.sum(state.samples).block_until_ready())

    t0 = time.perf_counter()
    for r in range(reps):
        state, img = M.render_many(
            state, ctx, seeds((r + 1) * batch), steps=steps, n_bins=12
        )
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    paths = int(jnp.sum(state.samples).block_until_ready()) - samples_before
    mpaths = paths / dt / 1e6
    # lane-steps are exact: every lane executes every fori step of every
    # dispatch (the lockstep megakernel), so the rate is a closed form
    lane_steps = resolution * resolution * streams * steps * reps * batch
    print(
        f"# fwd: {reps * batch} dispatches in {dt:.3f}s; "
        f"{paths / (resolution * resolution):.1f} spp; {mpaths:.1f} Mpaths/s; "
        f"{lane_steps / dt / 1e6:.1f} M lane-steps/s",
        file=sys.stderr,
    )
    return mpaths, lane_steps / dt


def measure_fwdbwd(resolution, volume_size, steps, streams, target_spp,
                   scatter_stride=1, chunk=4, scatter_mode="stride"):
    """fwd+bwd Mpaths/s on the production shape: scan-batched packed-adjoint
    windows (prb_render_and_grads_many — image + summed density gradients
    per K-dispatch device program) until >= target_spp accumulated."""
    import jax.numpy as jnp
    from vpt_tpu.kernels.spectral_backward import prb_render_and_grads_many

    renderer, camera = _scene(resolution, volume_size, steps, streams)
    ctx = renderer.ctx(camera, 1)
    state = renderer.reset(camera, 1)
    g_img = jnp.ones((resolution, resolution, 3), jnp.float32)
    wrt = frozenset({"density"})

    def window(state, lo):
        seeds = jnp.asarray(
            [(lo + k) * 2654435761 % 2**32 for k in range(chunk)], jnp.uint32)
        return prb_render_and_grads_many(
            state, ctx, seeds, g_img, steps, 12, wrt=wrt,
            scatter_stride=scatter_stride, scatter_mode=scatter_mode)

    state, img, g = window(state, 2)  # compile + warm
    float(jnp.sum(g["density"]))
    s_before = int(jnp.sum(state.samples))

    spp_per = max(s_before / (resolution * resolution * streams), 1e-6)
    reps = max(int(np.ceil(target_spp / spp_per)), 2)

    t0 = time.perf_counter()
    for k in range(reps):
        state, img, g = window(state, (k + 1) * chunk + 2)
    float(jnp.sum(g["density"]))
    dt = time.perf_counter() - t0
    paths = int(jnp.sum(state.samples)) - s_before
    spp = paths / (resolution * resolution * streams)
    mpaths = paths / dt / 1e6
    lane_steps = resolution * resolution * streams * steps * reps * chunk
    print(
        f"# fwd+bwd ({scatter_mode}={scatter_stride}): {reps * chunk} "
        f"dispatches in {dt:.2f}s; {spp:.1f} spp; {mpaths:.2f} Mpaths/s; "
        f"{lane_steps / dt / 1e6:.1f} M lane-steps/s",
        file=sys.stderr,
    )
    return mpaths, lane_steps / dt


def check_u8_bit_exact():
    """On-chip KERNEL-LEVEL guard for the u8 packed-table exactness claim
    (ADVICE r4): sampling a u8-quantized volume through the packed-u8 fast
    path must be bit-identical to the raw-f32 path for every code, ON THIS
    BACKEND — an XLA upgrade that re-fuses the compensated 1/255 into a
    reciprocal multiply would break bit-parity silently. Note the ISOLATED
    dequantize expression DOES fold back to a reciprocal multiply on the
    TPU backend (a known lowering fact, tests/test_packed_tables.py); the
    exactness claim is about the sampler's fusion context, so this check
    runs the actual sample_volume path on all 256 codes at random
    coordinates."""
    import jax
    import jax.numpy as jnp
    from vpt_tpu.ops import interp

    codes = np.arange(256, dtype=np.uint8).reshape(4, 8, 8)
    raw = codes.astype(np.float32) / np.float32(255.0)
    pv = interp.pack_volume_auto(raw, "full")
    assert isinstance(pv, interp.PackedVolume) and pv.table.dtype == jnp.uint8
    rng = np.random.default_rng(0)
    u, v, w = (jnp.asarray(rng.random(4096, dtype=np.float32))
               for _ in range(3))

    @jax.jit
    def sample(vol, u, v, w):
        return interp.sample_volume(vol, u, v, w, "linear")

    a = np.asarray(sample(jnp.asarray(raw), u, v, w))
    b = np.asarray(sample(pv, u, v, w))
    ok = bool((a == b).all())
    if not ok:
        bad = int((a != b).sum())
        print(f"# WARNING: packed-u8 sampling NOT bit-exact on this backend "
              f"({bad}/{a.size} samples differ) — XLA re-fused the "
              f"compensated 1/255; auto-u8 packed tables lost bit-parity",
              file=sys.stderr)
    return ok


def measure_ceilings(volume_size):
    """Speed-of-light microbenches for the two memory walls, measured on
    the CURRENT device at the bench's own table sizes (VERDICT r4 #7):

    - gather ceiling: lane-steps/s of the forward's binding access — one
      8-wide u8 corner-row gather per lane-step (the TF/light gather hides
      under it, ARCHITECTURE.md "the gather wall");
    - scatter ceiling: lane-steps/s of the exact backward's binding access
      — one 8-wide f32 row scatter-add into the packed-volume adjoint.

    Methodology matches the recorded campaign numbers (tools/
    gather_bench*.py, tools/coalesce_bench.py): precomputed random index
    streams scanned step-by-step, one access per lane per step.
    """
    import jax
    import jax.numpy as jnp
    from vpt_tpu.ops.interp import _dequantize_rows

    lanes = 1 << 20
    iters = 16
    Dp = volume_size + 1
    rows = Dp * Dp * Dp
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, rows, (iters, lanes), dtype=np.int32))
    table = jnp.zeros((rows, 8), jnp.uint8)
    upd = jnp.ones((lanes, 8), jnp.float32)

    @jax.jit
    def gather_run(idx, t):
        def body(acc, ix):
            r = _dequantize_rows(jnp.take(t, ix, axis=0))
            return acc + jnp.sum(r, axis=-1), None

        acc, _ = jax.lax.scan(body, jnp.zeros((lanes,), jnp.float32), idx)
        return acc

    @jax.jit
    def scatter_run(idx, upd):
        # adjoint initialized INSIDE the program, like the real backward's
        # _packed_adj_init — passing it as a donated argument forces a
        # full-table copy through the tunnel relay (measured 2x per-index
        # cost inflation)
        def body(a, ix):
            return a.at[ix].add(upd), None

        a, _ = jax.lax.scan(body, jnp.zeros((rows, 8), jnp.float32), idx)
        return a

    # sync via data fetches: block_until_ready can return before execution
    # through the async tunnel relay (ARCHITECTURE.md environment lessons)
    out = {}
    r = gather_run(idx, table)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    r = gather_run(idx, table)
    float(jnp.sum(r))
    out["gather_ceiling_lane_steps_per_s"] = lanes * iters / (
        time.perf_counter() - t0)

    a = scatter_run(idx, upd)
    float(jnp.sum(a))
    t0 = time.perf_counter()
    a = scatter_run(idx, upd)
    float(jnp.sum(a))
    out["scatter_ceiling_lane_steps_per_s"] = lanes * iters / (
        time.perf_counter() - t0)
    return out


def _vs_baseline(value, key="value"):
    path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    try:
        base = json.load(open(path))[key]
        return round(value / base, 3) if base else 1.0
    except Exception:
        return 1.0


def main():
    resolution = int(os.environ.get("BENCH_RES", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    volume_size = int(os.environ.get("BENCH_VOLUME", "128"))
    streams = int(os.environ.get("BENCH_STREAMS", "4"))

    u8_ok = check_u8_bit_exact()
    ceil = measure_ceilings(volume_size)
    g_ceil = ceil["gather_ceiling_lane_steps_per_s"]
    s_ceil = ceil["scatter_ceiling_lane_steps_per_s"]
    # exact fwd+bwd pays both walls per lane-step (one corner-row gather in
    # the taped forward + one adjoint-row scatter in the reverse); per-index
    # costs are additive, so the combined ceiling is the harmonic form
    fb_ceil = 1.0 / (1.0 / g_ceil + 1.0 / s_ceil)

    fwd, fwd_ls = measure_forward(
        resolution, volume_size, steps, streams,
        batch=int(os.environ.get("BENCH_BATCH", "64")),
        reps=int(os.environ.get("BENCH_REPS", "5")))
    if os.environ.get("BENCH_MODE") == "fwd":
        print(json.dumps({
            "metric": "spectral_mcm_fwd_throughput_512x512",
            "value": round(fwd, 3),
            "unit": "Mpaths/s/chip",
            "vs_baseline": _vs_baseline(fwd, key="fwd_value"),
            "fwd_lane_steps_per_s": round(fwd_ls),
            "gather_ceiling_lane_steps_per_s": round(g_ceil),
            "fwd_fraction_of_gather_ceiling": round(fwd_ls / g_ceil, 3),
            "u8_dequantize_bit_exact": u8_ok,
            "baseline": "this build's round-1 measurement "
                        "(BENCH_BASELINE.json); reference publishes none",
        }))
        return

    target_spp = int(os.environ.get("BENCH_SPP", "64"))
    exact, exact_ls = measure_fwdbwd(resolution, volume_size, steps, streams,
                                     target_spp)
    thinned, _ = measure_fwdbwd(resolution, volume_size, steps, streams,
                                target_spp, scatter_stride=4)
    importance, _ = measure_fwdbwd(resolution, volume_size, steps, streams,
                                   target_spp, scatter_stride=4,
                                   scatter_mode="importance")
    print(json.dumps({
        "metric": "spectral_mcm_fwdbwd_thinned_s4_512x512_64spp",
        "value": round(thinned, 3),
        "unit": "Mpaths/s/chip",
        # apples-to-apples: exact estimator vs the round-1 exact baseline;
        # the thinned headline's ratio rides separately (ADVICE r3)
        "vs_baseline": _vs_baseline(exact),
        "thinned_vs_exact_baseline": _vs_baseline(thinned),
        "fwd_mpaths_per_s": round(fwd, 3),
        "fwdbwd_exact_stride1": round(exact, 3),
        # importance thinning at stride-4's index budget (the sparse-scene
        # estimator of the r5 auto policy; CONFIGS.md "stride convergence")
        "fwdbwd_importance_i4": round(importance, 3),
        # speed-of-light occupancy (VERDICT r4 #7): lane-step rates vs the
        # gather/scatter walls measured ON THIS DEVICE at this table size
        "fwd_lane_steps_per_s": round(fwd_ls),
        "gather_ceiling_lane_steps_per_s": round(g_ceil),
        "fwd_fraction_of_gather_ceiling": round(fwd_ls / g_ceil, 3),
        "fwdbwd_exact_lane_steps_per_s": round(exact_ls),
        "scatter_ceiling_lane_steps_per_s": round(s_ceil),
        "fwdbwd_ceiling_lane_steps_per_s": round(fb_ceil),
        "fwdbwd_fraction_of_ceiling": round(exact_ls / fb_ceil, 3),
        "u8_dequantize_bit_exact": u8_ok,
        "baseline": "BENCH_BASELINE.json = this build's round-1 exact "
                    "fwd+bwd (12.99; reference publishes none). "
                    "vs_baseline grades fwdbwd_exact_stride1 against it "
                    "(same estimator); thinned_vs_exact_baseline is the "
                    "stride-4 headline over the same anchor, promoted on "
                    "the CONFIGS.md stride-convergence evidence. "
                    "CONFIGS.md regenerated this round: r5 (2026-08-21).",
    }))


if __name__ == "__main__":
    main()
