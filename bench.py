"""Benchmark: spectral MCM forward throughput on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpaths/s/chip on the north-star workload (512^2 framebuffer,
12 spectral bins, 8 Woodcock steps per dispatch, 128^3 volume). A "path"
is one completed photon sample (the estimator's unit of work). Dispatches
are batched on device via render_many; only scalars cross the host link
during measurement.
"""

import json
import os
import sys
import time

import numpy as np


def main_grad():
    """BENCH_MODE=grad: fwd+bwd throughput of the differentiable spectral
    path (value_and_grad of an image loss w.r.t. the density grid)."""
    import jax
    import jax.numpy as jnp

    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.optim import spectral_render_loss
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import (
        LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
    )

    # smaller default workload: the reverse-mode program over a scan of
    # dispatches is a much bigger compile than the forward path
    resolution = int(os.environ.get("BENCH_RES", "256"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    volume_size = int(os.environ.get("BENCH_VOLUME", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    streams = int(os.environ.get("BENCH_STREAMS", "4"))

    renderer = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(volume_size),
        MaterialTF.constant(0.8, 0.5),
        LightConfig(direction=(1.0, 0.2, 0.5)),
        SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, steps=steps),
        resolution=resolution,
        # packed non-learned tables (TF/light): raw tables cost 4/2 gathers
        # per lookup instead of 1; the learned density is packed inside the
        # loss (pack_volume_corners_jnp)
        pack_tables=True,
        streams=streams,
    )
    camera = Camera()
    ctx = renderer.ctx(camera, 1)
    state0 = renderer.reset(camera, 1)
    target = jnp.zeros((resolution, resolution, 3), jnp.float32)
    # learn the RAW density grid; it is corner-packed differentiably inside
    # the loss (one row gather fwd / one row scatter bwd per sample instead
    # of 8 scalar ones — see ops/interp.pack_volume_corners_jnp)
    raw_density = jnp.asarray(Volume.sphere_in_cube(volume_size).density)
    params = {"density": raw_density}

    # single-dispatch reverse program; everything (ctx/state/target) passed
    # as arguments — closure constants make remote lowering pathologically
    # slow (426s vs 13s measured)
    def loss_fn(p, ctx_in, s0, tgt, seed_bits):
        from vpt_tpu.ops.interp import pack_volume_corners_jnp

        c = ctx_in._replace(
            density=pack_volume_corners_jnp(p["density"]), seed_bits=seed_bits
        )
        score = jnp.ones_like(s0.px)
        _, _, img = M.render_diff(s0, score, c, steps, 12)
        return jnp.mean((img - tgt) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    loss, g = grad_fn(params, ctx, state0, target, jnp.uint32(1))
    float(jnp.sum(g["density"]))
    n_calls = reps * batch
    t0 = time.perf_counter()
    for r in range(n_calls):
        loss, g = grad_fn(params, ctx, state0, target,
                          jnp.uint32((r + 2) * 2654435761 % 2**32))
    float(jnp.sum(g["density"]))
    dt = time.perf_counter() - t0

    # fwd+bwd paths: completed samples of the same dispatches, forward
    st, _ = M.render_many(
        state0, ctx,
        jnp.asarray([(r + 2) * 2654435761 % 2**32 for r in range(n_calls)], jnp.uint32),
        steps=steps, n_bins=12,
    )
    paths = int(jnp.sum(st.samples))
    mpaths = paths / dt / 1e6
    print(
        f"# grad mode: {n_calls} dispatches fwd+bwd in {dt:.2f}s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "spectral_mcm_fwd_bwd_throughput",
        "value": round(mpaths, 3),
        "unit": "Mpaths/s/chip",
        "vs_baseline": 1.0,
    }))


def main():
    import jax
    import jax.numpy as jnp

    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import (
        LightConfig,
        MaterialTF,
        MCMSpectralConfig,
        SpectrumConfig,
    )

    resolution = int(os.environ.get("BENCH_RES", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    volume_size = int(os.environ.get("BENCH_VOLUME", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    streams = int(os.environ.get("BENCH_STREAMS", "4"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

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
    camera = Camera()
    ctx = renderer.ctx(camera, 1)

    def seeds(lo):
        return jnp.asarray(
            [(lo + k) * 2654435761 % 2**32 for k in range(batch)], jnp.uint32
        )

    state = renderer.reset(camera, seed=1)
    # warmup/compile
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

    samples_after = int(jnp.sum(state.samples).block_until_ready())
    paths = samples_after - samples_before
    dispatches = reps * batch
    mpaths_per_s = paths / dt / 1e6
    msteps_per_s = dispatches * resolution * resolution * steps / dt / 1e6

    print(
        f"# {dispatches} dispatches in {dt:.3f}s; "
        f"{paths / (resolution * resolution):.1f} spp; "
        f"{msteps_per_s:.0f} M woodcock-steps/s; {mpaths_per_s:.1f} Mpaths/s",
        file=sys.stderr,
    )

    baseline_file = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(baseline_file):
        try:
            base = json.load(open(baseline_file))["value"]
            vs = mpaths_per_s / base if base else 1.0
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "spectral_mcm_fwd_throughput_512x512",
                "value": round(mpaths_per_s, 3),
                "unit": "Mpaths/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "grad":
        main_grad()
    else:
        main()
