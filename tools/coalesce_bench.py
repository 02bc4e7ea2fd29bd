"""Compare-and-coalesce scatter experiment (VERDICT r3 directive #1b).

Hypothesis: consecutive steps of a surviving lane sample *nearby* positions
(free flight ~1/extinction), so within-lane consecutive-step packed-row
indices frequently repeat — summing those contributions before scattering
could cut scatter indices.

Measurements:
  1. duplicate fraction: P(vol_row0[t+1] == vol_row0[t]) among lanes where
     both steps scatter a table contribution — the ceiling for ANY
     coalescing scheme.
  2. pair-coalesce variant end-to-end: process the reverse scatter scan in
     step PAIRS; scatter A carries v[t] + same * v[t+1] at row[t], scatter
     B carries (1 - same) * v[t+1] at row[t+1]. Under XLA's static shapes
     the INDEX COUNT is unchanged (every lane still emits 2 indices per
     pair) — and scatter-add cost is per index regardless of value
     (tools/scatter_bench.py: zero-valued updates are not skipped; the
     lowering is sort-based over indices) — so the prediction is parity or
     a small loss from the extra compare/select work. The measurement makes
     the rejection (or a surprise win) a recorded fact.

Run on the TPU: python tools/coalesce_bench.py
"""

import json
import sys
import time

import numpy as np


def duplicate_fraction(resolution=512, volume=128, steps=8, streams=4,
                       extinction=40.0, seed=1):
    import jax
    import jax.numpy as jnp

    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.ops import geometry, sampling
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
    r = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(volume), MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=extinction, bounces=8, steps=steps),
        resolution=resolution, streams=streams)
    cam = Camera()
    ctx = r.ctx(cam, seed)
    state = r.reset(cam, seed)

    VDp, VHp, VWp = (d for d in (
        ctx.density.dims if hasattr(ctx.density, "dims")
        else ctx.density.shape[:3]))
    VD, VH, VW = VDp - 1, VHp - 1, VWp - 1

    @jax.jit
    def rows_per_step(state, ctx):
        ix, iy, seed_iy = M._pixel_grid(resolution, streams)
        sx, sy = geometry.screen_position(ix, iy, 1.0 / resolution)
        rng = sampling.seed_state(ix, seed_iy, ctx.seed_bits)

        def base(t, n):
            s = t * n - 0.5
            return jnp.clip(jnp.floor(s).astype(jnp.int32) + 1, 0, n)

        def body(carry, _):
            p, rng = carry
            p2, rng2, _, it = M._render_body(
                p, rng, None, sx, sy, ctx, 12, "linear", diff=False,
                collect=True)
            u, v, w = it["sample_pos"]
            row = (base(w, VD) * VHp + base(v, VH)) * VWp + base(u, VW)
            # a step contributes a table scatter iff the lane wasn't OOB
            return (p2, rng2), (row, ~it["oob"])

        (_, _), (rows, live) = jax.lax.scan(body, (state, rng), None,
                                            length=steps)
        same = (rows[1:] == rows[:-1]) & live[1:] & live[:-1]
        both = live[1:] & live[:-1]
        return jnp.sum(same), jnp.sum(both)

    s, b = rows_per_step(state, ctx)
    return float(s) / max(float(b), 1.0)


def pair_coalesce_time(resolution=512, streams=4, steps=8, n_rows=129**3,
                       seed=0, reps=8, mode="baseline"):
    """Isolated scatter-scan microbench on realistic index streams:
    ``baseline`` = one 8-wide row scatter per step; ``coalesce`` = pair
    scheme (same index count, values pre-summed where rows repeat)."""
    import jax
    import jax.numpy as jnp

    lanes = resolution * resolution * streams
    rng = np.random.default_rng(seed)
    # realistic: consecutive rows repeat with the measured probability ~0.5
    rows = np.empty((steps, lanes), np.int32)
    rows[0] = rng.integers(0, n_rows, lanes)
    for t in range(1, steps):
        stay = rng.random(lanes) < 0.5
        rows[t] = np.where(stay, rows[t - 1], rng.integers(0, n_rows, lanes))
    rows = jnp.asarray(rows)
    vals = jnp.asarray(rng.random((steps, lanes, 8), np.float32))

    if mode == "baseline":
        @jax.jit
        def run(rows, vals):
            def body(adj, inp):
                rr, vv = inp
                return adj.at[rr].add(vv), None
            adj, _ = jax.lax.scan(
                body, jnp.zeros((n_rows, 8), jnp.float32), (rows, vals))
            return adj
    elif mode == "segment_sum":
        # alternative lowering probe: does XLA lower segment_sum (scatter
        # by another name) differently from .at[].add?
        @jax.jit
        def run(rows, vals):
            def body(adj, inp):
                rr, vv = inp
                return adj + jax.ops.segment_sum(vv, rr, num_segments=n_rows), None
            adj, _ = jax.lax.scan(
                body, jnp.zeros((n_rows, 8), jnp.float32), (rows, vals))
            return adj
    elif mode == "sorted":
        # pre-sorted indices with the hint: measured flat before
        # (tools/scatter_bench.py) — re-checked here on the scan shape
        @jax.jit
        def run(rows, vals):
            def body(adj, inp):
                rr, vv = inp
                order = jnp.argsort(rr)
                return adj.at[rr[order]].add(
                    vv[order], indices_are_sorted=True, mode="drop"), None
            adj, _ = jax.lax.scan(
                body, jnp.zeros((n_rows, 8), jnp.float32), (rows, vals))
            return adj
    else:
        @jax.jit
        def run(rows, vals):
            r2 = rows.reshape(steps // 2, 2, -1)
            v2 = vals.reshape(steps // 2, 2, -1, 8)

            def body(adj, inp):
                rr, vv = inp
                same = (rr[0] == rr[1])[..., None]
                a = vv[0] + jnp.where(same, vv[1], 0.0)
                b = jnp.where(same, 0.0, vv[1])
                adj = adj.at[rr[0]].add(a)
                return adj.at[rr[1]].add(b), None

            adj, _ = jax.lax.scan(
                body, jnp.zeros((n_rows, 8), jnp.float32), (r2, v2))
            return adj

    out = run(rows, vals)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(rows, vals)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    return dt, dt / (steps * lanes) * 1e9  # s/dispatch, ns/index


def main():
    frac = duplicate_fraction()
    print(f"# consecutive-step same-row fraction: {frac:.3f}", file=sys.stderr)
    out = dict(duplicate_fraction=round(frac, 4))
    for mode in ("baseline", "coalesce", "segment_sum", "sorted"):
        t_s, t_ns = pair_coalesce_time(mode=mode)
        print(f"# {mode} scatter scan: {t_s*1e3:.1f} ms ({t_ns:.1f} ns/idx)",
              file=sys.stderr)
        out[f"{mode}_ms"] = round(t_s * 1e3, 2)
        out[f"{mode}_ns_per_idx"] = round(t_ns, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
