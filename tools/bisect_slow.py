"""Bisect the in-situ gather slowdown in the real render body.

Variants replace ONLY the `jnp.take` row fetch with arithmetic of identical
shapes/deps (keeping all index math), to isolate the take op itself.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import interp, sampling, geometry
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)

RES = 512
STEPS = 8
STREAMS = 4
BATCH = 32
VOL = 128


def build():
    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.9
    table[..., 1] = np.where(dens > 0.3, (dens - 0.3) / 0.7, 0.0)
    table[..., 2] = 0.5
    r = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(VOL), MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=STEPS),
        resolution=RES, streams=STREAMS,
    )
    cam = Camera()
    return r, r.ctx(cam, 1), r.reset(cam, 1)


def fake_take_volume(packed, u, v, w, mode):
    """Same math as _sample_volume_packed but rows faked (no take)."""
    Dp, Hp, Wp, _ = packed.shape
    D, H, W = Dp - 1, Hp - 1, Wp - 1

    def base_and_frac(t, n):
        s = t * n - 0.5
        i0 = jnp.floor(s)
        return jnp.clip(i0.astype(jnp.int32) + 1, 0, n), s - i0

    bx, fx = base_and_frac(u, W)
    by, fy = base_and_frac(v, H)
    bz, fz = base_and_frac(w, D)
    idx = (bz * Hp + by) * Wp + bx
    # fake rows: shape (..., 8), depends on idx
    rows = (idx[..., None] % 97).astype(jnp.float32) * (
        jnp.arange(8, dtype=jnp.float32) * 0.01 + 0.1
    )
    c000, c001, c010, c011 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
    c100, c101, c110, c111 = rows[..., 4], rows[..., 5], rows[..., 6], rows[..., 7]
    c00 = c000 + (c001 - c000) * fx
    c01 = c010 + (c011 - c010) * fx
    c10 = c100 + (c101 - c100) * fx
    c11 = c110 + (c111 - c110) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return (c0 + (c1 - c0) * fz) * 1e-3


def real_take_volume(packed, u, v, w, mode):
    return interp._sample_volume_packed(packed, u, v, w, mode)


def run_variant(name, ctx, state, seeds, svf, steps=STEPS, batch=BATCH):
    @jax.jit
    def run(state, ctx, seeds):
        ix, iy, seed_iy = M._pixel_grid(RES, STREAMS)
        sx, sy = geometry.screen_position(ix, iy, 1.0 / RES)

        def dispatch(p, seed_bits):
            rng = sampling.seed_state(ix, seed_iy, seed_bits)

            def body(_, carry):
                q, r = carry
                q, r, _ = M._render_body(
                    q, r, None, sx, sy, ctx._replace(seed_bits=seed_bits),
                    12, "linear", diff=False, sample_volume_fn=svf)
                return (q, r)

            p, _ = jax.lax.fori_loop(0, steps, body, (p, rng))
            return p, None

        state, _ = jax.lax.scan(dispatch, state, seeds[:batch])
        return state

    out = run(state, ctx, seeds)
    float(jnp.sum(out.radiance))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(out, ctx, seeds)
    float(jnp.sum(out.radiance))
    dt = (time.perf_counter() - t0) / 3
    ls = batch * steps * STREAMS * RES * RES
    print(f"{name:36s} {dt*1e3:8.1f} ms  {ls/dt/1e9:6.2f} Glane-steps/s")


def main():
    renderer, ctx, state = build()
    seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)
    run_variant("real take (volume only isolated)", ctx, state, seeds, real_take_volume)
    run_variant("fake rows, same index math", ctx, state, seeds, fake_take_volume)
    run_variant("real take, 1 dispatch", ctx, state, seeds, real_take_volume, batch=1)
    run_variant("real take, steps=1", ctx, state, seeds, real_take_volume, steps=1)


if __name__ == "__main__":
    main()


def preflat_take_volume_factory(vol_size):
    Dp = Hp = Wp = vol_size + 1

    def svf(packed_flat, u, v, w, mode):
        D = H = W = vol_size

        def base_and_frac(t, n):
            s = t * n - 0.5
            i0 = jnp.floor(s)
            return jnp.clip(i0.astype(jnp.int32) + 1, 0, n), s - i0

        bx, fx = base_and_frac(u, W)
        by, fy = base_and_frac(v, H)
        bz, fz = base_and_frac(w, D)
        rows = jnp.take(packed_flat, (bz * Hp + by) * Wp + bx, axis=0)
        c000, c001, c010, c011 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
        c100, c101, c110, c111 = rows[..., 4], rows[..., 5], rows[..., 6], rows[..., 7]
        c00 = c000 + (c001 - c000) * fx
        c01 = c010 + (c011 - c010) * fx
        c10 = c100 + (c101 - c100) * fx
        c11 = c110 + (c111 - c110) * fx
        c0 = c00 + (c01 - c00) * fy
        c1 = c10 + (c11 - c10) * fy
        return c0 + (c1 - c0) * fz

    return svf


def main2():
    renderer, ctx, state = build()
    seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)
    flat = jnp.asarray(np.asarray(ctx.density).reshape(-1, 8))
    ctx_flat = ctx._replace(density=flat)
    svf = preflat_take_volume_factory(VOL)
    run_variant("pre-flattened (129^3,8) table", ctx_flat, state, seeds, svf)


main2()
