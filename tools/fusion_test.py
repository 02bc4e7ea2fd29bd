"""Test: is the in-situ gather slowness an XLA fusion pathology?

Times the full dispatch with optimization_barrier fences around each gather
(preventing XLA from fusing the gather into surrounding loop fusions), and
with the dead transmittance loop-carry removed.
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


def fence(*xs):
    return jax.lax.optimization_barrier(xs)


def fenced_sample_volume(density, u, v, w, mode):
    # compute indices, fence, standalone gather, fence
    packed = density
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
    (idx,) = fence(idx)
    rows = jnp.take(packed.reshape(-1, 8), idx, axis=0)
    (rows,) = fence(rows)
    c000, c001, c010, c011 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
    c100, c101, c110, c111 = rows[..., 4], rows[..., 5], rows[..., 6], rows[..., 7]
    c00 = c000 + (c001 - c000) * fx
    c01 = c010 + (c011 - c010) * fx
    c10 = c100 + (c101 - c100) * fx
    c11 = c110 + (c111 - c110) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fz


def make_fenced_tex2d(orig):
    def f(tex, u, v):
        C = tex.shape[-1] // 4
        Hp, Wp, _ = tex.shape
        H, W = Hp - 1, Wp - 1

        def base_and_frac(t, n):
            s = t * n - 0.5
            i0 = jnp.floor(s)
            return jnp.clip(i0.astype(jnp.int32) + 1, 0, n), s - i0

        bx, fx = base_and_frac(u, W)
        by, fy = base_and_frac(v, H)
        idx = by * Wp + bx
        (idx,) = fence(idx)
        rows = jnp.take(tex.reshape(-1, 4 * C), idx, axis=0)
        (rows,) = fence(rows)
        c00 = rows[..., 0 * C:1 * C]
        c01 = rows[..., 1 * C:2 * C]
        c10 = rows[..., 2 * C:3 * C]
        c11 = rows[..., 3 * C:4 * C]
        fx = fx[..., None]
        fy = fy[..., None]
        c0 = c00 + (c01 - c00) * fx
        c1 = c10 + (c11 - c10) * fx
        return c0 + (c1 - c0) * fy
    return f


def make_fenced_tex1d(orig):
    def f(tex, u):
        Np1, _ = tex.shape
        N = Np1 - 1
        s = u * N - 0.5
        i0 = jnp.floor(s)
        frac = s - i0
        b = jnp.clip(i0.astype(jnp.int32) + 1, 0, N)
        (b,) = fence(b)
        rows = jnp.take(tex, b, axis=0)
        (rows,) = fence(rows)
        return rows[..., 0] + (rows[..., 1] - rows[..., 0]) * frac
    return f


def run_variant(name, ctx, state, seeds, fenced=False, drop_transmittance=False):
    orig2d, orig1d = interp.sample_tex2d, interp.sample_tex1d

    @jax.jit
    def run(state, ctx, seeds):
        if fenced:
            interp.sample_tex2d = make_fenced_tex2d(orig2d)
            interp.sample_tex1d = make_fenced_tex1d(orig1d)
        try:
            ix, iy, seed_iy = M._pixel_grid(RES, STREAMS)
            sx, sy = geometry.screen_position(ix, iy, 1.0 / RES)
            svf = fenced_sample_volume if fenced else None

            def dispatch(p, seed_bits):
                rng = sampling.seed_state(ix, seed_iy, seed_bits)

                def body(_, carry):
                    q, r = carry
                    if drop_transmittance:
                        t_saved = q.transmittance
                        q, r, _ = M._render_body(
                            q._replace(transmittance=q.transmittance[:1]), r,
                            None, sx, sy, ctx._replace(seed_bits=seed_bits),
                            12, "linear", diff=False, sample_volume_fn=svf)
                        q = q._replace(transmittance=t_saved)
                    else:
                        q, r, _ = M._render_body(
                            q, r, None, sx, sy, ctx._replace(seed_bits=seed_bits),
                            12, "linear", diff=False, sample_volume_fn=svf)
                    return (q, r)

                p, _ = jax.lax.fori_loop(0, STEPS, body, (p, rng))
                return p, None

            state, _ = jax.lax.scan(dispatch, state, seeds)
            return state
        finally:
            interp.sample_tex2d = orig2d
            interp.sample_tex1d = orig1d

    out = run(state, ctx, seeds)
    float(jnp.sum(out.radiance))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(out, ctx, seeds)
    float(jnp.sum(out.radiance))
    dt = (time.perf_counter() - t0) / 3
    ls = BATCH * STEPS * STREAMS * RES * RES
    print(f"{name:32s} {dt*1e3:8.1f} ms  {ls/dt/1e9:6.2f} Glane-steps/s")
    return out


def main():
    renderer, ctx, state = build()
    seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)
    base = run_variant("baseline", ctx, state, seeds)
    fen = run_variant("fenced gathers", ctx, state, seeds, fenced=True)
    print("images equal:", bool(jnp.allclose(base.radiance, fen.radiance)))
    run_variant("fenced + no dead transmittance", ctx, state, seeds,
                fenced=True, drop_transmittance=True)


if __name__ == "__main__":
    main()
