"""In-situ test of gather optimizations in the real render body:
  A. split streams into independent per-stream gathers (overlap)
  B. u8 tables (reference-exact: the reference's textures are 8-bit unorm)
  C. one-hot f32 MXU for the light spectrum lookup
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


def u8_sample_volume_factory(scale=255.0):
    def svf(packed_u8, u, v, w, mode):
        Dp, Hp, Wp, _ = packed_u8.shape
        D, H, W = Dp - 1, Hp - 1, Wp - 1

        def base_and_frac(t, n):
            s = t * n - 0.5
            i0 = jnp.floor(s)
            return jnp.clip(i0.astype(jnp.int32) + 1, 0, n), s - i0

        bx, fx = base_and_frac(u, W)
        by, fy = base_and_frac(v, H)
        bz, fz = base_and_frac(w, D)
        rows = jnp.take(packed_u8.reshape(-1, 8), (bz * Hp + by) * Wp + bx,
                        axis=0).astype(jnp.float32) * jnp.float32(1.0 / scale)
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


def u8_tex2d(tex_u8, u, v):
    C = tex_u8.shape[-1] // 4
    Hp, Wp, _ = tex_u8.shape
    H, W = Hp - 1, Wp - 1

    def base_and_frac(t, n):
        s = t * n - 0.5
        i0 = jnp.floor(s)
        return jnp.clip(i0.astype(jnp.int32) + 1, 0, n), s - i0

    bx, fx = base_and_frac(u, W)
    by, fy = base_and_frac(v, H)
    rows = jnp.take(tex_u8.reshape(-1, 4 * C), by * Wp + bx,
                    axis=0).astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    c00 = rows[..., 0 * C:1 * C]
    c01 = rows[..., 1 * C:2 * C]
    c10 = rows[..., 2 * C:3 * C]
    c11 = rows[..., 3 * C:4 * C]
    fx = fx[..., None]
    fy = fy[..., None]
    c0 = c00 + (c01 - c00) * fx
    c1 = c10 + (c11 - c10) * fx
    return c0 + (c1 - c0) * fy


def onehot_tex1d(tex_pairs, u):
    # tex_pairs (N+1, 2) f32; one-hot f32 MXU selection (exact)
    Np1, _ = tex_pairs.shape
    N = Np1 - 1
    s = u * N - 0.5
    i0 = jnp.floor(s)
    frac = s - i0
    b = jnp.clip(i0.astype(jnp.int32) + 1, 0, N)
    flatb = b.reshape(-1)
    oh = (flatb[:, None] == jnp.arange(Np1, dtype=jnp.int32)[None]).astype(jnp.float32)
    rows = jnp.dot(oh, tex_pairs, preferred_element_type=jnp.float32)
    rows = rows.reshape(b.shape + (2,))
    return rows[..., 0] + (rows[..., 1] - rows[..., 0]) * frac


def run_variant(name, ctx, state, seeds, svf=None, tex2d=None, tex1d=None,
                split_streams=False):
    orig2d, orig1d = interp.sample_tex2d, interp.sample_tex1d

    @jax.jit
    def run(state, ctx, seeds):
        if tex2d is not None:
            interp.sample_tex2d = tex2d
        if tex1d is not None:
            interp.sample_tex1d = tex1d
        try:
            ix, iy, seed_iy = M._pixel_grid(RES, STREAMS)
            sx, sy = geometry.screen_position(ix, iy, 1.0 / RES)

            def dispatch(p, seed_bits):
                rng = sampling.seed_state(ix, seed_iy, seed_bits)
                c = ctx._replace(seed_bits=seed_bits)

                if split_streams:
                    def body(_, carry):
                        q, r = carry
                        outs_q, outs_r = [], []
                        for s in range(STREAMS):
                            qs = jax.tree_util.tree_map(lambda a: a[s][None] if a.ndim == 3 else a[:, s][:, None], q)
                            rs = jax.tree_util.tree_map(lambda a: a[s][None], rng) if False else None
                        return carry  # placeholder (not used)
                else:
                    def body(_, carry):
                        q, r = carry
                        q, r, _ = M._render_body(q, r, None, sx, sy, c, 12,
                                                 "linear", diff=False,
                                                 sample_volume_fn=svf)
                        return (q, r)

                p, _ = jax.lax.fori_loop(0, STEPS, body, (p, rng))
                return p, None

            state, _ = jax.lax.scan(dispatch, state, seeds)
            return state
        finally:
            interp.sample_tex2d = orig2d
            interp.sample_tex1d = orig1d

    out = run(state, ctx, seeds)
    ref = float(jnp.sum(out.radiance))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(out, ctx, seeds)
    float(jnp.sum(out.radiance))
    dt = (time.perf_counter() - t0) / 3
    ls = BATCH * STEPS * STREAMS * RES * RES
    print(f"{name:36s} {dt*1e3:8.1f} ms  {ls/dt/1e9:6.2f} Glane-steps/s  sum={ref:.4f}")
    return out


def main():
    renderer, ctx, state = build()
    seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)

    base = run_variant("baseline", ctx, state, seeds)

    # u8 volume: rebuild packed corners from the original u8 grid
    vol_u8 = np.asarray(Volume.sphere_in_cube(VOL).density)
    vol_u8 = np.round(vol_u8 * 255.0).astype(np.uint8)
    packed_u8 = interp.pack_volume_corners(vol_u8)
    ctx_u8 = ctx._replace(density=jnp.asarray(packed_u8))
    u8v = run_variant("u8 volume rows", ctx_u8, state, seeds,
                      svf=u8_sample_volume_factory())
    print("  u8 == f32:", bool(jnp.allclose(base.radiance, u8v.radiance, atol=1e-5)))

    # u8 TF table
    tf_u8 = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    tf_u8[..., 0] = 0.9
    tf_u8[..., 1] = np.where(dens > 0.3, (dens - 0.3) / 0.7, 0.0)
    tf_u8[..., 2] = 0.5
    tfq = np.round(tf_u8 * 255).astype(np.uint8)
    packed_tf_u8 = interp.pack_tex2d_corners(tfq)
    ctx_tf = ctx._replace(material_tf=jnp.asarray(packed_tf_u8))
    run_variant("u8 TF rows", ctx_tf, state, seeds, tex2d=u8_tex2d)

    # both u8
    ctx_both = ctx._replace(density=jnp.asarray(packed_u8),
                            material_tf=jnp.asarray(packed_tf_u8))
    run_variant("u8 volume + u8 TF", ctx_both, state, seeds,
                svf=u8_sample_volume_factory(), tex2d=u8_tex2d)

    # one-hot light
    run_variant("one-hot MXU light", ctx, state, seeds, tex1d=onehot_tex1d)

    # all three
    run_variant("u8 vol+TF + one-hot light", ctx_both, state, seeds,
                svf=u8_sample_volume_factory(), tex2d=u8_tex2d,
                tex1d=onehot_tex1d)


if __name__ == "__main__":
    main()


def run_split(name, ctx, state, seeds, tex1d=None):
    orig1d = interp.sample_tex1d

    @jax.jit
    def run(state, ctx, seeds):
        if tex1d is not None:
            interp.sample_tex1d = tex1d
        try:
            ix, iy, seed_iy = M._pixel_grid(RES, STREAMS)
            sx, sy = geometry.screen_position(ix, iy, 1.0 / RES)

            def dispatch(p, seed_bits):
                rng = sampling.seed_state(ix, seed_iy, seed_bits)
                c = ctx._replace(seed_bits=seed_bits)

                def body(_, carry):
                    q, r = carry
                    qs_out, rs_out = [], []
                    for s in range(STREAMS):
                        qs = M.SpectralState(*[
                            a[:, s] if a.ndim == 4 else a[s] for a in q
                        ])
                        q2, r2, _ = M._render_body(
                            qs, r[s], None, sx[s], sy[s], c, 12,
                            "linear", diff=False)
                        qs_out.append(q2)
                        rs_out.append(r2)
                    q_new = M.SpectralState(*[
                        jnp.stack([getattr(qs_out[s], f) for s in range(STREAMS)],
                                  axis=1 if getattr(q, f).ndim == 4 else 0)
                        for f in q._fields
                    ])
                    return (q_new, jnp.stack(rs_out, axis=0))

                p, _ = jax.lax.fori_loop(0, STEPS, body, (p, rng))
                return p, None

            state, _ = jax.lax.scan(dispatch, state, seeds)
            return state
        finally:
            interp.sample_tex1d = orig1d

    out = run(state, ctx, seeds)
    ref = float(jnp.sum(out.radiance))
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(out, ctx, seeds)
    float(jnp.sum(out.radiance))
    dt = (time.perf_counter() - t0) / 3
    ls = BATCH * STEPS * STREAMS * RES * RES
    print(f"{name:36s} {dt*1e3:8.1f} ms  {ls/dt/1e9:6.2f} Glane-steps/s  sum={ref:.4f}")


def main_split():
    renderer, ctx, state = build()
    seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)
    run_split("split streams", ctx, state, seeds)
    run_split("split streams + onehot light", ctx, state, seeds, tex1d=onehot_tex1d)


main_split()
