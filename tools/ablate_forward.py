"""Ablation profile of the spectral forward dispatch on the current device.

Times the north-star workload with pieces of the step body stubbed out to
attribute dispatch time: full / no-volume-gather / no-TF-gather /
no-light-gather / no-gathers-at-all / rng+control-only.

Run: python tools/ablate_forward.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import interp, sampling
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


def timed(fn, state, ctx, seeds, reps=3):
    out = fn(state, ctx, seeds)  # compile
    float(jnp.sum(out.radiance))  # force full materialization
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out, ctx, seeds)
    float(jnp.sum(out.radiance))
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def make_fn(sample_volume_fn=None, tex2d=None, tex1d=None):
    orig2d, orig1d = interp.sample_tex2d, interp.sample_tex1d

    @jax.jit
    def run(state, ctx, seeds):
        if tex2d is not None:
            interp.sample_tex2d = tex2d
        if tex1d is not None:
            interp.sample_tex1d = tex1d
        try:
            ix, iy, seed_iy = M._pixel_grid(RES, STREAMS)
            sx, sy = M.__dict__["geometry"].screen_position(ix, iy, 1.0 / RES)

            def dispatch(p, seed_bits):
                rng = sampling.seed_state(ix, seed_iy, seed_bits)

                def body(_, carry):
                    q, r = carry
                    q, r, _ = M._render_body(
                        q, r, None, sx, sy, ctx._replace(seed_bits=seed_bits),
                        12, "linear", diff=False,
                        sample_volume_fn=sample_volume_fn)
                    return (q, r)

                p, _ = jax.lax.fori_loop(0, STEPS, body, (p, rng))
                return p, None

            state, _ = jax.lax.scan(dispatch, state, seeds)
            return state
        finally:
            interp.sample_tex2d = orig2d
            interp.sample_tex1d = orig1d

    return run


def main():
    renderer, ctx, state = build()
    seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)
    lane_steps = BATCH * STEPS * STREAMS * RES * RES

    const_vol = lambda d, x, y, z, mode: 0.4 + 0.1 * (x + y + z)
    const_2d = lambda tex, u, v: jnp.stack(
        [0.9 + 0 * u, 0.5 + 0.1 * v, 0.5 + 0 * u, 0 * u], axis=-1)
    const_1d = lambda tex, u: 1.0 + 0 * u

    variants = {
        "full": make_fn(),
        "no_volume_gather": make_fn(sample_volume_fn=const_vol),
        "no_tf_gather": make_fn(tex2d=const_2d),
        "no_light_gather": make_fn(tex1d=const_1d),
        "no_gathers": make_fn(sample_volume_fn=const_vol, tex2d=const_2d,
                              tex1d=const_1d),
    }
    base = None
    for name, fn in variants.items():
        dt, state_out = timed(fn, state, ctx, seeds)
        gsteps = lane_steps / dt / 1e9
        if base is None:
            base = dt
        print(f"{name:20s} {dt*1e3:8.1f} ms  {gsteps:6.2f} Glane-steps/s  "
              f"({dt/base*100:5.1f}% of full)")


if __name__ == "__main__":
    main()
