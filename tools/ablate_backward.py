"""Ablation of the differentiable spectral dispatch (fwd+bwd).

Attributes reverse-pass time: volume scatter / REINFORCE chain transpose /
radiance accumulation transpose / residual traffic.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import interp
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)

RES = 512
STEPS = 8
STREAMS = 4
VOL = 128


def build():
    r = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(VOL), MaterialTF.constant(0.8, 0.5),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=STEPS),
        resolution=RES, pack_tables=False, streams=STREAMS,
    )
    cam = Camera()
    return r, r.ctx(cam, 1), r.reset(cam, 1)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


def main():
    renderer, ctx, state0 = build()
    target = jnp.zeros((RES, RES, 3), jnp.float32)
    raw = jnp.asarray(Volume.sphere_in_cube(VOL).density)

    def mk(loss_kind):
        def loss_fn(p, ctx_in, s0, tgt, seed_bits):
            c = ctx_in._replace(
                density=interp.pack_volume_corners_jnp(p["density"]),
                seed_bits=seed_bits,
            )
            score = jnp.ones_like(s0.px)
            _, _, img = M.render_diff(s0, score, c, STEPS, 12)
            return jnp.mean((img - tgt) ** 2)

        def loss_nograd_density(p, ctx_in, s0, tgt, seed_bits):
            # gradient flows only through extinction (scalar): volume
            # scatter and pack-transpose vanish from the bwd
            c = ctx_in._replace(seed_bits=seed_bits,
                                extinction=p["extinction"])
            score = jnp.ones_like(s0.px)
            _, _, img = M.render_diff(s0, score, c, STEPS, 12)
            return jnp.mean((img - tgt) ** 2)

        if loss_kind == "density":
            return jax.jit(jax.value_and_grad(loss_fn))
        return jax.jit(jax.value_and_grad(loss_nograd_density))

    fwd_only = jax.jit(
        lambda ctx_in, s0, seed_bits: M.render_diff(
            s0, jnp.ones_like(s0.px), ctx_in._replace(seed_bits=seed_bits),
            STEPS, 12)[2]
    )

    dt = timeit(lambda: fwd_only(ctx, state0, jnp.uint32(7)))
    print(f"forward (diff path, no grad)       {dt*1e3:8.1f} ms")

    g1 = mk("density")
    dt = timeit(lambda: g1({"density": raw}, ctx, state0, target, jnp.uint32(7)))
    print(f"fwd+bwd w.r.t. density             {dt*1e3:8.1f} ms")

    g2 = mk("extinction")
    dt = timeit(lambda: g2({"extinction": jnp.float32(40.0)}, ctx, state0,
                           target, jnp.uint32(7)))
    print(f"fwd+bwd w.r.t. extinction only     {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
