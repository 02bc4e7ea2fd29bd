"""Single-scattering Monte-Carlo renderer (MCS).

TPU-native rebuild of /root/reference/src/glsl/renderers/MCSRenderer.glsl:
per frame, each ray Woodcock-samples one collision (``sampleDistance``,
glsl:70-87), then ratio-tracks transmittance toward a per-frame random
scattering direction (``sampleTransmittance``, glsl:89-104); shade =
diffuse * light * transmittance (glsl:122-137). Frames average with
1/frame (the uInvFrameNumber pass). The host picks the scattering
direction by rejection-sampling the unit ball per frame
(MCSRenderer.js:106-116) — here a deterministic hash-chain does the same
rejection loop so replays are exact.

The unbounded do-while collision loops become all-lanes-done early-exit
while_loops with lane masking; ``max_collisions`` is a safety cap only
(default generous — expected trips ~ extinction * path length, and the
exit fires as soon as the straggler lane finishes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models.base import register_renderer
from vpt_tpu.ops import geometry, interp, sampling
from vpt_tpu.models.mcm import sample_environment


class MCSCtx(NamedTuple):
    inv_mvp: jax.Array
    seed_bits: jax.Array
    extinction: jax.Array
    scatter_dir: jax.Array  # (3,)
    density: jax.Array
    tf_table: jax.Array
    environment: jax.Array


def _sample_tf(ctx, px, py, pz, volume_filter):
    d = interp.sample_volume(ctx.density, px, py, pz, volume_filter)
    return interp.sample_tex2d(ctx.tf_table, d, jnp.zeros_like(d))


def _woodcock_distance(rng, ctx, frm, to, max_collisions, volume_filter):
    """sampleDistance: free-flight until a real collision or escape.

    Returns (rng, dist). Lanes stop advancing (and drawing) once done —
    draw-order parity with the scalar do-while. The loop is a while_loop
    that exits as soon as EVERY lane is done (the reference's do-while is
    unbounded, glsl:70-87): typical frames finish in a few trips instead of
    always paying ``max_collisions``, and long straggler tails are no
    longer silently truncated — ``max_collisions`` is a safety cap only.
    """
    fx, fy, fz = frm
    tx, ty, tz = to
    max_dist = jnp.sqrt((tx - fx) ** 2 + (ty - fy) ** 2 + (tz - fz) ** 2)

    def cond(carry):
        i, rng, dist, done = carry
        return (i < max_collisions) & ~jnp.all(done)

    def body(carry):
        i, rng, dist, done = carry
        active = ~done
        rng, step = sampling.draw_exponential(rng, active, ctx.extinction)
        dist2 = jnp.where(active, dist + step, dist)
        escaped = active & (dist2 > max_dist)
        still = active & ~escaped
        t = dist2 / jnp.maximum(max_dist, 1e-30)
        tf4 = _sample_tf(ctx, fx + (tx - fx) * t, fy + (ty - fy) * t,
                         fz + (tz - fz) * t, volume_filter)
        rng, u = sampling.draw(rng, still)
        collided = still & (u < tf4[..., 3])
        return i + 1, rng, dist2, done | escaped | collided

    zeros = jnp.zeros_like(max_dist)
    _, rng, dist, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), rng, zeros, zeros.astype(bool))
    )
    return rng, dist, max_dist


def _woodcock_transmittance(rng, mask, ctx, frm, to, max_collisions, volume_filter):
    """sampleTransmittance: residual-ratio style product of (1 - alpha).
    Early-exits when all lanes are done, like _woodcock_distance."""
    fx, fy, fz = frm
    tx, ty, tz = to
    max_dist = jnp.sqrt((tx - fx) ** 2 + (ty - fy) ** 2 + (tz - fz) ** 2)

    def cond(carry):
        i, rng, dist, trans, done = carry
        return (i < max_collisions) & ~jnp.all(done)

    def body(carry):
        i, rng, dist, trans, done = carry
        active = mask & ~done
        rng, step = sampling.draw_exponential(rng, active, ctx.extinction)
        dist2 = jnp.where(active, dist + step, dist)
        escaped = active & (dist2 > max_dist)
        still = active & ~escaped
        t = dist2 / jnp.maximum(max_dist, 1e-30)
        tf4 = _sample_tf(ctx, fx + (tx - fx) * t, fy + (ty - fy) * t,
                         fz + (tz - fz) * t, volume_filter)
        trans2 = jnp.where(still, trans * (1.0 - tf4[..., 3]), trans)
        return i + 1, rng, dist2, trans2, done | escaped

    zeros = jnp.zeros_like(max_dist)
    done0 = ~mask  # lanes outside the mask never run
    _, rng, _, trans, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), rng, zeros, jnp.ones_like(max_dist), done0),
    )
    return rng, trans


@functools.partial(
    jax.jit, static_argnames=("resolution", "max_collisions", "volume_filter")
)
def mcs_frame(ctx: MCSCtx, resolution: int, max_collisions: int = 1024,
              volume_filter: str = "linear"):
    """One single-scattering sample per pixel -> (H, W, 4) RGBA frame."""
    from vpt_tpu.models.raymarch import camera_rays

    frm, to = camera_rays(resolution, ctx.inv_mvp)
    ddx, ddy, ddz = geometry.normalize3(to[0] - frm[0], to[1] - frm[1], to[2] - frm[2])
    tn, tf_ = geometry.intersect_cube(
        frm[0], frm[1], frm[2], to[0] - frm[0], to[1] - frm[1], to[2] - frm[2]
    )
    tn = jnp.maximum(tn, 0.0)
    tf_ = jnp.maximum(tf_, 0.0)
    miss = tn >= tf_

    entry = (
        frm[0] + (to[0] - frm[0]) * tn,
        frm[1] + (to[1] - frm[1]) * tn,
        frm[2] + (to[2] - frm[2]) * tn,
    )
    exit_ = (
        frm[0] + (to[0] - frm[0]) * tf_,
        frm[1] + (to[1] - frm[1]) * tf_,
        frm[2] + (to[2] - frm[2]) * tf_,
    )

    # per-pixel chain seeded from the screen-uv float bits (glsl:114)
    iy = jax.lax.broadcasted_iota(jnp.float32, (resolution, resolution), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (resolution, resolution), 1)
    u = ((ix + 0.5) / resolution).astype(jnp.float32)
    v = ((iy + 0.5) / resolution).astype(jnp.float32)
    rng = sampling.hash3(
        jax.lax.bitcast_convert_type(u, jnp.uint32),
        jax.lax.bitcast_convert_type(v, jnp.uint32),
        jnp.broadcast_to(ctx.seed_bits, u.shape),
    )

    rng, dist, max_dist = _woodcock_distance(
        rng, ctx, entry, exit_, max_collisions, volume_filter
    )
    escaped = dist > max_dist

    t = dist / jnp.maximum(max_dist, 1e-30)
    scat = (
        entry[0] + (exit_[0] - entry[0]) * t,
        entry[1] + (exit_[1] - entry[1]) * t,
        entry[2] + (exit_[2] - entry[2]) * t,
    )
    sd = ctx.scatter_dir
    _, stf = geometry.intersect_cube(
        scat[0], scat[1], scat[2],
        jnp.broadcast_to(sd[0], t.shape), jnp.broadcast_to(sd[1], t.shape),
        jnp.broadcast_to(sd[2], t.shape),
    )
    stf = jnp.maximum(stf, 0.0)
    light_exit = (scat[0] + sd[0] * stf, scat[1] + sd[1] * stf, scat[2] + sd[2] * stf)

    diffuse = _sample_tf(ctx, *scat, volume_filter)
    # the light is one env sample at the frame's scattering direction (vec4)
    light3 = sample_environment(ctx.environment, sd[0], sd[1], sd[2])
    light = jnp.concatenate([light3, jnp.ones((1,), light3.dtype)])
    need_trans = (~miss) & (~escaped)
    rng, trans = _woodcock_transmittance(
        rng, need_trans, ctx, scat, light_exit, max_collisions, volume_filter
    )

    shaded = diffuse * light * trans[..., None]
    env = sample_environment(ctx.environment, ddx, ddy, ddz)
    env4 = jnp.concatenate([env, jnp.ones_like(env[..., :1])], axis=-1)
    use_env = (miss | escaped)[..., None]
    return jnp.where(use_env, env4, shaded)


def _host_scatter_direction(seed: int):
    """Deterministic rejection-sampled unit-ball direction
    (MCSRenderer.js:106-116, with a hash chain instead of Math.random)."""
    state = np.uint32(seed ^ 0x9E3779B9)

    def nxt(s):
        from vpt_tpu.reference.oracle import pcg_hash

        s = pcg_hash(s)
        return s, float(s) / float(0xFFFFFFFF)

    while True:
        state, x = nxt(state)
        state, y = nxt(state)
        state, z = nxt(state)
        x, y, z = x * 2 - 1, y * 2 - 1, z * 2 - 1
        n = (x * x + y * y + z * z) ** 0.5
        if n <= 1 and n > 1e-6:
            return np.array([x / n, y / n, z / n], np.float32)


@register_renderer("mcs")
class MCSRenderer:
    def __init__(self, volume, tf2d=None, environment=None,
                 extinction: float = 1.0, max_collisions: int = 1024,
                 resolution: int = 512):
        from vpt_tpu.scene.tf import TransferFunction2D

        self.volume = volume
        self.tf2d = tf2d or TransferFunction2D.grayscale_ramp()
        self.extinction = extinction
        self.max_collisions = max_collisions
        self.resolution = resolution
        if environment is None:
            environment = np.ones((1, 1, 3), np.float32)
        density = volume.density
        tf_table = self.tf2d.rasterize()
        if volume.filter in ("linear", "quasicubic"):
            density = interp.pack_volume_auto(density, "full")
            tf_table = interp.pack_tex2d_corners(tf_table)
        self._static_ctx = dict(
            extinction=jnp.float32(extinction),
            density=(density if isinstance(density, interp.PackedVolume)
                     else jnp.asarray(density)),
            tf_table=jnp.asarray(tf_table),
            environment=jnp.asarray(environment, jnp.float32),
        )

    def ctx(self, camera, seed: int) -> MCSCtx:
        return MCSCtx(
            inv_mvp=jnp.asarray(camera.inverse_mvp()),
            seed_bits=jnp.uint32(np.uint32(seed)),
            scatter_dir=jnp.asarray(_host_scatter_direction(seed)),
            **self._static_ctx,
        )

    def reset(self, camera, seed: int = 0):
        return dict(
            acc=jnp.zeros((self.resolution, self.resolution, 4), jnp.float32),
            frame=jnp.zeros((), jnp.int32),
        )

    def render(self, state, camera, seed: int):
        frame_img = mcs_frame(
            self.ctx(camera, seed), resolution=self.resolution,
            max_collisions=self.max_collisions, volume_filter=self.volume.filter,
        )
        frame = state["frame"] + 1
        acc = state["acc"] + (frame_img - state["acc"]) / frame.astype(jnp.float32)
        return dict(acc=acc, frame=frame), acc[..., :3]
