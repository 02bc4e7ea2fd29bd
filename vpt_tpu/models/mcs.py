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
    # optional (Gz, Gy, Gx, 2) super-voxel majorant table (ops/majorant,
    # built against THIS renderer's alpha curve tf[0, d, 3]): per cell a
    # (local alpha majorant, flight validity range). The all-lanes-done
    # while_loops are dominated by straggler lanes null-colliding across
    # near-empty space at the global rate (~extinction * path length trips);
    # local majorants collapse those flights. Statistically exact, opt-in
    # (per-lane RNG consumption changes, so per-seed frames differ from the
    # reference-exact default).
    majorant: jax.Array | None = None


def _majorant_lookup(ctx, px, py, pz):
    """(m, r) of the cell at normalized (px, py, pz) — one 2-wide row
    gather (mirrors mcm_spectral's majorant addressing)."""
    Gz, Gy, Gx, _ = ctx.majorant.shape
    cz = jnp.clip(jnp.floor(pz * Gz).astype(jnp.int32), 0, Gz - 1)
    cy = jnp.clip(jnp.floor(py * Gy).astype(jnp.int32), 0, Gy - 1)
    cx = jnp.clip(jnp.floor(px * Gx).astype(jnp.int32), 0, Gx - 1)
    row = jnp.take(ctx.majorant.reshape(-1, 2), (cz * Gy + cy) * Gx + cx, axis=0)
    return jnp.maximum(row[..., 0], 1e-12), row[..., 1]


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
        if ctx.majorant is not None:
            t0 = dist / jnp.maximum(max_dist, 1e-30)
            m, cap = _majorant_lookup(
                ctx, fx + (tx - fx) * t0, fy + (ty - fy) * t0,
                fz + (tz - fz) * t0)
            rng, step = sampling.draw_exponential(rng, active,
                                                  ctx.extinction * m)
            capped = step >= cap
            step = jnp.minimum(step, cap)
        else:
            rng, step = sampling.draw_exponential(rng, active, ctx.extinction)
            capped = jnp.zeros(step.shape, bool)
        dist2 = jnp.where(active, dist + step, dist)
        escaped = active & (dist2 > max_dist)
        still = active & ~escaped & ~capped
        t = dist2 / jnp.maximum(max_dist, 1e-30)
        tf4 = _sample_tf(ctx, fx + (tx - fx) * t, fy + (ty - fy) * t,
                         fz + (tz - fz) * t, volume_filter)
        rng, u = sampling.draw(rng, still)
        alpha = tf4[..., 3]
        if ctx.majorant is not None:
            # spatially varying delta tracking: accept a tentative collision
            # with probability alpha / m (<= 1 by the builder's bound);
            # capped flights are pure advances (exact by memorylessness)
            alpha = jnp.minimum(alpha / m, 1.0)
        collided = still & (u < alpha)
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
        if ctx.majorant is not None:
            t0 = dist / jnp.maximum(max_dist, 1e-30)
            m, cap = _majorant_lookup(
                ctx, fx + (tx - fx) * t0, fy + (ty - fy) * t0,
                fz + (tz - fz) * t0)
            rng, step = sampling.draw_exponential(rng, active,
                                                  ctx.extinction * m)
            capped = step >= cap
            step = jnp.minimum(step, cap)
        else:
            rng, step = sampling.draw_exponential(rng, active, ctx.extinction)
            capped = jnp.zeros(step.shape, bool)
        dist2 = jnp.where(active, dist + step, dist)
        escaped = active & (dist2 > max_dist)
        still = active & ~escaped & ~capped
        t = dist2 / jnp.maximum(max_dist, 1e-30)
        tf4 = _sample_tf(ctx, fx + (tx - fx) * t, fy + (ty - fy) * t,
                         fz + (tz - fz) * t, volume_filter)
        alpha = tf4[..., 3]
        if ctx.majorant is not None:
            # ratio tracking against the local majorant: the per-collision
            # factor (1 - alpha/m) at rate ext*m has the same expectation
            # exp(-ext * integral alpha) as (1 - alpha) at rate ext
            alpha = jnp.minimum(alpha / m, 1.0)
        trans2 = jnp.where(still, trans * (1.0 - alpha), trans)
        return i + 1, rng, dist2, trans2, done | escaped

    zeros = jnp.zeros_like(max_dist)
    done0 = ~mask  # lanes outside the mask never run
    _, rng, _, trans, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), rng, zeros, jnp.ones_like(max_dist), done0),
    )
    return rng, trans


def _mcs_frame_impl(ctx: MCSCtx, resolution: int, max_collisions: int = 1024,
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


mcs_frame = functools.partial(
    jax.jit, static_argnames=("resolution", "max_collisions", "volume_filter")
)(_mcs_frame_impl)


@functools.partial(
    jax.jit,
    static_argnames=("resolution", "max_collisions", "volume_filter"),
    donate_argnames=("acc", "frame"),
)
def mcs_frames(ctx: MCSCtx, seeds, scatter_dirs, acc, frame,
               resolution: int, max_collisions: int = 1024,
               volume_filter: str = "linear"):
    """K frames in one device program: lax.scan over (seed, scatter_dir)
    pairs with the running frame average folded in (the MCS analog of
    mcm_spectral.render_many — amortizes per-frame host dispatch).
    Matches K sequential ``mcs_frame`` + average steps to float rounding
    (identical draws; XLA fuses the running average differently)."""

    def body(carry, inp):
        acc, frame = carry
        seed, sd = inp
        c = ctx._replace(seed_bits=seed, scatter_dir=sd)
        img = _mcs_frame_impl(c, resolution, max_collisions, volume_filter)
        frame = frame + 1
        acc = acc + (img - acc) / frame.astype(jnp.float32)
        return (acc, frame), None

    (acc, frame), _ = jax.lax.scan(body, (acc, frame), (seeds, scatter_dirs))
    return acc, frame


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
                 resolution: int = 512, majorant_blocks: int | None = None):
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
        # optional super-voxel majorants, built from the RAW tables before
        # packing. MCS samples its alpha at tf[v=0][u=density][3], i.e. the
        # alpha curve lives on the x axis of row 0 — remap it onto the
        # builder's density-rows-x-wavelength convention ((W, 1) table whose
        # row k carries alpha(density ~ texel k)), which makes the builder's
        # row-touch interval logic coincide with the sampler's column-touch
        # logic exactly.
        maj = None
        if majorant_blocks is not None:
            from vpt_tpu.ops.majorant import build_majorant_grid

            raw_tf = np.asarray(tf_table, np.float32)
            curve = raw_tf[0, :, 3]  # alpha(density) along x of row 0
            tf_equiv = np.zeros((curve.shape[0], 1, 4), np.float32)
            tf_equiv[:, 0, 1] = curve
            maj = jnp.asarray(build_majorant_grid(
                np.asarray(volume.density), tf_equiv, extinction,
                block=majorant_blocks))
        if volume.filter in ("linear", "quasicubic"):
            density = interp.pack_volume_auto(density, "full")
            tf_table = interp.pack_tex2d_corners(tf_table)
        self._static_ctx = dict(
            extinction=jnp.float32(extinction),
            density=(density if isinstance(density, interp.PackedVolume)
                     else jnp.asarray(density)),
            tf_table=jnp.asarray(tf_table),
            environment=jnp.asarray(environment, jnp.float32),
            majorant=maj,
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

    def render_many(self, state, camera, seeds):
        """K frames in one device program (mcs_frames): per-frame seeds and
        host-derived scatter directions ride a scan."""
        seeds = np.asarray(seeds, np.uint32)
        dirs = np.stack([_host_scatter_direction(int(s)) for s in seeds])
        acc, frame = mcs_frames(
            self.ctx(camera, int(seeds[0])),
            jnp.asarray(seeds), jnp.asarray(dirs),
            state["acc"], state["frame"],
            resolution=self.resolution, max_collisions=self.max_collisions,
            volume_filter=self.volume.filter,
        )
        return dict(acc=acc, frame=frame), acc[..., :3]
