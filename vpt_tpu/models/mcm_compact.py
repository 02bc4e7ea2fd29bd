"""Hit-lane compaction for the RGB MCM renderer (opt-in mode).

Same design as the spectral compaction (models/mcm_spectral_compact.py,
which owns the shared host-side machinery): at poses where the volume cube
does not fill the frame, lanes are marched only for pixels whose ray bundle
can hit the cube; miss pixels take the closed form of the SAME estimator.
For RGB MCM the miss closed form is even simpler than the spectral one —
a camera ray that misses the cube keeps transmittance (1,1,1) and deposits
env(dir) every sample (/root/reference/src/wgsl/renderers/
MCMComputeRenderer.wgsl: the oob branch samples the environment with
untouched transmittance), so the converged miss pixel is exactly the
subpixel-averaged equirect lookup E_jitter[env(dir)]
(mcm_spectral_compact.mean_env_image).

Restrictions: blur == 0 (the pixel-pyramid hit test assumes no DoF).
Hit pixels are bit-identical to the full kernel for the same seeds — each
lane's RNG chain seeds from its pixel's (ix, iy) exactly like the full
kernel (tests/test_compact.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vpt_tpu.models import mcm as MM
from vpt_tpu.ops import geometry, sampling


@functools.partial(jax.jit, static_argnames=("resolution",))
def compact_reset(ctx: MM.MCMCtx, lane_ix, lane_iy,
                  resolution: int) -> MM.PhotonState:
    """mcm.full_reset over an explicit lane table instead of the pixel grid."""
    sx, sy = geometry.screen_position(lane_ix, lane_iy, 1.0 / resolution)
    rng = sampling.seed_state(lane_ix, lane_iy, ctx.seed_bits)
    lane_shape = lane_ix.shape
    mask = jnp.ones(lane_shape, bool)
    rng, new = MM._respawn(rng, mask, sx, sy, ctx)
    one = jnp.ones(lane_shape, jnp.float32)
    zero_i = jnp.zeros(lane_shape, jnp.int32)
    return MM.PhotonState(
        px=new["px"], py=new["py"], pz=new["pz"],
        dx=new["dx"], dy=new["dy"], dz=new["dz"],
        bounces=zero_i, samples=zero_i,
        tr=one, tg=one, tb=one, rr=one, rg=one, rb=one,
    )


@functools.partial(
    jax.jit,
    static_argnames=("steps", "volume_filter", "resolution"),
    donate_argnames=("state",))
def render_compact_many(state: MM.PhotonState, ctx: MM.MCMCtx, seeds,
                        lane_ix, lane_iy, steps: int, resolution: int,
                        volume_filter: str = "linear"):
    """K dispatches over the compact lane set (scan-batched like
    mcm.render_many); lane math is position-independent so MM._render_body
    runs unchanged."""
    sx, sy = geometry.screen_position(lane_ix, lane_iy, 1.0 / resolution)

    def dispatch(p, seed_bits):
        c = ctx._replace(seed_bits=seed_bits)
        rng = sampling.seed_state(lane_ix, lane_iy, seed_bits)

        def body(_, carry):
            q, r = carry
            return MM._render_body(q, r, sx, sy, c, volume_filter)

        p, _ = jax.lax.fori_loop(0, steps, body, (p, rng))
        return p, None

    state, _ = jax.lax.scan(dispatch, state, seeds)
    return state


@functools.partial(jax.jit, static_argnames=("resolution",))
def compact_image(state: MM.PhotonState, lane_pixel, hit_mask, miss_rgb,
                  resolution: int):
    """Scatter lane radiance means back to the framebuffer and fill miss
    pixels with the closed-form E_jitter[env(dir)]."""
    n_pixels = resolution * resolution
    out = []
    for chan in (state.rr, state.rg, state.rb):
        acc = jnp.zeros((n_pixels + 1,), jnp.float32)
        acc = acc.at[lane_pixel].add(chan.reshape(-1))
        out.append(acc[:n_pixels].reshape(resolution, resolution))
    img = jnp.stack(out, axis=-1)
    return jnp.where(hit_mask[..., None], img, miss_rgb)
