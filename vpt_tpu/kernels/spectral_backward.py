"""Hand-derived backward pass for the spectral MCM renderer — path replay
(radiative-backprop / PRB style), no autodiff tape.

The estimator: a sample terminates with deposit c = emitted(light) after a
sequence of events drawn with probabilities P_e(theta). The gradient of the
expected image w.r.t. theta is

    E[ cbar * ( d(emitted)/d(theta)  +  emitted * sum_e dlog P_e/d(theta) ) ]

with cbar the image cotangent of that deposit (1/M_final per deposit in the
incremental mean). All terms are *local to an event* once the sample's
eventual contribution is known, so the backward is:

  pass 1 (tape):   forward dispatch recording per-step (emitted, respawn,
                   bin) — a (steps, lanes) tape, ~KBs per megapixel
  reverse scan:    propagate each step's *active-sample* contribution
                   backward (c_active), turning future deposits into
                   per-step locals
  pass 2 (replay): re-run the dispatch (same RNG chains), and at each step
                   scatter the analytic score/pathwise terms:

    null:     d log(1-alpha)            = -1/(1-alpha)            -> alpha
    scatter:  d log(alpha*albedo)       = 1/alpha, 1/albedo       -> alpha, albedo
              d log p_HG(cos; g)        = -2g/(1-g^2)
                                          - 3(g-cos)/(1+g^2-2g cos) -> g
    flight:   d log(mu e^(-mu d))       = 1/mu - d                -> extinction
    escape:   d emitted / d light-texel (pathwise, 5x lerp)       -> spectrum
    TF chain: d value/d density = 256*(row1-row0) (bilinear slope)
              -> trilinear-scattered into the 8 volume corners

Gradients are mathematically equal in expectation to the autodiff REINFORCE
surrogate (models/mcm_spectral.render_diff) — the discrete-event terms are
identical; the free-flight and HG terms use the score form where autodiff
uses the reparameterized (pathwise) form, so per-seed values differ but
means agree (tested). Memory is O(steps x lanes) scalars instead of full
autodiff residuals, and the backward is two forward passes plus one scatter
per table per step.

Gradients address the *raw* (unpacked) density / TF / spectrum tables
(build the renderer with pack_tables=False). Like the autodiff path, the
estimator is truncated to the dispatch window (events of samples begun in
earlier dispatches are attributed from this window on).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import geometry, interp, sampling
from vpt_tpu.ops.spectral import XYZ_TO_SRGB_KERNEL

EPS = 1e-5


def _bilinear_corners(u, v, H, W):
    """Corner indices + weights of sample_tex2d's bilinear lookup."""

    def coords(t, n):
        s = t * n - 0.5
        base = jnp.floor(s).astype(jnp.int32)
        frac = s - base.astype(jnp.float32)
        return jnp.clip(base, 0, n - 1), jnp.clip(base + 1, 0, n - 1), frac

    x0, x1, fx = coords(u, W)
    y0, y1, fy = coords(v, H)
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    return (y0, y1, x0, x1), (w00, w01, w10, w11), (fx, fy)


def _trilinear_corners(u, v, w, D, H, W):
    def coords(t, n):
        s = t * n - 0.5
        base = jnp.floor(s).astype(jnp.int32)
        frac = s - base.astype(jnp.float32)
        return jnp.clip(base, 0, n - 1), jnp.clip(base + 1, 0, n - 1), frac

    x0, x1, fx = coords(u, W)
    y0, y1, fy = coords(v, H)
    z0, z1, fz = coords(w, D)
    idx = []
    wts = []
    for zi, wz in ((z0, 1 - fz), (z1, fz)):
        for yi, wy in ((y0, 1 - fy), (y1, fy)):
            for xi, wx in ((x0, 1 - fx), (x1, fx)):
                idx.append((zi * H + yi) * W + xi)
                wts.append(wz * wy * wx)
    return idx, wts


def _tf_row_slope(tf_table, t, dens, channel):
    """d(bilinear TF value)/d(density coordinate) for one channel:
    256 * (x-lerped row1 - row0); zero automatically in the clamp zone."""
    H, W, _ = tf_table.shape
    (y0, y1, x0, x1), _, (fx, _) = _bilinear_corners(t, dens, H, W)
    flat = tf_table[..., channel].reshape(-1)
    c00 = jnp.take(flat, y0 * W + x0)
    c01 = jnp.take(flat, y0 * W + x1)
    c10 = jnp.take(flat, y1 * W + x0)
    c11 = jnp.take(flat, y1 * W + x1)
    r0 = c00 + (c01 - c00) * fx
    r1 = c10 + (c11 - c10) * fx
    return (r1 - r0) * H


def spectral_backward(state0, ctx, g_image, steps: int, n_bins: int,
                      volume_filter: str = "linear"):
    """Hand-derived gradients of one render dispatch.

    Returns (state_out, image, grads) where grads =
    dict(density, material_tf, light_spectrum, extinction) — the cotangents
    of ``radiance_to_rgb(dispatch(state0, ctx))`` contracted with
    ``g_image`` ((H, W, 3)).
    """
    resolution = state0.px.shape[-1]
    streams = state0.px.shape[0] if state0.px.ndim == 3 else 1
    ix, iy, seed_iy = M._pixel_grid(resolution, streams)
    sx, sy = geometry.screen_position(ix, iy, 1.0 / resolution)
    rng0 = sampling.seed_state(ix, seed_iy, ctx.seed_bits)

    # ---- pass 1: forward with a compact tape -----------------------------
    def fwd_body(carry, _):
        p, rng = carry
        p, rng, _, internals = M._render_body(
            p, rng, None, sx, sy, ctx, n_bins, volume_filter,
            diff=False, collect=True,
        )
        tape = dict(
            emitted=internals["emitted"],
            respawn=internals["respawn"],
            pre_bin=internals["pre_bin"],
        )
        return (p, rng), tape

    (state_out, _), tape = jax.lax.scan(fwd_body, (state0, rng0), None, length=steps)

    # ---- image cotangent -> per-deposit cotangent ------------------------
    # image = (mean over streams of) einsum(radiance, bin_xyz) @ M^T
    cm = jnp.asarray(XYZ_TO_SRGB_KERNEL) @ ctx.bin_xyz  # (3, B)
    g_rad = jnp.einsum("hwc,cb->bhw", g_image, cm)  # (B, H, W)
    if streams > 1:
        g_rad = jnp.broadcast_to(
            g_rad[:, None] / streams, (n_bins, streams, resolution, resolution)
        )
    m_final = jnp.maximum(state_out.samples, 1).astype(jnp.float32)

    def deposit_cotangent(pre_bin):
        # cbar = g_rad[bin] / M_final for the depositing lane
        sel = jnp.take_along_axis(
            g_rad.reshape(n_bins, -1), pre_bin.reshape(1, -1), axis=0
        ).reshape(pre_bin.shape)
        return sel / m_final

    # ---- reverse scan: contribution of the step's active sample ----------
    def rev_body(carry, t):
        c_next, cb_next = carry
        dep = t["respawn"]
        c = jnp.where(dep, t["emitted"], c_next)
        cb = jnp.where(dep, deposit_cotangent(t["pre_bin"]), cb_next)
        return (c, cb), (c, cb)

    zero = jnp.zeros_like(tape["emitted"][0])
    (_, _), (c_act, cb_act) = jax.lax.scan(
        rev_body, (zero, zero), tape, reverse=True
    )

    # ---- pass 2: replay + analytic scatters ------------------------------
    D, H, W = ctx.density.shape
    TH, TW, TC = ctx.material_tf.shape
    (LN,) = ctx.light_spectrum.shape

    def rep_body(carry, inputs):
        (p, rng, g_dens, g_tf, g_ls, g_ext) = carry
        c, cb = inputs
        p2, rng2, _, it = M._render_body(
            p, rng, None, sx, sy, ctx, n_bins, volume_filter,
            diff=False, collect=True,
        )
        q = cb * c  # cbar * eventual contribution of the active sample

        alpha = it["alpha"]
        albedo = it["albedo"]
        g = it["g"]
        null = it["null"]
        scat = it["scatter"]
        oob = it["oob"]
        dens = it["dens"]
        t_lam = (it["pre_wavelength"] - 400.0) / 300.0

        # per-channel value gradients from the event scores
        grad_alpha = (
            jnp.where(null, -q / jnp.maximum(1.0 - alpha, 1e-12), 0.0)
            + jnp.where(scat, q / jnp.maximum(alpha, 1e-12), 0.0)
        )
        grad_albedo = jnp.where(scat, q / jnp.maximum(albedo, 1e-12), 0.0)
        aniso = jnp.abs(g) >= EPS
        cosd = it["hg_cos"]
        g2 = g * g
        hg_score = -2.0 * g / jnp.maximum(1.0 - g2, 1e-9) - 3.0 * (g - cosd) / jnp.maximum(
            1.0 + g2 - 2.0 * g * cosd, 1e-9
        )
        grad_graw = jnp.where(scat & aniso, q * hg_score, 0.0) * 2.0  # g = 2*raw-1

        # extinction score: every step's free-flight draw of a contributing
        # sample (1/mu - dist)
        g_ext = g_ext + jnp.sum(q * (1.0 / ctx.extinction - it["dist"]))

        # light spectrum (pathwise at escape)
        ld = ctx.light_direction
        lnorm = jnp.sqrt(jnp.sum(ld * ld))
        ldn = ld / jnp.maximum(lnorm, 1e-30)
        ddot = (
            it["pre_dir"][0] * ldn[0]
            + it["pre_dir"][1] * ldn[1]
            + it["pre_dir"][2] * ldn[2]
        )
        dI = jnp.where(lnorm < EPS, 1.0, jnp.where(it["emitted"] > 0.0, ddot, 0.0))
        gl = jnp.where(oob, cb * dI * 5.0, 0.0)
        tl = t_lam * LN - 0.5
        l0 = jnp.clip(jnp.floor(tl).astype(jnp.int32), 0, LN - 1)
        l1 = jnp.clip(jnp.floor(tl).astype(jnp.int32) + 1, 0, LN - 1)
        lf = tl - jnp.floor(tl)
        g_ls = g_ls.at[l0.reshape(-1)].add((gl * (1 - lf)).reshape(-1))
        g_ls = g_ls.at[l1.reshape(-1)].add((gl * lf).reshape(-1))

        # TF texel scatters (one flat scatter for all corners x channels)
        (y0, y1, x0, x1), (w00, w01, w10, w11), _ = _bilinear_corners(
            t_lam, dens, TH, TW
        )
        tf_idx = []
        tf_val = []
        for ch, gval in ((0, grad_albedo), (1, grad_alpha), (2, grad_graw)):
            for yi, xi, wcorner in ((y0, x0, w00), (y0, x1, w01),
                                    (y1, x0, w10), (y1, x1, w11)):
                tf_idx.append(((yi * TW + xi) * TC + ch).reshape(-1))
                tf_val.append((gval * wcorner).reshape(-1))
        g_tf = g_tf.at[jnp.concatenate(tf_idx)].add(jnp.concatenate(tf_val))

        # density chain: sum of channel slopes, trilinear-scattered
        grad_dens = (
            grad_albedo * _tf_row_slope(ctx.material_tf, t_lam, dens, 0)
            + grad_alpha * _tf_row_slope(ctx.material_tf, t_lam, dens, 1)
            + grad_graw * _tf_row_slope(ctx.material_tf, t_lam, dens, 2)
        )
        u, v, w = it["sample_pos"]
        v_idx, v_wts = _trilinear_corners(u, v, w, D, H, W)
        g_dens = g_dens.at[jnp.concatenate([i.reshape(-1) for i in v_idx])].add(
            jnp.concatenate([(grad_dens * wt).reshape(-1) for wt in v_wts])
        )

        return (p2, rng2, g_dens, g_tf, g_ls, g_ext), None

    g_dens0 = jnp.zeros(D * H * W, jnp.float32)
    g_tf0 = jnp.zeros(TH * TW * TC, jnp.float32)
    g_ls0 = jnp.zeros(LN, jnp.float32)
    (_, _, g_dens, g_tf, g_ls, g_ext), _ = jax.lax.scan(
        rep_body, (state0, rng0, g_dens0, g_tf0, g_ls0, jnp.float32(0.0)),
        (c_act, cb_act),
    )
    grads = dict(
        density=g_dens.reshape(D, H, W),
        material_tf=g_tf.reshape(TH, TW, TC),
        light_spectrum=g_ls,
        extinction=g_ext,
    )
    image = M.radiance_to_rgb(state_out.radiance, ctx.bin_xyz)
    return state_out, image, grads


@functools.partial(jax.jit, static_argnames=("steps", "n_bins", "volume_filter"))
def prb_render_and_grads(state0, ctx, g_image, steps: int, n_bins: int,
                         volume_filter: str = "linear"):
    """Jitted forward dispatch + hand-derived backward:
    (state_out, image, grads). Forward results are bit-identical to
    M.render on the same inputs."""
    return spectral_backward(state0, ctx, g_image, steps, n_bins, volume_filter)
