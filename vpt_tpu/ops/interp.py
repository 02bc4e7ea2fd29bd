"""Explicit texture sampling: the TPU has no sampler hardware, so GPU-style
nearest/linear/quasi-cubic filtering with clamp-to-edge addressing is done
with gathers + arithmetic.

Semantics match WebGPU ``textureSampleLevel`` with normalized coordinates:
texel centers at (i + 0.5)/N, linear filter weights from the fractional
offset, clamp-to-edge addressing. Quasi-cubic mode is the smoothstep-warped
trilinear of /root/reference/src/glsl/mixins/quasiCubicSampling.glsl:3-9.

Gathers lower to XLA gather on TPU; the Pallas megakernel reuses these same
index/weight computations.
"""

from __future__ import annotations

import jax.numpy as jnp


def _coords(u, n):
    """Normalized coord -> (lo index, hi index, frac) with clamp-to-edge."""
    t = u * n - 0.5
    i0 = jnp.floor(t)
    frac = t - i0
    base = i0.astype(jnp.int32)
    i0 = jnp.clip(base, 0, n - 1)
    i1 = jnp.clip(base + 1, 0, n - 1)
    return i0, i1, frac


def _nearest_coords(u, n):
    i = jnp.clip(jnp.floor(u * n).astype(jnp.int32), 0, n - 1)
    return i


def sample_volume(density, u, v, w, mode: str = "linear"):
    """Sample a (D,H,W) scalar volume at normalized (u,v,w) -> density lanes.

    (u,v,w) maps to (x,y,z): u indexes W, v indexes H, w indexes D —
    the 3D-texture convention the renderers rely on.
    """
    D, H, W = density.shape
    flat = density.reshape(-1)

    if mode == "nearest":
        ix = _nearest_coords(u, W)
        iy = _nearest_coords(v, H)
        iz = _nearest_coords(w, D)
        return jnp.take(flat, (iz * H + iy) * W + ix, axis=0)

    x0, x1, fx = _coords(u, W)
    y0, y1, fy = _coords(v, H)
    z0, z1, fz = _coords(w, D)

    if mode == "quasicubic":
        # smoothstep-warp the interpolation weights (quasiCubicSampling.glsl)
        fx = fx * fx * (3.0 - 2.0 * fx)
        fy = fy * fy * (3.0 - 2.0 * fy)
        fz = fz * fz * (3.0 - 2.0 * fz)
    elif mode != "linear":
        raise ValueError(f"unknown volume filter {mode!r}")

    def fetch(iz, iy, ix):
        return jnp.take(flat, (iz * H + iy) * W + ix, axis=0)

    c000 = fetch(z0, y0, x0)
    c001 = fetch(z0, y0, x1)
    c010 = fetch(z0, y1, x0)
    c011 = fetch(z0, y1, x1)
    c100 = fetch(z1, y0, x0)
    c101 = fetch(z1, y0, x1)
    c110 = fetch(z1, y1, x0)
    c111 = fetch(z1, y1, x1)

    c00 = c000 + (c001 - c000) * fx
    c01 = c010 + (c011 - c010) * fx
    c10 = c100 + (c101 - c100) * fx
    c11 = c110 + (c111 - c110) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fz


def sample_tex2d(tex, u, v):
    """Bilinear sample of a (H, W, C) texture at normalized (u, v).

    u indexes W (x), v indexes H (y). Returns (..., C).
    """
    H, W, C = tex.shape
    flat = tex.reshape(-1, C)
    x0, x1, fx = _coords(u, W)
    y0, y1, fy = _coords(v, H)

    def fetch(iy, ix):
        return jnp.take(flat, iy * W + ix, axis=0)

    c00 = fetch(y0, x0)
    c01 = fetch(y0, x1)
    c10 = fetch(y1, x0)
    c11 = fetch(y1, x1)
    fx = fx[..., None]
    fy = fy[..., None]
    c0 = c00 + (c01 - c00) * fx
    c1 = c10 + (c11 - c10) * fx
    return c0 + (c1 - c0) * fy


def sample_tex1d(tex, u):
    """Linear sample of a (N,) texture at normalized u."""
    (N,) = tex.shape
    x0, x1, fx = _coords(u, N)
    c0 = jnp.take(tex, x0, axis=0)
    c1 = jnp.take(tex, x1, axis=0)
    return c0 + (c1 - c0) * fx
