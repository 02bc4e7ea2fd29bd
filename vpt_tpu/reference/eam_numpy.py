"""Vectorized pure-NumPy reference of the EAM single-wavelength
absorption-emission ray march (BASELINE config 1 oracle).

Implements the exact semantics of models/raymarch.eam_frame — same camera
unprojection, cube clamp, front-to-back compositing recurrence with the
0.99 early-out mask and over-saturation renormalization — with no JAX
anywhere, so the jitted renderer can be validated against an independent
implementation on the notebook-generated test volumes.
"""

from __future__ import annotations

import numpy as np


def _apply_homogeneous(m, x, y, z):
    w = 1.0
    rx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3] * w
    ry = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3] * w
    rz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3] * w
    rw = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3] * w
    return rx / rw, ry / rw, rz / rw


def _sample_volume(density, u, v, w):
    D, H, W = density.shape

    def coords(t, n):
        s = t * n - 0.5
        base = np.floor(s).astype(np.int64)
        frac = (s - base).astype(np.float32)
        return np.clip(base, 0, n - 1), np.clip(base + 1, 0, n - 1), frac

    x0, x1, fx = coords(u, W)
    y0, y1, fy = coords(v, H)
    z0, z1, fz = coords(w, D)
    c = density
    c00 = c[z0, y0, x0] + (c[z0, y0, x1] - c[z0, y0, x0]) * fx
    c01 = c[z0, y1, x0] + (c[z0, y1, x1] - c[z0, y1, x0]) * fx
    c10 = c[z1, y0, x0] + (c[z1, y0, x1] - c[z1, y0, x0]) * fx
    c11 = c[z1, y1, x0] + (c[z1, y1, x1] - c[z1, y1, x0]) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fz


def _sample_tf(tf_table, u):
    H, W, _ = tf_table.shape

    def coords(t, n):
        s = t * n - 0.5
        base = np.floor(s).astype(np.int64)
        frac = (s - base).astype(np.float32)[..., None]
        return np.clip(base, 0, n - 1), np.clip(base + 1, 0, n - 1), frac

    x0, x1, fx = coords(u, W)
    y0, y1, fy = coords(np.zeros_like(u), H)
    c00 = tf_table[y0, x0]
    c01 = tf_table[y0, x1]
    c10 = tf_table[y1, x0]
    c11 = tf_table[y1, x1]
    c0 = c00 + (c01 - c00) * fx
    c1 = c10 + (c11 - c10) * fx
    return c0 + (c1 - c0) * fy


def eam_frame_numpy(inv_mvp, density, tf_table, extinction, offset,
                    slices, resolution):
    """(H, W, 3) float32 image — same signature/semantics as eam_frame."""
    inv_mvp = np.asarray(inv_mvp, np.float32)
    density = np.asarray(density, np.float32)
    tf_table = np.asarray(tf_table, np.float32)
    res = resolution

    iy, ix = np.meshgrid(np.arange(res, dtype=np.float32),
                         np.arange(res, dtype=np.float32), indexing="ij")
    inv_res = np.float32(1.0 / res)
    sx = ((ix + 0.5) * inv_res - 0.5) * 2.0
    sy = ((iy + 0.5) * inv_res - 0.5) * -2.0

    fx, fy, fz = _apply_homogeneous(inv_mvp, sx, sy, np.float32(-1.0))
    tx, ty, tz = _apply_homogeneous(inv_mvp, sx, sy, np.float32(1.0))

    dx, dy, dz = tx - fx, ty - fy, tz - fz
    with np.errstate(divide="ignore", invalid="ignore"):
        t0x, t0y, t0z = -fx / dx, -fy / dy, -fz / dz
        t1x, t1y, t1z = (1 - fx) / dx, (1 - fy) / dy, (1 - fz) / dz
    tn = np.maximum(np.maximum(np.minimum(t0x, t1x), np.minimum(t0y, t1y)),
                    np.minimum(t0z, t1z))
    tf_ = np.minimum(np.minimum(np.maximum(t0x, t1x), np.maximum(t0y, t1y)),
                     np.maximum(t0z, t1z))
    tn = np.maximum(tn, 0.0)
    tf_ = np.maximum(tf_, 0.0)
    miss = tn >= tf_

    ex, ey, ez = fx + dx * tn, fy + dy * tn, fz + dz * tn
    ox, oy, oz = fx + dx * tf_, fy + dy * tf_, fz + dz * tf_

    step = np.float32(1.0 / slices)
    seg = np.sqrt((ox - ex) ** 2 + (oy - ey) ** 2 + (oz - ez) ** 2)
    ray_step_len = seg * step

    acc = np.zeros((res, res, 4), np.float32)
    for k in range(slices + 1):
        t = step * np.float32(offset) + k * step
        active = (t < 1.0) & (acc[..., 3] < 0.99)
        px = ex + (ox - ex) * t
        py = ey + (oy - ey) * t
        pz = ez + (oz - ez) * t
        d = _sample_volume(density, px, py, pz)
        c = _sample_tf(tf_table, d)
        a = c[..., 3] * ray_step_len * np.float32(extinction)
        wgt = np.where(active, (1.0 - acc[..., 3]) * a, 0.0).astype(np.float32)
        acc[..., 0] += wgt * c[..., 0]
        acc[..., 1] += wgt * c[..., 1]
        acc[..., 2] += wgt * c[..., 2]
        acc[..., 3] += wgt

    a = acc[..., 3]
    scale = np.where(a > 1.0, 1.0 / np.maximum(a, 1.0), 1.0).astype(np.float32)
    rgb = acc[..., :3] * scale[..., None]
    rgb[miss] = 0.0
    return rgb
