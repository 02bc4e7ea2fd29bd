"""Ray-setup geometry: cube intersection and stochastic unprojection.

Parity targets:
  - intersectCube: /root/reference/src/wgsl/mixins/intersectCube.wgsl:3-11
  - unprojectRand: /root/reference/src/wgsl/mixins/unprojectRand.wgsl:3-25

All functions are vectorized over lane arrays (any shape) and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from vpt_tpu.ops import sampling


def intersect_cube(ox, oy, oz, dx, dy, dz):
    """Slab test of a ray against the unit cube [0,1]^3.

    Returns (tnear, tfar). Division by a zero direction component yields
    +/-inf BY DESIGN, which min/max resolve exactly like the WGSL version;
    the errstate guard only silences NumPy's RuntimeWarning when callers
    pass host arrays (device arrays never warn).
    """
    import numpy as np

    with np.errstate(divide="ignore", invalid="ignore"):
        t0x, t0y, t0z = (0.0 - ox) / dx, (0.0 - oy) / dy, (0.0 - oz) / dz
        t1x, t1y, t1z = (1.0 - ox) / dx, (1.0 - oy) / dy, (1.0 - oz) / dz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return tnear, tfar


def unproject_rand(state, mask, sx, sy, inv_mvp, inv_resolution, blur):
    """Jittered NDC->world unprojection (depth-of-field + AA jitter).

    ``sx, sy``: NDC screen position lanes; ``inv_mvp``: (4,4) row-major matrix
    (applied as the mat4x4 column-vector product the reference uses);
    ``inv_resolution``: scalar 1/resolution; ``blur``: DoF disk radius.

    Draw order (parity-critical): disk(2 draws) for the near-plane DoF offset,
    then square(2 draws) for the far-plane AA jitter.

    Returns (state, (fx,fy,fz), (tx,ty,tz)).
    """
    state, (ox, oy) = sampling.draw_disk(state, mask)
    near_x = sx + ox * blur
    near_y = sy + oy * blur

    state, (ax, ay) = sampling.draw_square(state, mask)
    far_x = sx + (ax * 2.0 - 1.0) * inv_resolution
    far_y = sy + (ay * 2.0 - 1.0) * inv_resolution

    fx, fy, fz = _apply_homogeneous(inv_mvp, near_x, near_y, -1.0)
    tx, ty, tz = _apply_homogeneous(inv_mvp, far_x, far_y, 1.0)
    return state, (fx, fy, fz), (tx, ty, tz)


def _apply_homogeneous(m, x, y, z):
    """(4,4) matrix times (x, y, z, 1) with perspective divide.

    ``m`` is in mathematical (row-major) convention: out_i = sum_j m[i,j]*v_j.
    """
    w = jnp.asarray(1.0, dtype=jnp.float32)
    rx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3] * w
    ry = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3] * w
    rz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3] * w
    rw = m[3, 0] * x + m[3, 1] * y + m[3, 2] * z + m[3, 3] * w
    return rx / rw, ry / rw, rz / rw


def normalize3(x, y, z):
    inv = 1.0 / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def screen_position(ix, iy, inv_resolution):
    """Pixel index -> NDC with the reference's y-flip.

    ((i + 0.5) * invRes - 0.5) * (2, -2)  — MCMSpectralComputeRenderer.wgsl:118.
    """
    sx = ((ix.astype(jnp.float32) + 0.5) * inv_resolution - 0.5) * 2.0
    sy = ((iy.astype(jnp.float32) + 0.5) * inv_resolution - 0.5) * -2.0
    return sx, sy
