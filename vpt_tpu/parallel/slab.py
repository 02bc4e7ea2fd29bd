"""Slab-sharded volumes: render with the density grid partitioned across
devices (for volumes beyond one chip's HBM), bit-identical to the
replicated path.

Design (SURVEY.md §2.10 "TP analog"): the packed corner table shards along
its leading (z) dimension over the "rays" mesh axis — each device owns a
contiguous slab of rows. A Woodcock step's volume fetch becomes a *routed
distributed gather*:

    1. all_gather the flat row indices of every device's rays  (ICI)
    2. each owner gathers values for the full request set from its slab
       (rows outside the slab contribute zeros)
    3. reduce_scatter sums the per-owner partial results and hands each
       device back exactly its own rays' rows                  (ICI)

Because the gathered *values* are identical regardless of where rows are
stored, slab-mode renders are bit-identical to replicated-volume renders —
which is exactly what the test asserts on a virtual 8-device mesh.

Everything else in the dispatch is elementwise per lane, so the whole
megakernel runs under one shard_map with only these two collectives per
step. Communication per step: n*N indices + N*8 floats per device.

Sample streams compose with slab mode: (S, H, W) lanes shard the H axis
like the replicated path. The super-voxel majorant table (ctx.majorant),
when present, stays replicated — it is ~MBs where the corner table is GBs,
so sharding it would add collectives for no memory win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import geometry, sampling

AXIS = "rays"


def pad_packed_for_slabs(packed: np.ndarray, n_devices: int) -> np.ndarray:
    """Zero-pad the packed corner table's z dim to a multiple of n_devices
    (pad rows are never addressed: base indices stay within the original)."""
    Dp = packed.shape[0]
    pad = (-Dp) % n_devices
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((pad,) + packed.shape[1:], packed.dtype)], axis=0
        )
    return packed


def shard_packed_volume(packed, mesh) -> jax.Array:
    """Place the (padded) packed table slab-sharded over the mesh."""
    return jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P(AXIS, None, None, None))
    )


def _distributed_rows(packed_slab, flat_idx, rows_per_device, hw8):
    """The routed gather (runs inside shard_map). ``packed_slab``:
    (slab_z, Hp, Wp, 8) local slab; ``flat_idx``: (N,) local flat ROW
    indices into the global (Dp*Hp*Wp) row space."""
    me = jax.lax.axis_index(AXIS)
    lo = me * rows_per_device

    all_idx = jax.lax.all_gather(flat_idx, AXIS, tiled=True)  # (n*N,)
    local = all_idx - lo
    in_slab = (local >= 0) & (local < rows_per_device)
    safe = jnp.clip(local, 0, rows_per_device - 1)
    rows = jnp.take(packed_slab.reshape(-1, 8), safe, axis=0)
    rows = jnp.where(in_slab[:, None], rows, 0.0)
    # sum over owners and scatter each device its own segment back
    return jax.lax.psum_scatter(rows, AXIS, scatter_dimension=0, tiled=True)


def _sample_volume_slab(packed_slab, u, v, w, rows_per_device, dims, mode):
    """Trilinear sample against the slab-sharded packed table (lane arrays
    are local shards inside shard_map)."""
    D, H, W = dims
    Hp, Wp = H + 1, W + 1

    def base_and_frac(t, n):
        s = t * n - 0.5
        i0 = jnp.floor(s)
        return jnp.clip(i0.astype(jnp.int32) + 1, 0, n), s - i0

    bx, fx = base_and_frac(u, W)
    by, fy = base_and_frac(v, H)
    bz, fz = base_and_frac(w, D)
    if mode == "quasicubic":
        fx = fx * fx * (3.0 - 2.0 * fx)
        fy = fy * fy * (3.0 - 2.0 * fy)
        fz = fz * fz * (3.0 - 2.0 * fz)

    flat = ((bz * Hp + by) * Wp + bx).reshape(-1)
    rows = _distributed_rows(packed_slab, flat, rows_per_device, Hp * Wp * 8)
    rows = rows.reshape(u.shape + (8,))
    c000, c001, c010, c011 = rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3]
    c100, c101, c110, c111 = rows[..., 4], rows[..., 5], rows[..., 6], rows[..., 7]
    c00 = c000 + (c001 - c000) * fx
    c01 = c010 + (c011 - c010) * fx
    c10 = c100 + (c101 - c100) * fx
    c11 = c110 + (c111 - c110) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return c0 + (c1 - c0) * fz


def render_slab(state, ctx, mesh, volume_dims, steps: int, n_bins: int,
                volume_filter: str = "linear", lower_only: bool = False):
    """One spectral render dispatch with the volume slab-sharded.

    ``ctx.density`` must be the slab-sharded padded packed table
    (shard_packed_volume); ``volume_dims`` the original (D, H, W).
    State lanes shard over rows as usual. Returns (state, image) —
    bit-identical to M.render with a replicated volume.

    ``lower_only``: return the lowered-but-unexecuted program instead
    (tests/test_hlo.py inspects its compiled HLO for the two-collective
    contract).
    """
    n = mesh.devices.size
    resolution = state.px.shape[-1]
    streams = state.px.shape[0] if state.px.ndim == 3 else 1
    D, H, W = volume_dims
    Dp_padded = ctx.density.shape[0]
    rows_per_device = (Dp_padded // n) * (H + 1) * (W + 1)

    # lane leaves are (H, W) or — with sample streams — (S, H, W); the
    # framebuffer H axis shards over "rays" either way (streams replicate:
    # they are per-pixel, not per-device)
    lane = P(AXIS, None) if streams == 1 else P(None, AXIS, None)
    binned = P(None, AXIS, None) if streams == 1 else P(None, None, AXIS, None)
    state_specs = M.SpectralState(
        px=lane, py=lane, pz=lane, dx=lane, dy=lane, dz=lane,
        bounces=lane, samples=lane, bin=lane, wavelength=lane,
        radiance=binned, transmittance=binned,
    )
    ctx_specs = M.SpectralCtx(
        inv_mvp=P(), seed_bits=P(), extinction=P(), blur=P(),
        max_bounces=P(), light_direction=P(),
        density=P(AXIS, None, None, None),
        material_tf=P(), light_spectrum=P(), boundaries=P(), bin_xyz=P(),
        environment=None if ctx.environment is None else P(),
        majorant=None if ctx.majorant is None else P(),
    )

    rows_local = resolution // n

    def shard_fn(state, ctx):
        me = jax.lax.axis_index(AXIS)
        # global pixel coordinates for this device's row shard (streams seed
        # as extra framebuffer rows, exactly like _pixel_grid)
        shape = (rows_local, resolution) if streams == 1 else (
            streams, rows_local, resolution
        )
        iy_local = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 2)
        ix = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        iy = iy_local + me.astype(jnp.uint32) * jnp.uint32(rows_local)
        seed_iy = iy
        if streams > 1:
            s = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
            seed_iy = iy + s * jnp.uint32(resolution)
        sx, sy = geometry.screen_position(ix, iy, 1.0 / resolution)
        rng = sampling.seed_state(ix, seed_iy, ctx.seed_bits)

        def slab_sampler(density, u, v, w, mode="linear"):
            return _sample_volume_slab(
                density, u, v, w, rows_per_device, (D, H, W), mode
            )

        def body(_, carry):
            p, r = carry
            p, r, _ = M._render_body(p, r, None, sx, sy, ctx, n_bins,
                                     volume_filter, diff=False,
                                     sample_volume_fn=slab_sampler)
            return (p, r)

        state, rng = jax.lax.fori_loop(0, steps, body, (state, rng))
        image = M.radiance_to_rgb(state.radiance, ctx.bin_xyz)
        return state, image

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(state_specs, ctx_specs),
        out_specs=(state_specs, P(AXIS, None, None)),
        check_vma=False,
    )
    if lower_only:
        return jax.jit(fn).lower(state, ctx)
    return jax.jit(fn)(state, ctx)
