"""Microbenchmark: per-lane table lookup strategies on TPU.

The forward dispatch is gather-bound (tools/ablate_forward.py: 94% of time).
Compares, for the three lookup shapes the renderer needs:
  - XLA gather (jnp.take) from HBM (status quo)
  - Pallas kernel gather from a VMEM-resident table
  - one-hot matmul on the MXU (small tables only)

Run: python tools/gather_bench.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 4 * 512 * 512  # lanes per dispatch step in the north-star workload


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def report(name, dt, nlookups=L):
    print(f"{name:42s} {dt*1e6:9.1f} us  {nlookups/dt/1e9:7.2f} Glookups/s")


# ---------------------------------------------------------------- XLA gather
@jax.jit
def xla_gather_rows8(table, idx):
    return jnp.take(table, idx, axis=0)  # (L, 8) rows


@jax.jit
def xla_gather_scalar(flat, idx):
    return jnp.take(flat, idx, axis=0)  # (L,) scalars


# ------------------------------------------------------------- Pallas gather
def _pallas_gather_kernel(table_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


def pallas_gather_scalar(flat, idx):
    # whole table in VMEM; grid over index blocks
    B = 8 * 2048
    grid = (idx.shape[0] // B,)
    return pl.pallas_call(
        _pallas_gather_kernel,
        out_shape=jax.ShapeDtypeStruct(idx.shape, flat.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((flat.shape[0],), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.VMEM),
    )(flat, idx)


def _pallas_gather2d_kernel(table_ref, idx_ref, out_ref):
    # idx (R, 128) int32; table (N, 128) where lookup is along sublanes per lane
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


def pallas_gather_lanewise(table_lanes, idx2d):
    R = 512
    grid = (idx2d.shape[0] // R,)
    return pl.pallas_call(
        _pallas_gather2d_kernel,
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, table_lanes.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((table_lanes.shape[0], 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(table_lanes, idx2d)


# ---------------------------------------------------------- one-hot matmul
@jax.jit
def onehot_matmul(table, idx):
    # table (256, 2): light-spectrum pair rows
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.bfloat16)
    return oh @ table.astype(jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)

    # --- scalar gather from 2M-entry table (the 128^3 volume) -------------
    vol = jax.random.uniform(key, (128 * 128 * 128,), jnp.float32)
    idx = jax.random.randint(key, (L,), 0, vol.shape[0], jnp.int32)
    report("xla scalar gather  (2M f32 table)", timeit(xla_gather_scalar, vol, idx))

    try:
        dt = timeit(jax.jit(pallas_gather_scalar), vol, idx)
        report("pallas VMEM scalar gather (2M f32)", dt)
    except Exception as e:
        print(f"pallas scalar gather FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- row gather of 8 contiguous f32 (packed volume corners) -----------
    packed = jax.random.uniform(key, (129 * 129 * 129, 8), jnp.float32)
    idxp = jax.random.randint(key, (L,), 0, packed.shape[0], jnp.int32)
    report("xla row8 gather (67MB packed table)", timeit(xla_gather_rows8, packed, idxp))

    packed_bf16 = packed.astype(jnp.bfloat16)
    report("xla row8 gather bf16 (34MB)", timeit(xla_gather_rows8, packed_bf16, idxp))

    # --- lanewise gather: table replicated across 128 lanes ---------------
    tab_lanes = jax.random.uniform(key, (2048, 128), jnp.float32)
    idx2d = jax.random.randint(key, (L // 128, 128), 0, 2048, jnp.int32)
    try:
        dt = timeit(jax.jit(pallas_gather_lanewise), tab_lanes, idx2d)
        report("pallas lanewise take_along_axis (2k)", dt)
    except Exception as e:
        print(f"pallas lanewise gather FAILED: {type(e).__name__}: {str(e)[:200]}")

    # --- small-table lookup: 256x2 light spectrum -------------------------
    light = jax.random.uniform(key, (256, 2), jnp.float32)
    idxl = jax.random.randint(key, (L,), 0, 256, jnp.int32)
    report("xla gather (256x2 light table)", timeit(xla_gather_rows8, light, idxl))
    report("one-hot MXU matmul (256x2)", timeit(onehot_matmul, light, idxl))

    # --- 2D TF row gather: 257*257 rows x 16 f32 ---------------------------
    tf = jax.random.uniform(key, (257 * 257, 16), jnp.float32)
    idxt = jax.random.randint(key, (L,), 0, tf.shape[0], jnp.int32)
    report("xla row16 gather (4MB TF table)", timeit(xla_gather_rows8, tf, idxt))


if __name__ == "__main__":
    main()


# ------------------------------------------------------- gather inside loop
def loop_gather_test():
    import functools
    key = jax.random.PRNGKey(1)
    packed = jax.random.uniform(key, (129 * 129 * 129, 8), jnp.float32)
    idx0 = jax.random.randint(key, (4, 512, 512), 0, packed.shape[0], jnp.int32)

    @jax.jit
    def unrolled(packed, idx):
        acc = jnp.zeros(idx.shape, jnp.float32)
        for k in range(8):
            rows = jnp.take(packed, (idx + k) % packed.shape[0], axis=0)
            acc = acc + rows.sum(-1)
        return acc

    @jax.jit
    def forloop(packed, idx):
        def body(k, acc):
            rows = jnp.take(packed, (idx + k) % packed.shape[0], axis=0)
            return acc + rows.sum(-1)
        return jax.lax.fori_loop(0, 8, body, jnp.zeros(idx.shape, jnp.float32))

    @jax.jit
    def forloop_datadep(packed, idx):
        # index depends on the carry (like the renderer: position evolves)
        def body(k, carry):
            acc, cur = carry
            rows = jnp.take(packed, cur, axis=0)
            s = rows.sum(-1)
            cur = (cur + s.astype(jnp.int32) + 1) % packed.shape[0]
            return (acc + s, cur)
        acc, _ = jax.lax.fori_loop(0, 8, body,
                                   (jnp.zeros(idx.shape, jnp.float32), idx))
        return acc

    n = 8 * idx0.size
    dt = timeit(unrolled, packed, idx0, reps=5)
    report("row8 gather x8 unrolled", dt, n)
    dt = timeit(forloop, packed, idx0, reps=5)
    report("row8 gather x8 fori_loop", dt, n)
    dt = timeit(forloop_datadep, packed, idx0, reps=5)
    report("row8 gather x8 fori_loop data-dep", dt, n)


loop_gather_test()
