"""Corrected gather microbenchmarks (forced host reads — block_until_ready
does not synchronize on the tunneled axon backend).

Establishes true rates for: XLA gather at several row widths, Pallas
VMEM-table gathers (various formulations), one-hot MXU lookups.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 1024 * 1024


def force(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1].astype(jnp.float32)))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def report(name, dt, n=L):
    print(f"{name:48s} {dt*1e6:9.1f} us  {n/dt/1e6:9.1f} Mlookups/s")


@jax.jit
def take0(table, idx):
    return jnp.take(table, idx, axis=0)


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (L,), 0, 128 ** 3, jnp.int32)

    for w in (1, 8, 16):
        tab = jax.random.uniform(key, (128 ** 3, w) if w > 1 else (128 ** 3,), jnp.float32)
        report(f"xla gather row{w} f32 (128^3 rows)", timeit(take0, tab, idx))
    tab8_bf16 = jax.random.uniform(key, (128 ** 3, 8), jnp.float32).astype(jnp.bfloat16)
    report("xla gather row8 bf16", timeit(take0, tab8_bf16, idx))
    # small tables
    idx256 = jax.random.randint(key, (L,), 0, 256, jnp.int32)
    tab256 = jax.random.uniform(key, (256, 2), jnp.float32)
    report("xla gather row2 (256 rows)", timeit(take0, tab256, idx256))

    @jax.jit
    def onehot256(table, idx):
        oh = (idx[:, None] == jnp.arange(256, dtype=jnp.int32)[None]).astype(jnp.bfloat16)
        return oh @ table.astype(jnp.bfloat16)

    report("one-hot bf16 MXU (256x2)", timeit(onehot256, tab256, idx256))

    # one-hot for 2D TF via segmented tables: 257x257 too big; try 4096 rows
    idx4k = jax.random.randint(key, (L,), 0, 4096, jnp.int32)
    tab4k = jax.random.uniform(key, (4096, 16), jnp.float32)
    report("xla gather row16 (4096 rows)", timeit(take0, tab4k, idx4k))

    @jax.jit
    def onehot4k(table, idx):
        oh = (idx[:, None] == jnp.arange(4096, dtype=jnp.int32)[None]).astype(jnp.bfloat16)
        return oh @ table.astype(jnp.bfloat16)

    report("one-hot bf16 MXU (4096x16)", timeit(onehot4k, tab4k, idx4k))

    # ---------------- pallas lanewise gather: out[m,l] = tab[idx[m,l], l] --
    def mk_lanewise(N, R):
        def kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        def fn(tab, idx2d):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(idx2d.shape, tab.dtype),
                grid=(idx2d.shape[0] // R,),
                in_specs=[
                    pl.BlockSpec((N, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(tab, idx2d)

        return jax.jit(fn)

    for N in (8, 256, 2048, 32768):
        tabl = jax.random.uniform(key, (N, 128), jnp.float32)
        idx2d = jax.random.randint(key, (L // 128, 128), 0, N, jnp.int32)
        try:
            dt = timeit(mk_lanewise(N, 512), tabl, idx2d)
            report(f"pallas lanewise take_along_axis (N={N})", dt)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            print(f"pallas lanewise N={N} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
