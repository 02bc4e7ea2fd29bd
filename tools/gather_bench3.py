"""Round 3: dynamic_gather (correct same-shape form), gather overlap,
index-count scaling."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 1024 * 1024


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0][..., :1].astype(jnp.float32)))


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


def main():
    key = jax.random.PRNGKey(0)

    # ---- pallas dynamic_gather: table (N,128) == idx (N,128) shapes -------
    def mk_dg(N):
        def kernel(tab_ref, idx_ref, out_ref):
            # grid step i handles one (N,128) block of indices
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        def fn(tab, idx):
            # idx: (M, 128) with M = k*N
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(idx.shape, tab.dtype),
                grid=(idx.shape[0] // N,),
                in_specs=[
                    pl.BlockSpec((N, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((N, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((N, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(tab, idx)

        return jax.jit(fn)

    for N in (256, 1024):
        tab = jax.random.uniform(key, (N, 128), jnp.float32)
        idx = jax.random.randint(key, (L // 128, 128), 0, N, jnp.int32)
        try:
            dt = timeit(mk_dg(N), tab, idx)
            report(f"pallas dynamic_gather sublane (N={N})", dt)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:160]
            print(f"pallas dynamic_gather N={N} FAILED: {type(e).__name__}: {msg}")

    # ---- XLA gather: index-count scaling ----------------------------------
    tab8 = jax.random.uniform(key, (128 ** 3, 8), jnp.float32)

    @jax.jit
    def take1(idx):
        return jnp.take(tab8, idx, axis=0)

    for m in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
        idx = jax.random.randint(key, (m,), 0, 128 ** 3, jnp.int32)
        dt = timeit(jax.jit(lambda i: jnp.take(tab8, i, axis=0)), idx)
        report(f"xla row8 gather, {m >> 10}k indices", dt, m)

    # ---- overlap: 3 independent gathers in one jit ------------------------
    tf_tab = jax.random.uniform(key, (257 * 257, 16), jnp.float32)
    li_tab = jax.random.uniform(key, (257, 2), jnp.float32)
    i1 = jax.random.randint(key, (L,), 0, 128 ** 3, jnp.int32)
    i2 = jax.random.randint(key, (L,), 0, 257 * 257, jnp.int32)
    i3 = jax.random.randint(key, (L,), 0, 257, jnp.int32)

    @jax.jit
    def three(i1, i2, i3):
        a = jnp.take(tab8, i1, axis=0).sum(-1)
        b = jnp.take(tf_tab, i2, axis=0).sum(-1)
        c = jnp.take(li_tab, i3, axis=0).sum(-1)
        return a + b + c

    @jax.jit
    def one(i1):
        return jnp.take(tab8, i1, axis=0).sum(-1)

    dt3 = timeit(three, i1, i2, i3)
    dt1 = timeit(one, i1)
    report("three independent 1M gathers (sum)", dt3, 3 * L)
    report("one 1M gather", dt1, L)

    # ---- u8 gather ---------------------------------------------------------
    tab_u8 = (jax.random.uniform(key, (128 ** 3, 8)) * 255).astype(jnp.uint8)
    dt = timeit(jax.jit(lambda i: jnp.take(tab_u8, i, axis=0)), i1)
    report("xla row8 gather u8", dt)

    # ---- gather from a small VMEM-sized table, scalar rows ----------------
    small = jax.random.uniform(key, (4096,), jnp.float32)
    i4 = jax.random.randint(key, (L,), 0, 4096, jnp.int32)
    dt = timeit(jax.jit(lambda i: jnp.take(small, i, axis=0)), i4)
    report("xla scalar gather (4096 table)", dt)


if __name__ == "__main__":
    main()
