"""Scatter-add cost structure on TPU (the backward-path analog of
tools/gather_bench.py).

The packed-adjoint backward's cost is dominated by two row scatter-adds per
lane-step (volume corner rows + TF rows). This measures how XLA:TPU
scatter-add cost scales with: table row count, row width, index count,
index locality (random / clustered / sorted), and the indices_are_sorted
hint — plus the cost of a sort+gather preprocessing stage, to evaluate a
sort-then-sorted-scatter pipeline.

Run: python tools/scatter_bench.py
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, table, *args, reps=3):
    """Times ``table = fn(table, *args)`` (donation-correct threading)."""
    table = fn(table, *args)
    float(jnp.sum(table))
    t0 = time.perf_counter()
    for _ in range(reps):
        table = fn(table, *args)
    float(jnp.sum(table))
    return (time.perf_counter() - t0) / reps


def timeit_pure(fn, *args, reps=5):
    r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    float(jnp.sum(r[0] if isinstance(r, tuple) else r))
    return (time.perf_counter() - t0) / reps


@partial(jax.jit, donate_argnums=(0,))
def scat(table, idx, vals):
    return table.at[idx].add(vals)


@partial(jax.jit, donate_argnums=(0,))
def scat_sorted_hint(table, idx, vals):
    import jax.lax as lax
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    return lax.scatter_add(table, idx[:, None], vals, dnums,
                           indices_are_sorted=True, unique_indices=False)


@jax.jit
def sort_pipeline(idx, vals):
    order = jnp.argsort(idx)
    return idx[order], jnp.take(vals, order, axis=0)


def main():
    rng = np.random.default_rng(0)
    rows_list = [(66049, "tf257"), (2146689, "vol129")]
    results = []
    for nrows, rname in rows_list:
        for width in (8, 18):
            for n_idx in (1048576,):
                vals = jnp.asarray(rng.random((n_idx, width), np.float32))
                base = jnp.zeros((nrows, width), jnp.float32)
                # random
                idx_r = jnp.asarray(rng.integers(0, nrows, n_idx, np.int32))
                # clustered: lanes hit a contiguous 1/64 slab of the table
                idx_c = jnp.asarray(
                    (rng.integers(0, nrows // 64, n_idx) + nrows // 2)
                    .astype(np.int32))
                # sorted random
                idx_s = jnp.sort(idx_r)
                t_rand = timeit(scat, base, idx_r, vals)
                base = jnp.zeros((nrows, width), jnp.float32)
                t_clus = timeit(scat, base, idx_c, vals)
                base = jnp.zeros((nrows, width), jnp.float32)
                t_sort = timeit(scat, base, idx_s, vals)
                base = jnp.zeros((nrows, width), jnp.float32)
                t_hint = timeit(scat_sorted_hint, base, idx_s, vals)
                row = dict(rows=rname, width=width, n=n_idx,
                           rand_ms=round(t_rand * 1e3, 2),
                           clustered_ms=round(t_clus * 1e3, 2),
                           sorted_ms=round(t_sort * 1e3, 2),
                           sorted_hint_ms=round(t_hint * 1e3, 2),
                           ns_per_idx_rand=round(t_rand / n_idx * 1e9, 1))
                results.append(row)
                print(row, file=sys.stderr)

    # sort-pipeline cost at 1M x 8
    n_idx = 1048576
    idx_r = jnp.asarray(rng.integers(0, 2146689, n_idx, np.int32))
    vals = jnp.asarray(rng.random((n_idx, 8), np.float32))
    t_pipe = timeit_pure(sort_pipeline, idx_r, vals)
    print(f"sort+permute 1M x 8f: {t_pipe*1e3:.2f} ms", file=sys.stderr)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
