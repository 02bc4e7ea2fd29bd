"""Round 4: column-wise take_along_axis (the TPU-vectorizable gather form).

If V is laid out (D, H, W) with (H, W) mapping to (sublane, lane), then
out[k,h,w] = V[idx[k,h,w], h, w] gathers within each lane's own depth
column — no cross-lane traffic. Measures whether XLA lowers this fast.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H = W = 512


def force(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[..., :1]))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def report(name, dt, n):
    print(f"{name:52s} {dt*1e6:9.1f} us  {n/dt/1e6:9.1f} Mlookups/s")


def main():
    key = jax.random.PRNGKey(0)
    for D, K in ((128, 4), (256, 4), (512, 4)):
        V = jax.random.uniform(key, (D, H, W), jnp.float32)
        idx = jax.random.randint(key, (K, H, W), 0, D, jnp.int32)

        @jax.jit
        def col_gather(V, idx):
            return jnp.take_along_axis(V, idx, axis=0)

        dt = timeit(col_gather, V, idx)
        report(f"take_along_axis depth (D={D}, K={K})", dt, K * H * W)

    # data-dependent chain inside a loop (renderer-like)
    D = 256
    V = jax.random.uniform(key, (D, H, W), jnp.float32)
    idx0 = jax.random.randint(key, (4, H, W), 0, D, jnp.int32)

    @jax.jit
    def chain(V, idx):
        def body(k, carry):
            acc, cur = carry
            vals = jnp.take_along_axis(V, cur, axis=0)
            cur = (cur + (vals * 31).astype(jnp.int32) + 1) % D
            return (acc + vals, cur)
        acc, _ = jax.lax.fori_loop(0, 8, body, (jnp.zeros_like(V[:4]), idx0))
        return acc

    dt = timeit(chain, V, idx0)
    report("chained col-gather x8 (data-dep)", dt, 8 * 4 * H * W)

    # same but 4 independent "streams" dims folded to sublanes? try (D, S*H, W)
    S = 4
    V2 = jax.random.uniform(key, (D, S * H, W), jnp.float32)
    idx2 = jax.random.randint(key, (1, S * H, W), 0, D, jnp.int32)

    @jax.jit
    def col_gather2(V, idx):
        return jnp.take_along_axis(V, idx, axis=0)

    dt = timeit(col_gather2, V2, idx2)
    report("take_along_axis depth (D=256, folded S)", dt, S * H * W)

    # gather along the LAST axis per-sublane (lane-dim table)
    V3 = jax.random.uniform(key, (H * 8, W), jnp.float32)
    idx3 = jax.random.randint(key, (H * 8, W), 0, W, jnp.int32)

    @jax.jit
    def lane_gather(V, idx):
        return jnp.take_along_axis(V, idx, axis=1)

    dt = timeit(lane_gather, V3, idx3)
    report("take_along_axis lanes (axis=-1)", dt, V3.size)


if __name__ == "__main__":
    main()
