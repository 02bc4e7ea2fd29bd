"""Grow a synthetic loop toward the renderer until gathers become slow."""

import time

import jax
import jax.numpy as jnp
import numpy as np

S, R = 4, 512
STEPS = 8
BATCH = 8


def force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(jnp.sum(leaves[0]))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def report(name, dt):
    ls = BATCH * STEPS * S * R * R
    print(f"{name:44s} {dt*1e3:8.1f} ms  {ls/dt/1e9:6.2f} Glane-steps/s")


key = jax.random.PRNGKey(0)
packed = jax.random.uniform(key, (129 * 129 * 129, 8), jnp.float32)
tf_tab = jax.random.uniform(key, (257 * 257, 16), jnp.float32)
light_tab = jax.random.uniform(key, (257, 2), jnp.float32)
pos0 = jax.random.uniform(key, (3, S, R, R), jnp.float32)
seeds = jnp.arange(1, BATCH + 1, dtype=jnp.uint32)


def takes(pos):
    u, v, w = pos[0], pos[1], pos[2]
    bx = jnp.clip((u * 128).astype(jnp.int32), 0, 128)
    by = jnp.clip((v * 128).astype(jnp.int32), 0, 128)
    bz = jnp.clip((w * 128).astype(jnp.int32), 0, 128)
    rows = jnp.take(packed_arg, (bz * 129 + by) * 129 + bx, axis=0)
    dens = rows.mean(-1)
    ti = jnp.clip((dens * 256).astype(jnp.int32), 0, 256)
    tj = jnp.clip((u * 256).astype(jnp.int32), 0, 256)
    mat = jnp.take(tf_arg, ti * 257 + tj, axis=0)
    li = jnp.clip((v * 256).astype(jnp.int32), 0, 256)
    lrow = jnp.take(light_arg, li, axis=0)
    return dens + mat.mean(-1) + lrow.mean(-1)


packed_arg = tf_arg = light_arg = None


def variant_small_carry(packed_, tf_, light_, pos, seeds):
    global packed_arg, tf_arg, light_arg
    packed_arg, tf_arg, light_arg = packed_, tf_, light_

    def dispatch(pos, seed):
        def body(k, p):
            x = takes(p)
            return (p + x[None] * 1e-6) % 1.0
        return jax.lax.fori_loop(0, STEPS, body, pos), None

    out, _ = jax.lax.scan(dispatch, pos, seeds)
    return out


def variant_big_carry(packed_, tf_, light_, pos, radiance, seeds):
    global packed_arg, tf_arg, light_arg
    packed_arg, tf_arg, light_arg = packed_, tf_, light_

    def dispatch(carry, seed):
        pos, rad = carry

        def body(k, c):
            p, rd = c
            x = takes(p)
            hit = x > 0.5
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (12,) + x.shape, 0)
                == (x * 12).astype(jnp.int32) % 12
            )
            rd = jnp.where(hit[None] & onehot, rd + x[None], rd)
            return ((p + x[None] * 1e-6) % 1.0, rd)

        return jax.lax.fori_loop(0, STEPS, body, (pos, rad)), None

    out, _ = jax.lax.scan(dispatch, (pos, radiance), seeds)
    return out


def main():
    rad = jnp.zeros((12, S, R, R), jnp.float32)
    dt = timeit(jax.jit(variant_small_carry), packed, tf_tab, light_tab, pos0, seeds)
    report("3 takes, small carry", dt)
    dt = timeit(jax.jit(variant_big_carry), packed, tf_tab, light_tab, pos0, rad, seeds)
    report("3 takes + 50MB radiance carry", dt)


if __name__ == "__main__":
    main()
