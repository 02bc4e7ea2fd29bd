"""Targeted Pallas attempt at the ~39% non-gather floor (VERDICT r1 #9).

Question: with the table gathers staying in XLA (Pallas has no viable
per-lane HBM gather — measured round 1), can a Pallas kernel run the REST
of a Woodcock step (RNG advance, free flight, event wheel, masked state
update, one-hot binned radiance accumulation) faster than XLA's fusions?

Method: one step body with the material lookup stubbed by arithmetic
(BOTH sides use the identical jnp math, so this isolates codegen/fusion
quality, not algorithm). State is SoA over N lanes; radiance is (B, N).
The XLA side is jit(step); the Pallas side tiles lanes into VMEM blocks.
In the real renderer the volume gather forces state through HBM every
step either way, so a single-step comparison is the honest shape.

Run: python tools/pallas_step.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BINS = 12
EXT = 40.0
_INV24 = np.float32(1.0 / (1 << 24))


def _u01(x):
    """uint32 -> [0,1) via the top 24 bits (Mosaic has no u32->f32 cast;
    both sides use this so the comparison stays codegen-for-codegen)."""
    return (x >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * _INV24


def _pcg(x):
    x = x * np.uint32(747796405) + np.uint32(2891336453)
    x = ((x >> ((x >> np.uint32(28)) + np.uint32(4))) ^ x) * np.uint32(277803737)
    return (x >> np.uint32(22)) ^ x


def step_math(rng, px, py, pz, dx, dy, dz, bounces, samples, bin_, radiance):
    """One Woodcock step, material lookup stubbed by arithmetic.
    radiance: (N_BINS,) + lane shape. Pure jnp — shared by both sides."""
    rng = _pcg(rng)
    dist = -jnp.log(jnp.maximum(_u01(rng), 1e-12)) / jnp.float32(EXT)
    px = px + dist * dx
    py = py + dist * dy
    pz = pz + dist * dz

    dens = 0.4 + 0.1 * (px + py + pz)          # stubbed volume sample
    albedo = jnp.float32(0.9)
    alpha = jnp.clip((dens - 0.3) / 0.7, 0.0, 1.0)  # stubbed TF
    p_null = 1.0 - alpha
    p_scatter = jnp.where(bounces >= 8, 0.0, alpha * albedo)
    p_absorb = 1.0 - p_null - p_scatter

    rng = _pcg(rng)
    wheel = _u01(rng)
    oob = (px > 1.0) | (px < 0.0) | (py > 1.0) | (py < 0.0) | (pz > 1.0) | (pz < 0.0)
    absorb = (~oob) & (wheel < p_absorb)
    scatter = (~oob) & (~absorb) & (wheel < p_absorb + p_scatter)
    respawn = oob | absorb

    emitted = jnp.where(oob, jnp.maximum(dx * 0.7 + dy * 0.2 + dz * 0.1, 0.0) * 5.0, 0.0)
    samples = samples + respawn.astype(jnp.int32)
    denom = jnp.maximum(samples, 1).astype(jnp.float32)
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, (N_BINS,) + bin_.shape, 0) == bin_[None]
    )
    target = jnp.where(one_hot, emitted[None], 0.0)
    radiance = jnp.where(respawn[None], radiance + (target - radiance) / denom[None],
                         radiance)

    # masked scatter direction (cheap stand-in for HG: deterministic bend)
    rng = _pcg(rng)
    s = _u01(rng) * 2.0 - 1.0
    ndx = jnp.where(scatter, dx * s, dx)
    ndy = jnp.where(scatter, dy * (1 - s), dy)
    ndz = jnp.where(scatter, dz, dz)
    inv = jax.lax.rsqrt(jnp.maximum(ndx * ndx + ndy * ndy + ndz * ndz, 1e-20))
    dx, dy, dz = ndx * inv, ndy * inv, ndz * inv

    # respawn at a stubbed entry point with a fresh wavelength bin
    rng = _pcg(rng)
    lam_u = _u01(rng)
    nbin = jnp.clip((lam_u * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
    px = jnp.where(respawn, 0.01, px)
    py = jnp.where(respawn, lam_u, py)
    pz = jnp.where(respawn, 0.5, pz)
    bin_ = jnp.where(respawn, nbin, bin_)
    bounces = jnp.where(respawn, 0, bounces + scatter.astype(jnp.int32))
    return rng, px, py, pz, dx, dy, dz, bounces, samples, bin_, radiance


LANE_NAMES = ("rng", "px", "py", "pz", "dx", "dy", "dz", "bounces", "samples", "bin")


def make_state(n):
    r = np.random.default_rng(0)
    return dict(
        rng=jnp.asarray(r.integers(1, 2**32, n, dtype=np.uint32)),
        px=jnp.asarray(r.random(n, np.float32)),
        py=jnp.asarray(r.random(n, np.float32)),
        pz=jnp.asarray(r.random(n, np.float32)),
        dx=jnp.full((n,), 0.57735, jnp.float32),
        dy=jnp.full((n,), 0.57735, jnp.float32),
        dz=jnp.full((n,), 0.57735, jnp.float32),
        bounces=jnp.zeros(n, jnp.int32),
        samples=jnp.zeros(n, jnp.int32),
        bin=jnp.asarray(r.integers(0, N_BINS, n, dtype=np.int32)),
        radiance=jnp.ones((N_BINS, n), jnp.float32),
    )


@jax.jit
def xla_step(state):
    args = [state[k] for k in LANE_NAMES] + [state["radiance"]]
    out = step_math(*args)
    return dict(zip(LANE_NAMES, out[:10]), radiance=out[10])


def pallas_step(state, block=16384):
    """Lanes viewed 2-D (rows, 128) so blocks map onto the (8, 128) VPU
    tiling (1-D lane blocks were measured ~700x slower — scalarized)."""
    n = state["px"].shape[0]
    rows = n // 128
    brows = block // 128

    def kernel(*refs):
        ins = refs[:11]
        outs = refs[11:]
        vals = [r[:] for r in ins[:10]] + [ins[10][:]]
        out_vals = step_math(*vals)
        for r, v in zip(outs, out_vals):
            r[:] = v

    lane_spec = pl.BlockSpec((brows, 128), lambda i: (i, 0))
    rad_spec = pl.BlockSpec((N_BINS, brows, 128), lambda i: (0, i, 0))
    ins_2d = [state[k].reshape(rows, 128) for k in LANE_NAMES] + [
        state["radiance"].reshape(N_BINS, rows, 128)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(rows // brows,),
        in_specs=[lane_spec] * 10 + [rad_spec],
        out_specs=[lane_spec] * 10 + [rad_spec],
        out_shape=(
            [jax.ShapeDtypeStruct((rows, 128), state[k].dtype) for k in LANE_NAMES]
            + [jax.ShapeDtypeStruct((N_BINS, rows, 128), jnp.float32)]
        ),
    )(*ins_2d)
    return dict(
        {k: v.reshape(n) for k, v in zip(LANE_NAMES, out[:10])},
        radiance=out[10].reshape(N_BINS, n),
    )


def timed(fn, state, reps=20):
    out = fn(state)
    float(jnp.sum(out["radiance"]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    float(jnp.sum(out["radiance"]))
    return (time.perf_counter() - t0) / reps


def main():
    n = 1 << 20  # 1M lanes (the 512^2 x 4-stream workload)
    state = make_state(n)
    dt_x = timed(xla_step, state)
    print(f"XLA step body:    {dt_x*1e3:7.2f} ms  ({n/dt_x/1e9:.2f} Glanes/s)")
    for block in (8192, 16384, 32768):
        try:
            f = functools.partial(pallas_step, block=block)
            dt_p = timed(f, state)
            print(f"Pallas (block={block:5d}): {dt_p*1e3:7.2f} ms  "
                  f"({n/dt_p/1e9:.2f} Glanes/s, {dt_x/dt_p:.2f}x vs XLA)")
        except Exception as e:
            print(f"Pallas (block={block}): FAILED {type(e).__name__}: {e}"[:200])
    # value check
    a = xla_step(state)
    b = pallas_step(state)
    err = float(jnp.max(jnp.abs(a["radiance"] - b["radiance"])))
    print("max |radiance diff|:", err)


if __name__ == "__main__":
    main()
