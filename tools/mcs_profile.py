"""MCS straggler profile + throughput: why the all-lanes-done early exit
bought nothing at 512^2, and what the majorant mode buys back.

Two measurements (VERDICT r2 #3):
  1. Per-frame trips histogram of the collision while_loop — the per-lane
     iteration at which each lane finished (instrumented replica of
     models/mcs._woodcock_distance). The early exit fires at max(lane
     trips); at 512^2 that is the max of 262k geometric-ish tails, so the
     p50 lane's work says nothing about frame cost.
  2. Mrays/s of the exact path vs majorant_blocks=8, both through
     render_many (scan-batched frames).

Run: python tools/mcs_profile.py [--res 512] [--frames 16]
"""

import argparse
import json
import sys
import time

import numpy as np


def _scene(res, maj, extinction):
    from vpt_tpu.models.mcs import MCSRenderer
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume

    r = MCSRenderer(Volume.sphere_in_cube(128), extinction=extinction,
                    resolution=res, majorant_blocks=maj)
    return r, Camera()


def trips_histogram(res, extinction, maj, seed=1):
    """Replica of the _woodcock_distance loop recording each lane's finish
    trip (distance loop only; the transmittance loop has the same shape)."""
    import jax
    import jax.numpy as jnp

    from vpt_tpu.models import mcs as MCS
    from vpt_tpu.models.raymarch import camera_rays
    from vpt_tpu.ops import geometry, sampling

    r, cam = _scene(res, maj, extinction)
    ctx = r.ctx(cam, seed)

    @jax.jit
    def finish_trips(ctx):
        frm, to = camera_rays(res, ctx.inv_mvp)
        tn, tf_ = geometry.intersect_cube(
            frm[0], frm[1], frm[2], to[0] - frm[0], to[1] - frm[1],
            to[2] - frm[2])
        tn = jnp.maximum(tn, 0.0)
        tf_ = jnp.maximum(tf_, 0.0)
        entry = tuple(frm[i] + (to[i] - frm[i]) * tn for i in range(3))
        exit_ = tuple(frm[i] + (to[i] - frm[i]) * tf_ for i in range(3))
        iy = jax.lax.broadcasted_iota(jnp.float32, (res, res), 0)
        ix = jax.lax.broadcasted_iota(jnp.float32, (res, res), 1)
        u = ((ix + 0.5) / res).astype(jnp.float32)
        v = ((iy + 0.5) / res).astype(jnp.float32)
        rng = sampling.hash3(
            jax.lax.bitcast_convert_type(u, jnp.uint32),
            jax.lax.bitcast_convert_type(v, jnp.uint32),
            jnp.broadcast_to(ctx.seed_bits, u.shape))

        fx, fy, fz = entry
        tx, ty, tz = exit_
        max_dist = jnp.sqrt((tx - fx) ** 2 + (ty - fy) ** 2 + (tz - fz) ** 2)

        def cond(c):
            i, rng, dist, done, fin = c
            return (i < 4096) & ~jnp.all(done)

        def body(c):
            i, rng, dist, done, fin = c
            active = ~done
            if ctx.majorant is not None:
                t0 = dist / jnp.maximum(max_dist, 1e-30)
                m, cap = MCS._majorant_lookup(
                    ctx, fx + (tx - fx) * t0, fy + (ty - fy) * t0,
                    fz + (tz - fz) * t0)
                rng, step = sampling.draw_exponential(rng, active,
                                                      ctx.extinction * m)
                capped = step >= cap
                step = jnp.minimum(step, cap)
            else:
                rng, step = sampling.draw_exponential(rng, active,
                                                      ctx.extinction)
                capped = jnp.zeros(step.shape, bool)
            dist2 = jnp.where(active, dist + step, dist)
            escaped = active & (dist2 > max_dist)
            still = active & ~escaped & ~capped
            t = dist2 / jnp.maximum(max_dist, 1e-30)
            tf4 = MCS._sample_tf(ctx, fx + (tx - fx) * t, fy + (ty - fy) * t,
                                 fz + (tz - fz) * t, "linear")
            rng, uu = sampling.draw(rng, still)
            alpha = tf4[..., 3]
            if ctx.majorant is not None:
                alpha = jnp.minimum(alpha / m, 1.0)
            collided = still & (uu < alpha)
            done2 = done | escaped | collided
            fin = jnp.where(done2 & ~done, i + 1, fin)
            return i + 1, rng, dist2, done2, fin

        zeros = jnp.zeros_like(max_dist)
        _, _, _, _, fin = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), rng, zeros, zeros.astype(bool),
             jnp.zeros(max_dist.shape, jnp.int32)))
        return fin

    fin = np.asarray(finish_trips(ctx)).ravel()
    qs = np.percentile(fin, [50, 90, 99, 99.9, 100]).tolist()
    return dict(p50=qs[0], p90=qs[1], p99=qs[2], p999=qs[3], max=qs[4],
                mean=float(fin.mean()))


def throughput(res, extinction, maj, frames, seed=1):
    import jax

    r, cam = _scene(res, maj, extinction)
    state = r.reset(cam)
    state, img = r.render_many(state, cam, [seed])  # compile
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    state, img = r.render_many(
        state, cam, [(seed + k + 1) * 2654435761 % 2**32 for k in range(frames)])
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(img)).all()
    return frames * res * res / dt / 1e6, np.asarray(img)


def persistent_accounting(res, extinction, maj, steps=8, streams=4,
                          dispatches=16, seed=1):
    """Speed-of-light accounting for the persistent-lane path (VERDICT r3
    #5): every lane runs every fori_loop step, so total lane-steps are
    exact: dispatches * steps * streams * res^2. Each lane-step issues one
    fused volume+TF gather (+1 majorant-cell gather in majorant mode) —
    against the spectral kernel's measured ~110M fused-gather lane-steps/s
    this gives the implied Mrays/s ceiling at the measured
    steps-per-deposit. Measured with the frustum-filling camera (z=1.2)
    so Mrays/s counts transport, not miss-lane churn (ADVICE r3)."""
    import jax
    import jax.numpy as jnp

    from vpt_tpu.models.mcs import MCSRenderer
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume

    r = MCSRenderer(Volume.sphere_in_cube(128), extinction=extinction,
                    resolution=res, majorant_blocks=maj,
                    persistent=True, steps=steps, streams=streams)
    cam = Camera(translation=np.array([0.0, 0.0, 1.2]))
    state = r.reset(cam, 0)
    warm = [(k + 1) * 2654435761 % 2**32 for k in range(dispatches)]
    state, img = r.render_many(state, cam, warm)
    s0 = float(jnp.sum(state.samples))
    t0 = time.perf_counter()
    state, img = r.render_many(
        state, cam,
        [(seed + dispatches + k) * 2654435761 % 2**32
         for k in range(dispatches)])
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    deposits = float(jnp.sum(state.samples)) - s0
    lanes = streams * res * res
    lane_steps = dispatches * steps * lanes
    steps_per_dep = lane_steps / max(deposits, 1.0)
    rate = lane_steps / dt
    spectral_rate = 110e6  # measured fused-gather lane-step rate
    return dict(
        mrays_per_s=round(deposits / dt / 1e6, 2),
        lane_steps_per_s_M=round(rate / 1e6, 1),
        steps_per_deposit=round(steps_per_dep, 2),
        gathers_per_step=1 + (1 if maj else 0),
        implied_ceiling_mrays=round(
            spectral_rate / (1 + (1 if maj else 0)) / steps_per_dep / 1e6, 2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--ext", type=float, default=50.0)
    args = ap.parse_args()

    out = {}
    for label, maj in (("exact", None), ("majorant8", 8)):
        h = trips_histogram(args.res, args.ext, maj)
        print(f"# {label} trips: {h}", file=sys.stderr)
        out[f"trips_{label}"] = h
        mr, img = throughput(args.res, args.ext, maj, args.frames)
        print(f"# {label}: {mr:.2f} Mrays/s (mean {img.mean():.4f})",
              file=sys.stderr)
        out[f"mrays_{label}"] = round(mr, 2)
        out[f"mean_{label}"] = float(img.mean())
    for label, maj in (("persistent", None), ("persistent_majorant8", 8)):
        acc = persistent_accounting(args.res, args.ext, maj)
        print(f"# {label}: {acc}", file=sys.stderr)
        out[label] = acc
    print(json.dumps(out))


if __name__ == "__main__":
    main()
