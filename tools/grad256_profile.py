"""Profile the 256^3 window-backward cost structure (config 3 grads).

Origin: capability_configs once reported ~3.6 Mpaths/s at BOTH stride 1
and stride 4 here — resolved as a harness bug (it warmed a K=1 window and
timed a K=4 window, so the timed region contained a fresh remote
compile). The real numbers from this tool: stride 1 tape 3506 ms/window,
stride 4 1362 (16.3 Mpaths/s) — cost(k) = 647 + 2859/k ms per 4-dispatch
window, i.e. the big-adjoint scatter tier dominates at stride 1 and is
~2.2x the remaining base at stride 4. Variants timed (4-dispatch windows,
density-only):

  window=False            — per-dispatch truncated mode (r2's shape)
  window tape / forward   — the two window storages
  raw_adjoints            — tape mode without the final dense
                            pack-transpose contraction (isolates
                            _contract_packed_adjoints, which at 257^3
                            runs a vjp over a 543 MB packed table)
  stride 1 vs 4 for each

Run: python tools/grad256_profile.py [--volume 256] [--reps 3]
"""

import argparse
import functools
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, default=256)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vpt_tpu.kernels import spectral_backward as SB
    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import (
        LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
    )

    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.9
    table[..., 1] = np.where(dens > 0.3, (dens - 0.3) / 0.7, 0.0)
    table[..., 2] = 0.5
    r = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(args.volume), MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=args.steps),
        resolution=args.res, streams=args.streams)
    cam = Camera()
    ctx = r.ctx(cam, 1)
    g_img = jnp.ones((args.res, args.res, 3), jnp.float32)
    wrt = frozenset({"density"})
    seeds = jnp.asarray([(k + 2) * 2654435761 % 2**32
                         for k in range(args.chunk)], jnp.uint32)

    def timed(label, fn):
        state0 = r.reset(cam, 1)
        out = fn(state0)  # compile+warm
        # sync via a reduction fetch: block_until_ready can return before
        # execution completes through the async relay (ARCHITECTURE.md)
        float(jnp.sum(jax.tree.leaves(out)[-1]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(r.reset(cam, 1))
        float(jnp.sum(jax.tree.leaves(out)[-1]))
        dt = (time.perf_counter() - t0) / args.reps
        # paths/s: sample count of one window
        st = out[0]
        paths = float(jnp.sum(st.samples)) if hasattr(st, "samples") else 0
        print(f"{label:42s} {dt*1e3:9.1f} ms/window "
              f"({paths / dt / 1e6:7.2f} Mpaths/s)", file=sys.stderr)
        return dt

    for stride in (1, 4):
        timed(f"window=False stride={stride}", lambda s0, k=stride: (
            SB.prb_render_and_grads_many(s0, ctx, seeds, g_img, args.steps,
                                         12, wrt=wrt, scatter_stride=k,
                                         window=False)))
        for storage in ("tape", "forward"):
            timed(f"window {storage} stride={stride}", lambda s0, k=stride, st=storage: (
                SB.prb_render_and_grads_many(s0, ctx, seeds, g_img,
                                             args.steps, 12, wrt=wrt,
                                             scatter_stride=k,
                                             window_storage=st)))

    # isolate the contraction: tape mode, raw adjoints (no contraction).
    # ctx/seeds/g_img ride as ARGUMENTS — closing over them serializes the
    # arrays into the lowered module and the remote compiler rejects the
    # oversized request (HTTP 413) / lowers pathologically slowly
    @functools.partial(jax.jit, static_argnames=())
    def tape_raw_impl(state0, ctx, seeds, g_img):
        state_f, tapes, image, m_final = SB._tape_forward_sweep(
            state0, ctx, seeds, args.steps, 12, "linear", wrt)
        ks = jnp.arange(seeds.shape[0], dtype=jnp.uint32)
        zero = jnp.zeros_like(state0.px)
        cot0 = dict(c=zero, cb=zero)
        adj0 = SB._packed_adj_init(ctx, wrt)

        def body_b(carry, inp):
            cot, adj = carry
            tape_k, seed, k = inp
            c = ctx._replace(seed_bits=seed)
            _, _, adj, cot = SB.spectral_backward_packed(
                state0, c, g_img, args.steps, 12, "linear", wrt=wrt,
                m_final=m_final, adj_in=adj, raw_adjoints=True,
                cot_in=cot, return_cot=True, tape_in=tape_k,
                state_out_in=state_f)
            return (cot, adj), None

        (_, acc), _ = jax.lax.scan(body_b, (cot0, adj0), (tapes, seeds, ks),
                                   reverse=True)
        return state_f, acc["g_vol"]

    timed("tape raw-adjoints (no contraction)",
          lambda s0: tape_raw_impl(s0, ctx, seeds, g_img))

    # isolate the contraction alone
    from vpt_tpu.ops import interp
    n_rows = int(np.prod(SB._packed_vol_meta(ctx)[0]))

    @jax.jit
    def contract_only(adj_flat):
        vol_dims, _ = SB._packed_vol_meta(ctx)
        D = vol_dims[0] - 1
        _, vjp_vol = jax.vjp(interp.pack_volume_corners_jnp,
                             jnp.zeros((D, D, D), jnp.float32))
        (g,) = vjp_vol(adj_flat.reshape(tuple(vol_dims) + (8,)))
        return g

    adj = jnp.ones((n_rows, 8), jnp.float32)
    g = contract_only(adj)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        g = contract_only(adj)
    jax.block_until_ready(g)
    print(f"{'contraction alone':42s} "
          f"{(time.perf_counter() - t0) / args.reps * 1e3:9.1f} ms",
          file=sys.stderr)

    # forward render_many baseline
    def fwd(state0):
        return M.render_many(state0, ctx, seeds, steps=args.steps, n_bins=12)
    timed("forward render_many", fwd)


if __name__ == "__main__":
    main()
