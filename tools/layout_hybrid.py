"""Layout-wall hybrid experiment (VERDICT r3 directive #6).

Context (ARCHITECTURE.md "the layout wall"): the 4-D (D,Hp,Wp,8) packed
table is the FAST gather path while small (XLA:TPU's planes-major layout
{2,1,0,3} maps the corner dim onto sublanes — ~6 ns/idx) but collapses with
size (planes end up gigabytes apart + a full-table layout copy at
dispatch); the flat (rows, 8) layout is size-independent at ~12 ns/idx.
pack_volume_auto crosses over at 100 MB. This tool measures whether any
hybrid recovers the sublane-mapped speed at 134 MB-2.1 GB:

  a. 4d       — the natural 4-D table (XLA-chosen layout)  [baseline fast-small]
  b. flat     — (rows, 8) PackedVolume                     [baseline size-indep]
  c. forced   — the 4-D table with an explicitly forced row-minor
                {3,2,1,0} device layout (jax.experimental layout API):
                physically identical bytes to flat, 4-D logical indexing —
                isolates whether the 4-D slowdown is layout-copy overhead
                or the gather lowering itself
  d. flat128  — (rows/16, 128) table packing 16 corner-rows per physical
                row (full 128-lane vregs); gather the 128-wide row, select
                the 8-wide slice in-register via a static-unrolled masked
                sum over the 16 slots

Each variant is measured IN-SITU: the real spectral render dispatch
(render_many) with the volume sampler swapped, plus a standalone gather
microbench. Run on the TPU: python tools/layout_hybrid.py --size 256
"""

import argparse
import json
import sys
import time

import numpy as np


def _gather_bench(v, n_idx=1_048_576, reps=10, seed=0):
    """ns/index of v.fn(table, idx) over random indices. The table rides as
    a jit ARGUMENT — closing over a multi-hundred-MB table serializes it
    into the lowered module and the remote compiler rejects it (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    idx = jnp.asarray(rng.integers(0, v.n_rows, n_idx, dtype=np.int32))
    f = jax.jit(v.fn, in_shardings=(v.format, None)) if v.format is not None \
        else jax.jit(v.fn)
    out = f(v.table, idx)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(v.table, idx)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    return dt / n_idx * 1e9


class Variant:
    def __init__(self, name, n_rows, table, fn, format=None):
        self.name = name
        self.n_rows = n_rows
        self.table = table
        self.fn = fn
        self.format = format


def build_variants(size):
    import jax
    import jax.numpy as jnp

    from vpt_tpu.ops import interp
    from vpt_tpu.scene.volume import Volume

    packed = interp.pack_volume_corners(
        np.asarray(Volume.sphere_in_cube(size).density))
    dims = packed.shape[:3]
    n_rows = int(np.prod(dims))
    mb = packed.nbytes / 1e6
    print(f"# packed table {packed.shape} = {mb:.0f} MB", file=sys.stderr)

    out = []

    t4d = jnp.asarray(packed)
    out.append(Variant(
        "4d", n_rows, t4d,
        lambda t, idx: jnp.take(t.reshape(-1, 8), idx, axis=0)))

    tflat = jnp.asarray(packed.reshape(-1, 8))
    out.append(Variant(
        "flat", n_rows, tflat,
        lambda t, idx: jnp.take(t, idx, axis=0)))

    # c: forced row-minor layout on the 4-D logical table
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        fmt = Format(Layout(major_to_minor=(0, 1, 2, 3)),
                     SingleDeviceSharding(jax.devices()[0]))
        tforced = jax.device_put(t4d, fmt)
        out.append(Variant(
            "forced_rowminor_4d", n_rows, tforced,
            lambda t, idx: jnp.take(t.reshape(-1, 8), idx, axis=0),
            format=fmt))
    except Exception as e:  # API moved / unsupported on backend
        print(f"# forced-layout variant unavailable: {e}", file=sys.stderr)

    # d: 16 corner-rows per 128-wide physical row
    pad_rows = (-n_rows) % 16
    flat_p = np.pad(packed.reshape(-1, 8), ((0, pad_rows), (0, 0)))
    t128 = jnp.asarray(flat_p.reshape(-1, 128))

    def take128(t, idx):
        rows = jnp.take(t, idx // 16, axis=0)  # (n, 128)
        slot = idx % 16
        acc = jnp.zeros(idx.shape + (8,), t.dtype)
        for s in range(16):
            acc = acc + jnp.where(
                (slot == s)[:, None], rows[:, s * 8:(s + 1) * 8], 0.0)
        return acc

    out.append(Variant("flat128", n_rows, t128, take128))

    # e: bf16 storage — halves table bytes; gather cost partly tracks
    # residency, so test whether half the footprint buys back ns/idx.
    # (Opt-in precision trade if it wins: densities are u8-quantized
    # upstream, so bf16's 8-bit mantissa costs ~2^-9 relative.)
    tbf16 = jnp.asarray(packed.reshape(-1, 8), jnp.bfloat16)
    out.append(Variant(
        "flat_bf16", n_rows, tbf16,
        lambda t, idx: jnp.take(t, idx, axis=0).astype(jnp.float32)))

    # f: u8 storage — quarter bytes and EXACT for u8-quantized upstream
    # volumes (round(d*255)/255 round-trips); upcast+scale post-gather
    tu8 = jnp.asarray(
        np.round(packed.reshape(-1, 8) * 255.0).astype(np.uint8))
    inv255 = jnp.float32(1.0 / 255.0)
    out.append(Variant(
        "flat_u8", n_rows, tu8,
        lambda t, idx: jnp.take(t, idx, axis=0).astype(jnp.float32) * inv255))

    # g: u8 on the natural 4-D layout — does quantized storage deepen the
    # small-table sublane-mapped regime (the 128^3 headline band)?
    t4d_u8 = jnp.asarray(np.round(packed * 255.0).astype(np.uint8))
    out.append(Variant(
        "4d_u8", n_rows, t4d_u8,
        lambda t, idx: jnp.take(t.reshape(-1, 8), idx, axis=0)
        .astype(jnp.float32) * inv255))
    return out, mb


def in_situ(size, variant_kind, resolution=512, streams=4, reps=3, batch=16):
    """Full spectral dispatch throughput with the chosen representation."""
    import jax.numpy as jnp

    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.ops import interp
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
        Volume.sphere_in_cube(size), MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=8),
        resolution=resolution, streams=streams,
        pack_tables={"material_tf", "light_spectrum"})
    cam = Camera()
    packed = interp.pack_volume_corners(np.asarray(r.volume.density))
    if variant_kind == "4d":
        density = jnp.asarray(packed)
    elif variant_kind == "flat":
        density = interp.PackedVolume(
            jnp.asarray(packed.reshape(-1, packed.shape[-1])),
            packed.shape[:3], "full")
    elif variant_kind in ("flat_u8", "flat_bf16"):
        density = interp.PackedVolume.pack(
            np.asarray(r.volume.density), "full",
            table_dtype=variant_kind.split("_", 1)[1])
    else:
        raise ValueError(variant_kind)
    ctx = r.ctx(cam, 1)._replace(density=density)
    state = r.reset(cam, 1)
    seeds = lambda lo: jnp.asarray(
        [(lo + k) * 2654435761 % 2**32 for k in range(batch)], jnp.uint32)
    state, img = M.render_many(state, ctx, seeds(0), steps=8, n_bins=12)
    s0 = float(jnp.sum(state.samples))
    t0 = time.perf_counter()
    for rr in range(reps):
        state, img = M.render_many(state, ctx, seeds((rr + 1) * batch),
                                   steps=8, n_bins=12)
    paths = float(jnp.sum(state.samples)) - s0
    dt = time.perf_counter() - t0
    return paths / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--situ", action="store_true",
                    help="also run the full-dispatch in-situ comparison")
    args = ap.parse_args()

    variants, mb = build_variants(args.size)
    res = {"size": args.size, "table_mb": round(mb, 1)}
    for v in variants:
        ns = _gather_bench(v)
        res[f"gather_ns_{v.name}"] = round(ns, 2)
        print(f"# {v.name}: {ns:.2f} ns/idx", file=sys.stderr)
    if args.situ:
        for kind in ("4d", "flat", "flat_u8", "flat_bf16"):
            mp = in_situ(args.size, kind)
            res[f"situ_mpaths_{kind}"] = round(mp, 1)
            print(f"# in-situ {kind}: {mp:.1f} Mpaths/s", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
