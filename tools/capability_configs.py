"""Run the BASELINE.json capability configs on the current device and write
the evidence table to CONFIGS.md.

Configs (BASELINE.md "capability configs"):
  1. 64^3 / 256^2 single-wavelength ray-march vs NumPy oracle
     -> covered by tests/test_config1_eam_oracle.py (CI); re-checked here.
  2. 128^3 single-scatter MCM (MCS), 512^2 @ 16 spp
  3. 256^3 spectral MCM, 512^2 @ 64 spp + radiative-backprop density grads
  4. inverse rendering on an 8-device mesh
     -> covered by tests/test_spectral_inverse.py / test_inverse.py on the
        virtual CPU mesh (single physical chip here).
  5. 512^3 volume, 1024^2 @ 256 spp spectral MCM (single-chip slice of the
     multi-host config; multi-host needs >1 host).

Run: python tools/capability_configs.py [--skip 5]
"""

import argparse
import json
import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def config2():
    """BASELINE config 2 wording: "128^3 single-scatter MCM with Woodcock
    tracking + HG phase, 512^2 @ 16spp" — that is the RGB MCM megakernel
    (models/mcm.py: Woodcock free flights, HG scattering) capped at
    bounces=1, i.e. single scattering. MCS (the reference's dedicated
    single-scatter GLSL renderer, fixed per-frame scatter direction, no HG)
    is measured alongside as the reference-exact alternative."""
    import jax.numpy as jnp

    from vpt_tpu.models import mcm as MM
    from vpt_tpu.models.mcs import MCSRenderer
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import MCMConfig

    cam = Camera()
    vol = Volume.sphere_in_cube(128)
    spp = 16

    # -- headline: RGB MCM, bounces=1 (Woodcock + HG, per BASELINE) --------
    r = MM.MCMRenderer(
        vol, config=MCMConfig(extinction=50.0, anisotropy=0.5, bounces=1,
                              steps=8),
        resolution=512,
    )
    state = r.reset(cam, 0)
    batch = 16
    seeds = lambda lo: [(lo + k + 1) * 2654435761 % 2 ** 32 for k in range(batch)]
    state, img = r.render_many(state, cam, seeds(0))  # compile + warm
    s0 = _sync(state.samples)
    t0 = time.perf_counter()
    rounds = 4
    for rr in range(rounds):
        state, img = r.render_many(state, cam, seeds((rr + 1) * batch))
    paths = _sync(state.samples) - s0
    dt = time.perf_counter() - t0
    mdn = np.asarray(img)
    spp_measured = paths / (512 * 512)
    out = dict(
        config=2,
        desc="128^3 single-scatter MCM (Woodcock+HG, bounces=1) 512^2 @ 16spp",
        seconds=round(dt, 3),
        paths=int(paths), spp_measured=round(spp_measured, 1),
        mpaths_per_s=round(paths / dt / 1e6, 2),
        est_seconds_to_target_spp=round(spp * 512 * 512 / (paths / dt) , 2),
        finite=bool(np.isfinite(mdn).all()), mean=float(mdn.mean()),
    )

    # -- aux: MCS (reference-exact single-scatter algorithm) ---------------
    r2 = MCSRenderer(vol, extinction=50.0, resolution=512)
    state = r2.reset(cam, 0)
    state, img = r2.render(state, cam, 1)  # compile
    _sync(img)
    t0 = time.perf_counter()
    for f in range(spp):
        state, img = r2.render(state, cam, f + 2)
    _sync(img)
    dt = time.perf_counter() - t0
    mdn = np.asarray(img)
    out.update(
        mcs_seconds=round(dt, 3),
        mcs_mrays_per_s=round(spp * 512 * 512 / dt / 1e6, 2),
        mcs_finite=bool(np.isfinite(mdn).all()),
    )
    return out


def _spectral(volume_size, resolution, spp, steps=8, streams=4, grads=False,
              pack_volume=True):
    # pack_volume: True = full 8x corner table; "xy" = 4x half packing
    # (2 gathers/step — the big-volume mode); False = raw grid (8 gathers)
    import jax
    import jax.numpy as jnp

    from vpt_tpu.models import mcm_spectral as M
    from vpt_tpu.ops.interp import pack_volume_corners_jnp
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
    renderer = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(volume_size), MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=steps),
        resolution=resolution, streams=streams,
        pack_tables=(
            {"material_tf", "light_spectrum"}
            | ({"density_xy"} if pack_volume == "xy" else set())
            if (grads or pack_volume is not True)
            else True
        ),
    )
    cam = Camera()
    ctx = renderer.ctx(cam, 1)
    state = renderer.reset(cam, 1)

    # a dispatch yields ~streams*steps samples/pixel upper bound; measure by
    # actual samples counter
    target_paths = spp * resolution * resolution
    out = {}
    if grads:
        raw = jnp.asarray(Volume.sphere_in_cube(volume_size).density)
        tgt = jnp.zeros((resolution, resolution, 3), jnp.float32)

        def loss_fn(p, c_in, s0, seed_bits):
            c = c_in._replace(density=pack_volume_corners_jnp(p["density"]),
                              seed_bits=seed_bits)
            score = jnp.ones_like(s0.px)
            _, _, img = M.render_diff(s0, score, c, steps, 12)
            return jnp.mean((img - tgt) ** 2)

        gfn = jax.jit(jax.value_and_grad(loss_fn))
        loss, g = gfn({"density": raw}, ctx, state, jnp.uint32(1))
        _sync(g["density"])
        t0 = time.perf_counter()
        n = 0
        st = state
        while True:
            loss, g = gfn({"density": raw}, ctx, st, jnp.uint32(n + 2))
            n += 1
            if n >= max(1, spp // (steps * streams)):
                break
        _sync(g["density"])
        dt = time.perf_counter() - t0
        paths = n * steps * streams * resolution * resolution  # upper bound
        out.update(
            grad_dispatches=n, grad_seconds=round(dt, 3),
            grad_mpaths_per_s=round(paths / dt / 1e6, 2),
            grad_finite=bool(np.isfinite(np.asarray(g["density"])).all()),
            grad_norm=float(jnp.linalg.norm(g["density"])),
        )
        return out

    batch = 16
    seeds = lambda lo: jnp.asarray(
        [(lo + k) * 2654435761 % 2 ** 32 for k in range(batch)], jnp.uint32)
    state, img = M.render_many(state, ctx, seeds(0), steps=steps, n_bins=12)
    s_before = _sync(state.samples)
    t0 = time.perf_counter()
    rounds = 4
    for r in range(rounds):
        state, img = M.render_many(state, ctx, seeds((r + 1) * batch),
                                   steps=steps, n_bins=12)
    done = int(_sync(state.samples))
    dt = time.perf_counter() - t0
    paths = done - int(s_before)
    # spp = mean completed samples per pixel-stream (the accumulator's n)
    spp_measured = paths / (resolution * resolution * streams)
    mpaths = paths / dt / 1e6
    out.update(
        seconds=round(dt, 3), paths=paths,
        spp_measured=round(spp_measured, 1),
        mpaths_per_s=round(mpaths, 2),
        est_seconds_to_target_spp=round(
            spp * resolution * resolution * streams / (mpaths * 1e6), 1),
        image_finite=bool(np.isfinite(np.asarray(img)).all()),
    )
    return out


def config3():
    fwd = _spectral(256, 512, spp=64)
    bwd = _spectral(256, 512, spp=64, grads=True, streams=4)
    return dict(config=3, desc="256^3 spectral MCM 512^2 @ 64spp + density grads",
                **fwd, **bwd)


def config5():
    # the 8x packed corner table of a 512^3 volume (4.3 GB) exceeds what the
    # remote compile path handles; the xy half packing (2.1 GB, 2 gathers
    # per step) is the big-volume mode
    fwd = _spectral(512, 1024, spp=256, streams=1, pack_volume="xy")
    return dict(config=5,
                desc="512^3 spectral MCM 1024^2 @ 256spp (single-chip slice)",
                **fwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", type=int, default=[])
    args = ap.parse_args()

    rows = []
    for n, fn in ((2, config2), (3, config3), (5, config5)):
        if n in args.skip:
            continue
        print(f"running config {n}...", file=sys.stderr)
        try:
            rows.append(fn())
        except Exception as e:
            rows.append(dict(config=n, error=f"{type(e).__name__}: {e}"[:300]))
        print(json.dumps(rows[-1]), file=sys.stderr)

    lines = [
        "# CONFIGS — BASELINE.json capability configs, measured",
        "",
        "Produced by tools/capability_configs.py on the current device",
        "(one TPU v5e chip via tunnel). Configs 1 and 4 are CI-tested",
        "(tests/test_config1_eam_oracle.py; tests/test_spectral_inverse.py +",
        "tests/test_inverse.py on the 8-device virtual mesh). Config 5 runs",
        "the single-chip slice of the multi-host workload (one host here).",
        "",
        "```json",
    ]
    lines += [json.dumps(r) for r in rows]
    lines += ["```", ""]
    with open("CONFIGS.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote CONFIGS.md")


if __name__ == "__main__":
    main()
