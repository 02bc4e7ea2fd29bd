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
    # Three tiers (tools/mcs_profile.py + ARCHITECTURE.md "MCS"):
    #   mcs            — reference-exact frame loops (every frame gated on
    #                    the slowest lane's collision chain: per-lane mean
    #                    12.5 trips vs max 57 measured)
    #   mcs_majorant   — same loops with super-voxel majorants (halves the
    #                    trips; the frame gate still dominates)
    #   mcs_persistent — the TPU-idiomatic persistent-lane megakernel
    #                    (streams=4 + majorants): zero straggler wait,
    #                    statistically identical converged image
    # All tiers use the FRUSTUM-FILLING camera (z=1.2, same rationale as
    # config_sparse): at the default z=2 pose ~2/3 of rays miss the cube
    # and persistent miss lanes complete cheap env deposits every few
    # steps, inflating Mrays/s vs the frame tiers (ADVICE r3).
    mcs_cam = Camera(translation=np.array([0.0, 0.0, 1.2]))
    for label, maj in (("mcs", None), ("mcs_majorant", 8)):
        r2 = MCSRenderer(vol, extinction=50.0, resolution=512,
                         majorant_blocks=maj)
        state = r2.reset(mcs_cam, 0)
        state, img = r2.render_many(state, mcs_cam, [1])  # compile
        _sync(img)
        t0 = time.perf_counter()
        state, img = r2.render_many(
            state, mcs_cam,
            [(f + 2) * 2654435761 % 2**32 for f in range(spp)])
        _sync(img)
        dt = time.perf_counter() - t0
        mdn = np.asarray(img)
        out.update({
            f"{label}_seconds": round(dt, 3),
            f"{label}_mrays_per_s": round(spp * 512 * 512 / dt / 1e6, 2),
            f"{label}_finite": bool(np.isfinite(mdn).all()),
            f"{label}_mean": float(mdn.mean()),
        })

    # persistent tiers: EXACTLY the tier set ARCHITECTURE.md's "MCS
    # persistent speed-of-light accounting" discusses, measured by the SAME
    # function (tools/mcs_profile.persistent_accounting — one source of
    # truth; VERDICT r4 #8 flagged that the old single mcs_persistent field
    # was ambiguous between these two tiers). Field names state the
    # majorant mode and stream count explicitly.
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mcs_profile import persistent_accounting

    out["mcs_camera"] = "frustum-filling z=1.2 (all mcs_* tiers)"
    for label, maj in (("mcs_persistent_exact_streams4", None),
                       ("mcs_persistent_majorant8_streams4", 8)):
        acc = persistent_accounting(512, 50.0, maj, steps=8, streams=4)
        out.update({f"{label}_{k}": v for k, v in acc.items()})
    return out


def _spectral(volume_size, resolution, spp, steps=8, streams=4, grads=False,
              pack_volume=True):
    # pack_volume: True = full 8x corner table; "xy" = 4x half packing
    # (2 gathers/step — the big-volume mode); False = raw grid (8 gathers)
    import jax
    import jax.numpy as jnp

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
    renderer = M.MCMSpectralRenderer(
        Volume.sphere_in_cube(volume_size), MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)), SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=steps),
        resolution=resolution, streams=streams,
        pack_tables=(
            {"material_tf", "light_spectrum"}
            | ({"density_xy"} if pack_volume == "xy" else set())
            if pack_volume is not True
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
        # the canonical config-3 gradient path: hand-derived packed-adjoint
        # backward, density-only, scan-batched (prb_render_and_grads_many).
        # Measured at the exact estimator (stride 1) AND the production
        # stride-4 thinned estimator (unbiased, ~4x fewer scatter indices;
        # the optimizer-grade estimator per CONFIGS.md "stride convergence")
        # — the split shows where the 256^3 (544 MB adjoint) scatter tier
        # sits.
        from vpt_tpu.kernels.spectral_backward import prb_render_and_grads_many

        g_img = jnp.ones((resolution, resolution, 3), jnp.float32)
        wrt = frozenset({"density"})
        n = max(4, spp // (steps * streams))
        for label, stride in (("grad_stride4", 4), ("grad_stride8", 8),
                              ("grad_stride1", 1)):
            def window(st, lo):
                # warm and timed calls use the SAME window size K=n — a
                # different K is a different jitted program, and warming
                # with K=1 put a fresh remote compile inside the timed
                # region (measured 3.6 "Mpaths/s" vs the real 16.3 at
                # 256^3 stride 4 — tools/grad256_profile.py)
                seeds = jnp.asarray(
                    [(lo + k) * 2654435761 % 2**32 for k in range(n)],
                    jnp.uint32)
                return prb_render_and_grads_many(
                    st, ctx, seeds, g_img, steps, 12, wrt=wrt,
                    scatter_stride=stride)
            st = renderer.reset(cam, 1)
            st, img, g = window(st, 2)
            _sync(g["density"])
            s0 = _sync(st.samples)
            t0 = time.perf_counter()
            st, img, g = window(st, n + 2)
            _sync(g["density"])
            dt = time.perf_counter() - t0
            paths = _sync(st.samples) - s0
            out.update({
                f"{label}_dispatches": n,
                f"{label}_seconds": round(dt, 3),
                f"{label}_mpaths_per_s": round(paths / dt / 1e6, 2),
                f"{label}_finite":
                    bool(np.isfinite(np.asarray(g["density"])).all()),
                f"{label}_norm": float(jnp.linalg.norm(g["density"])),
            })
        out["grad_dispatches"] = n
        # the canonical config-3 grad rate = the production stride-4
        # estimator; the per-stride fields above carry each measurement
        out["grad_mpaths_per_s"] = out["grad_stride4_mpaths_per_s"]
        # the measured wall split at this size (VERDICT r2 #2): cost(k) =
        # base + scatter/k ms per window, solved from the stride pair
        t1 = out["grad_stride1_seconds"]
        t4 = out["grad_stride4_seconds"]
        scatter = (t1 - t4) / 0.75
        out["grad_wall_split"] = dict(
            window_ms_base=round((t1 - scatter) * 1000, 1),
            window_ms_scatter_stride1=round(scatter * 1000, 1))
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
    # two big-volume representations (round 4): the xy half packing
    # (f32 2.1 GB -> u8 540 MB, 2 gathers/step) vs the FULL 8-wide corner
    # table, which only fits HBM because auto-u8 quarters it
    # (f32 4.3 GB -> u8 1.08 GB, 1 gather/step). Both bit-exact for the
    # u8-quantized source volume.
    fwd = _spectral(512, 1024, spp=256, streams=1, pack_volume="xy")
    out = dict(config=5,
               desc="512^3 spectral MCM 1024^2 @ 256spp (single-chip slice)",
               **fwd)
    try:
        full = _spectral(512, 1024, spp=256, streams=1, pack_volume=True)
        out.update({f"full_u8_{k}": v for k, v in full.items()
                    if k in ("seconds", "mpaths_per_s", "spp_measured",
                             "image_finite")})
    except Exception as e:
        out["full_u8_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def config_sparse():
    """The majorant mode's capability scene (VERDICT r2 #4): 512^3 at ~0.2%
    occupancy — a few small dense spheres in empty space. In this regime
    paths delta-track their way across near-empty space at the global rate
    (steps-per-path ~ extinction * path length), so the per-cell
    (majorant, validity-range) table (ops/majorant) wins big.

    The camera FILLS the frustum with the cube (translation z=1.2): with
    the default z=2 pose ~2/3 of pixels never intersect the volume, and
    those miss lanes complete a trivial one-step "path" every step
    (reference-faithful: oob -> deposit light -> respawn), so Mpaths/s
    measures miss-lane churn, not transport — the majorant mode measured
    as a LOSS on the sparse scene until the frustum was filled (0.72x ->
    5x, ARCHITECTURE.md "what Mpaths/s counts")."""
    import jax.numpy as jnp

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
    vol = Volume.sparse_spheres(512)
    occupancy = float((np.asarray(vol.density) > 0).mean())

    out = dict(config="sparse",
               desc="512^3 sparse scene (~{:.2%} occupancy) 512^2 "
                    "frustum-filling camera, exact vs super-voxel "
                    "majorant".format(occupancy))

    def run(maj, seed_base, timed=True):
        r = M.MCMSpectralRenderer(
            vol, MaterialTF(table), LightConfig(direction=(1.0, 0.2, 0.5)),
            SpectrumConfig(),
            MCMSpectralConfig(extinction=40.0, bounces=8, steps=8),
            resolution=512, streams=4,
            pack_tables={"density_xy", "material_tf", "light_spectrum"},
            majorant_blocks=maj,
        )
        cam = Camera(translation=np.array([0.0, 0.0, 1.2]))
        ctx = r.ctx(cam, 1)
        state = r.reset(cam, 1)
        batch = 16
        seeds = lambda lo: jnp.asarray(
            [(seed_base + lo + k) * 2654435761 % 2**32 for k in range(batch)],
            jnp.uint32)
        state, img = M.render_many(state, ctx, seeds(0), steps=8, n_bins=12)
        s0 = _sync(state.samples)
        t0 = time.perf_counter()
        for rr in range(3):
            state, img = M.render_many(state, ctx, seeds((rr + 1) * batch),
                                       steps=8, n_bins=12)
        paths = _sync(state.samples) - s0
        dt = time.perf_counter() - t0
        return np.asarray(img), paths / dt / 1e6

    img_exact, mp_exact = run(None, 0)
    img_major, mp_major = run(16, 0)
    # per-pixel parity (VERDICT r3 weak #4): relative L1 of the majorant
    # image vs the exact image at MATCHED dispatch count, judged against
    # the exact path's own seed-to-seed noise floor at the same count —
    # a scalar mean-of-means would pass with badly wrong spatial structure
    img_exact_b, _ = run(None, 10_000)
    norm = max(float(np.abs(img_exact).mean()), 1e-9)
    rel_l1 = float(np.abs(img_exact - img_major).mean()) / norm
    floor = float(np.abs(img_exact - img_exact_b).mean()) / norm
    out["exact_mpaths_per_s"] = round(mp_exact, 2)
    out["majorant_mpaths_per_s"] = round(mp_major, 2)
    out["exact_finite"] = bool(np.isfinite(img_exact).all())
    out["majorant_finite"] = bool(np.isfinite(img_major).all())
    out["speedup"] = round(mp_major / max(mp_exact, 1e-9), 2)
    out["pixel_rel_l1_vs_exact"] = round(rel_l1, 4)
    out["pixel_rel_l1_noise_floor"] = round(floor, 4)
    out["pixel_parity_ok"] = bool(rel_l1 < 2.0 * floor + 1e-3)
    return out


def scaling_virtual8():
    """Run the scaling harness (weak-scaling sweep + collective
    microbenchmark, parallel/scaling.py) on the virtual 8-device CPU mesh
    in a subprocess — the same harness a real pod sweep uses; these numbers
    validate the harness and the sharded program, NOT ICI bandwidth (the
    8 'devices' share one CPU host)."""
    import os
    import subprocess

    code = (
        "import jax; jax.config.update('jax_platforms','cpu');\n"
        "import json;\n"
        "from vpt_tpu.parallel.scaling import scaling_sweep, collective_microbench;\n"
        "from vpt_tpu.parallel.mesh import ray_mesh;\n"
        "rows = scaling_sweep(device_counts=[1,2,4,8], rows_per_device=64,"
        " width=128, volume_size=32, steps=8, dispatches=8, verbose=False);\n"
        "mb = collective_microbench(ray_mesh(8), size_mb=32.0);\n"
        "print(json.dumps(dict(sweep=rows, microbench=mb)))\n"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900)
    data = json.loads(out.stdout.strip().splitlines()[-1])
    return dict(config="scaling-virtual8", desc="scaling harness on the "
                "virtual 8-device CPU mesh (harness validation, not ICI)",
                **data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", nargs="*", type=int, default=[])
    args = ap.parse_args()

    rows = []
    for n, fn in ((2, config2), (3, config3), (5, config5),
                  ("sparse", config_sparse), ("scaling", scaling_virtual8)):
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
        "tests/test_inverse.py on the 8-device virtual mesh). Config 3's",
        "gradient correctness is pinned by central finite differences with",
        "common random numbers (tests/test_grad_fd.py: EAM pixel gradients",
        "vs FD of the jitted forward AND the NumPy oracle; spectral MCM",
        "directional derivatives for density voxels / TF texels / extinction",
        "for both the autodiff surrogate and the hand-derived backward).",
        "Config 2 follows the BASELINE wording (single-scatter = RGB MCM,",
        "Woodcock + HG, bounces=1); MCS — the reference's dedicated",
        "single-scatter renderer with a fixed per-frame scatter direction and",
        "no phase function — is reported alongside as mcs_* fields. Config 5",
        "runs the single-chip slice of the multi-host workload (one host",
        "here). The scaling-virtual8 row executes the pod-sweep harness",
        "(parallel/scaling.py) on the virtual 8-device CPU mesh — it",
        "validates the harness and the sharded program, not ICI bandwidth.",
        "",
        "```json",
    ]
    lines += [json.dumps(r) for r in rows]
    lines += ["```", ""]
    lines += _stride_convergence_section()
    with open("CONFIGS.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote CONFIGS.md")


def _stride_convergence_section():
    """Render the config-4 stride-convergence evidence (the BENCH headline
    promotion rationale) from tools/convergence_stride*.json: the primary
    study plus the scene/seed replicates (VERDICT r3 #4)."""
    import glob
    import os

    here = os.path.dirname(__file__)
    primary = os.path.join(here, "convergence_stride.json")
    if not os.path.exists(primary):
        return []
    replicates = sorted(
        p for p in glob.glob(os.path.join(here, "convergence_stride_*.json")))

    lines = [
        "## Stride convergence (config 4) — the BENCH headline evidence",
        "",
        "tools/convergence_stride.py: density recovery from a smoothed init,",
        "same targets and per-iteration seeds for every method within a",
        "study. The decisive metric is a fixed-seed EVAL loss (off the",
        "optimizer clock, deterministic given params). autodiff =",
        "REINFORCE-surrogate autodiff; prb-sK = packed-adjoint window PRB at",
        "scatter_stride K. One table per (scene, seed) study; the primary",
        "study plus replicates across a second scene and extra seeds.",
        "",
    ]
    for path in [primary] + replicates:
        data = json.load(open(path))
        rows = data["curves"]
        floor = min(min(r["eval_loss"]) for r in rows)
        init_eval = rows[0]["init_eval_loss"]
        cfg = data["config"]
        scene = cfg.get("scene", "sphere_in_cube")
        seed = cfg.get("seed", 7)
        lines += [
            f"### {scene} seed {seed} ({cfg['volume']}^3, {cfg['res']}^2, "
            f"{cfg['dispatches']} dispatches/step, {cfg['iters']} iters, "
            f"lr {cfg['lr']}, init smoothing {cfg.get('init_factor', 8)})",
            "",
            "| method | s/iter | final eval loss | t to 0.5x gap | 0.25x "
            "| 0.1x |",
            "|---|---|---|---|---|---|",
        ]
        for r in rows:
            t_iter = r["times"][-1] / len(r["times"])
            cells = []
            for frac in (0.5, 0.25, 0.1):
                thresh = floor + (init_eval - floor) * frac
                hit = next((t for t, m in zip(r["times"], r["eval_loss"])
                            if m <= thresh), None)
                cells.append(f"{hit:.1f}s" if hit is not None else "never")
            lines.append(
                f"| {r['method']} | {t_iter:.2f} | {r['eval_loss'][-1]:.6f} "
                "| " + " | ".join(cells) + " |")
        lines += [
            "",
            f"Init eval loss {init_eval:.6f}; floor (best any method "
            f"reached) {floor:.6f}. Raw curves: tools/{os.path.basename(path)}.",
            "",
        ]
    lines += [
        "Verdict (r5; supersedes the r4 fixed-stride guidance): the",
        "thinning trade is SCENE-DEPENDENT, and the estimator now adapts.",
        "Dense-gradient recoveries (sphere_in_cube, both seeds): uniform",
        "stride 4 — and even 8 — reaches every threshold fastest (gradient",
        "noise is MC-dominated, the k-fold table-grad variance nearly",
        "free); stride 8 is unreliable at the deepest threshold. On the",
        "sparse-live-voxel recovery (two_spheres, 16x-smoothed init, ~3%",
        "of voxels in the TF's live zone) uniform strides 4/8 STALL — but",
        "IMPORTANCE thinning at the same index budget (prb-i4: per-lane",
        "step selection proportional to the actual per-table scatter",
        "magnitude, kernels/spectral_backward._importance_scatter) beats",
        "even the exact stride 1 by ~1.6x wall-clock at every threshold.",
        "The shipped default is scatter_stride='auto'",
        "(optim.auto_initial_policy): a live-gradient-fraction probe",
        "routes broad-support problems to stride:4 and concentrated-",
        "support problems to importance:4, with a fixed-seed eval-loss",
        "stall detector annealing to the exact stride 1 as the safety",
        "net; the 'auto' rows measure that policy with its probe and",
        "on-clock policy evals included. Wall-clock outliers from the",
        "shared-tunnel device are possible on any single row; the s/iter",
        "column is the robust comparison.",
        "",
    ]
    return lines


if __name__ == "__main__":
    main()
