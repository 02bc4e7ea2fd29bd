"""Benchmark: spectral MCM forward throughput on the current device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpaths/s/chip on the north-star workload (512^2 framebuffer,
12 spectral bins, 8 Woodcock steps per dispatch, 128^3 volume). A "path"
is one completed photon sample (the estimator's unit of work); we also
report raw Woodcock-step throughput in the detail line on stderr.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from vpt_tpu.models.mcm_spectral import MCMSpectralRenderer
    from vpt_tpu.scene.camera import Camera
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import (
        LightConfig,
        MaterialTF,
        MCMSpectralConfig,
        SpectrumConfig,
    )

    resolution = int(os.environ.get("BENCH_RES", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    volume_size = int(os.environ.get("BENCH_VOLUME", "128"))
    target_spp = int(os.environ.get("BENCH_SPP", "64"))

    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.9
    table[..., 1] = np.where(dens > 0.3, (dens - 0.3) / 0.7, 0.0)
    table[..., 2] = 0.5

    renderer = MCMSpectralRenderer(
        Volume.sphere_in_cube(volume_size),
        MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.5)),
        SpectrumConfig(),
        MCMSpectralConfig(extinction=40.0, bounces=8, steps=steps),
        resolution=resolution,
    )
    camera = Camera()

    state = renderer.reset(camera, seed=1)
    # warmup/compile
    state, img = renderer.render(state, camera, 1)
    jax.block_until_ready(img)

    # measure: dispatches until target mean spp
    spp0 = float(np.asarray(state.samples).mean())
    t0 = time.perf_counter()
    frames = 0
    while True:
        frames += 1
        state, img = renderer.render(state, camera, frames * 2654435761 % 2**32)
        if frames % 16 == 0:
            jax.block_until_ready(img)
            if float(np.asarray(state.samples).mean()) - spp0 >= target_spp:
                break
            if time.perf_counter() - t0 > 120:
                break
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    spp = float(np.asarray(state.samples).mean()) - spp0
    paths = spp * resolution * resolution
    mpaths_per_s = paths / dt / 1e6
    msteps_per_s = frames * resolution * resolution * steps / dt / 1e6

    print(
        f"# {frames} dispatches in {dt:.2f}s; {spp:.1f} spp; "
        f"{msteps_per_s:.1f} M woodcock-steps/s",
        file=sys.stderr,
    )

    baseline_file = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(baseline_file):
        try:
            base = json.load(open(baseline_file))["value"]
            vs = mpaths_per_s / base if base else 1.0
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "spectral_mcm_fwd_throughput_512x512",
                "value": round(mpaths_per_s, 3),
                "unit": "Mpaths/s/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
