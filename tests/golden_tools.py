"""Golden-image machinery: deterministic tiny renders for every renderer.

Regenerate after an *intentional* behavior change with:
    python tests/golden_tools.py regen
"""

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "goldens.npz")
RES = 16
FRAMES = 3


def render_all():
    from vpt_tpu.scene.camera import Camera, OrbitController
    from vpt_tpu.scene.tf import TransferFunction2D
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.session import RenderSession
    from vpt_tpu.utils.config import (
        EAMConfig, LightConfig, MaterialTF, MCMConfig, MCMSpectralConfig,
        SpectrumConfig,
    )

    volume = Volume.sphere_in_cube(16)
    tf_table = np.zeros((256, 256, 4), np.float32)
    tf_table[..., :3] = (0.9, 0.7, 0.5)
    tf_table[..., 3] = np.linspace(0, 1, 256)[None, :]
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: tf_table)

    cam = Camera()
    OrbitController(yaw=0.4, pitch=-0.3).apply(cam)

    sessions = {
        "mcm-spectral": ("mcm-spectral", (volume, MaterialTF.constant(0.8, 0.6, 0.2),
                          LightConfig(direction=(1.0, 0.2, 0.3)), SpectrumConfig(),
                          MCMSpectralConfig(extinction=30.0, steps=6)), {}),
        "mcm": ("mcm", (volume, tf, None, MCMConfig(extinction=30.0, steps=6)), {}),
        "mcs": ("mcs", (volume, tf, None), dict(extinction=30.0, max_collisions=16)),
        "eam": ("eam", (volume, tf, EAMConfig(extinction=150.0, slices=32)), {}),
        "mip": ("mip", (volume, tf), dict(steps=32)),
        "iso": ("iso", (volume, tf), dict(steps=32, isovalue=0.5)),
        "depth": ("depth", (volume, tf), dict(extinction=400.0, slices=32)),
        "dos": ("dos", (volume, tf), dict(steps=8, slices=16, extinction=200.0, samples=4)),
        "lao": ("lao", (volume, tf), dict(slices=16)),
    }

    out = {}
    for name, (key, args, kw) in sessions.items():
        s = RenderSession(key, *args, camera=cam, base_seed=7,
                          resolution=RES, **kw)
        s.run(FRAMES)
        out[name] = s.hdr_image()
    return out


def main():
    import sys

    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        np.savez_compressed(GOLDEN_PATH, **render_all())
        print(f"wrote {GOLDEN_PATH}")
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
