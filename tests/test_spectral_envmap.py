"""Spectral environment-map mode.

The reference wrote this path but left it commented out at the escape
branch (MCMSpectralComputeRenderer.wgsl:49-60, :143-146); vpt_tpu ships it
as an opt-in. Checks: the equirect mapping + gain + 3-band wavelength ->
RGB-channel selection against a scalar oracle, and that the renderer-level
mode changes only the escape radiance (structure otherwise identical).
"""

import numpy as np
import jax.numpy as jnp

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)


def _bilinear(tex, u, v):
    H, W, _ = tex.shape

    def coords(t, n):
        s = t * n - 0.5
        i0 = int(np.floor(s))
        return np.clip(i0, 0, n - 1), np.clip(i0 + 1, 0, n - 1), s - np.floor(s)

    x0, x1, fx = coords(u, W)
    y0, y1, fy = coords(v, H)
    c0 = tex[y0, x0] + (tex[y0, x1] - tex[y0, x0]) * fx
    c1 = tex[y1, x0] + (tex[y1, x1] - tex[y1, x0]) * fx
    return c0 + (c1 - c0) * fy


def test_sample_environment_oracle():
    rng = np.random.default_rng(11)
    env = rng.uniform(size=(8, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lams = rng.uniform(400.0, 700.0, size=64).astype(np.float32)

    ctx_like = type("C", (), {})()
    ctx_like.environment = jnp.asarray(env)
    got = np.asarray(
        M._sample_environment(
            ctx_like,
            jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]),
            jnp.asarray(dirs[:, 2]), jnp.asarray(lams),
        )
    )

    for k in range(64):
        x, y, z = dirs[k]
        u = np.arctan2(x, -z) / np.pi * 0.5 + 0.5
        v = np.arcsin(-y) * 2.0 / np.pi * 0.5 + 0.5
        color = _bilinear(env, np.float32(u), np.float32(v)) * 2.7
        want = color[2] if lams[k] < 500 else (color[1] if lams[k] < 600 else color[0])
        np.testing.assert_allclose(got[k], want, rtol=1e-5)


def test_envmap_renderer_runs_and_differs():
    vol = Volume.sphere_in_cube(16)
    args = (MaterialTF.constant(0.8, 0.6), LightConfig(), SpectrumConfig(),
            MCMSpectralConfig(extinction=20.0, steps=6))
    cam = Camera()
    env = np.zeros((4, 8, 3), np.float32)
    env[..., 0] = 1.0  # red-only environment
    re = M.MCMSpectralRenderer(vol, *args, resolution=16, environment=env)
    rl = M.MCMSpectralRenderer(vol, *args, resolution=16)
    se, sl = re.reset(cam, 3), rl.reset(cam, 3)
    for f in range(4):
        se, ie = re.render(se, cam, f + 1)
        sl, il = rl.render(sl, cam, f + 1)
    ie, il = np.asarray(ie), np.asarray(il)
    assert np.all(np.isfinite(ie)) and not np.array_equal(ie, il)
    # a red-only env deposits only into bins >= 600nm: the escaped photons'
    # long-wavelength bins should carry signal while <500nm bins got zeros
    rad = np.asarray(se.radiance)  # (B, H, W)
    bounds = np.asarray(re.spectrum.boundaries)
    long_bins = rad[bounds[1:] > 600.0]
    assert long_bins.max() > 0.0


def test_envmap_packed_matches_unpacked():
    vol = Volume.sphere_in_cube(16)
    args = (MaterialTF.constant(0.8, 0.6), LightConfig(), SpectrumConfig(),
            MCMSpectralConfig(extinction=20.0, steps=6))
    cam = Camera()
    rng = np.random.default_rng(4)
    env = rng.uniform(size=(8, 16, 3)).astype(np.float32)
    rp = M.MCMSpectralRenderer(vol, *args, resolution=16, environment=env,
                               pack_tables=True)
    ru = M.MCMSpectralRenderer(vol, *args, resolution=16, environment=env,
                               pack_tables=False)
    sp, su = rp.reset(cam, 3), ru.reset(cam, 3)
    for f in range(3):
        sp, ip = rp.render(sp, cam, f + 1)
        su, iu = ru.render(su, cam, f + 1)
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(iu))
