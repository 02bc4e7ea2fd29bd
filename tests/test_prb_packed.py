"""Packed-adjoint backward vs the raw-table replay backward.

Both paths are the SAME estimator (identical forward RNG consumption and
identical per-event analytic terms); only the scatter addressing differs
(packed corner rows + dense pack transposes vs raw-texel scatters). Per
seed the raw-table gradients must therefore agree to float rounding.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vpt_tpu.kernels.spectral_backward import prb_render_and_grads
from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)

RES = 16
STEPS = 8


def _renderers(volume, streams=1, big_volume=False):
    """(raw, packed) renderer pair over the same scene."""
    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.7
    table[..., 1] = 0.1 + 0.8 * dens
    table[..., 2] = 0.3 + 0.4 * dens
    mat = MaterialTF(table)
    light = LightConfig(direction=(0.6, 0.3, 0.2))
    cfg = MCMSpectralConfig(extinction=6.0, bounces=4, steps=STEPS)
    kw = dict(resolution=RES, streams=streams)
    raw = M.MCMSpectralRenderer(volume, mat, light, SpectrumConfig(), cfg,
                                pack_tables=False, **kw)
    pack = (
        {"density_xy", "material_tf", "light_spectrum"} if big_volume else True
    )
    packed = M.MCMSpectralRenderer(volume, mat, light, SpectrumConfig(), cfg,
                                   pack_tables=pack, **kw)
    return raw, packed


def _grads(r, seed, g_img):
    cam = Camera()
    ctx = r.ctx(cam, seed)
    s0 = r.reset(cam, seed)
    state, img, grads = prb_render_and_grads(s0, ctx, g_img, STEPS, 12)
    return np.asarray(img), {k: np.asarray(v) for k, v in grads.items()}


@pytest.mark.parametrize("streams", [1, 2])
def test_packed_matches_raw_per_seed(streams):
    raw, packed = _renderers(Volume.sphere_in_cube(16), streams=streams)
    g_img = jnp.ones((RES, RES, 3))
    img_r, g_r = _grads(raw, 5, g_img)
    img_p, g_p = _grads(packed, 5, g_img)
    np.testing.assert_array_equal(img_r, img_p)  # forward bit-identical
    for k in ("density", "material_tf", "light_spectrum", "extinction"):
        a, b = g_r[k], g_p[k]
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=k)
        assert np.abs(a).sum() > 0, f"{k} gradient is non-trivial"


def test_xy_packed_matches_raw():
    """The big-volume (xy half-packed) mode gets the same gradients."""
    raw, packed = _renderers(Volume.sphere_in_cube(16), big_volume=True)
    g_img = jnp.ones((RES, RES, 3))
    img_r, g_r = _grads(raw, 9, g_img)
    img_p, g_p = _grads(packed, 9, g_img)
    np.testing.assert_array_equal(img_r, img_p)
    for k in ("density", "material_tf", "light_spectrum", "extinction"):
        a, b = g_r[k], g_p[k]
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5,
                                   err_msg=k)


def test_wrt_subsets():
    """wrt restricts the returned grads; values match the full run."""
    _, packed = _renderers(Volume.sphere_in_cube(16))
    g_img = jnp.ones((RES, RES, 3))
    cam = Camera()
    ctx = packed.ctx(cam, 7)
    s0 = packed.reset(cam, 7)
    _, _, g_all = prb_render_and_grads(s0, ctx, g_img, STEPS, 12)
    _, _, g_d = prb_render_and_grads(packed.reset(cam, 7), ctx, g_img,
                                     STEPS, 12, wrt=frozenset({"density"}))
    assert set(g_d) == {"density"}
    np.testing.assert_allclose(np.asarray(g_d["density"]),
                               np.asarray(g_all["density"]), rtol=1e-6)
    _, _, g_t = prb_render_and_grads(
        packed.reset(cam, 7), ctx, g_img, STEPS, 12,
        wrt=frozenset({"material_tf", "light_spectrum"}))
    assert set(g_t) == {"material_tf", "light_spectrum"}
    np.testing.assert_allclose(np.asarray(g_t["material_tf"]),
                               np.asarray(g_all["material_tf"]), rtol=1e-6)


def test_scatter_stride_partition_identity():
    """stride-k thinning at a FIXED seed: the k phase gradients partition
    the steps, so their average equals the exact gradient identically —
    pinning unbiasedness without statistics."""
    _, packed = _renderers(Volume.sphere_in_cube(16))
    g_img = jnp.ones((RES, RES, 3))
    cam = Camera()
    k = 4
    ctx = packed.ctx(cam, 7)
    _, _, g_e = prb_render_and_grads(packed.reset(cam, 7), ctx, g_img,
                                     STEPS, 12, wrt=frozenset({"density"}))
    exact = np.asarray(g_e["density"])
    acc = np.zeros_like(exact)
    for phase in range(k):
        _, _, g_s = prb_render_and_grads(
            packed.reset(cam, 7), ctx, g_img, STEPS, 12,
            wrt=frozenset({"density"}), scatter_stride=k,
            scatter_phase=phase)
        acc += np.asarray(g_s["density"]) / k
    scale = max(np.abs(exact).max(), 1e-6)
    np.testing.assert_allclose(acc / scale, exact / scale, atol=1e-5)
    assert np.abs(exact).sum() > 0


def test_rejects_half_packed_ctx():
    """TF packed but volume raw (or vice versa) is an explicit error, not a
    silent wrong answer."""
    vol = Volume.sphere_in_cube(16)
    r = M.MCMSpectralRenderer(
        vol, MaterialTF.constant(0.5, 0.5), LightConfig(), SpectrumConfig(),
        MCMSpectralConfig(extinction=4.0, steps=STEPS), resolution=RES,
        pack_tables={"material_tf", "light_spectrum"},
    )
    cam = Camera()
    ctx = r.ctx(cam, 1)
    s0 = r.reset(cam, 1)
    with pytest.raises(ValueError, match="packed"):
        prb_render_and_grads(s0, ctx, jnp.ones((RES, RES, 3)), STEPS, 12)
