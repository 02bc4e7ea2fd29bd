"""Packed-table gradient path: differentiating through the jnp corner
packing (ops/interp.pack_*_jnp) must give the same forward values
bit-for-bit and the same gradients (up to fp reassociation) as
differentiating the raw-table sampling directly.

This is the fast differentiable path (one row gather/scatter per sample
instead of 8 corner ones); see optim.spectral_render_loss(pack_params=True).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import interp
from vpt_tpu.optim import spectral_render_loss
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)

RES = 16


def _scene():
    rng = np.random.default_rng(3)
    vol = Volume(density=rng.uniform(0.2, 0.9, (6, 6, 6)).astype(np.float32))
    table = np.zeros((256, 256, 4), np.float32)
    table[..., 0] = 0.7
    table[..., 1] = np.linspace(0, 1, 256)[:, None]
    table[..., 2] = 0.5
    r = M.MCMSpectralRenderer(
        vol, MaterialTF(table), LightConfig(direction=(0.3, 0.2, 0.9)),
        SpectrumConfig(), MCMSpectralConfig(extinction=3.0, bounces=4, steps=6),
        resolution=RES, pack_tables=False,
    )
    cam = Camera()
    return r, r.ctx(cam, 5), r.reset(cam, 5)


def test_packed_jnp_matches_numpy_pack():
    rng = np.random.default_rng(0)
    d = rng.uniform(size=(5, 6, 7)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(interp.pack_volume_corners_jnp(jnp.asarray(d))),
        interp.pack_volume_corners(d),
    )
    t = rng.uniform(size=(8, 9, 4)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(interp.pack_tex2d_corners_jnp(jnp.asarray(t))),
        interp.pack_tex2d_corners(t),
    )
    s = rng.uniform(size=(11,)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(interp.pack_tex1d_corners_jnp(jnp.asarray(s))),
        interp.pack_tex1d_corners(s),
    )


def test_packed_loss_forward_and_grad_match_raw():
    r, ctx, s0 = _scene()
    seeds = jnp.asarray([11, 29, 47], jnp.uint32)
    target = jnp.zeros((RES, RES, 3), jnp.float32)
    params = {
        "density": ctx.density,
        "material_tf": ctx.material_tf,
        "light_spectrum": ctx.light_spectrum,
    }

    def loss(p, pack):
        return spectral_render_loss(p, s0, ctx, seeds, target, 6, 12,
                                    pack_params=pack)

    l_raw, g_raw = jax.value_and_grad(lambda p: loss(p, False))(params)
    l_pk, g_pk = jax.value_and_grad(lambda p: loss(p, True))(params)

    # forward bit-identical (packed sampling reproduces the 8-gather lerps)
    np.testing.assert_array_equal(np.asarray(l_raw), np.asarray(l_pk))

    # gradients equal up to fp reassociation of the scatter-order sums
    for k in params:
        a, b = np.asarray(g_raw[k]), np.asarray(g_pk[k])
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7, err_msg=k)
    # the density gradient must be nontrivial for the test to mean anything
    assert np.abs(np.asarray(g_raw["density"])).max() > 0
