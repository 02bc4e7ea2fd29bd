"""Color-space mixin parity tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from vpt_tpu.postprocess import color


def test_rgb_xyz_round_trip():
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(50, 3)).astype(np.float32))
    back = color.xyz2rgb(color.rgb2xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=2e-4)


def test_white_point():
    xyz = np.asarray(color.rgb2xyz(jnp.ones((1, 3))))
    # ITU matrix rows sum to the D65 white point
    np.testing.assert_allclose(xyz[0], [0.950456, 1.000000, 1.088754], atol=1e-5)


@pytest.mark.parametrize("standard", ["bt601", "bt709"])
def test_yuv_round_trip(standard):
    rgb = jnp.asarray(np.random.default_rng(1).uniform(size=(50, 3)).astype(np.float32))
    back = color.yuv2rgb(color.rgb2yuv(rgb, standard), standard)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=5e-3)


def test_yuv_gray_has_zero_chroma():
    gray = jnp.full((1, 3), 0.5)
    yuv = np.asarray(color.rgb2yuv(gray))
    assert yuv[0, 0] == pytest.approx(0.5, abs=1e-5)
    np.testing.assert_allclose(yuv[0, 1:], 0.0, atol=1e-5)


def test_xyY_round_trip():
    xyz = jnp.asarray(np.random.default_rng(2).uniform(0.1, 1.0, size=(20, 3)).astype(np.float32))
    back = color.xyY2xyz(color.xyz2xyY(xyz))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xyz), rtol=1e-5)


def test_hue_ramp_endpoints():
    h = np.asarray(color.hue(jnp.asarray([0.0, 1 / 3, 2 / 3, 1.0])))
    assert h.shape == (4, 4)
    np.testing.assert_allclose(h[:, 3], 1.0)
    # x=0: (1-r, g, b) = (1, 0, 0) red
    np.testing.assert_allclose(h[0, :3], [1, 0, 0], atol=1e-6)
    # x=1/3: green channel at its plateau
    assert h[1, 1] == pytest.approx(1.0, abs=1e-6)
