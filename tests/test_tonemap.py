"""Tone-mapper parity tests: fixed-point values transcribed from the
reference curves + shared invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from vpt_tpu.postprocess import tonemap

ALL_KEYS = [
    "artistic", "range", "reinhard", "reinhard2", "uncharted2",
    "filmic", "unreal", "aces", "lottes", "uchimura",
]


def test_registry_complete():
    assert sorted(tonemap.TONEMAPPERS) == sorted(ALL_KEYS)
    with pytest.raises(ValueError):
        tonemap.make_tonemapper("nope")


@pytest.mark.parametrize("key", ALL_KEYS)
def test_output_range_and_monotonicity(key):
    fn = tonemap.make_tonemapper(key)
    x = jnp.linspace(0.0, 20.0, 256)[:, None] * jnp.ones((1, 3))
    y = np.asarray(fn(x))
    assert np.isfinite(y).all()
    assert y.min() >= 0.0 and y.max() <= 1.0 + 1e-6
    # monotone non-decreasing in input luminance
    assert np.all(np.diff(y[:, 0]) >= -1e-5)


def _f32(v):
    return np.float32(v)


def test_reinhard_values():
    fn = tonemap.make_tonemapper("reinhard")
    # reinhard(1.0) = 0.5; with gamma 2.2 -> 0.5^(1/2.2)
    y = float(np.asarray(fn(jnp.full((1, 3), 1.0)))[0, 0])
    assert y == pytest.approx(0.5 ** (1 / 2.2), rel=1e-5)


def test_aces_values():
    fn = tonemap.make_tonemapper("aces")
    x = 0.5
    curve = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
    y = float(np.asarray(fn(jnp.full((1, 3), 0.5), gamma=1.0))[0, 0])
    assert y == pytest.approx(min(curve, 1.0), rel=1e-5)


def test_unreal_values():
    fn = tonemap.make_tonemapper("unreal")
    x = 0.3
    y = float(np.asarray(fn(jnp.full((1, 3), x), gamma=1.0))[0, 0])
    assert y == pytest.approx(x / (x + 0.155) * 1.019, rel=1e-5)


def test_uncharted2_white_maps_near_one():
    fn = tonemap.make_tonemapper("uncharted2")
    y = float(np.asarray(fn(jnp.full((1, 3), 11.2 / 2), gamma=1.0))[0, 0])
    # at W/exposureBias the whiteScale normalization gives exactly 1.0
    assert y == pytest.approx(1.0, rel=1e-4)


def test_range_mapper():
    fn = tonemap.make_tonemapper("range")
    y = np.asarray(fn(jnp.full((1, 3), 0.5), minimum=0.0, maximum=1.0, gamma=1.0))
    assert y[0, 0] == pytest.approx(0.5)
    y = np.asarray(fn(jnp.full((1, 3), 2.0), minimum=0.0, maximum=4.0, gamma=1.0))
    assert y[0, 0] == pytest.approx(0.5)


def test_artistic_curve_values():
    """The reference formula: exponent = -log(midpoint)/log 2, applied as
    c^(exponent/gamma). Only mid == 0.5 anchors to 0.5 exactly."""
    fn = tonemap.make_tonemapper("artistic")
    y = np.asarray(fn(jnp.full((1, 3), 0.5), low=0.0, mid=0.5, high=1.0,
                      saturation=1.0, gamma=1.0))
    assert y[0, 0] == pytest.approx(0.5, rel=1e-5)
    y = np.asarray(fn(jnp.full((1, 3), 0.4), low=0.0, mid=0.4, high=1.0,
                      saturation=1.0, gamma=1.0))
    expo = -np.log(0.4) / np.log(2.0)
    assert y[0, 0] == pytest.approx(0.4 ** expo, rel=1e-5)


def test_artistic_saturation_zero_is_gray():
    fn = tonemap.make_tonemapper("artistic")
    rgb = jnp.asarray([[0.9, 0.2, 0.1]])
    y = np.asarray(fn(rgb, saturation=0.0, gamma=1.0))
    assert y[0, 0] == pytest.approx(y[0, 1], abs=1e-6)
    assert y[0, 1] == pytest.approx(y[0, 2], abs=1e-6)


def test_uchimura_linear_section():
    """Inside the linear section [m, m+l0] the curve is m + a(x - m)."""
    fn = tonemap.make_tonemapper("uchimura")
    x = 0.4  # m=0.22, l0=(1-0.22)*0.4 = 0.312 -> linear up to 0.532
    y = float(np.asarray(fn(jnp.full((1, 3), x), gamma=1.0))[0, 0])
    assert y == pytest.approx(0.22 + 1.0 * (x - 0.22), rel=1e-4)


def test_filmic_zero_black():
    fn = tonemap.make_tonemapper("filmic")
    assert float(np.asarray(fn(jnp.zeros((1, 3))))[0, 0]) == 0.0
