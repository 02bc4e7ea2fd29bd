"""Color-science unit tests vs the reference's oracles (Spectrum.js and the
spectral-coefficient averaging in WebGPUMCMSpectralComputeRenderer.js)."""

import numpy as np
import pytest

from vpt_tpu.ops import spectral


def test_cie_table_shape_and_landmarks():
    lams, X, Y, Z = spectral.cie_1931()
    assert len(lams) == 471 and lams[0] == 360 and lams[-1] == 830
    # y-bar peaks at 555nm with value 1.0 (CIE 1931 definition)
    assert lams[np.argmax(Y)] == 555
    assert Y.max() == pytest.approx(1.0, abs=1e-7)
    # x-bar has its secondary blue lobe near 442nm
    assert abs(lams[np.argmax(X[:120])] - 442) <= 3


def test_xyz_to_rgb_white_point():
    # D65 white: XYZ ~ (0.9505, 1.0, 1.089) -> RGB ~ (1,1,1)
    rgb = spectral.xyz_to_rgb(np.array([0.9505, 1.0, 1.089]))
    assert np.allclose(rgb, 1.0, atol=2e-3)


def test_xyz_to_rgb_gamma_and_clamp():
    assert np.all(spectral.xyz_to_rgb(np.zeros(3)) == 0)
    # pure green-ish XYZ should clamp into gamut
    rgb = spectral.xyz_to_rgb(np.array([0.0, 1.0, 0.0]))
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_bin_coefficients_12_uniform():
    bounds = np.array([400 + 25 * i for i in range(13)], float)
    x, y, z = spectral.bin_coefficients(bounds)
    assert x.shape == (12,)
    # each coefficient is a mean of CIE samples -> bounded by curve extrema
    lams, X, Y, Z = spectral.cie_1931()
    sel = (lams >= 400) & (lams < 700)
    assert x.max() <= X[sel].max() + 1e-12 and x.min() >= X[sel].min() - 1e-12
    # y coefficients integrate (weighted by bin width 25) close to the
    # integral of y-bar over [400, 700)
    approx = (y * 25).sum()
    exact = Y[sel].sum()
    assert approx == pytest.approx(exact, rel=0.02)


def test_bin_coefficients_match_scan_semantics():
    """Re-derive with a plain histogram and compare — guards the running-bin
    scan against off-by-one drift."""
    bounds = np.array([400, 450, 520, 700], float)
    x, y, z = spectral.bin_coefficients(bounds)
    lams, X, Y, Z = spectral.cie_1931()
    for b in range(3):
        sel = (lams >= bounds[b]) & (lams < bounds[b + 1])
        assert x[b] == pytest.approx(X[sel].mean(), rel=1e-12)
        assert y[b] == pytest.approx(Y[sel].mean(), rel=1e-12)
        assert z[b] == pytest.approx(Z[sel].mean(), rel=1e-12)


def test_spectrum_representation_buffer_layout():
    bounds = [400.0 + 25 * i for i in range(13)]
    buf = spectral.spectrum_representation_buffer(np.array(bounds))
    assert buf.shape == (64,) and buf.dtype == np.float32
    assert buf[0] == 12
    assert np.allclose(buf[1:14], bounds)
    x, y, z = spectral.bin_coefficients(np.array(bounds))
    assert np.allclose(buf[14:26], x, rtol=1e-6)
    assert np.allclose(buf[26:38], y, rtol=1e-6)
    assert np.allclose(buf[38:50], z, rtol=1e-6)
    assert np.all(buf[50:] == 0)


def test_flat_spectrum_is_neutral():
    """A flat emission spectrum should produce near-neutral chromaticity when
    integrated (sanity check of spectrum_to_rgb plumbing)."""
    rgb = spectral.spectrum_to_rgb(np.full(256, 128.0), 400, 700)
    assert rgb.max() <= 1.0
    # not asserting equality — equal-energy white is not sRGB white
    assert rgb.std() < 0.25
