"""Differentiable spectral MCM: forward equivalence, gradient flow, and
statistical validation against the analytic homogeneous-medium solution.

Gradient design (models/mcm_spectral._surrogate): discrete Woodcock events
carry REINFORCE weights P/stop_grad(P); continuous quantities (free-flight
distances, TF lookups, HG inversion, light lookups) differentiate pathwise.
The estimator's expectation and its gradient are exact; tests validate the
gradient statistically against closed forms.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig

RES = 16


def _renderer(alpha, albedo=0.0, bounces=0, extinction=2.0, steps=8):
    vol = Volume(density=np.full((4, 4, 4), 0.5, np.float32))
    mat = MaterialTF.constant(albedo=albedo, alpha=alpha, anisotropy_g=0.0)
    # isotropic light (zero direction) with a flat spectrum
    light = LightConfig(direction=(0.0, 0.0, 0.0))
    cfg = MCMSpectralConfig(extinction=extinction, bounces=bounces, steps=steps)
    # pack_tables=False: gradients are taken w.r.t. the raw tables
    return M.MCMSpectralRenderer(vol, mat, light, SpectrumConfig(), cfg,
                                 resolution=RES, pack_tables=False)


def test_render_diff_forward_matches_render():
    """The differentiable path must be bit-identical to the fast path."""
    r = _renderer(alpha=0.6, albedo=0.5, bounces=4)
    cam = Camera()
    ctx = r.ctx(cam, 11)
    s0 = r.reset(cam, 11)

    s1, img1 = M.render(s0, ctx, steps=8, n_bins=12, volume_filter="linear")

    s0b = r.reset(cam, 11)
    score = jnp.ones_like(s0b.px)
    s2, _, img2 = M.render_diff(s0b, score, ctx, steps=8, n_bins=12,
                                volume_filter="linear")
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(s1.px), np.asarray(s2.px))
    np.testing.assert_array_equal(np.asarray(s1.samples), np.asarray(s2.samples))


def test_gradients_flow_and_are_finite():
    r = _renderer(alpha=0.5, albedo=0.8, bounces=4)
    cam = Camera()
    s0 = r.reset(cam, 3)
    base_ctx = r.ctx(cam, 3)

    def loss(density, tf_table, light_spectrum):
        ctx = base_ctx._replace(
            density=density, material_tf=tf_table, light_spectrum=light_spectrum
        )
        score = jnp.ones_like(s0.px)
        _, _, img = M.render_diff(s0, score, ctx, steps=8, n_bins=12)
        return jnp.mean(img ** 2)

    g_d, g_tf, g_ls = jax.grad(loss, argnums=(0, 1, 2))(
        base_ctx.density, base_ctx.material_tf, base_ctx.light_spectrum
    )
    for g in (g_d, g_tf, g_ls):
        assert np.isfinite(np.asarray(g)).all()
    # the light spectrum definitely receives pathwise gradient
    assert np.abs(np.asarray(g_ls)).sum() > 0
    # the TF alpha channel receives score-function gradient
    assert np.abs(np.asarray(g_tf)[..., 1]).sum() > 0


def _mean_escape_and_grad(alpha, n_dispatches=24, steps=16, extinction=2.0, seed0=100):
    """Monte-Carlo estimate of the converged mean image and its d/dalpha,
    differentiating through the accumulated estimator."""
    r = _renderer(alpha=alpha, albedo=0.0, bounces=0,
                  extinction=extinction, steps=steps)
    cam = Camera()
    base_ctx = r.ctx(cam, seed0)
    s0 = r.reset(cam, seed0)
    seeds = jnp.asarray(
        [np.uint32((seed0 + 1 + k) * 2654435761 % 2**32) for k in range(n_dispatches)],
        jnp.uint32,
    )

    def mean_lum(alpha_scalar):
        # alpha enters through the TF table's alpha channel
        tf = base_ctx.material_tf.at[..., 1].set(alpha_scalar)
        ctx = base_ctx._replace(material_tf=tf)
        img = M.render_sequence_diff(seeds, s0, ctx, steps=steps, n_bins=12)
        return jnp.mean(img[..., 1])  # green channel ~ luminance

    f = jax.jit(jax.value_and_grad(mean_lum))
    val, grad = f(jnp.float32(alpha))
    return float(val), float(grad)


def test_alpha_gradient_matches_analytic_sign_and_scale():
    """Homogeneous absorber, no scattering: per-pixel mean = I * exp(-mu L a),
    so d(mean)/da = -mu L I exp(-mu L a) < 0. Validate sign and rough
    magnitude of the score-function gradient against the analytic ratio
    grad/value = -mu*L (L estimated from the value itself)."""
    mu = 2.0
    a = 0.5
    val, grad = _mean_escape_and_grad(a, extinction=mu)
    assert val > 0
    assert grad < 0, f"expected negative d/dalpha, got {grad}"
    # value ~ C * exp(-mu L a) averaged over pixels; effective L from value
    # requires the unattenuated intensity C: evaluate at alpha ~ 0
    val0, _ = _mean_escape_and_grad(1e-4, extinction=mu)
    L_eff = -np.log(val / val0) / (mu * a)
    analytic = -mu * L_eff * val
    assert grad == pytest.approx(analytic, rel=0.5), (
        f"grad {grad} vs analytic {analytic} (L_eff {L_eff:.3f})"
    )


def test_extinction_gradient_flows():
    r = _renderer(alpha=0.5, albedo=0.3, bounces=2)
    cam = Camera()
    base_ctx = r.ctx(cam, 7)
    s0 = r.reset(cam, 7)

    def loss(extinction):
        ctx = base_ctx._replace(extinction=extinction)
        score = jnp.ones_like(s0.px)
        _, _, img = M.render_diff(s0, score, ctx, steps=8, n_bins=12)
        return jnp.mean(img)

    g = jax.grad(loss)(jnp.float32(2.0))
    assert np.isfinite(float(g))
