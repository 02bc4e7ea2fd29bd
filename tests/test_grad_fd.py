"""Finite-difference gradient validation (BASELINE.md:33).

Two regimes:

1. EAM (deterministic ray march): pixel gradients from autodiff JVPs must
   allclose central finite differences of BOTH the jitted forward and the
   independent NumPy/CPU oracle (reference/eam_numpy.py) — the mandated
   "pixel gradients allclose vs finite differences & NumPy/CPU oracle".

2. Spectral MCM (stochastic): the estimator is Monte Carlo, so the check is
   statistical — seed-averaged directional derivatives from (a) the autodiff
   REINFORCE surrogate and (b) the hand-derived path-replay backward must
   match central finite differences of the seed-averaged image (common
   random numbers both sides) within the FD standard error, for all three
   mandated parameter classes: density voxels, TF texels, extinction.

Known (documented) support caveat exercised by test_zero_support_alpha:
score-function gradients are blind to events whose probability is exactly
zero under the sampling measure — perturbing alpha upward where alpha == 0
creates new scatter/absorb events the baseline never samples, so the
score gradient there is one-sided. The statistical tests therefore use
transfer functions with alpha in (0, 1) everywhere (full support), and the
dedicated test pins the divergence so the limitation stays visible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpt_tpu.kernels.spectral_backward import prb_render_and_grads
from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.models.raymarch import eam_frame
from vpt_tpu.reference.eam_numpy import eam_frame_numpy
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)

# ==========================================================================
# 1. EAM — deterministic, tight tolerances
# ==========================================================================
EAM_RES = 16
EAM_SLICES = 24


def _eam_scene():
    vol = Volume.sphere_in_cube(8)
    tf = np.zeros((256, 256, 4), np.float32)
    ramp = np.linspace(0, 1, 256)[None, :]
    tf[..., 0] = 0.9
    tf[..., 1] = 0.3 + 0.5 * ramp
    tf[..., 2] = 0.7
    tf[..., 3] = 0.8 * ramp  # opacity ramp: density gradients flow
    inv_mvp = jnp.asarray(Camera().inverse_mvp())
    return inv_mvp, jnp.asarray(vol.density), jnp.asarray(tf)


def _eam_forward(inv_mvp, density, tf_table):
    return eam_frame(inv_mvp, density, tf_table, jnp.float32(30.0),
                     jnp.float32(0.3), slices=EAM_SLICES, resolution=EAM_RES)


def test_eam_pixel_gradients_match_fd_and_oracle():
    """d(image)/d(voxel) pixel arrays: autodiff JVP == FD(jit) == FD(oracle)."""
    inv_mvp, density, tf_table = _eam_scene()
    base = np.asarray(_eam_forward(inv_mvp, density, tf_table))
    assert base.max() > 0.01, "scene renders something"

    # pick the 3 most influential voxels by autodiff, then validate them
    g = np.asarray(jax.grad(
        lambda d: jnp.sum(_eam_forward(inv_mvp, d, tf_table))
    )(density))
    voxels = [np.unravel_index(i, g.shape)
              for i in np.argsort(np.abs(g).ravel())[::-1][:3]]
    eps = 1e-2
    for vz, vy, vx in voxels:
        e = jnp.zeros_like(density).at[vz, vy, vx].set(1.0)
        # autodiff pixel gradient (JVP with the voxel tangent)
        _, jvp = jax.jvp(lambda d: _eam_forward(inv_mvp, d, tf_table),
                         (density,), (e,))
        jvp = np.asarray(jvp)
        # FD of the jitted forward
        ip = np.asarray(_eam_forward(inv_mvp, density + eps * e, tf_table))
        im = np.asarray(_eam_forward(inv_mvp, density - eps * e, tf_table))
        fd = (ip - im) / (2 * eps)
        scale = max(np.abs(fd).max(), 1e-4)
        assert np.abs(jvp).max() > 1e-4, "voxel has influence"
        # the image is piecewise in a voxel value (0.99 early-out, clamps);
        # pixels whose kink falls inside the FD interval show as one-sided
        # slopes disagreeing — exclude those, assert tight elsewhere
        fwd_slope = (ip - base) / eps
        bwd_slope = (base - im) / eps
        smooth = np.abs(fwd_slope - bwd_slope) < 1e-2 * scale
        assert smooth.mean() > 0.95, "most pixels are kink-free"
        np.testing.assert_allclose((jvp / scale)[smooth], (fd / scale)[smooth],
                                   atol=5e-3)
        # FD of the independent NumPy oracle
        op = eam_frame_numpy(inv_mvp, np.asarray(density + eps * e),
                             np.asarray(tf_table), 30.0, 0.3,
                             EAM_SLICES, EAM_RES)
        om = eam_frame_numpy(inv_mvp, np.asarray(density - eps * e),
                             np.asarray(tf_table), 30.0, 0.3,
                             EAM_SLICES, EAM_RES)
        fd_oracle = (op - om) / (2 * eps)
        np.testing.assert_allclose((jvp / scale)[smooth],
                                   (fd_oracle / scale)[smooth], atol=5e-3)


def test_eam_tf_texel_gradient_matches_fd():
    """Scalar loss gradient w.r.t. TF texels vs finite differences."""
    inv_mvp, density, tf_table = _eam_scene()
    cot = jnp.asarray(
        np.random.default_rng(7).uniform(0.5, 1.0, (EAM_RES, EAM_RES, 3))
        .astype(np.float32)
    )

    def loss(tf):
        return jnp.sum(_eam_forward(inv_mvp, density, tf) * cot)

    g = np.asarray(jax.grad(loss)(tf_table))
    # pick the 3 most influential texels
    flat = np.argsort(np.abs(g).ravel())[::-1][:3]
    eps = 2e-2
    for fi in flat:
        idx = np.unravel_index(fi, g.shape)
        e = jnp.zeros_like(tf_table).at[idx].set(1.0)
        lp = float(loss(tf_table + eps * e))
        lm = float(loss(tf_table - eps * e))
        fd = (lp - lm) / (2 * eps)
        assert abs(g[idx] - fd) < 2e-2 * max(abs(fd), 1e-3) + 1e-4, (
            f"texel {idx}: grad {g[idx]:.6f} vs fd {fd:.6f}"
        )


# ==========================================================================
# 2. Spectral MCM — statistical FD with common random numbers
# ==========================================================================
RES = 8
STEPS = 64
NBINS = 12
N_FD_SEEDS = 768
N_AD_SEEDS = 192
N_PRB_SEEDS = 48


@pytest.fixture(scope="module")
def spectral_ctx():
    """Full-support scene: alpha in [0.1, 0.9] everywhere (see module doc)."""
    vol = Volume.sphere_in_cube(8)
    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.7
    table[..., 1] = 0.1 + 0.8 * dens
    table[..., 2] = 0.6
    mat = MaterialTF(table)
    light = LightConfig(direction=(0.0, 0.0, 0.0))
    cfg = MCMSpectralConfig(extinction=4.0, bounces=3, steps=STEPS)
    r = M.MCMSpectralRenderer(vol, mat, light, SpectrumConfig(), cfg,
                              resolution=RES, pack_tables=False)
    return r.ctx(Camera(), 0)


def _seeds(n):
    return (jnp.arange(1, n + 1, dtype=jnp.uint32) * jnp.uint32(2654435761))


def _render_sum(ctx, seed_bits):
    c = ctx._replace(seed_bits=seed_bits)
    state = M.full_reset(c, RES, NBINS)
    _, img = M.render(state, c, steps=STEPS, n_bins=NBINS)
    return jnp.sum(img)


@jax.jit
def _per_seed_sums(ctx, seeds):
    def body(_, s):
        return None, _render_sum(ctx, s)
    _, vals = jax.lax.scan(body, None, seeds)
    return vals


@jax.jit
def _ad_grad_mean(ctx, seeds):
    def one(seed_bits):
        def loss(dens, tf, ext):
            c = ctx._replace(density=dens, material_tf=tf, extinction=ext,
                             seed_bits=seed_bits)
            s0 = M.full_reset(c, RES, NBINS)
            score = jnp.ones_like(s0.px)
            _, _, img = M.render_diff(s0, score, c, STEPS, NBINS)
            return jnp.sum(img)
        return jax.grad(loss, argnums=(0, 1, 2))(
            ctx.density, ctx.material_tf, ctx.extinction)

    def body(acc, s):
        return jax.tree.map(jnp.add, acc, one(s)), None

    z = (jnp.zeros_like(ctx.density), jnp.zeros_like(ctx.material_tf),
         jnp.float32(0.0))
    tot, _ = jax.lax.scan(body, z, seeds)
    return jax.tree.map(lambda x: x / seeds.shape[0], tot)


def _fd_directional(ctx, field, direction, eps):
    """Central FD of the seed-mean image sum along ``direction``; returns
    (estimate, standard_error) using common random numbers."""
    seeds = _seeds(N_FD_SEEDS)
    if field == "extinction":
        cp = ctx._replace(extinction=ctx.extinction + eps)
        cm = ctx._replace(extinction=ctx.extinction - eps)
    else:
        cp = ctx._replace(**{field: getattr(ctx, field) + eps * direction})
        cm = ctx._replace(**{field: getattr(ctx, field) - eps * direction})
    diffs = (np.asarray(_per_seed_sums(cp, seeds))
             - np.asarray(_per_seed_sums(cm, seeds))) / (2 * eps)
    return float(diffs.mean()), float(diffs.std() / np.sqrt(len(diffs)))


@pytest.fixture(scope="module")
def grad_means(spectral_ctx):
    ctx = spectral_ctx
    gd, gt, ge = _ad_grad_mean(ctx, _seeds(N_AD_SEEDS))
    ad = dict(density=np.asarray(gd), material_tf=np.asarray(gt),
              extinction=float(ge))
    g_img = jnp.ones((RES, RES, 3))
    acc = None
    for s in range(N_PRB_SEEDS):
        c = ctx._replace(seed_bits=jnp.uint32((s + 1) * 2654435761 % 2**32))
        s0 = M.full_reset(c, RES, NBINS)
        _, _, g = prb_render_and_grads(s0, c, g_img, STEPS, NBINS)
        g = {k: np.asarray(v) for k, v in g.items()}
        acc = g if acc is None else {k: acc[k] + g[k] for k in acc}
    prb = {k: v / N_PRB_SEEDS for k, v in acc.items()}
    return ad, prb


def _assert_close(name, fd, se, ad_val, prb_val):
    # 4-sigma FD noise + 15% estimator-variance slack (the broken estimator
    # this test exists to catch was off by ~170%, see module docstring)
    for kind, val in (("autodiff", ad_val), ("prb", prb_val)):
        tol = 4 * se + 0.15 * max(abs(fd), abs(val))
        assert abs(fd - val) < tol, (
            f"{name} [{kind}]: FD {fd:.4f}±{se:.4f} vs {val:.4f} (tol {tol:.4f})"
        )


def test_fd_extinction(spectral_ctx, grad_means):
    ad, prb = grad_means
    fd, se = _fd_directional(spectral_ctx, "extinction", None, 0.25)
    assert se < 0.5 * abs(fd) + 0.2
    _assert_close("extinction", fd, se, ad["extinction"], prb["extinction"])


def test_fd_density_voxels(spectral_ctx, grad_means):
    ad, prb = grad_means
    d = jnp.ones_like(spectral_ctx.density)
    fd, se = _fd_directional(spectral_ctx, "density", d, 0.03)
    _assert_close("density", fd, se,
                  float(ad["density"].sum()), float(prb["density"].sum()))


def test_fd_tf_alpha_texels(spectral_ctx, grad_means):
    ad, prb = grad_means
    d = jnp.zeros_like(spectral_ctx.material_tf).at[..., 1].set(1.0)
    fd, se = _fd_directional(spectral_ctx, "material_tf", d, 0.03)
    _assert_close("tf_alpha", fd, se,
                  float(ad["material_tf"][..., 1].sum()),
                  float(prb["material_tf"][..., 1].sum()))


def test_zero_support_alpha_is_one_sided(spectral_ctx):
    """Pin the documented limitation: where alpha == 0 the score gradient
    misses the probability mass flowing INTO scatter/absorb (those events
    have zero probability under the sampling measure), so FD and the score
    estimators genuinely diverge there. This test keeps the caveat visible;
    if it starts failing because they AGREE, the estimator gained support
    handling and the docs should be updated."""
    vol = Volume.sphere_in_cube(8)
    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.7
    table[..., 1] = np.clip((dens - 0.2) / 0.8, 0.0, 0.9)  # exact zeros
    table[..., 2] = 0.6
    cfg = MCMSpectralConfig(extinction=4.0, bounces=3, steps=STEPS)
    r = M.MCMSpectralRenderer(vol, MaterialTF(table),
                              LightConfig(direction=(0.0, 0.0, 0.0)),
                              SpectrumConfig(), cfg,
                              resolution=RES, pack_tables=False)
    ctx = r.ctx(Camera(), 0)
    d = jnp.zeros_like(ctx.material_tf).at[..., 1].set(1.0)
    fd, se = _fd_directional(ctx, "material_tf", d, 0.03)
    gd, gt, ge = _ad_grad_mean(ctx, _seeds(N_AD_SEEDS))
    ad = float(np.asarray(gt)[..., 1].sum())
    # score gradient overestimates the magnitude (misses the positive
    # scatter-growth term); measured ~3-4x in this scene
    assert abs(ad) > 2.0 * abs(fd) + 4 * se, (
        f"expected documented divergence, got FD {fd:.2f}±{se:.2f} vs AD {ad:.2f}"
    )


def test_environment_texel_gradients_match_fd_exactly():
    """Env-map escape gradients (packed PRB): the image is LINEAR in env
    texel values (deposits scale the equirect lookup; no event probability
    depends on env), so central FD with common random numbers equals the
    directional derivative to float rounding — per seed, no statistics."""
    from vpt_tpu.ops import interp

    vol = Volume.sphere_in_cube(8)
    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.7
    table[..., 1] = 0.1 + 0.8 * dens
    table[..., 2] = 0.6
    rng = np.random.default_rng(5)
    env = rng.uniform(0.2, 1.0, (6, 12, 3)).astype(np.float32)
    r = M.MCMSpectralRenderer(
        Volume(density=np.asarray(vol.density)), MaterialTF(table),
        LightConfig(direction=(0.0, 0.0, 0.0)), SpectrumConfig(),
        MCMSpectralConfig(extinction=4.0, bounces=3, steps=16),
        resolution=RES, pack_tables=True, environment=env)
    cam = Camera()
    direction = rng.normal(size=env.shape).astype(np.float32)

    for seed in (3, 41):
        ctx = r.ctx(cam, seed)
        s0 = r.reset(cam, seed)
        g_img = jnp.ones((RES, RES, 3))
        _, _, g = prb_render_and_grads(
            s0, ctx, g_img, 16, NBINS, wrt=frozenset({"environment"}))
        got = float(np.sum(np.asarray(g["environment"]) * direction))

        def f(e):
            c = ctx._replace(environment=jnp.asarray(
                interp.pack_tex2d_corners(e)))
            _, img = M.render(r.reset(cam, seed), c, steps=16, n_bins=NBINS)
            return float(jnp.sum(img))

        eps = 0.25
        fd = (f(env + eps * direction) - f(env - eps * direction)) / (2 * eps)
        assert abs(got - fd) <= 1e-3 * max(abs(fd), 1.0), (got, fd, seed)
        assert abs(fd) > 1e-6
