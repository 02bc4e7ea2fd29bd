"""Inverse rendering (BASELINE config 4): recover a density grid from target
renders; sharded and unsharded optimization agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpt_tpu.models.raymarch import eam_frame
from vpt_tpu.optim import fit_density
from vpt_tpu.scene.camera import Camera, OrbitController

RES = 48
SLICES = 24
EXT = 60.0
D = 12


def _tf():
    tf = np.zeros((256, 256, 4), np.float32)
    tf[..., :3] = 1.0
    tf[..., 3] = np.linspace(0, 1, 256)[None, :]
    return tf


def _blob(size=D):
    x, y, z = np.meshgrid(*([np.linspace(-1, 1, size)] * 3), indexing="ij")
    return np.exp(-((x + 0.2) ** 2 + y ** 2 + (z - 0.1) ** 2) / 0.18).astype(np.float32)


def _targets(density, tf, views=4):
    cams, imgs = [], []
    for k in range(views):
        cam = Camera()
        OrbitController(yaw=2 * np.pi * k / views, pitch=-0.3).apply(cam)
        cams.append(cam)
        imgs.append(np.asarray(eam_frame(
            jnp.asarray(cam.inverse_mvp()), jnp.asarray(density), jnp.asarray(tf),
            jnp.float32(EXT), jnp.float32(0.0), slices=SLICES, resolution=RES,
        )))
    return cams, imgs


def test_density_recovery():
    tf = _tf()
    truth = _blob()
    cams, targets = _targets(truth, tf)

    # density 0 maps into the TF's clamped edge half-texel (zero bilinear
    # slope -> zero gradient): start from a small constant instead
    init = np.full_like(truth, 0.2)
    params, losses = fit_density(
        targets, cams, init, tf, extinction=EXT, slices=SLICES,
        resolution=RES, iterations=150, learning_rate=0.08,
    )
    rec = np.asarray(params["density"])

    assert losses[-1] < losses[0] * 0.05, f"loss barely moved: {losses[0]} -> {losses[-1]}"
    mae0 = np.abs(init - truth).mean()
    mae = np.abs(rec - truth).mean()
    assert mae < mae0 * 0.5, f"density MAE {mae:.4f} vs initial {mae0:.4f}"
    # the blob's center of mass should be roughly recovered
    idx = np.unravel_index(np.argmax(rec), rec.shape)
    idx_t = np.unravel_index(np.argmax(truth), truth.shape)
    assert np.abs(np.array(idx) - np.array(idx_t)).max() <= 3


def test_sharded_matches_unsharded():
    """psum-equivalence (SURVEY §4 item 4): optimizing on an 8-device rays
    mesh must produce the same trajectory as a single device."""
    from vpt_tpu.parallel.mesh import ray_mesh

    tf = _tf()
    truth = _blob()
    cams, targets = _targets(truth, tf, views=2)
    init = np.full_like(truth, 0.2)

    kw = dict(extinction=EXT, slices=SLICES, resolution=RES,
              iterations=8, learning_rate=0.08)
    p1, l1 = fit_density(targets, cams, init, tf, **kw)
    mesh = ray_mesh(8)
    p8, l8 = fit_density(targets, cams, init, tf, mesh=mesh, **kw)

    np.testing.assert_allclose(l1, l8, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(p1["density"]), np.asarray(p8["density"]), rtol=1e-4, atol=1e-6
    )


def test_learn_tf_jointly():
    tf = _tf()
    truth = _blob()
    cams, targets = _targets(truth, tf)
    params, losses = fit_density(
        targets, cams, truth * 0.5, tf * 0.8, extinction=EXT, slices=SLICES,
        resolution=RES, learn_tf=True, iterations=30, learning_rate=0.05,
    )
    assert "tf_table" in params
    assert losses[-1] < losses[0]
    assert np.isfinite(np.asarray(params["tf_table"])).all()
