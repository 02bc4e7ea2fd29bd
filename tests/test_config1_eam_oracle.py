"""BASELINE config 1: 64^3 procedural volume, 256^2 image, single-wavelength
absorption-emission ray march — jitted renderer vs the independent NumPy
reference implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from vpt_tpu.models.raymarch import eam_frame
from vpt_tpu.reference.eam_numpy import eam_frame_numpy
from vpt_tpu.scene.camera import Camera, OrbitController
from vpt_tpu.scene.volume import Volume


def _tf():
    tf = np.zeros((256, 256, 4), np.float32)
    tf[..., 0] = 0.9
    tf[..., 1] = 0.7
    tf[..., 2] = 0.4
    tf[..., 3] = np.linspace(0, 1, 256)[None, :]
    return tf


@pytest.mark.parametrize("offset", [0.0, 0.37])
def test_config1_eam_vs_numpy_oracle(offset):
    volume = Volume.sphere_in_cube(64)
    tf = _tf()
    cam = Camera()
    OrbitController(yaw=0.5, pitch=-0.3).apply(cam)
    inv_mvp = cam.inverse_mvp()
    slices, res, ext = 64, 256, 80.0

    got = np.asarray(eam_frame(
        jnp.asarray(inv_mvp), jnp.asarray(volume.density), jnp.asarray(tf),
        jnp.float32(ext), jnp.float32(offset), slices=slices, resolution=res,
    ))
    want = eam_frame_numpy(inv_mvp, volume.density, tf, ext, offset, slices, res)

    assert got.shape == want.shape == (256, 256, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # the scene must actually render something nontrivial
    assert want.max() > 0.3
    assert (want.sum(-1) == 0).mean() > 0.1  # some rays miss


def test_config1_two_spheres():
    volume = Volume.two_spheres(64)
    tf = _tf()
    cam = Camera()
    inv_mvp = cam.inverse_mvp()
    got = np.asarray(eam_frame(
        jnp.asarray(inv_mvp), jnp.asarray(volume.density), jnp.asarray(tf),
        jnp.float32(100.0), jnp.float32(0.0), slices=48, resolution=128,
    ))
    want = eam_frame_numpy(inv_mvp, volume.density, tf, 100.0, 0.0, 48, 128)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
