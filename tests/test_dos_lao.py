"""DOS and LAO renderer tests."""

import numpy as np
import pytest

from vpt_tpu.models import make_renderer
from vpt_tpu.models.dos import depth_range, generate_occlusion_samples
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.tf import TransferFunction2D
from vpt_tpu.scene.volume import Volume

RES = 24


def _ramp_tf(rgb=(1.0, 0.8, 0.6)):
    t = np.zeros((256, 256, 4), np.float32)
    t[..., 0], t[..., 1], t[..., 2] = rgb
    t[..., 3] = np.linspace(0, 1, 256)[None, :]
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    return tf


@pytest.fixture(scope="module")
def scene():
    return Volume.sphere_in_cube(16), Camera()


def test_occlusion_samples_centered():
    s = generate_occlusion_samples(16, seed=3)
    assert s.shape == (16, 2)
    np.testing.assert_allclose(s.mean(axis=0), 0.0, atol=1e-6)
    assert np.sqrt((s ** 2).sum(axis=1)).max() < 2.0


def test_depth_range_contains_cube():
    lo, hi = depth_range(Camera())
    # camera at z=2, cube centered at origin with half-width 0.5
    assert lo == pytest.approx(1.5, abs=1e-6)
    assert hi == pytest.approx(2.5, abs=1e-6)


def test_dos_sweep_progresses_and_completes(scene):
    vol, cam = scene
    r = make_renderer("dos", vol, _ramp_tf(), steps=8, slices=16,
                      extinction=300.0, samples=4, resolution=RES)
    state = r.reset(cam)
    assert state["depth"] == state["min_depth"]
    state, img1 = r.render(state, cam, 0)
    assert state["depth"] > state["min_depth"]
    state, img2 = r.render(state, cam, 1)
    state, img3 = r.render(state, cam, 2)  # sweep done (16 slices / 8 steps)
    img = np.asarray(img3)
    assert np.isfinite(img).all()
    c = RES // 2
    # dense center absorbs: darker than the white background
    assert img[c, c].mean() < img[0, 0].mean()
    np.testing.assert_allclose(np.asarray(img3)[0, 0], 1.0, atol=1e-5)
    # extra renders past the end are no-ops
    state2, img4 = r.render(dict(state), cam, 3)
    np.testing.assert_array_equal(np.asarray(img3), np.asarray(img4))


def test_dos_occlusion_darkens(scene):
    """With occlusion active, deep slices receive less light than the same
    scene rendered with aperture 0 samples pointing nowhere — proxy check:
    occlusion buffer must decay inside the dense volume."""
    vol, cam = scene
    r = make_renderer("dos", vol, _ramp_tf(), steps=16, slices=16,
                      extinction=300.0, samples=4, resolution=RES)
    state = r.reset(cam)
    state, _ = r.render(state, cam, 0)
    occ = np.asarray(state["occlusion"])
    assert occ.min() < 0.5  # attenuated through the dense cube
    assert occ.max() <= 1.0 + 1e-6


def test_lao_renders_structure(scene):
    vol, cam = scene
    r = make_renderer("lao", vol, _ramp_tf(), slices=16, resolution=RES)
    state = r.reset(cam)
    state, img = r.render(state, cam, 0)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    c = RES // 2
    assert img[c, c].sum() > 0  # volume visible
    np.testing.assert_allclose(img[0, 0], 0.0, atol=1e-6)  # miss = black
    assert int(state["frame"]) == 1


def test_lao_occlusion_darkens(scene):
    vol, cam = scene
    kw = dict(slices=16, resolution=RES)
    r_on = make_renderer("lao", vol, _ramp_tf(), lao_weight=0.69, **kw)
    r_off = make_renderer("lao", vol, _ramp_tf(), lao_enabled=False,
                          shadows_enabled=False, **kw)
    _, img_on = r_on.render(r_on.reset(Camera()), Camera(), 0)
    _, img_off = r_off.render(r_off.reset(Camera()), Camera(), 0)
    # occlusion+shadows must darken the lit volume on average
    assert np.asarray(img_on).mean() < np.asarray(img_off).mean()


def test_all_renderers_registered():
    from vpt_tpu.models import RENDERERS

    assert set(RENDERERS) >= {
        "mcm-spectral", "mcm", "mcs", "eam", "mip", "iso", "depth", "dos", "lao"
    }
