"""Ray-march renderer family tests: EAM, MIP, ISO, Depth + analytic checks."""

import numpy as np
import pytest

from vpt_tpu.models import make_renderer
from vpt_tpu.models import raymarch
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.tf import TransferFunction2D
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import EAMConfig

import jax.numpy as jnp

RES = 32


def _full_alpha_tf(alpha=1.0, rgb=(1.0, 1.0, 1.0)):
    """TF table that maps every density to a constant color/alpha."""
    t = np.zeros((256, 256, 4), np.float32)
    t[..., 0], t[..., 1], t[..., 2], t[..., 3] = *rgb, alpha
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    return tf


@pytest.fixture(scope="module")
def scene():
    return Volume.sphere_in_cube(32), Camera()


def test_eam_opaque_volume_is_white(scene):
    """With alpha=1 everywhere and huge extinction, every cube-hitting ray
    saturates to the TF color; misses are black."""
    vol, cam = scene
    r = make_renderer("eam", vol, _full_alpha_tf(),
                      EAMConfig(extinction=10000.0, slices=64, random_offset=False),
                      resolution=RES)
    state = r.reset(cam)
    state, img = r.render(state, cam, 0)
    img = np.asarray(img)
    center = img[RES // 2, RES // 2]
    corner = img[0, 0]
    np.testing.assert_allclose(center, 1.0, atol=1e-3)
    np.testing.assert_allclose(corner, 0.0, atol=1e-6)


def test_eam_homogeneous_transmittance_analytic(scene):
    """EAM's front-to-back compositing of a homogeneous slab approximates
    1 - exp(-k L); check against the discrete recurrence it implements."""
    vol, cam = scene
    ones = Volume(density=np.ones((8, 8, 8), np.float32))
    k = 3.0
    r = make_renderer("eam", ones, _full_alpha_tf(alpha=0.5),
                      EAMConfig(extinction=k, slices=128, random_offset=False),
                      resolution=RES)
    state = r.reset(cam)
    state, img = r.render(state, cam, 0)
    img = np.asarray(img)
    # center ray: L = path length through the unit cube ~ 1 for the default
    # camera; discrete alpha per step = 0.5*k*L/slices
    L = 1.0
    a_step = 0.5 * k * L / 128
    alpha_total = 1 - (1 - a_step) ** 128  # geometric compositing limit
    # rgb = alpha_total (premultiplied white), within discretization slack
    assert img[RES // 2, RES // 2, 0] == pytest.approx(alpha_total, rel=0.05)


def test_eam_progressive_average(scene):
    vol, cam = scene
    r = make_renderer("eam", vol, None, EAMConfig(slices=32), resolution=RES)
    state = r.reset(cam)
    imgs = []
    for f in range(4):
        state, img = r.render(state, cam, f)
        imgs.append(np.asarray(img))
    assert state["frame"] == 4
    assert np.isfinite(imgs[-1]).all()


def test_mip_is_max_projection(scene):
    vol, cam = scene
    r = make_renderer("mip", vol, _full_alpha_tf(alpha=1.0), steps=64, resolution=RES)
    state = r.reset(cam)
    state, img = r.render(state, cam, 0)
    img = np.asarray(img)
    # alpha=1 everywhere -> max along any hitting ray = 1, misses 0
    assert img[RES // 2, RES // 2, 0] == pytest.approx(1.0, abs=1e-6)
    assert img[0, 0, 0] == 0.0
    # monotone under accumulation
    state, img2 = r.render(state, cam, 1)
    assert np.all(np.asarray(img2) >= img - 1e-7)


def test_mip_density_tf_ramp(scene):
    """With a TF whose alpha equals density, MIP picks the max density along
    the ray — for sphere_in_cube's center ray that is (155+100)/255."""
    vol, cam = scene
    t = np.zeros((256, 256, 4), np.float32)
    t[..., 3] = np.linspace(0, 1, 256)[None, :]  # alpha = x coord = density
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    r = make_renderer("mip", vol, tf, steps=256, resolution=RES)
    state = r.reset(cam)
    for f in range(8):
        state, img = r.render(state, cam, f)
    img = np.asarray(img)
    assert img[RES // 2, RES // 2, 0] == pytest.approx(255 / 255, abs=0.02) or \
        img[RES // 2, RES // 2, 0] == pytest.approx((155 + 100) / 255, abs=0.02)


def test_iso_hits_sphere(scene):
    vol, cam = scene
    t = np.zeros((256, 256, 4), np.float32)
    t[..., :3] = 0.8
    t[..., 3] = np.linspace(0, 1, 256)[None, :]
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    r = make_renderer("iso", vol, tf, steps=64, isovalue=0.6, resolution=RES)
    state = r.reset(cam)
    for f in range(4):
        state, img = r.render(state, cam, f)
    img = np.asarray(img)
    ct = np.asarray(state["ct"])
    # center ray hits the dense sphere, corner ray misses (white background)
    assert ct[RES // 2, RES // 2] > 0
    assert ct[0, 0] == -1.0
    np.testing.assert_allclose(img[0, 0], 1.0)
    # shaded hit is darker than background
    assert img[RES // 2, RES // 2].max() < 1.0


def test_iso_closest_merge_keeps_nearest(scene):
    vol, cam = scene
    r = make_renderer("iso", vol, None, steps=32, isovalue=0.3, resolution=RES)
    state = r.reset(cam)
    state, _ = r.render(state, cam, 0)
    ct1 = np.asarray(state["ct"]).copy()
    for f in range(1, 6):
        state, _ = r.render(state, cam, f)
    ct6 = np.asarray(state["ct"])
    hit = (ct1 > 0) & (ct6 > 0)
    assert np.all(ct6[hit] <= ct1[hit] + 1e-7)


def test_depth_orders_front_surfaces(scene):
    vol, cam = scene
    r = make_renderer("depth", vol, _full_alpha_tf(alpha=1.0),
                      extinction=1000.0, slices=64, threshold=0.1, resolution=RES)
    state = r.reset(cam)
    state, img = r.render(state, cam, 0)
    img = np.asarray(img)
    # center hits the cube sooner than an edge-grazing ray; misses are white
    assert img[0, 0, 0] == 1.0
    assert 0 < img[RES // 2, RES // 2, 0] < 1.0


def test_tf2d_bump_rasterization():
    tf = TransferFunction2D.from_bumps([
        {"position": {"x": 0.5, "y": 0.5}, "size": {"x": 0.2, "y": 0.2},
         "color": {"r": 1.0, "g": 0.5, "b": 0.0, "a": 1.0}},
    ])
    table = tf.rasterize()
    assert table.shape == (256, 256, 4)
    # peak at the bump center, decaying outward
    c = table[128, 128]
    e = table[128, 20]
    assert c[3] > 0.9 and e[3] < 0.05
    assert c[0] == pytest.approx(1.0, abs=2 / 255)
    # blend order: second bump composites over the first
    tf2 = TransferFunction2D.from_bumps([
        {"position": {"x": 0.5, "y": 0.5}, "size": {"x": 0.2, "y": 0.2},
         "color": {"r": 1.0, "g": 0.0, "b": 0.0, "a": 1.0}},
        {"position": {"x": 0.5, "y": 0.5}, "size": {"x": 0.2, "y": 0.2},
         "color": {"r": 0.0, "g": 1.0, "b": 0.0, "a": 1.0}},
    ])
    t2 = tf2.rasterize()
    assert t2[128, 128, 1] > t2[128, 128, 0]
    # JSON round trip
    assert TransferFunction2D.from_json(tf.to_json()) == tf
