"""Geometry op tests: cube intersection, unprojection, screen mapping."""

import numpy as np
import pytest

from vpt_tpu.ops import geometry, sampling
from vpt_tpu.reference import oracle
from vpt_tpu.scene.camera import Camera


def _arr(*vals):
    return [np.asarray([v], np.float32) for v in vals]


def test_intersect_cube_through_center():
    ox, oy, oz, dx, dy, dz = _arr(0.5, 0.5, -1.0, 0.0, 0.0, 1.0)
    tn, tf = geometry.intersect_cube(ox, oy, oz, dx, dy, dz)
    assert tn[0] == pytest.approx(1.0)
    assert tf[0] == pytest.approx(2.0)


def test_intersect_cube_miss():
    ox, oy, oz, dx, dy, dz = _arr(2.0, 2.0, -1.0, 0.0, 0.0, 1.0)
    tn, tf = geometry.intersect_cube(ox, oy, oz, dx, dy, dz)
    assert tn[0] > tf[0]  # miss encoded as tnear > tfar


def test_intersect_cube_axis_parallel_inside():
    # direction has zero components -> division by zero must behave
    ox, oy, oz, dx, dy, dz = _arr(0.5, 0.5, 0.5, 0.0, 0.0, 1.0)
    tn, tf = geometry.intersect_cube(ox, oy, oz, dx, dy, dz)
    assert tn[0] == pytest.approx(-0.5)
    assert tf[0] == pytest.approx(0.5)


def test_intersect_cube_matches_oracle_random():
    rng = np.random.default_rng(0)
    for _ in range(50):
        o = rng.uniform(-2, 3, 3).astype(np.float32)
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        tn_o, tf_o = oracle.intersect_cube(o, d.astype(np.float32))
        tn, tf = geometry.intersect_cube(*_arr(o[0], o[1], o[2], d[0], d[1], d[2]))
        assert tn[0] == pytest.approx(float(tn_o), rel=1e-5, abs=1e-6)
        assert tf[0] == pytest.approx(float(tf_o), rel=1e-5, abs=1e-6)


def test_unproject_matches_oracle():
    cam = Camera()
    inv_mvp = cam.inverse_mvp()
    state0 = oracle.hash3(7, 9, 1)

    chain = oracle.Chain(state0)
    fr_o, to_o = oracle.unproject_rand(chain, np.float32(0.25), np.float32(-0.5), inv_mvp, np.float32(1 / 64), 0.1)

    s = np.full(1, state0, np.uint32)
    m = np.ones(1, bool)
    sx = np.full(1, 0.25, np.float32)
    sy = np.full(1, -0.5, np.float32)
    s, (fx, fy, fz), (tx, ty, tz) = geometry.unproject_rand(
        s, m, sx, sy, inv_mvp, np.float32(1 / 64), np.float32(0.1)
    )
    np.testing.assert_allclose([fx[0], fy[0], fz[0]], fr_o, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose([tx[0], ty[0], tz[0]], to_o, rtol=1e-4, atol=1e-5)


def test_camera_ray_hits_volume():
    """Default camera at z=2 looking at origin: the center pixel's ray must
    hit the unit cube centered at the origin (model translate(-0.5))."""
    cam = Camera()
    inv_mvp = cam.inverse_mvp()
    state0 = oracle.hash3(0, 0, 0)
    chain = oracle.Chain(state0)
    fr, to = oracle.unproject_rand(chain, np.float32(0.0), np.float32(0.0), inv_mvp, np.float32(1 / 64), 0.0)
    d = to - fr
    d = d / np.linalg.norm(d)
    tn, tf = oracle.intersect_cube(fr, d.astype(np.float32))
    assert tn < tf and tf > 0


def test_screen_position_yflip():
    ix = np.array([0, 63], np.uint32)
    iy = np.array([0, 63], np.uint32)
    sx, sy = geometry.screen_position(ix, iy, np.float32(1 / 64))
    # top-left pixel: sx negative, sy positive (y-flip)
    assert sx[0] < 0 and sy[0] > 0
    assert sx[1] > 0 and sy[1] < 0
    assert sx[0] == pytest.approx(-(1 - 1 / 64))
    assert sy[0] == pytest.approx(1 - 1 / 64)
