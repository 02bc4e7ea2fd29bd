"""RGB MCM + MCS renderer tests: structure, physics sanity, determinism."""

import numpy as np
import pytest

from vpt_tpu.models import make_renderer
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.tf import TransferFunction2D
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import MCMConfig

RES = 24


def _tf(albedo=(0.9, 0.9, 0.9), alpha_ramp=True):
    t = np.zeros((256, 256, 4), np.float32)
    t[..., 0], t[..., 1], t[..., 2] = albedo
    if alpha_ramp:
        t[..., 3] = np.linspace(0, 1, 256)[None, :]
    else:
        t[..., 3] = 0.5
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    return tf


@pytest.fixture(scope="module")
def scene():
    return Volume.sphere_in_cube(16), Camera()


def test_mcm_vacuum_renders_environment(scene):
    """Zero-alpha TF = vacuum: every sample escapes with transmittance 1 and
    the render converges to the environment map exactly."""
    vol, cam = scene
    t = np.zeros((256, 256, 4), np.float32)
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    env = np.full((1, 1, 3), 0.75, np.float32)
    r = make_renderer("mcm", vol, tf, env,
                      MCMConfig(extinction=10.0, steps=16), resolution=RES)
    state = r.reset(cam, 0)
    for f in range(6):
        state, img = r.render(state, cam, f + 1)
    img = np.asarray(img)
    sampled = np.asarray(state.samples) > 0
    assert sampled.mean() > 0.9
    np.testing.assert_allclose(img[sampled], 0.75, atol=1e-5)


def test_mcm_dense_absorber_is_black_inside(scene):
    """Alpha=1, albedo=0 everywhere: every collision absorbs -> radiance 0
    for rays that enter the cube."""
    vol, cam = scene
    t = np.zeros((256, 256, 4), np.float32)
    t[..., 3] = 1.0
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    r = make_renderer("mcm", vol, tf, None,
                      MCMConfig(extinction=200.0, steps=32), resolution=RES)
    state = r.reset(cam, 0)
    for f in range(4):
        state, img = r.render(state, cam, f + 1)
    img = np.asarray(img)
    c = RES // 2
    assert np.asarray(state.samples)[c, c] > 0
    assert img[c, c].max() < 1e-3


def test_mcm_deterministic(scene):
    vol, cam = scene
    r = make_renderer("mcm", vol, _tf(), None, MCMConfig(steps=8), resolution=RES)
    s1 = r.reset(cam, 5)
    s1, i1 = r.render(s1, cam, 5)
    s2 = r.reset(cam, 5)
    s2, i2 = r.render(s2, cam, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_mcm_transmittance_attenuates(scene):
    """Colored scattering (red albedo) with a white env must tint escaping
    multi-bounce radiance red on average."""
    vol, cam = scene
    t = np.zeros((256, 256, 4), np.float32)
    t[..., 0] = 0.9  # red albedo only
    t[..., 3] = np.linspace(0, 1, 256)[None, :]
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    r = make_renderer("mcm", vol, tf, None,
                      MCMConfig(extinction=50.0, steps=64, bounces=8), resolution=RES)
    state = r.reset(cam, 3)
    for f in range(10):
        state, img = r.render(state, cam, f * 7 + 1)
    img = np.asarray(img)
    c = RES // 2
    # center rays traverse the dense sphere: scattered paths dominate
    assert img[c, c, 0] > img[c, c, 1] + 0.01
    assert img[c, c, 0] > img[c, c, 2] + 0.01


def test_mcs_vacuum_is_environment(scene):
    vol, cam = scene
    t = np.zeros((256, 256, 4), np.float32)
    tf = TransferFunction2D()
    object.__setattr__(tf, "rasterize", lambda quantize=True: t)
    env = np.full((1, 1, 3), 0.6, np.float32)
    r = make_renderer("mcs", vol, tf, env, extinction=5.0, resolution=RES)
    state = r.reset(cam)
    state, img = r.render(state, cam, 1)
    np.testing.assert_allclose(np.asarray(img), 0.6, atol=1e-5)


def test_mcs_shades_collisions(scene):
    vol, cam = scene
    r = make_renderer("mcs", vol, _tf(), None, extinction=50.0,
                      max_collisions=32, resolution=RES)
    state = r.reset(cam)
    for f in range(12):
        state, img = r.render(state, cam, f + 1)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    c = RES // 2
    # collisions in the dense center attenuate below the white env
    assert img[c, c].mean() < np.asarray(img)[0, 0].mean()


def test_mcs_frame_average(scene):
    vol, cam = scene
    r = make_renderer("mcs", vol, _tf(), None, extinction=20.0, resolution=RES)
    state = r.reset(cam)
    state, _ = r.render(state, cam, 1)
    assert int(state["frame"]) == 1
    state, _ = r.render(state, cam, 2)
    assert int(state["frame"]) == 2


def test_mcs_render_many_matches_sequential(scene):
    """mcs_frames (scan-batched) matches sequential render to float
    rounding (XLA fuses the running average differently inside the scan)."""
    vol, cam = scene
    r = make_renderer("mcs", vol, _tf(), None, extinction=20.0, resolution=RES)
    seeds = [3, 71, 9001, 44]
    state_a = r.reset(cam)
    for s in seeds:
        state_a, img_a = r.render(state_a, cam, s)
    state_b = r.reset(cam)
    state_b, img_b = r.render_many(state_b, cam, seeds)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-6)
    assert int(state_b["frame"]) == len(seeds)


def test_mcs_majorant_statistical_parity(scene):
    """Majorant-informed MCS converges to the same image as the exact
    global-rate path (different sample paths, same estimand), judged
    against the exact path's own seed-to-seed noise floor."""
    vol, cam = scene

    def converged(maj, seed):
        r = make_renderer("mcs", vol, _tf(), None, extinction=20.0,
                          resolution=RES, majorant_blocks=maj)
        state = r.reset(cam)
        seeds = [(seed + k + 1) * 2654435761 % 2**32 for k in range(160)]
        state, img = r.render_many(state, cam, seeds)
        return np.asarray(img)

    a = converged(None, 1)
    b = converged(None, 991)  # noise-floor pair
    m = converged(4, 1)
    floor = np.abs(a - b).mean()
    diff = np.abs(a - m).mean()
    assert np.isfinite(m).all()
    assert diff < 2.0 * floor + 1e-4, (diff, floor)


def test_mcs_persistent_matches_frames(scene):
    """Persistent-lane MCS converges to the frame-based (reference-exact)
    image: same single-scattering estimand, different variance structure
    (per-sample scatter directions instead of per-frame), judged against
    the frame path's own seed-to-seed noise floor."""
    vol, cam = scene

    def frames(seed, n=160):
        r = make_renderer("mcs", vol, _tf(), None, extinction=20.0,
                          resolution=RES)
        state = r.reset(cam)
        seeds = [(seed + k + 1) * 2654435761 % 2**32 for k in range(n)]
        state, img = r.render_many(state, cam, seeds)
        return np.asarray(img)

    def persistent(seed, dispatches=60):
        r = make_renderer("mcs", vol, _tf(), None, extinction=20.0,
                          resolution=RES, persistent=True, steps=32)
        state = r.reset(cam)
        seeds = [(seed + k + 1) * 2654435761 % 2**32
                 for k in range(dispatches)]
        state, img = r.render_many(state, cam, seeds)
        assert int(np.asarray(state.samples).min()) > 0
        return np.asarray(img)

    a = frames(1)
    b = frames(991)  # noise-floor pair
    p = persistent(7)
    floor = np.abs(a - b).mean()
    diff = np.abs(a - p).mean()
    assert np.isfinite(p).all()
    assert diff < 2.0 * floor + 1e-4, (diff, floor)


def test_mcs_persistent_miss_rays_hit_environment():
    """Regression: rays that miss the cube must deposit the environment,
    even when the volume has nonzero alpha at its faces. Before the miss
    guard, persistent miss lanes Woodcock-marched a reversed out-of-cube
    segment sampling clamped border voxels and deposited shaded border
    color instead of env (frame path / MCSRenderer.glsl:112-116 both
    guard this)."""
    vol = Volume(np.ones((8, 8, 8), np.float32))  # dense up to the faces
    cam = Camera()  # z=2, fovy=1: image corners miss the unit cube
    env = np.full((1, 1, 3), 0.6, np.float32)
    r = make_renderer("mcs", vol, _tf(), env, extinction=50.0,
                      resolution=RES, persistent=True, steps=32)
    state = r.reset(cam)
    seeds = [(k + 1) * 2654435761 % 2**32 for k in range(20)]
    state, img = r.render_many(state, cam, seeds)
    img = np.asarray(img)

    # compute the miss mask the same way the kernel does
    import jax.numpy as jnp
    from vpt_tpu.models.raymarch import camera_rays
    from vpt_tpu.ops import geometry
    frm, to = camera_rays(RES, jnp.asarray(cam.inverse_mvp()))
    tn, tf_ = geometry.intersect_cube(
        frm[0], frm[1], frm[2], to[0] - frm[0], to[1] - frm[1], to[2] - frm[2])
    miss = np.asarray(jnp.maximum(tn, 0.0) >= jnp.maximum(tf_, 0.0))
    assert miss.any() and (~miss).any()  # the pose exercises both cases
    np.testing.assert_allclose(img[miss], 0.6, atol=1e-5)


def test_mcs_persistent_deterministic_and_majorant(scene):
    """Same seeds -> bit-identical persistent renders; the majorant mode
    stays statistically exact on the persistent path too."""
    vol, cam = scene

    def run(maj, seed=5, dispatches=40):
        r = make_renderer("mcs", vol, _tf(), None, extinction=20.0,
                          resolution=RES, persistent=True, steps=32,
                          majorant_blocks=maj)
        state = r.reset(cam)
        seeds = [(seed + k + 1) * 2654435761 % 2**32
                 for k in range(dispatches)]
        state, img = r.render_many(state, cam, seeds)
        return np.asarray(img)

    np.testing.assert_array_equal(run(None), run(None))
    a, b = run(None, seed=5, dispatches=80), run(None, seed=991, dispatches=80)
    m = run(4, seed=5, dispatches=80)
    floor = np.abs(a - b).mean()
    assert np.abs(a - m).mean() < 2.0 * floor + 1e-4
