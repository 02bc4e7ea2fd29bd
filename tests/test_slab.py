"""Slab-sharded volume rendering: bit-identical to the replicated path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.ops import interp
from vpt_tpu.parallel import slab
from vpt_tpu.parallel.mesh import ray_mesh, replicated, row_sharding, shard_spectral_state
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig

RES = 16
VOL = 16


def _setup(n_devices):
    volume = Volume.sphere_in_cube(VOL)
    renderer = M.MCMSpectralRenderer(
        volume, MaterialTF.constant(0.8, 0.6, 0.2),
        LightConfig(direction=(1.0, 0.2, 0.3)),
        SpectrumConfig(), MCMSpectralConfig(extinction=20.0, steps=6),
        resolution=RES,
    )
    cam = Camera()
    mesh = ray_mesh(n_devices)
    return volume, renderer, cam, mesh


def test_distributed_gather_matches_local():
    """The routed row gather must return the same rows as a local take."""
    n = 8
    _, renderer, cam, mesh = _setup(n)
    packed_np = interp.pack_volume_corners(Volume.sphere_in_cube(VOL).density)
    padded = slab.pad_packed_for_slabs(packed_np, n)
    sharded = slab.shard_packed_volume(padded, mesh)

    rng = np.random.default_rng(0)
    Dp, Hp, Wp, _ = packed_np.shape
    n_rows_global = padded.shape[0] * Hp * Wp
    idx = rng.integers(0, Dp * Hp * Wp, size=(n * 13,)).astype(np.int32)
    rows_per_device = (padded.shape[0] // n) * Hp * Wp

    from jax.sharding import NamedSharding, PartitionSpec as P

    idx_sharded = jax.device_put(
        jnp.asarray(idx), NamedSharding(mesh, P(slab.AXIS))
    )

    fn = jax.jit(jax.shard_map(
        lambda tab, i: slab._distributed_rows(tab, i, rows_per_device, Hp * Wp * 8),
        mesh=mesh,
        in_specs=(P(slab.AXIS, None, None, None), P(slab.AXIS)),
        out_specs=P(slab.AXIS, None),
        check_vma=False,
    ))
    got = np.asarray(fn(sharded, idx_sharded))
    want = np.asarray(jnp.take(jnp.asarray(padded).reshape(-1, 8), jnp.asarray(idx), axis=0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_devices,stride,streams",
                         [(2, 1, 1), (8, 1, 1), (8, 2, 1), (8, 1, 2)])
def test_slab_prb_grads_match_replicated(n_devices, stride, streams):
    """Slab-sharded packed-PRB density gradients (routed adjoint scatter +
    distributed pack-transpose contraction) match the replicated
    packed-PRB gradient; the forward image stays bit-identical.
    n=8 with VOL=16 exercises the pad/fold paths hard: Dp=17 pads to 24,
    devices 6-7 own pure pad slabs, device 5 folds the z-clip overflow."""
    from vpt_tpu.kernels.spectral_backward import prb_render_and_grads
    from vpt_tpu.utils.config import MaterialTF

    volume = Volume.sphere_in_cube(VOL)
    # density gradients flow through the TF's density slope — use a ramp
    # (a constant TF has zero slope and hence zero density gradient)
    table = np.zeros((256, 256, 4), np.float32)
    table[..., 0] = 0.8
    table[..., 1] = np.linspace(0, 1, 256)[:, None]
    table[..., 2] = 0.5
    renderer = M.MCMSpectralRenderer(
        volume, MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.3)),
        SpectrumConfig(), MCMSpectralConfig(extinction=20.0, steps=6),
        resolution=RES, pack_tables=True, streams=streams,
    )
    cam = Camera()
    mesh = ray_mesh(n_devices)
    rng = np.random.default_rng(3)
    g_image = jnp.asarray(rng.standard_normal((RES, RES, 3)), jnp.float32)

    # replicated reference
    ctx = renderer.ctx(cam, 5)
    state = renderer.reset(cam, 5)
    ref_state, ref_img, ref_grads = prb_render_and_grads(
        state, ctx, g_image, steps=6, n_bins=12,
        wrt=frozenset({"density"}), scatter_stride=stride)

    # slab-sharded run
    packed_np = interp.pack_volume_corners(volume.density)
    padded = slab.pad_packed_for_slabs(packed_np, n_devices)
    ctx2 = renderer.ctx(cam, 5)._replace(
        density=slab.shard_packed_volume(padded, mesh))
    ctx2 = ctx2._replace(
        **{f: jax.device_put(getattr(ctx2, f), replicated(mesh))
           for f in ("inv_mvp", "seed_bits", "extinction", "blur",
                     "max_bounces", "light_direction", "material_tf",
                     "light_spectrum", "boundaries", "bin_xyz")}
    )
    state2 = shard_spectral_state(renderer.reset(cam, 5), mesh)
    out_state, out_img, grads = slab.prb_grads_slab(
        state2, ctx2, mesh, volume_dims=volume.density.shape,
        g_image=g_image, steps=6, n_bins=12, scatter_stride=stride)

    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(ref_img))
    np.testing.assert_array_equal(np.asarray(out_state.samples),
                                  np.asarray(ref_state.samples))
    ref_g = np.asarray(ref_grads["density"])
    got_g = np.asarray(grads["density"])
    assert got_g.shape == ref_g.shape
    assert np.abs(ref_g).max() > 0  # the scene actually produces gradient
    np.testing.assert_allclose(got_g, ref_g, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("n_devices,stride", [(8, 1), (8, 2)])
def test_slab_window_prb_grads_match_replicated(n_devices, stride):
    """K-dispatch WINDOW gradients (cotangent carry threaded across
    dispatch boundaries, window-final normalizer) with the volume
    slab-sharded match the replicated
    prb_render_and_grads_many(window=True)."""
    from vpt_tpu.kernels.spectral_backward import prb_render_and_grads_many
    from vpt_tpu.utils.config import MaterialTF

    volume = Volume.sphere_in_cube(VOL)
    table = np.zeros((256, 256, 4), np.float32)
    table[..., 0] = 0.8
    table[..., 1] = np.linspace(0, 1, 256)[:, None]
    table[..., 2] = 0.5
    renderer = M.MCMSpectralRenderer(
        volume, MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.3)),
        SpectrumConfig(), MCMSpectralConfig(extinction=20.0, steps=6),
        resolution=RES, pack_tables=True,
    )
    cam = Camera()
    mesh = ray_mesh(n_devices)
    rng = np.random.default_rng(5)
    g_image = jnp.asarray(rng.standard_normal((RES, RES, 3)), jnp.float32)
    seeds = jnp.asarray([11, 12, 13, 14], jnp.uint32)

    ctx = renderer.ctx(cam, 5)
    state = renderer.reset(cam, 5)
    ref_state, ref_img, ref_grads = prb_render_and_grads_many(
        state, ctx, seeds, g_image, steps=6, n_bins=12,
        wrt=frozenset({"density"}), scatter_stride=stride,
        window=True, window_storage="forward")

    packed_np = interp.pack_volume_corners(volume.density)
    padded = slab.pad_packed_for_slabs(packed_np, n_devices)
    ctx2 = renderer.ctx(cam, 5)._replace(
        density=slab.shard_packed_volume(padded, mesh))
    ctx2 = ctx2._replace(
        **{f: jax.device_put(getattr(ctx2, f), replicated(mesh))
           for f in ("inv_mvp", "seed_bits", "extinction", "blur",
                     "max_bounces", "light_direction", "material_tf",
                     "light_spectrum", "boundaries", "bin_xyz")}
    )
    state2 = shard_spectral_state(renderer.reset(cam, 5), mesh)
    out_state, out_img, grads = slab.prb_window_grads_slab(
        state2, ctx2, mesh, volume_dims=volume.density.shape, seeds=seeds,
        g_image=g_image, steps=6, n_bins=12, scatter_stride=stride)

    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(ref_img))
    ref_g = np.asarray(ref_grads["density"])
    got_g = np.asarray(grads["density"])
    assert np.abs(ref_g).max() > 0
    np.testing.assert_allclose(got_g, ref_g, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_slab_render_bit_identical_to_replicated(n_devices):
    volume, renderer, cam, mesh = _setup(n_devices)

    # replicated reference
    ctx = renderer.ctx(cam, 5)
    state = renderer.reset(cam, 5)
    ref_state, ref_img = M.render(state, ctx, steps=6, n_bins=12)
    ref_img = np.asarray(ref_img)
    ref_samples = np.asarray(ref_state.samples)

    # slab-sharded run
    packed_np = interp.pack_volume_corners(volume.density)
    padded = slab.pad_packed_for_slabs(packed_np, n_devices)
    ctx2 = renderer.ctx(cam, 5)._replace(
        density=slab.shard_packed_volume(padded, mesh)
    )
    ctx2 = ctx2._replace(
        **{f: jax.device_put(getattr(ctx2, f), replicated(mesh))
           for f in ("inv_mvp", "seed_bits", "extinction", "blur", "max_bounces",
                      "light_direction", "material_tf", "light_spectrum",
                      "boundaries", "bin_xyz")}
    )
    state2 = shard_spectral_state(renderer.reset(cam, 5), mesh)
    out_state, out_img = slab.render_slab(
        state2, ctx2, mesh, volume_dims=volume.density.shape, steps=6, n_bins=12
    )
    np.testing.assert_array_equal(np.asarray(out_img), ref_img)
    np.testing.assert_array_equal(np.asarray(out_state.samples), ref_samples)


def test_pack_slab_rows_matches_host_packer():
    """The in-graph per-device slab packer reproduces the host
    pack_volume_corners rows exactly (including the zero padding rows of
    pad_packed_for_slabs)."""
    vol = Volume.two_spheres(8).density
    D = vol.shape[0]
    n = 4
    full = interp.pack_volume_corners(vol)           # (D+1, H+1, W+1, 8)
    padded = slab.pad_packed_for_slabs(full, n)
    slab_z = padded.shape[0] // n
    raw = jnp.asarray(vol)
    for d in range(n):
        got = np.asarray(slab._pack_slab_rows(raw, d * slab_z, slab_z, D))
        np.testing.assert_array_equal(got, padded[d * slab_z:(d + 1) * slab_z])


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_fit_spectral_slab_matches_replicated_trajectory():
    """The end-to-end slab optimizer loop (VERDICT r4 #3): density
    recovery through fit_spectral_slab follows the replicated
    fit_spectral(method='prb') trajectory — same seeds, same estimator
    (window-exact, stride 1), grads routed through the distributed slab
    machinery instead of a replicated packed table."""
    from vpt_tpu import optim

    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.9
    table[..., 1] = np.where(dens > 0.3, (dens - 0.3) / 0.7, 0.0)
    vol = Volume.sphere_in_cube(VOL)
    cam = Camera()
    mesh = ray_mesh(4)

    def renderer(pack, msh=None):
        return M.MCMSpectralRenderer(
            vol, MaterialTF(table), LightConfig(direction=(1.0, 0.2, 0.5)),
            SpectrumConfig(), MCMSpectralConfig(extinction=20.0, steps=8),
            resolution=RES, pack_tables=pack, mesh=msh)

    # converged-ish target from the true scene
    r_t = renderer(True)
    st = r_t.reset(cam, 99)
    st, target = r_t.render_many(
        st, cam, [(99 + k + 1) * 2654435761 % 2**32 for k in range(16)])
    target = np.asarray(target)

    init = np.full(vol.density.shape, 0.5, np.float32)
    iters = 3

    ref_params, ref_losses = optim.fit_spectral(
        target, renderer(True), cam, {"density": init},
        dispatches_per_step=4, iterations=iters, learning_rate=0.05,
        seed=3, method="prb", scatter_stride=1)

    r_slab = renderer({"material_tf", "light_spectrum"}, msh=mesh)
    got_params, got_losses = slab.fit_spectral_slab(
        target, r_slab, cam, init, mesh, dispatches_per_step=4,
        iterations=iters, learning_rate=0.05, seed=3, scatter_stride=1)

    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_params["density"]), np.asarray(ref_params["density"]),
        rtol=5e-4, atol=5e-6)
    # the step actually moved the params (gradient is nonzero end-to-end);
    # 3 iterations at this lr is an Adam transient, so do not assert the
    # loss direction here — trajectory equality above is the contract
    assert np.abs(np.asarray(got_params["density"]) - init).max() > 1e-3
    assert np.isfinite(got_losses).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_slab_window_importance_grads_match_replicated():
    """Importance-thinned scatters compose with the slab path, and because
    pick selection seeds from GLOBAL lane identity, the slab gradient
    matches the replicated importance gradient (same picks; only routed
    float summation order differs)."""
    table = np.zeros((256, 256, 4), np.float32)
    dens = np.linspace(0, 1, 256)[:, None]
    table[..., 0] = 0.7
    table[..., 1] = 0.1 + 0.8 * dens
    volume = Volume.sphere_in_cube(VOL)
    renderer = M.MCMSpectralRenderer(
        volume, MaterialTF(table),
        LightConfig(direction=(1.0, 0.2, 0.3)),
        SpectrumConfig(), MCMSpectralConfig(extinction=20.0, steps=8),
        resolution=RES, pack_tables=True)
    cam = Camera()
    mesh = ray_mesh(4)
    seeds = jnp.asarray([3, 4, 5, 6], jnp.uint32)
    g_img = jnp.ones((RES, RES, 3), jnp.float32)

    from vpt_tpu.kernels.spectral_backward import prb_render_and_grads_many

    ctx = renderer.ctx(cam, 3)
    s0 = renderer.reset(cam, 3)
    _, _, ref = prb_render_and_grads_many(
        s0, ctx, seeds, g_img, 8, 12, wrt=frozenset({"density"}),
        scatter_stride=4, scatter_mode="importance")

    packed_np = interp.pack_volume_corners(volume.density)
    padded = slab.pad_packed_for_slabs(packed_np, 4)
    ctx2 = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)),
                        renderer.ctx(cam, 3))
    ctx2 = ctx2._replace(density=slab.shard_packed_volume(padded, mesh))
    state2 = shard_spectral_state(renderer.reset(cam, 3), mesh)
    g2 = jax.device_put(g_img, row_sharding(mesh, 3, 0))
    _, _, got = slab.prb_window_grads_slab(
        state2, ctx2, mesh, volume_dims=volume.density.shape, seeds=seeds,
        g_image=g2, steps=8, n_bins=12, scatter_stride=4,
        scatter_mode="importance")
    ref_d = np.asarray(ref["density"])
    got_d = np.asarray(got["density"])
    assert np.abs(ref_d).max() > 0
    np.testing.assert_allclose(got_d, ref_d, rtol=2e-5, atol=1e-7)
