"""Fault injection / elastic recovery (SURVEY.md §5).

The accumulation state (radiance means + per-lane sample counters + counter
RNG seeds) is trivially resumable, and because RNG chains are pure functions
of (global pixel coords, frame seed) — never of device/shard ids — a render
killed mid-run can resume on a DIFFERENT mesh shape and still produce the
bit-identical image. That property is this framework's failure-recovery
contract: lose hosts, re-mesh, reload the last snapshot, continue.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vpt_tpu.models import mcm_spectral as M
from vpt_tpu.parallel.mesh import ray_mesh, shard_ctx, shard_spectral_state
from vpt_tpu.scene.camera import Camera
from vpt_tpu.scene.volume import Volume
from vpt_tpu.utils.config import (
    LightConfig, MaterialTF, MCMSpectralConfig, SpectrumConfig,
)


def _renderer(res=16):
    return M.MCMSpectralRenderer(
        Volume.sphere_in_cube(16),
        MaterialTF.constant(0.8, 0.6),
        LightConfig(direction=(1.0, 0.2, 0.5)),
        SpectrumConfig(),
        MCMSpectralConfig(extinction=20.0, steps=4),
        resolution=res,
    )


def _snapshot(state):
    """Device state -> host arrays (what a checkpoint writes)."""
    return jax.tree.map(np.asarray, state)


def test_kill_and_resume_on_different_mesh():
    """Render 3 dispatches on 8 devices, 'kill' (drop all device state),
    resume the snapshot on a 2-device mesh, finish with 3 more dispatches:
    final image and sample counters must be bit-identical to an
    uninterrupted single-device run."""
    res = 16
    seeds = [(k + 1) * 2654435761 % 2**32 for k in range(6)]
    r = _renderer(res)
    cam = Camera()

    # uninterrupted single-device reference
    ctx = r.ctx(cam, 1)
    ref = r.reset(cam, 1)
    for s in seeds:
        ref, ref_img = M.render(
            ref, ctx._replace(seed_bits=jnp.uint32(s)), steps=4, n_bins=12
        )
    ref_img = np.asarray(ref_img)

    # phase 1: 8-device mesh
    mesh8 = ray_mesh(8)
    ctx8 = shard_ctx(r.ctx(cam, 1), mesh8)
    st = shard_spectral_state(r.reset(cam, 1), mesh8)
    for s in seeds[:3]:
        st, _ = M.render(st, ctx8._replace(seed_bits=jnp.uint32(s)), steps=4, n_bins=12)
    snap = _snapshot(st)  # the checkpoint
    del st, ctx8  # the "host failure": all device state is gone

    # phase 2: resume on a 2-device mesh
    mesh2 = ray_mesh(2)
    ctx2 = shard_ctx(r.ctx(cam, 1), mesh2)
    st2 = shard_spectral_state(
        M.SpectralState(*[jnp.asarray(x) for x in snap]), mesh2
    )
    for s in seeds[3:]:
        st2, img = M.render(st2, ctx2._replace(seed_bits=jnp.uint32(s)), steps=4, n_bins=12)

    np.testing.assert_array_equal(np.asarray(img), ref_img)
    np.testing.assert_array_equal(np.asarray(st2.samples), np.asarray(ref.samples))
    assert np.asarray(st2.samples).sum() > 0  # paths actually completed


def test_session_checkpoint_survives_process_boundary(tmp_path):
    """Session checkpoint round-trips through the filesystem into a freshly
    constructed session (new process semantics) and continues identically."""
    from vpt_tpu.session import RenderSession

    args = ("mcm-spectral", Volume.sphere_in_cube(16),
            MaterialTF.constant(0.8, 0.6), LightConfig(), SpectrumConfig(),
            MCMSpectralConfig(extinction=20.0, steps=4))
    a = RenderSession(*args, resolution=16, base_seed=7)
    a.run(2)
    ck = str(tmp_path / "snap.npz")
    a.save_checkpoint(ck)
    a.run(3)

    b = RenderSession(*args, resolution=16, base_seed=7)
    b.load_checkpoint(ck)
    b.run(3)
    np.testing.assert_array_equal(a.hdr_image(), b.hdr_image())
