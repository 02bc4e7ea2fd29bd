"""Differentiable inverse rendering: recover a density grid (and transfer
function) from target renders by gradient descent.

The reference is forward-only; this is the build's new capability
(BASELINE.json config 4). The EAM forward model (models/raymarch.eam_frame)
is smooth in (density, tf_table), so plain autodiff through the compositing
scan gives exact gradients; the spectral MCM path gets its gradients from
the score-function surrogate in models/mcm_spectral_grad.

Sharding: images/losses are sharded over the "rays" mesh axis, parameters
replicated — XLA inserts the gradient all-reduce (psum over ICI)
automatically when differentiating replicated params against a sharded loss.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from vpt_tpu.models.raymarch import _seed_to_offset, eam_frame


class InverseState(NamedTuple):
    params: dict  # {"density": (D,H,W), "tf_table": (256,256,4)} (any subset)
    opt_state: optax.OptState
    step: jax.Array


def save_inverse_checkpoint(path: str, istate: InverseState) -> None:
    """Persist an optimization state (params + opt_state + step) — the
    inverse-rendering analog of session.save_checkpoint (SURVEY §5:
    (params, opt_state) checkpointing for BASELINE config 4). Stored as
    flattened pytree leaves; restore against a structurally identical
    template (a fresh init from the same optimizer/params)."""
    import numpy as np

    leaves = jax.tree.leaves(istate)
    np.savez(path, n_leaves=len(leaves),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_inverse_checkpoint(path: str, template: InverseState) -> InverseState:
    """Restore an InverseState saved by save_inverse_checkpoint.

    ``template``: a fresh InverseState with the same params/optimizer
    structure (its leaf VALUES are ignored). Resuming is exact: the step
    function is deterministic given (state, seeds), so an interrupted and
    a straight-through run produce bit-identical trajectories."""
    import numpy as np

    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as data:
        n = int(data["n_leaves"])
        if n != len(leaves):
            raise ValueError(
                f"checkpoint has {n} leaves; template has {len(leaves)} "
                "(different params subset or optimizer?)")
        new = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    return jax.tree.unflatten(treedef, new)


def sanitize_grads(grads, clip: float):
    """Make Monte-Carlo gradients safe for Adam: replace NaN with 0,
    +/-inf with +/-clip, and clamp every element to [-clip, clip].

    Score-function estimators have heavy-tailed per-event terms — the event
    scores divide by event probabilities floored at 1e-12
    (kernels/spectral_backward.py:210-213), so a lane that samples an
    event whose probability is denormal contributes a ~1e12-scale term, and
    the scatter-add accumulation at clamp corners (the reference's
    clamped-sample-before-OOB quirk funnels every out-of-bounds lane onto
    border voxels) can overflow float32 to inf. Adam converts a single inf
    gradient element into a NaN parameter (inf/sqrt(inf^2)), permanently
    corrupting that voxel. Clipping at ``clip`` (default 1e3 — ~6 orders
    above typical density-grad magnitudes, a pure spike guard) bounds the
    update direction without touching well-behaved elements."""
    return jax.tree.map(
        lambda g: jnp.clip(
            jnp.nan_to_num(g, nan=0.0, posinf=clip, neginf=-clip),
            -clip, clip),
        grads)


def eam_loss(params, inv_mvp, offset, target, static):
    """MSE between the EAM forward render and a target image."""
    img = eam_frame(
        inv_mvp,
        params["density"],
        params.get("tf_table", static["tf_table"]),
        static["extinction"],
        offset,
        slices=static["slices"],
        resolution=static["resolution"],
        volume_filter=static["volume_filter"],
    )
    return jnp.mean((img - target) ** 2)


def make_inverse_step(optimizer, static, learn_tf: bool = False):
    """Build a jitted training step closed over the optimizer and statics."""

    @jax.jit
    def step(state: InverseState, inv_mvp, offset, target):
        loss, grads = jax.value_and_grad(eam_loss)(
            state.params, inv_mvp, offset, target, static
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # densities are physical: clamp to [0, 1]
        params = dict(params, density=jnp.clip(params["density"], 0.0, 1.0))
        if "tf_table" in params:
            params = dict(params, tf_table=jnp.clip(params["tf_table"], 0.0, 1.0))
        return InverseState(params, opt_state, state.step + 1), loss

    return step


def spectral_render_loss(params, state0, base_ctx, seeds, target, steps, n_bins,
                         pack_params: bool = True):
    """MSE between a differentiable spectral MCM render and a target.

    ``params`` may override any of: density, material_tf, light_spectrum,
    extinction (raw/unpacked tables). Gradients through the discrete
    Woodcock events use the REINFORCE surrogate
    (models/mcm_spectral._surrogate).

    ``pack_params``: corner-pack the raw table params *inside* the
    differentiated function (ops/interp.pack_*_jnp). Bit-identical forward
    and mathematically identical gradients, but ~8x fewer gather/scatter ops
    on the hot path (one packed row per sample instead of 8 corners). The
    non-packed path is kept for validation. Requires base_ctx tables that
    are packed too (renderer pack_tables=True) for any non-learned tables.
    """
    from vpt_tpu.models.mcm_spectral import render_sequence_diff
    from vpt_tpu.ops import interp

    if pack_params:
        packers = {
            "density": interp.pack_volume_corners_jnp,
            "material_tf": interp.pack_tex2d_corners_jnp,
            "light_spectrum": interp.pack_tex1d_corners_jnp,
            "environment": interp.pack_tex2d_corners_jnp,
        }
        params = {k: packers[k](v) if k in packers else v for k, v in params.items()}
    ctx = base_ctx._replace(**params)
    img = render_sequence_diff(seeds, state0, ctx, steps=steps, n_bins=n_bins)
    return jnp.mean((img - target) ** 2)


def make_spectral_inverse_step(optimizer, steps, n_bins,
                               clip_params=("density", "material_tf"),
                               grad_clip: float = 1e3):
    """Jitted Adam step for spectral inverse rendering (BASELINE config 4).

    state0/base_ctx are call arguments, not closure captures: large
    closed-over constants get serialized into the lowered module, which is
    pathologically slow on remote-compile toolchains (measured 426s vs 13s
    lowering for a 128^3 volume).

    ``grad_clip``: element-wise spike guard (sanitize_grads) against the
    score estimator's heavy tails; None disables.
    """

    @jax.jit
    def step(istate: InverseState, state0, base_ctx, seeds, target):
        loss, grads = jax.value_and_grad(spectral_render_loss)(
            istate.params, state0, base_ctx, seeds, target, steps, n_bins
        )
        if grad_clip is not None:
            grads = sanitize_grads(grads, grad_clip)
        updates, opt_state = optimizer.update(grads, istate.opt_state, istate.params)
        params = optax.apply_updates(istate.params, updates)
        for key in clip_params:
            if key in params:
                params = dict(params, **{key: jnp.clip(params[key], 0.0, 1.0)})
        return InverseState(params, opt_state, istate.step + 1), loss

    return step


def _pack_params_into_ctx(base_ctx, params: dict, raw_mtf=None, raw_light=None):
    """Corner-pack learned RAW tables into the base ctx's packed
    representation, in-graph (ops/interp.pack_*_jnp) — the PRB optimizer's
    analog of spectral_render_loss's pack_params. The representation always
    matches base_ctx (same PackedVolume kind / fused-TF layout), so the
    packed-adjoint backward dispatches identically every step.

    ``raw_mtf`` / ``raw_light``: raw fallbacks for the fused TF+light table
    when only one of the pair is learned."""
    from vpt_tpu.ops import interp

    updates = {}
    if "density" in params:
        base = base_ctx.density
        if isinstance(base, interp.PackedVolume):
            packer = (interp.pack_volume_corners_xy_jnp if base.kind == "xy"
                      else interp.pack_volume_corners_jnp)
            packed = packer(params["density"])
            updates["density"] = interp.PackedVolume(
                packed.reshape(-1, packed.shape[-1]), base.dims, base.kind)
        elif base.ndim == 4:
            packer = (interp.pack_volume_corners_xy_jnp if base.shape[-1] == 4
                      else interp.pack_volume_corners_jnp)
            updates["density"] = packer(params["density"])
        else:
            updates["density"] = params["density"]
    if "material_tf" in params or "light_spectrum" in params:
        if base_ctx.material_tf.shape[-1] == 18:
            mtf = params.get("material_tf", raw_mtf)
            light = params.get("light_spectrum", raw_light)
            if mtf is None or light is None:
                raise ValueError(
                    "fused-TF ctx needs raw_mtf/raw_light fallbacks when only "
                    "one of material_tf/light_spectrum is learned")
            updates["material_tf"] = interp.pack_tex2d_with_tex1d_jnp(mtf, light)
            if "light_spectrum" in params:
                updates["light_spectrum"] = interp.pack_tex1d_corners_jnp(light)
        else:
            if "material_tf" in params:
                updates["material_tf"] = params["material_tf"]
            if "light_spectrum" in params:
                updates["light_spectrum"] = params["light_spectrum"]
    if "extinction" in params:
        updates["extinction"] = params["extinction"]
    if "environment" in params:
        env = params["environment"]
        base_env = base_ctx.environment
        if base_env is not None and base_env.shape[-1] == 12:
            updates["environment"] = interp.pack_tex2d_corners_jnp(env)
        else:
            updates["environment"] = env
    return updates


def make_spectral_prb_step(optimizer, steps, n_bins,
                           wrt: frozenset,
                           scatter_stride: int = 1,
                           clip_params=("density", "material_tf"),
                           raw_mtf=None, raw_light=None,
                           grad_clip: float = 1e3):
    """Jitted Adam step on the hand-derived packed-adjoint PRB gradients
    (kernels/spectral_backward.prb_loss_and_grads) — the fast config-4 path.

    vs make_spectral_inverse_step (the autodiff REINFORCE surrogate): same
    estimator in expectation (identical event scores, score-form free
    flights), but the backward is one taped replay + one packed row scatter
    per table per lane-step instead of autodiff residuals — and
    ``scatter_stride`` thins the table scatters k-fold (unbiased, ~k x
    table-grad variance, phase rotating per dispatch). Requires a renderer
    built with pack_tables=True (the fused 18-wide TF + packed volume).
    ``wrt`` must cover every learned param key.
    """
    from vpt_tpu.kernels.spectral_backward import prb_loss_and_grads

    wrt = frozenset(wrt)

    @functools.partial(jax.jit, donate_argnames=("istate",))
    def step(istate: InverseState, state0, base_ctx, seeds, target):
        ctx = base_ctx._replace(**_pack_params_into_ctx(
            base_ctx, istate.params, raw_mtf=raw_mtf, raw_light=raw_light))
        _, _, loss, grads = prb_loss_and_grads(
            state0, ctx, seeds, target, steps, n_bins,
            wrt=wrt, scatter_stride=scatter_stride)
        grads = {k: grads[k] for k in istate.params}
        if grad_clip is not None:
            grads = sanitize_grads(grads, grad_clip)
        updates, opt_state = optimizer.update(grads, istate.opt_state,
                                              istate.params)
        params = optax.apply_updates(istate.params, updates)
        for key in clip_params:
            if key in params:
                params = dict(params, **{key: jnp.clip(params[key], 0.0, 1.0)})
        return InverseState(params, opt_state, istate.step + 1), loss

    return step


def fit_spectral(
    target_image,
    renderer,
    camera,
    init_params: dict,
    dispatches_per_step: int = 8,
    iterations: int = 100,
    learning_rate: float = 0.02,
    seed: int = 0,
    progress=None,
    method: str | None = None,
    scatter_stride: int = 4,
    checkpoint: str | None = None,
    checkpoint_every: int = 25,
):
    """Recover spectral-MCM scene parameters from a target HDR render.

    ``renderer``: an MCMSpectralRenderer. ``init_params``: subset of
    {density, material_tf, light_spectrum, extinction} as arrays.
    Fresh Monte-Carlo sample streams are drawn every iteration (stochastic
    gradients; the estimator's expectation matches the converged render).

    ``method``: "prb" runs the hand-derived packed-adjoint backward —
    requires pack_tables=True and honors ``scatter_stride`` (see
    make_spectral_prb_step). Stride 4 converges fastest in wall-clock on
    dense-gradient recoveries, but the trade is SCENE-DEPENDENT: when the
    gradient signal is concentrated in few voxels (sparse scenes, inits
    in the TF's flat zone), thinning variance stalls convergence — use
    scatter_stride=1 there (CONFIGS.md "stride convergence", r4 scene/
    seed replicates). "autodiff" differentiates through
    the REINFORCE surrogate (render_sequence_diff) — works with raw or
    packed tables and arbitrary param subsets; the validation path.
    Default (None): "prb" when the renderer's tables are packed (the
    standard fast path), "autodiff" otherwise.

    ``checkpoint``: path for periodic (params, opt_state, step) snapshots
    (save_inverse_checkpoint); if the file already exists the run RESUMES
    from it — bit-identical to an uninterrupted run (per-iteration seeds
    derive from the iteration index). ``losses`` then covers only the
    resumed iterations.
    """
    import os
    import numpy as np

    base_ctx = renderer.ctx(camera, seed)
    if method is None:
        packed = (base_ctx.material_tf.shape[-1] == 18
                  and (not hasattr(base_ctx.density, "ndim")
                       or base_ctx.density.ndim == 4))
        method = "prb" if packed else "autodiff"
    state0 = renderer.reset(camera, seed)
    steps = renderer.config.steps
    n_bins = renderer.spectrum.n_bins

    params = {k: jnp.asarray(v) for k, v in init_params.items()}
    optimizer = optax.adam(learning_rate)
    istate = InverseState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    if method == "prb":
        if steps % scatter_stride != 0:
            # the window backward partitions steps into stride phases; fall
            # back to the largest divisor of steps <= the requested stride so
            # user-settable steps (e.g. 6) keep working instead of crashing
            scatter_stride = max(
                d for d in range(1, scatter_stride + 1) if steps % d == 0)
        step = make_spectral_prb_step(
            optimizer, steps, n_bins, wrt=frozenset(params),
            scatter_stride=scatter_stride,
            raw_mtf=jnp.asarray(renderer.material_tf.table),
            raw_light=jnp.asarray(renderer.light.spectrum_array()),
        )
    elif method == "autodiff":
        step = make_spectral_inverse_step(optimizer, steps, n_bins)
    else:
        raise ValueError(f"unknown method {method!r} (prb | autodiff)")

    start = 0
    if checkpoint and os.path.exists(checkpoint):
        istate = load_inverse_checkpoint(checkpoint, istate)
        start = int(istate.step)

    target = jnp.asarray(target_image)
    losses = []
    for i in range(start, iterations):
        seeds = jnp.asarray(
            [np.uint32((seed + 1 + i * dispatches_per_step + k) * 2654435761 % 2**32)
             for k in range(dispatches_per_step)],
            jnp.uint32,
        )
        istate, loss = step(istate, state0, base_ctx, seeds, target)
        losses.append(float(loss))
        if progress is not None and (i % 10 == 0 or i == iterations - 1):
            progress(i, losses[-1])
        if checkpoint and ((i + 1) % checkpoint_every == 0
                           or i == iterations - 1):
            save_inverse_checkpoint(checkpoint, istate)
    return istate.params, losses


def fit_density(
    target_images,
    cameras,
    init_density,
    tf_table,
    extinction: float = 100.0,
    slices: int = 32,
    resolution: int = 64,
    volume_filter: str = "linear",
    learn_tf: bool = False,
    iterations: int = 200,
    learning_rate: float = 0.05,
    mesh=None,
    progress=None,
):
    """Adam loop recovering density (and optionally the TF) from targets.

    ``target_images``: list of (H, W, 3) arrays; ``cameras``: matching list.
    Returns (params, losses).
    """
    import numpy as np

    static = dict(
        tf_table=jnp.asarray(tf_table),
        extinction=jnp.float32(extinction),
        slices=slices,
        resolution=resolution,
        volume_filter=volume_filter,
    )
    params = {"density": jnp.asarray(init_density)}
    if learn_tf:
        params["tf_table"] = jnp.asarray(tf_table)

    optimizer = optax.adam(learning_rate)
    state = InverseState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
    step = make_inverse_step(optimizer, static, learn_tf)

    inv_mvps = [jnp.asarray(c.inverse_mvp()) for c in cameras]
    targets = [jnp.asarray(t) for t in target_images]
    if mesh is not None:
        from vpt_tpu.parallel.mesh import replicated, row_sharding

        targets = [
            jax.device_put(t, row_sharding(mesh, 3, 0)) for t in targets
        ]
        state = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), state
        )

    losses = []
    for i in range(iterations):
        k = i % len(targets)
        offset = jnp.float32(_seed_to_offset(i))
        state, loss = step(state, inv_mvps[k], offset, targets[k])
        losses.append(float(loss))
        if progress is not None and (i % 20 == 0 or i == iterations - 1):
            progress(i, losses[-1])
    return state.params, np.asarray(losses)
