"""Adaptive density control for 3DGS training — the INRIA schedule.

The reference names the original 3D Gaussian Splatting paper as its goal
renderer (reference README.md:7); that paper's training loop interleaves
gradient steps with **adaptive density control** (ADC): splats whose
view-space positional gradients stay large are under-reconstructing, so
they are *cloned* (if small) or *split* (if large); near-transparent
splats are *pruned*; opacities are periodically *reset* so pruning can
reclaim stale splats.

TPU-first design — static shapes throughout:

* The parameter arrays are allocated at a fixed ``capacity`` with a
  ``live`` mask; dead slots carry near-zero opacity and tiny scale, so
  they project to zero-radius splats and emit no tile pairs (their only
  cost is the O(capacity) projection math).
* Densification is ONE jitted function of fixed shapes: candidates are
  ranked by average view-space gradient (``jnp.argsort``), dead slots are
  enumerated by a second argsort, and the j-th best candidate's child is
  scattered into the j-th dead slot. Both index vectors are permutations,
  so every slot is written exactly once — no dynamic compaction, no
  host round-trips.
* The view-space gradient statistic comes from differentiating w.r.t. a
  zeros-valued ``mean2d_offset`` input of the renderers (gs_training),
  which works identically through the pure-jnp path and the production
  Pallas custom-VJP path.

Schedule constants follow the INRIA reference implementation: densify
every 100 steps between steps 500 and 15000, ``grad_threshold`` on the
mean view-space gradient norm, ``percent_dense = 0.01`` of the scene
extent separating clone from split, split scale factor 1.6, prune below
opacity 0.005, opacity reset every 3000 steps to 0.01.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.resources import pytree_dataclass
from ..ops.gs import quat_to_rotmat
from .gs_training import GaussianParams

#: opacity logit of a dead slot: sigmoid(-12) ~ 6e-6, far below the
#: compositor's 1/255 alpha floor
_DEAD_LOGIT = -12.0
#: log-scale of a dead slot: exp(-14) ~ 8e-7 world units -> 0-px radius
_DEAD_LOG_SCALE = -14.0
#: INRIA split factor: children shrink by 1.6
_SPLIT_SHRINK = 1.6


@pytree_dataclass
class DensifyState:
    """Per-slot ADC bookkeeping (all shape (capacity,)).

    ``grad_accum`` sums view-space positional gradient norms over the
    steps since the last densify; ``grad_count`` counts the steps the
    splat actually received gradient (was visible); ``live`` marks
    allocated slots."""
    live: jnp.ndarray        # (N,) bool
    grad_accum: jnp.ndarray  # (N,) f32
    grad_count: jnp.ndarray  # (N,) f32


def init_densify_state(capacity: int, n_live: int) -> DensifyState:
    return DensifyState(
        live=jnp.arange(capacity) < n_live,
        grad_accum=jnp.zeros(capacity, jnp.float32),
        grad_count=jnp.zeros(capacity, jnp.float32))


def pad_params(params: GaussianParams, capacity: int) -> GaussianParams:
    """Grow parameter arrays to ``capacity`` rows; new rows are dead
    (near-zero opacity, tiny scale) and render to nothing."""
    n = params.means.shape[0]
    if n > capacity:
        raise ValueError(f"{n} splats exceed capacity {capacity}")
    pad = capacity - n

    def padded(a, fill):
        return jnp.concatenate(
            [a, jnp.full((pad, *a.shape[1:]), fill, a.dtype)])

    return GaussianParams(
        means=padded(params.means, 0.0),
        log_scales=padded(params.log_scales, _DEAD_LOG_SCALE),
        quats=padded(params.quats, 0.0).at[n:, 0].set(1.0),
        opacity_logits=padded(params.opacity_logits, _DEAD_LOGIT),
        colors=padded(params.colors, 0.0),
    )


def accumulate_grad_stats(state: DensifyState,
                          mean2d_grad: jnp.ndarray) -> DensifyState:
    """Fold one step's view-space positional gradient (N, 2) into the
    running per-splat statistics (INRIA accumulates the norm over steps
    where the splat was visible)."""
    norm = jnp.linalg.norm(mean2d_grad, axis=-1)
    seen = (norm > 0.0).astype(jnp.float32)
    return DensifyState(live=state.live,
                        grad_accum=state.grad_accum + norm,
                        grad_count=state.grad_count + seen)


def densify_and_prune(params: GaussianParams, state: DensifyState,
                      key: jax.Array, *,
                      grad_threshold: float,
                      scene_extent: float,
                      percent_dense: float = 0.01,
                      prune_opacity: float = 0.005,
                      prune_scale3d: float | None = None):
    """One INRIA ADC pass — jittable, static shapes.

    Splats whose mean accumulated view-space gradient exceeds
    ``grad_threshold`` spawn one child each, best-ranked first, while
    dead slots last: a *clone* (small splats: child sampled at ~0.3 sigma,
    same size) or a *split* (large splats: parent and child both shrink by
    1.6 and move to independent samples of the parent Gaussian). Then
    splats below ``prune_opacity`` — and, when ``prune_scale3d`` is given,
    world-size outliers above it — are killed. Gradient statistics reset.

    Returns (params, state, stats) where stats holds ``n_clone``,
    ``n_split``, ``n_prune``, ``n_live`` device scalars."""
    n = state.live.shape[0]
    avg = state.grad_accum / jnp.maximum(state.grad_count, 1.0)
    scales = jnp.exp(params.log_scales)
    smax = jnp.max(scales, axis=-1)
    candidate = state.live & (avg > grad_threshold)
    is_small = smax <= percent_dense * scene_extent
    split_cand = candidate & ~is_small

    # rank candidates by gradient pressure; enumerate dead slots
    order = jnp.argsort(jnp.where(candidate, -avg, jnp.inf))   # parents
    slot = jnp.argsort(state.live)                             # dead first
    n_dead = jnp.sum(~state.live)
    j = jnp.arange(n)
    parent = order[j]
    valid = (j < n_dead) & candidate[parent]

    # child position: a sample of the parent Gaussian (split) or a close
    # 0.3-sigma jitter (clone) — coincident clones would receive identical
    # gradients forever, so symmetry must break at birth
    eps = jax.random.normal(key, (n, 3), jnp.float32)
    rot = quat_to_rotmat(params.quats[parent])                 # (N, 3, 3)
    sigma_step = jnp.einsum("nij,nj->ni", rot,
                            scales[parent] * eps)
    child_off = jnp.where(split_cand[parent, None], sigma_step,
                          0.3 * sigma_step)
    shrink = jnp.where(split_cand[parent, None],
                       jnp.float32(jnp.log(_SPLIT_SHRINK)), 0.0)

    def scatter(arr, child_vals):
        cur = arr[slot]
        v = jnp.where(valid.reshape((n,) + (1,) * (arr.ndim - 1)),
                      child_vals, cur)
        return arr.at[slot].set(v)

    new_means = scatter(params.means, params.means[parent] + child_off)
    new_logs = scatter(params.log_scales,
                       params.log_scales[parent] - shrink)
    new_quats = scatter(params.quats, params.quats[parent])
    new_logits = scatter(params.opacity_logits,
                         params.opacity_logits[parent])
    new_colors = scatter(params.colors, params.colors[parent])
    live = state.live.at[slot].set(valid | state.live[slot])

    # split parents that DID get a child shrink and resample too (the
    # INRIA split replaces one big splat with two samples)
    parent_split = jnp.zeros(n, bool).at[parent].set(valid & split_cand[parent])
    key2 = jax.random.fold_in(key, 1)
    eps2 = jax.random.normal(key2, (n, 3), jnp.float32)
    rot_own = quat_to_rotmat(params.quats)
    own_step = jnp.einsum("nij,nj->ni", rot_own,
                          jnp.exp(params.log_scales) * eps2)
    new_means = jnp.where(parent_split[:, None],
                          new_means + own_step, new_means)
    new_logs = jnp.where(parent_split[:, None],
                         new_logs - jnp.log(_SPLIT_SHRINK), new_logs)

    n_clone = jnp.sum(valid & ~split_cand[parent])
    n_split = jnp.sum(valid & split_cand[parent])

    # prune: transparent, and (optionally) world-size outliers
    dead = live & (jax.nn.sigmoid(new_logits) < prune_opacity)
    if prune_scale3d is not None:
        dead = dead | (live & (jnp.max(jnp.exp(new_logs), -1)
                               > prune_scale3d))
    live = live & ~dead
    new_logits = jnp.where(live, new_logits, _DEAD_LOGIT)
    new_logs = jnp.where(live[:, None], new_logs, _DEAD_LOG_SCALE)

    params = GaussianParams(means=new_means, log_scales=new_logs,
                            quats=new_quats, opacity_logits=new_logits,
                            colors=new_colors)
    state = DensifyState(live=live,
                         grad_accum=jnp.zeros(n, jnp.float32),
                         grad_count=jnp.zeros(n, jnp.float32))
    stats = {"n_clone": n_clone, "n_split": n_split,
             "n_prune": jnp.sum(dead), "n_live": jnp.sum(live)}
    return params, state, stats


def reset_opacity(params: GaussianParams, state: DensifyState,
                  max_opacity: float = 0.01) -> GaussianParams:
    """INRIA opacity reset: clamp every live splat's opacity to at most
    ``max_opacity`` so stale splats must re-earn their contribution or be
    pruned at the next ADC pass."""
    cap = jnp.float32(jnp.log(max_opacity / (1.0 - max_opacity)))
    logits = jnp.where(state.live,
                       jnp.minimum(params.opacity_logits, cap),
                       params.opacity_logits)
    return GaussianParams(means=params.means,
                          log_scales=params.log_scales,
                          quats=params.quats,
                          opacity_logits=logits,
                          colors=params.colors)


def reset_new_slots(opt_state, prev_live: jnp.ndarray,
                    live: jnp.ndarray):
    """Zero an optimizer state's per-splat moments for newly allocated
    slots (a fresh splat must not inherit the dead slot's stale Adam
    moments). Works on any optax state: every array leaf whose leading
    dimension equals the capacity is masked."""
    fresh = live & ~prev_live
    n = fresh.shape[0]

    def mask(leaf):
        if isinstance(leaf, jnp.ndarray) and leaf.ndim >= 1 \
                and leaf.shape[0] == n and jnp.issubdtype(
                    leaf.dtype, jnp.floating):
            keep = ~fresh
            return leaf * keep.reshape((n,) + (1,) * (leaf.ndim - 1))
        return leaf
    return jax.tree_util.tree_map(mask, opt_state)


def make_train_step_adc(optimizer, width: int, height: int,
                        background=(0.0, 0.0, 0.0),
                        use_pallas: bool = False,
                        max_splats_per_tile: int = 256,
                        interpret: bool = False):
    """Training step that also accumulates ADC statistics.

    Unlike :func:`gs_training.make_train_step`, ``view``/``proj``/
    ``target`` are step arguments (scene reconstruction optimizes over
    many camera poses), and the loss is differentiated w.r.t. BOTH the
    parameters and a zeros ``mean2d_offset``, whose gradient is the
    view-space positional gradient the INRIA densifier thresholds on.

    Returns ``step(params, opt_state, dstate, target, view, proj) ->
    (params, opt_state, dstate, loss)``."""
    from .gs_training import render_diff, render_diff_pallas

    def loss_fn(params, off, target, view, proj):
        if use_pallas:
            img = render_diff_pallas(
                params, view, proj, width, height, background,
                max_splats_per_tile, interpret, mean2d_offset=off)
        else:
            img = render_diff(params, view, proj, width, height,
                              background, mean2d_offset=off)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params, opt_state, dstate, target, view, proj):
        off = jnp.zeros_like(params.means[:, :2])
        loss, (gp, goff) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, off, target, view, proj)
        dstate = accumulate_grad_stats(dstate, goff)
        updates, opt_state = optimizer.update(gp, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                        updates)
        return params, opt_state, dstate, loss

    return step


def make_train_window_adc(optimizer, width: int, height: int,
                          background=(0.0, 0.0, 0.0),
                          use_pallas: bool = False,
                          max_splats_per_tile: int = 256,
                          interpret: bool = False,
                          nsteps: int = 100):
    """DEVICE-RESIDENT ADC training window: ``nsteps`` consecutive train
    steps in ONE dispatch, cycling the stacked training views.

    Host-looped per-step training pays the fixed ~28 ms tunnel round
    trip EVERY step (BENCHLOG round 2: an empty 1-iteration device loop
    costs the same as an empty 1000-iteration one), which capped ADC
    training at ~3.3 steps/s at the 960x540/262k-capacity config while
    the step compute was ~0.3 s... for the WHOLE 100-step window. The
    densify/prune/reset events between windows stay host-side (they
    need a live-quantile threshold), which costs one dispatch per
    ``densify_every`` steps instead of one per step.

    Returns ``window(params, opt_state, dstate, targets (V,H,W,3),
    views (V,4,4), proj, i0) -> (params, opt_state, dstate, loss)``
    where ``i0`` is the global step index of the window's first step
    (view k = (i0+i) % V matches the host loop's schedule) and ``loss``
    is the final step's."""
    inner = make_train_step_adc(optimizer, width, height, background,
                                use_pallas, max_splats_per_tile,
                                interpret)

    @jax.jit
    def window(params, opt_state, dstate, targets, views, proj, i0):
        nviews = targets.shape[0]

        def body(i, carry):
            params, opt_state, dstate, _ = carry
            k = (i0 + i) % nviews
            t = jax.lax.dynamic_index_in_dim(targets, k, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(views, k, keepdims=False)
            return inner(params, opt_state, dstate, t, v, proj)

        return jax.lax.fori_loop(
            0, nsteps, body,
            (params, opt_state, dstate, jnp.float32(0.0)))

    return window
