"""Adaptive density control (models/gs_densify.py): clone/split/prune
semantics, view-space gradient statistics through both differentiable
renderers, and an end-to-end from-scratch reconstruction that the fixed
initial splat count cannot reach without densification."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ray_eater_tpu import rmath
from ray_eater_tpu.models.gaussians import random_cloud
from ray_eater_tpu.models.gs_densify import (DensifyState,
                                             accumulate_grad_stats,
                                             densify_and_prune,
                                             init_densify_state,
                                             make_train_step_adc,
                                             pad_params, reset_new_slots,
                                             reset_opacity)
from ray_eater_tpu.models.gs_training import (GaussianParams,
                                              cloud_from_params,
                                              params_from_cloud,
                                              render_diff,
                                              render_diff_pallas)

W, H = 80, 60


def camera():
    view = rmath.look_at_zforward(rmath.vec(0.0, 0.2, -2.2),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)
    return view, proj


def small_params(n=4, cap=8, scale=0.05):
    cloud = random_cloud(n, seed=3, extent=0.4,
                         scale_range=(scale, scale))
    return pad_params(params_from_cloud(cloud), cap)


def test_pad_params_dead_slots_render_to_nothing():
    view, proj = camera()
    cloud = random_cloud(6, seed=2, extent=0.4, scale_range=(0.05, 0.1))
    p = params_from_cloud(cloud)
    base = render_diff(p, view, proj, W, H)
    padded = render_diff(pad_params(p, 32), view, proj, W, H)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base),
                               atol=1e-6)


def test_densify_clones_small_and_splits_large():
    cap = 16
    p = small_params(n=4, cap=cap, scale=0.05)
    # splat 0 small (clone), splat 1 large (split); both over threshold
    p = GaussianParams(
        means=p.means,
        log_scales=p.log_scales.at[0].set(jnp.log(0.004))
                               .at[1].set(jnp.log(0.5)),
        quats=p.quats, opacity_logits=p.opacity_logits, colors=p.colors)
    st = init_densify_state(cap, 4)
    st = DensifyState(
        live=st.live,
        grad_accum=jnp.zeros(cap).at[0].set(10.0).at[1].set(20.0),
        grad_count=jnp.ones(cap))
    p2, st2, stats = densify_and_prune(
        p, st, jax.random.PRNGKey(0), grad_threshold=1.0,
        scene_extent=1.0, percent_dense=0.01)
    assert int(stats["n_clone"]) == 1
    assert int(stats["n_split"]) == 1
    assert int(stats["n_live"]) == 6
    live = np.asarray(st2.live)
    assert live[:6].all() and not live[6:].any()
    # the split parent (slot 1) and its child both shrank by 1.6
    np.testing.assert_allclose(float(p2.log_scales[1, 0]),
                               float(jnp.log(0.5 / 1.6)), rtol=1e-5)
    new_logs = np.asarray(p2.log_scales[4:6])
    assert np.isclose(new_logs, np.log(0.5 / 1.6), rtol=1e-4).any(), \
        "one child must carry the shrunk split scale"
    assert np.isclose(new_logs, np.log(0.004), rtol=1e-4).any(), \
        "one child must carry the clone's unchanged scale"
    # statistics reset
    assert float(jnp.sum(st2.grad_accum)) == 0.0


def test_densify_respects_capacity_and_ranking():
    cap = 6
    p = small_params(n=5, cap=cap, scale=0.004)
    st = init_densify_state(cap, 5)
    # 3 candidates over threshold, only ONE dead slot: the highest-avg
    # candidate (index 2) must win it
    st = DensifyState(
        live=st.live,
        grad_accum=jnp.zeros(cap).at[0].set(5.0).at[1].set(8.0)
                                 .at[2].set(30.0),
        grad_count=jnp.ones(cap))
    p2, st2, stats = densify_and_prune(
        p, st, jax.random.PRNGKey(1), grad_threshold=1.0,
        scene_extent=1.0)
    assert int(stats["n_clone"]) + int(stats["n_split"]) == 1
    assert bool(st2.live.all())
    # the child (slot 5) is a jittered copy of parent 2
    d = np.linalg.norm(np.asarray(p2.means[5] - p.means[2]))
    assert d < 0.01, "clone child must start near its parent"


def test_prune_kills_transparent_and_huge():
    cap = 8
    p = small_params(n=4, cap=cap, scale=0.05)
    p = GaussianParams(
        means=p.means,
        log_scales=p.log_scales.at[3].set(jnp.log(5.0)),
        quats=p.quats,
        opacity_logits=p.opacity_logits.at[2].set(-8.0),  # ~3e-4
        colors=p.colors)
    st = init_densify_state(cap, 4)
    p2, st2, stats = densify_and_prune(
        p, st, jax.random.PRNGKey(2), grad_threshold=1e9,
        scene_extent=1.0, prune_opacity=0.005, prune_scale3d=1.0)
    assert int(stats["n_prune"]) == 2
    live = np.asarray(st2.live)
    assert not live[2] and not live[3] and live[:2].all()
    # killed slots render to nothing: opacity below the alpha floor
    assert float(jax.nn.sigmoid(p2.opacity_logits[2])) < 1e-4


def test_opacity_reset_clamps_live_only():
    cap = 8
    p = small_params(n=4, cap=cap)
    st = init_densify_state(cap, 4)
    p2 = reset_opacity(p, st, max_opacity=0.01)
    op = np.asarray(jax.nn.sigmoid(p2.opacity_logits))
    assert (op[:4] <= 0.0101).all()
    np.testing.assert_allclose(np.asarray(p2.opacity_logits[4:]),
                               np.asarray(p.opacity_logits[4:]))


def test_reset_new_slots_zeroes_adam_moments():
    cap = 8
    p = small_params(n=4, cap=cap)
    opt = optax.adam(1e-2)
    state = opt.init(p)
    # fake non-zero moments
    state = jax.tree_util.tree_map(
        lambda a: (a + 1.0 if isinstance(a, jnp.ndarray)
                   and jnp.issubdtype(a.dtype, jnp.floating) else a),
        state)
    prev = jnp.arange(cap) < 4
    live = jnp.arange(cap) < 6          # slots 4, 5 newly allocated
    state2 = reset_new_slots(state, prev, live)
    mu = state2[0].mu.means
    np.testing.assert_allclose(np.asarray(mu[4:6]), 0.0)
    np.testing.assert_allclose(np.asarray(mu[:4]), 1.0)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_viewspace_grad_stats_flow(use_pallas):
    view, proj = camera()
    cap = 16
    p = small_params(n=4, cap=cap, scale=0.08)
    target = jnp.zeros((H, W, 3))
    opt = optax.adam(1e-3)
    step = make_train_step_adc(opt, W, H, use_pallas=use_pallas,
                               interpret=True)
    st = init_densify_state(cap, 4)
    p2, _, st2, loss = step(p, opt.init(p), st, target, view, proj)
    acc = np.asarray(st2.grad_accum)
    assert float(loss) > 0
    assert (acc[:4] > 0).sum() >= 3, \
        "visible splats must accumulate view-space gradient"
    assert (acc[4:] == 0).all(), "dead slots must not"


def test_adc_reconstructs_beyond_initial_count():
    # end-to-end INRIA loop: a 16-splat random init cannot fit a
    # 150-splat target; densification must grow the cloud and reach a
    # fidelity the fixed-size baseline cannot
    view, proj = camera()
    target_cloud = random_cloud(150, seed=42, extent=0.5,
                                scale_range=(0.03, 0.08))
    target = render_diff(params_from_cloud(target_cloud), view, proj,
                         W, H)
    view2 = rmath.look_at_zforward(rmath.vec(1.2, 0.4, -1.9),
                                   rmath.vec(0.0, 0.0, 0.0))
    target2 = render_diff(params_from_cloud(target_cloud), view2, proj,
                          W, H)
    cams = [(view, target), (view2, target2)]

    cap = 256
    p0 = params_from_cloud(random_cloud(16, seed=7, extent=0.5,
                                        scale_range=(0.05, 0.1)))
    opt = optax.adam(6e-3)
    step = make_train_step_adc(opt, W, H)

    def train(densify: bool, steps=360):
        p = pad_params(p0, cap)
        st = init_densify_state(cap, 16)
        os_ = opt.init(p)
        key = jax.random.PRNGKey(0)
        for i in range(steps):
            v, t = cams[i % len(cams)]
            p, os_, st, loss = step(p, os_, st, t, v, proj)
            if densify and i % 60 == 59 and i < steps - 60:
                avg = np.asarray(st.grad_accum
                                 / np.maximum(np.asarray(st.grad_count),
                                              1.0))
                lv = np.asarray(st.live)
                thr = float(np.quantile(avg[lv], 0.7))
                key, k = jax.random.split(key)
                prev = st.live
                p, st, stats = densify_and_prune(
                    p, st, k, grad_threshold=max(thr, 1e-12),
                    scene_extent=1.0)
                os_ = reset_new_slots(os_, prev, st.live)
        mse = float(jnp.mean(
            (render_diff(p, view, proj, W, H) - target) ** 2))
        n_live = int(jnp.sum(st.live))
        return 10 * np.log10(1.0 / max(mse, 1e-12)), n_live

    psnr_adc, n_adc = train(True)
    psnr_fixed, n_fixed = train(False)
    assert n_adc > 40, f"densification must grow the cloud (got {n_adc})"
    assert n_fixed == 16
    assert psnr_adc > psnr_fixed + 1.5, (psnr_adc, psnr_fixed)
    assert psnr_adc > 24.0, psnr_adc
