"""Differentiable 3DGS: render parity with the kernel path, gradient flow,
and single/multi-device training steps that actually reduce loss."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ray_eater_tpu import rmath
from ray_eater_tpu.models.gaussians import random_cloud
from ray_eater_tpu.models.gs_training import (GaussianParams,
                                              cloud_from_params, l2_loss,
                                              make_train_step,
                                              make_train_step_dp,
                                              params_from_cloud, render_diff)
from ray_eater_tpu.ops.gs import render_gaussians
from ray_eater_tpu.parallel.sharded import make_device_mesh

W, H = 128, 64


def camera():
    view = rmath.look_at_zforward(rmath.vec(0.0, 0.0, -3.0),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)
    return view, proj


def test_params_cloud_roundtrip():
    cloud = random_cloud(32, seed=0)
    back = cloud_from_params(params_from_cloud(cloud))
    np.testing.assert_allclose(np.asarray(back.scales),
                               np.asarray(cloud.scales), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(back.opacities),
                               np.asarray(cloud.opacities), atol=1e-5)


def test_render_diff_close_to_kernel_path():
    view, proj = camera()
    cloud = random_cloud(40, seed=7, extent=0.6, scale_range=(0.03, 0.08))
    params = params_from_cloud(cloud)
    img_d = np.asarray(render_diff(params, view, proj, W, H))
    img_k = np.asarray(render_gaussians(cloud_from_params(params), view,
                                        proj, W, H, interpret=True))
    # differentiable path has no tile-footprint truncation or alpha floor,
    # so allow a small tolerance
    assert np.abs(img_d - img_k).max() < 0.06


def test_gradients_flow_to_all_params():
    view, proj = camera()
    cloud = random_cloud(16, seed=3, extent=0.5, scale_range=(0.05, 0.1))
    params = params_from_cloud(cloud)
    target = jnp.zeros((H, W, 3))
    grads = jax.grad(l2_loss)(params, view, proj, target)
    for name in ("means", "log_scales", "quats", "opacity_logits",
                 "colors"):
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
        assert np.abs(g).max() > 0, f"no gradient to {name}"


def test_train_step_reduces_loss():
    view, proj = camera()
    target_cloud = random_cloud(24, seed=11, extent=0.5,
                                scale_range=(0.05, 0.12))
    target = render_diff(params_from_cloud(target_cloud), view, proj, W, H)

    init = random_cloud(24, seed=12, extent=0.5, scale_range=(0.05, 0.12))
    params = params_from_cloud(init)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(opt, view, proj)

    params, opt_state, loss0 = step(params, opt_state, target)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, target)
    assert float(loss) < float(loss0) * 0.7, (float(loss0), float(loss))


def test_dp_train_step_matches_single_device():
    view, proj = camera()
    cloud = random_cloud(24, seed=5, extent=0.5, scale_range=(0.05, 0.1))
    target = render_diff(params_from_cloud(
        random_cloud(24, seed=6, extent=0.5, scale_range=(0.05, 0.1))),
        view, proj, W, H)

    opt = optax.adam(1e-3)
    params0 = params_from_cloud(cloud)

    step1 = make_train_step(opt, view, proj)
    p1, _, loss1 = step1(params0, opt.init(params0), target)

    mesh = make_device_mesh()
    stepn = make_train_step_dp(opt, view, proj, mesh)
    pn, _, lossn = stepn(params0, opt.init(params0), target)

    np.testing.assert_allclose(float(lossn), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pn.means), np.asarray(p1.means),
                               atol=1e-6)
