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


def test_pallas_backward_matches_jnp_autodiff():
    # the custom-VJP composite backward vs jnp autodiff of an independent
    # jnp reimplementation of the SAME step sweep, on identical packed
    # inputs — isolates the kernel gradient from binning discreteness
    from ray_eater_tpu.ops import gs

    view, proj = camera()
    cloud = random_cloud(60, seed=5, extent=0.7, scale_range=(0.03, 0.09))
    ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                              cloud.opacities, cloud.colors, view, proj,
                              W, H)
    records = gs._make_records(ps)
    ntx = -(-W // gs.TILE_W)
    nty = -(-H // gs.TILE_H)
    cap = -(-(60 * gs.KX * gs.KY + ntx * nty * 128) // 128) * 128
    pack_idx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
        ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
        jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap, max_per_tile=512)
    packed0 = jnp.take(records, pack_idx, axis=0)
    ntiles = ntx * nty
    st, sf, sb, sl, sh = [np.asarray(x) for x in steps]

    def composite_ref(packed):
        pix = gs._PIX
        r = jnp.zeros((ntiles, pix))
        g = jnp.zeros((ntiles, pix))
        b = jnp.zeros((ntiles, pix))
        t = jnp.ones((ntiles, pix))
        for si in range(len(st)):
            tile = int(st[si])
            if tile >= ntiles:
                continue
            base = int(sb[si]) * 128
            rec = packed[base:base + 128]
            i = np.arange(pix)
            px = (i & 127) + (tile % ntx) * gs.TILE_W + 0.5
            py = (i >> 7) + (tile // ntx) * gs.TILE_H + 0.5
            dx = px[None] - rec[:, 0:1]
            dy = py[None] - rec[:, 1:2]
            power = (-0.5 * (rec[:, 2:3] * dx * dx + rec[:, 4:5] * dy * dy)
                     - rec[:, 3:4] * dx * dy)
            araw = rec[:, 5:6] * jnp.exp(power)
            a = jnp.minimum(araw, 0.99)
            rows = np.arange(128)[:, None]        # block-local [lo, hi)
            live = (rows >= int(sl[si])) & (rows < int(sh[si]))
            a = jnp.where(live & (araw >= 1 / 255), a, 0.0)
            lom = jnp.log(jnp.maximum(1 - a, 1e-6))
            ti = t[tile] * jnp.exp(jnp.cumsum(lom, 0) - lom)
            w = a * ti
            r = r.at[tile].add(jnp.sum(rec[:, 6:7] * w, 0))
            g = g.at[tile].add(jnp.sum(rec[:, 7:8] * w, 0))
            b = b.at[tile].add(jnp.sum(rec[:, 8:9] * w, 0))
            t = t.at[tile].multiply(jnp.exp(jnp.sum(lom, 0)))
        return r, g, b, t

    # random cotangents over the REAL tile rows only (the pallas sentinel
    # row holds garbage by design)
    ct = [jax.random.normal(jax.random.PRNGKey(i), (ntiles, gs._PIX))
          for i in range(4)]

    def loss_ref(p):
        return sum(jnp.sum(c * x) for c, x in zip(ct, composite_ref(p)))

    def loss_pal(p):
        planes = gs.composite_diff(p, steps, nty, ntx, True)
        return sum(jnp.sum(c * x.reshape(ntiles + 1, -1)[:ntiles])
                   for c, x in zip(ct, planes))

    g_ref = np.asarray(jax.grad(loss_ref)(packed0))
    g_pal = np.asarray(jax.grad(loss_pal)(packed0))
    scale = max(np.abs(g_ref).max(), 1e-12)
    assert np.abs(g_ref - g_pal).max() / scale < 1e-4


def test_pallas_train_step_reduces_loss():
    from ray_eater_tpu.models.gs_training import make_train_step_pallas

    view, proj = camera()
    target = render_diff(params_from_cloud(
        random_cloud(48, seed=21, extent=0.5, scale_range=(0.05, 0.1))),
        view, proj, W, H)
    params = params_from_cloud(
        random_cloud(48, seed=22, extent=0.5, scale_range=(0.05, 0.1)))
    opt = optax.adam(5e-3)
    step = make_train_step_pallas(opt, view, proj, interpret=True)
    state = opt.init(params)
    losses = []
    for _ in range(8):
        params, state, loss = step(params, state, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


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
