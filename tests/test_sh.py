"""Spherical-harmonic view-dependent color evaluation."""

import numpy as np
import jax.numpy as jnp

from ray_eater_tpu import rmath
from ray_eater_tpu.models.gaussians import (eval_sh_colors, gaussian_cloud,
                                            load_ply, random_cloud, save_ply)
from ray_eater_tpu.ops.gs import render_gaussians


def cloud_with_sh(n=8, bands=15, seed=0):
    rng = np.random.RandomState(seed)
    base = random_cloud(n, seed=seed)
    sh = rng.randn(n, bands, 3).astype(np.float32) * 0.1
    return gaussian_cloud(base.means, base.scales, base.quats,
                          base.opacities, base.colors, sh)


def test_degree0_passthrough():
    c = random_cloud(5, seed=1)
    out = eval_sh_colors(c, (0.0, 0.0, -3.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(c.colors))


def test_sh_view_dependence():
    c = cloud_with_sh()
    a = np.asarray(eval_sh_colors(c, (0.0, 0.0, -5.0)))
    b = np.asarray(eval_sh_colors(c, (5.0, 0.0, 0.0)))
    assert a.shape == (8, 3)
    assert not np.allclose(a, b)          # colors change with view
    assert (a >= 0).all() and (a <= 1).all()


def test_sh_degree1_analytic():
    # single splat with only the z-band (index 1) of degree 1 set: color =
    # clip(base + C1 * z_dir * coeff). Camera straight below on -z → dir=+z.
    sh = np.zeros((1, 3, 3), np.float32)
    sh[0, 1, 0] = 1.0     # z band, red channel
    c = gaussian_cloud([[0, 0, 0]], [[0.1] * 3], [[1, 0, 0, 0]], [1.0],
                       [[0.5, 0.5, 0.5]], sh)
    out = np.asarray(eval_sh_colors(c, (0.0, 0.0, -2.0)))[0]
    want_r = 0.5 + 0.4886025119029199 * 1.0   # dir = (0,0,1)
    np.testing.assert_allclose(out[0], min(want_r, 1.0), rtol=1e-5)
    np.testing.assert_allclose(out[1], 0.5, atol=1e-6)


def test_ply_roundtrip_with_sh(tmp_path):
    c = cloud_with_sh(n=16)
    p = str(tmp_path / "sh.ply")
    save_ply(p, c)
    back = load_ply(p)
    assert back.sh_rest is not None and back.sh_degree == 3
    np.testing.assert_allclose(np.asarray(back.sh_rest),
                               np.asarray(c.sh_rest), atol=1e-6)


def test_render_with_sh_runs():
    c = cloud_with_sh(n=64, seed=3)
    view = rmath.look_at_zforward(rmath.vec(0., 0., -3.),
                                  rmath.vec(0., 0., 0.))
    proj = rmath.perspective(rmath.radians(60.0), 2.0, 0.1, 30.0)
    img = np.asarray(render_gaussians(c, view, proj, 128, 64,
                                      cam_pos=(0., 0., -3.),
                                      interpret=True))
    assert np.isfinite(img).all()
