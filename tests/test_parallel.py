"""Multi-device sharded rendering on the 8-device virtual CPU mesh:
sharded outputs must match the single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ray_eater_tpu as re
from ray_eater_tpu import rmath
from ray_eater_tpu.models.gaussians import random_cloud
from ray_eater_tpu.ops.gs import render_gaussians
from ray_eater_tpu.parallel.sharded import (make_device_mesh,
                                            render_gaussians_sharded,
                                            render_mesh_sharded)

W, H = 256, 128


def camera():
    view = rmath.look_at_zforward(rmath.vec(0.0, 0.6, -2.5),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)
    return view, proj


def test_mesh_has_8_devices():
    mesh = make_device_mesh()
    assert mesh.shape["d"] == 8


def test_gaussians_sharded_matches_single():
    view, proj = camera()
    cloud = random_cloud(512, seed=11, extent=0.8,
                         scale_range=(0.02, 0.06))
    single = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                         (0.1, 0.1, 0.1), interpret=True))
    mesh = make_device_mesh()
    sharded = np.asarray(render_gaussians_sharded(
        cloud, view, proj, W, H, mesh, (0.1, 0.1, 0.1), interpret=True))
    assert sharded.shape == single.shape
    err = np.abs(sharded - single)
    # identical math, different reduction grouping → tiny fp drift only
    assert err.max() < 1e-4, err.max()


def test_gaussians_sharded_flagship_config_matches_single():
    # the FULL flagship knob set (VERDICT round-2 weak item 6): per-tile
    # LOD + temporal budget feedback + stats telemetry + tail slab +
    # footprint-tight tile_w, sharded == single-device
    from ray_eater_tpu.ops.gs import num_tiles, update_lod_budget
    view, proj = camera()
    cloud = random_cloud(1024, seed=7, extent=0.8,
                         scale_range=(0.02, 0.06))
    mesh = make_device_mesh()
    kw = dict(max_splats_per_tile=128, big_splat_cap=128, lod_tail=True,
              tile_w=32)
    single, st1 = render_gaussians(cloud, view, proj, W, H,
                                   return_stats=True, interpret=True,
                                   **kw)
    sharded, st2 = render_gaussians_sharded(cloud, view, proj, W, H, mesh,
                                            return_stats=True,
                                            interpret=True, **kw)
    # stats parity: same pair totals dropped, same telemetry shape
    assert st2["tile_exec"].shape[0] >= st1["tile_exec"].shape[0]
    assert int(st2["overflow_big_splats"]) >= 0
    err = np.abs(np.asarray(sharded) - np.asarray(single))
    # LOD pool allocation is per-band (each band scales its own pool) and
    # the tail slab's per-splat energy split is band-local, so sharded is
    # not bit-identical — but with an uncrowded pool both effects vanish
    # on most pixels
    assert err.mean() < 5e-3, err.mean()

    # temporal adaptive LOD round trip: full-grid telemetry → full-grid
    # budget → next sharded frame accepts it
    ntx, nty = num_tiles(W, H, tile_w=32)
    nty = -(-nty // 8) * 8          # sharded pads rows to the mesh size
    budget = update_lod_budget(st2["tile_exec"], 128, ntx, nty,
                               st2["tile_kept"], st2["tile_count"])
    img2 = render_gaussians_sharded(cloud, view, proj, W, H, mesh,
                                    lod_budget=budget, interpret=True,
                                    **kw)
    err2 = np.abs(np.asarray(img2) - np.asarray(single))
    assert err2.mean() < 5e-3, err2.mean()


def test_gaussians_sharded_ring_exchange_matches_all_gather():
    # ring splat exchange (ppermute + band compaction, the 10M-splat
    # memory path) must match the all_gather exchange; overflow counted
    # when the ring budget is too small
    view, proj = camera()
    cloud = random_cloud(512, seed=11, extent=0.8,
                         scale_range=(0.02, 0.06))
    mesh = make_device_mesh()
    base = np.asarray(render_gaussians_sharded(
        cloud, view, proj, W, H, mesh, (0.1, 0.1, 0.1), interpret=True))
    # budget = N: cannot overflow (bands here are 32 px, radii are
    # comparable — the 2N/D default is for production aspect ratios)
    ringed, st = render_gaussians_sharded(
        cloud, view, proj, W, H, mesh, (0.1, 0.1, 0.1), interpret=True,
        splat_exchange="ring", ring_budget=512, return_stats=True)
    err = np.abs(np.asarray(ringed) - base)
    assert err.max() < 1e-4, err.max()
    assert int(st["overflow_big_splats"]) == 0
    assert bool(st["lossless"])         # exact + no channel drops
    # starve the budget: must still render (graceful) and report drops
    _, st2 = render_gaussians_sharded(
        cloud, view, proj, W, H, mesh, (0.1, 0.1, 0.1), interpret=True,
        splat_exchange="ring", ring_budget=16, return_stats=True)
    assert int(st2["overflow_big_splats"]) > 0
    assert not bool(st2["lossless"])    # drops withdraw the certificate


def test_gaussians_depth_sliced_matches_single():
    # sort-last mode: depth-quantile slices composited full-frame per
    # device, folded front-to-back — must match the single-device exact
    # render (different pair->device split => fp-grouping drift only)
    from ray_eater_tpu.parallel.sharded import render_gaussians_depth_sliced
    view, proj = camera()
    cloud = random_cloud(512, seed=11, extent=0.8,
                         scale_range=(0.02, 0.06))
    single = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                         (0.1, 0.2, 0.3), interpret=True))
    mesh = make_device_mesh()
    sliced, st = render_gaussians_depth_sliced(
        cloud, view, proj, W, H, mesh, (0.1, 0.2, 0.3), interpret=True,
        slice_budget=512, return_stats=True)
    assert int(st["overflow_big_splats"]) == 0
    assert bool(st["lossless"])
    err = np.abs(np.asarray(sliced) - single)
    assert err.max() < 1e-4, err.max()
    # starved slice budget: graceful + counted
    _, st2 = render_gaussians_depth_sliced(
        cloud, view, proj, W, H, mesh, (0.1, 0.2, 0.3), interpret=True,
        slice_budget=16, return_stats=True)
    assert int(st2["overflow_big_splats"]) > 0
    assert not bool(st2["lossless"])
    # two-level big-splat binning through the sort-last path
    big = random_cloud(256, seed=3, extent=0.6,
                       scale_range=(0.05, 0.35))
    sb = np.asarray(render_gaussians(big, view, proj, W, H, (0, 0, 0),
                                     big_splat_cap=256, interpret=True))
    db = np.asarray(render_gaussians_depth_sliced(
        big, view, proj, W, H, mesh, (0, 0, 0), big_splat_cap=256,
        slice_budget=256, interpret=True))
    assert np.abs(db - sb).max() < 1e-4


def test_gaussians_sharded_rejects_indivisible():
    view, proj = camera()
    cloud = random_cloud(513, seed=1)
    with pytest.raises(ValueError, match="not divisible"):
        render_gaussians_sharded(cloud, view, proj, W, H,
                                 make_device_mesh(), interpret=True)


def test_raster_sharded_matches_single():
    mesh_dev = make_device_mesh()
    geo = re.two_planes()
    uni = {
        "model": rmath.rotate_y(rmath.identity(), 0.4),
        "view": rmath.look_at(rmath.vec(2., 2., 2.), rmath.vec(0., 0., 0.)),
        "projection": rmath.perspective(rmath.radians(45.0), W / H, 0.1,
                                        30.0),
    }

    def frag(v, r):
        c = v["color"]
        return jnp.concatenate(
            [c, jnp.ones((*c.shape[:-1], 1), jnp.float32)], -1)

    pipe = re.GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                               fragment_fn=frag)
    fb = re.render_mesh(pipe, geo, uni, {}, re.create_framebuffer(W, H),
                        interpret=True)
    single_c = np.asarray(fb.color)[:H, :W]
    single_d = np.asarray(fb.depth)[:H, :W]

    color, depth = render_mesh_sharded(pipe, geo, uni, {}, W, H, mesh_dev,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(color), single_c, atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), single_d, atol=2e-5)


def test_sharded_jit_compiles_once():
    view, proj = camera()
    cloud = random_cloud(512, seed=3)
    mesh = make_device_mesh()

    @jax.jit
    def step(means, scales, quats, opac, colors, v, p):
        from ray_eater_tpu.models.gaussians import GaussianCloud
        c = GaussianCloud(means=means, scales=scales, quats=quats,
                          opacities=opac, colors=colors)
        return render_gaussians_sharded(c, v, p, W, H, mesh,
                                        interpret=True)

    img = step(cloud.means, cloud.scales, cloud.quats, cloud.opacities,
               cloud.colors, view, proj)
    assert np.isfinite(np.asarray(img)).all()


def test_gaussians_sharded_midfan_exact_certified_matches_single():
    # the inria PRODUCTION knob set (VERDICT round-3 task 6): three-level
    # binning (mid_splat_cap with big_splat_cap), payload-sort exact pack,
    # and the saturation-certified lossless flag — sharded == single on
    # the configs that actually ship. Wide radius range so all three fan
    # levels carry splats.
    view, proj = camera()
    cloud = random_cloud(1024, seed=5, extent=0.7,
                         scale_range=(0.02, 0.28))
    mesh = make_device_mesh()
    # this cloud projects 904 mid-fan splats at 256x128 (per-axis
    # extents): caps must clear the counts for the lossless certificate
    # below to hold; the mid-lo split + corner channel ride along so the
    # sharded program exercises every fan level that ships
    caps = dict(big_splat_cap=256, mid_splat_cap=1024,
                mid_lo_splat_cap=1024, corner_cap=512, tile_w=32)

    # exact mode (payload-sort): bit-near parity + certificates agree
    single, st1 = render_gaussians(cloud, view, proj, W, H,
                                   return_stats=True, interpret=True,
                                   **caps)
    sharded, st2 = render_gaussians_sharded(cloud, view, proj, W, H, mesh,
                                            return_stats=True,
                                            interpret=True, **caps)
    assert int(st1["overflow_big_splats"]) == 0
    assert int(st2["overflow_big_splats"]) == 0
    assert bool(st1["lossless"]) and bool(st2["lossless"])
    err = np.abs(np.asarray(sharded) - np.asarray(single))
    assert err.max() < 1e-4, err.max()

    # LOD mode with the mid fan + temporal budget round trip
    from ray_eater_tpu.ops.gs import num_tiles, update_lod_budget
    kw = dict(max_splats_per_tile=128, **caps)
    s_lod, stl1 = render_gaussians(cloud, view, proj, W, H,
                                   return_stats=True, interpret=True,
                                   **kw)
    d_lod, stl2 = render_gaussians_sharded(cloud, view, proj, W, H, mesh,
                                           return_stats=True,
                                           interpret=True, **kw)
    err2 = np.abs(np.asarray(d_lod) - np.asarray(s_lod))
    assert err2.mean() < 5e-3, err2.mean()
    ntx, nty = num_tiles(W, H, tile_w=32)
    nty = -(-nty // 8) * 8
    budget = update_lod_budget(stl2["tile_exec"], 128, ntx, nty,
                               stl2["tile_kept"], stl2["tile_count"])
    img2 = render_gaussians_sharded(cloud, view, proj, W, H, mesh,
                                    lod_budget=budget, interpret=True,
                                    **kw)
    err3 = np.abs(np.asarray(img2) - np.asarray(s_lod))
    assert err3.mean() < 5e-3, err3.mean()


def test_gaussians_sharded_tail_decim_matches_single():
    # the decimated-tail composite (inria production default since
    # 2026-08-21: mpt=128 + tail=768 @ lod_tail_d=4) — sharded == single
    # at both decimation factors. Pool grants are per-band, so parity is
    # statistical (mean), like the other LOD-mode checks.
    view, proj = camera()
    cloud = random_cloud(1024, seed=5, extent=0.7,
                         scale_range=(0.02, 0.28))
    mesh = make_device_mesh()
    caps = dict(big_splat_cap=256, mid_splat_cap=1024,
                mid_lo_splat_cap=1024, corner_cap=512, tile_w=32)
    for tail_d in (2, 4):
        kw = dict(max_splats_per_tile=64, lod_tail_decim=128,
                  lod_tail_d=tail_d, **caps)
        s, st1 = render_gaussians(cloud, view, proj, W, H,
                                  return_stats=True, interpret=True,
                                  **kw)
        d, st2 = render_gaussians_sharded(cloud, view, proj, W, H,
                                          mesh, return_stats=True,
                                          interpret=True, **kw)
        err = np.abs(np.asarray(d) - np.asarray(s))
        assert err.mean() < 5e-3, (tail_d, err.mean())
        # the tail moves dropped-pair accounting behind the second pool
        # on both paths
        assert int(st2["overflow_pairs"]) >= 0


def test_mid_cap_requires_big_cap():
    view, proj = camera()
    cloud = random_cloud(256, seed=1)
    with pytest.raises(ValueError, match="mid_splat_cap"):
        render_gaussians(cloud, view, proj, W, H, mid_splat_cap=64,
                         interpret=True)
