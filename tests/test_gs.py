"""3DGS pipeline: projection math, binning, and the composite kernel vs an
independent float64 numpy compositor (same tile-footprint semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ray_eater_tpu import rmath
from ray_eater_tpu.models.gaussians import (GaussianCloud, gaussian_cloud,
                                            load_ply, random_cloud, save_ply)
from ray_eater_tpu.ops import gs
from ray_eater_tpu.ops.gs import (ProjectedSplats, project_gaussians,
                                  quat_to_rotmat, render_gaussians)

W, H = 256, 96


def camera():
    # GS needs true view depth → the correct-convention camera
    view = rmath.look_at_zforward(rmath.vec(0.0, 0.0, -3.0),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)
    return view, proj


def test_quat_to_rotmat_identity_and_z90():
    r = np.asarray(quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]])))[0]
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)
    s = np.sqrt(2) / 2
    rz = np.asarray(quat_to_rotmat(jnp.array([[s, 0, 0, s]])))[0]
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(rz, want, atol=1e-6)


def test_projection_center_splat():
    # splat at the origin, camera on -z looking at it → projects to screen
    # center with depth = 3
    view, proj = camera()
    ps = project_gaussians(
        jnp.zeros((1, 3)), jnp.full((1, 3), 0.05),
        jnp.array([[1.0, 0, 0, 0]]), jnp.ones((1,)), jnp.ones((1, 3)),
        view, proj, W, H)
    assert np.isfinite(float(ps.depth[0]))
    np.testing.assert_allclose(float(ps.depth[0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ps.mean2d[0]), [W / 2, H / 2],
                               atol=1e-3)
    # isotropic splat → isotropic conic (b ≈ 0, a ≈ c)
    conic = np.asarray(ps.conic[0])
    assert abs(conic[1]) < 1e-4 * abs(conic[0])
    r = int(ps.radius[0])
    assert 1 <= r <= gs.TILE_H * (gs.KY - 1) // 2


def test_behind_camera_culled():
    view, proj = camera()
    ps = project_gaussians(
        jnp.array([[0.0, 0.0, -10.0]]), jnp.full((1, 3), 0.05),
        jnp.array([[1.0, 0, 0, 0]]), jnp.ones((1,)), jnp.ones((1, 3)),
        view, proj, W, H)
    assert not np.isfinite(float(ps.depth[0]))


def reference_composite(ps: ProjectedSplats, width, height, bg,
                        two_level=False, return_sensitive=False,
                        tile_w=None):
    """Float64 per-pixel compositor with the kernel's tile-footprint rule:
    a splat contributes exactly to the pixels of the tiles it bins into.
    ``two_level=True`` mirrors the big_splat_cap path: splats larger than
    the level-1 radius limit get the coarse KX2×KY2 span cap.
    ``return_sensitive=True`` also returns a (H, W) bool mask of pixels
    where some splat's alpha sits within f32-rounding distance of the
    discrete ``_ALPHA_MIN`` cutoff — there the kernel's f32 arithmetic can
    legitimately land on the other side of the 1/255 decision than this
    f64 oracle, so tolerance assertions should exclude those pixels."""
    tw = gs.TILE_W if tile_w is None else tile_w
    order = np.argsort(np.asarray(ps.depth), kind="stable")
    ys, xs = np.mgrid[0:height, 0:width]
    px, py = xs + 0.5, ys + 0.5
    img = np.zeros((height, width, 3))
    T = np.ones((height, width))
    sensitive = np.zeros((height, width), bool)
    ntx = -(-width // tw)
    nty = -(-height // gs.TILE_H)
    # per-axis level-1 span limits (the kernel's anisotropic routing)
    r1x = (gs.KX - 1) * tw // 2 - 1
    r1y = (gs.KY - 1) * gs.TILE_H // 2 - 1
    for i in order:
        if not np.isfinite(float(ps.depth[i])):
            continue
        mx, my = (float(ps.mean2d[i, 0]), float(ps.mean2d[i, 1]))
        r = float(ps.radius[i])
        # bbox spans use the per-axis extents; the circle corner cull
        # uses the circumscribed radius (gs._emit_fan semantics)
        rx = float(ps.ext[i, 0]) if ps.ext is not None else r
        ry = float(ps.ext[i, 1]) if ps.ext is not None else r
        tx0 = int(np.clip(np.floor((mx - rx) / tw), 0, ntx - 1))
        tx1 = int(np.clip(np.floor((mx + rx) / tw), 0, ntx - 1))
        ty0 = int(np.clip(np.floor((my - ry) / gs.TILE_H), 0, nty - 1))
        ty1 = int(np.clip(np.floor((my + ry) / gs.TILE_H), 0, nty - 1))
        kx, ky = ((gs._kx2(tw), gs.KY2)
                  if two_level and (rx > r1x or ry > r1y)
                  else (gs.KX, gs.KY))
        tx1 = min(tx1, tx0 + kx - 1)      # span cap, like the kernel
        ty1 = min(ty1, ty0 + ky - 1)
        # footprint = union of span tiles whose rect the circle touches
        # (the kernel's circle-vs-tile emission cull)
        box = np.zeros_like(px, bool)
        for tty in range(ty0, ty1 + 1):
            for ttx in range(tx0, tx1 + 1):
                rx0, ry0 = ttx * tw, tty * gs.TILE_H
                ddx = max(rx0 - mx, mx - (rx0 + tw), 0.0)
                ddy = max(ry0 - my, my - (ry0 + gs.TILE_H), 0.0)
                if ddx * ddx + ddy * ddy <= r * r:
                    box |= ((px >= rx0) & (px < rx0 + tw)
                            & (py >= ry0) & (py < ry0 + gs.TILE_H))
        dx, dy = px - mx, py - my
        ca, cb, cc = np.asarray(ps.conic[i], np.float64)
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = float(ps.opacity[i]) * np.exp(power)
        alpha = np.minimum(alpha, gs._ALPHA_MAX)
        sensitive |= box & (np.abs(alpha - gs._ALPHA_MIN)
                            < 1e-5 * gs._ALPHA_MIN)
        alpha = np.where(alpha < gs._ALPHA_MIN, 0.0, alpha)
        alpha = np.where(box, alpha, 0.0)
        img += (T * alpha)[..., None] * np.asarray(ps.color[i], np.float64)
        T *= 1.0 - alpha
    out = img + T[..., None] * np.asarray(bg, np.float64)
    return (out, sensitive) if return_sensitive else out


@pytest.mark.parametrize("tile_w", [128, 32])
def test_composite_matches_reference(tile_w):
    view, proj = camera()
    cloud = random_cloud(80, seed=5, extent=0.8,
                         scale_range=(0.02, 0.08))
    bg = (0.1, 0.2, 0.3)
    got = np.asarray(render_gaussians(cloud, view, proj, W, H, bg,
                                      interpret=True, tile_w=tile_w))
    # same projection the render used — binning is discrete in radius/mean
    ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                          cloud.opacities, cloud.colors, view, proj, W, H,
                          interpret=True)
    want = reference_composite(ps, W, H, bg, tile_w=tile_w)
    assert np.isfinite(got).all()
    err = np.abs(got - want)
    assert err.max() < 2e-3, f"max err {err.max()}"


def test_opaque_front_splat_occludes():
    view, proj = camera()
    # two coincident-screen splats, front one (closer to camera) opaque red
    cloud = gaussian_cloud(
        means=[[0, 0, -0.5], [0, 0, 0.5]],     # -0.5 is closer to cam @ -3
        scales=[[0.1] * 3, [0.1] * 3],
        quats=[[1, 0, 0, 0]] * 2,
        opacities=[0.995, 1.0],
        colors=[[1, 0, 0], [0, 1, 0]])
    img = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                      interpret=True))
    center = img[H // 2, W // 2]
    assert center[0] > 0.9 and center[1] < 0.1, center


def test_empty_and_all_culled():
    view, proj = camera()
    cloud = gaussian_cloud(means=[[0, 0, -50.0]], scales=[[0.01] * 3],
                           quats=[[1, 0, 0, 0]], opacities=[1.0],
                           colors=[[1, 1, 1]])   # behind camera
    img = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                      (0.25, 0.5, 0.75), interpret=True))
    np.testing.assert_allclose(img, np.broadcast_to([0.25, 0.5, 0.75],
                                                    img.shape), atol=1e-6)


def test_pairs_cap_overflow_is_graceful():
    # force a cap far below the needed pair count: pairs beyond the cap
    # are dropped positionally, overflow is reported, the tiles that DID
    # fit render finite values, and dropped regions fall to background —
    # never garbage
    view, proj = camera()
    cloud = random_cloud(200, seed=2, extent=0.5, scale_range=(0.05, 0.15))
    ps = project_gaussians(cloud.means, cloud.scales, cloud.quats,
                           cloud.opacities, cloud.colors, view, proj, W, H)
    records = gs._make_records(ps)
    ntx, nty = 2, 6
    cap = 2 * gs.CHUNK
    pack_idx, steps, visited, overflow, _, _, _, _ = gs._bin_splats(
        ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
        jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap)
    assert int(overflow) > 0
    rec = gs._pack_records(records, pack_idx)
    r, g, b, t, _ = gs._composite_call(rec, steps, nty, ntx, True)
    vis = np.asarray(visited)
    assert np.isfinite(np.asarray(r)[:nty * ntx][vis]).all()
    # and the public API with a finite factor still renders finite images
    img = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                      pairs_cap_factor=1, interpret=True))
    assert np.isfinite(img).all()


def test_cap_stats_report_overflow():
    # return_stats exposes the dropped-pair count: exact render → 0;
    # a starved cap → positive, and the image stays finite
    view, proj = camera()
    n = 600
    rng = np.random.RandomState(3)
    means = (rng.rand(n, 3).astype(np.float32) * 2 - 1) * 0.6
    cloud = gaussian_cloud(means, np.full((n, 3), 0.06),
                           [[1, 0, 0, 0]] * n, [0.5] * n,
                           rng.rand(n, 3).astype(np.float32))
    exact, st0 = render_gaussians(cloud, view, proj, W, H,
                                  return_stats=True, interpret=True)
    assert int(st0["overflow_pairs"]) == 0
    # a dense stack (every splat covers the center tiles) starves a
    # factor-1 cap: overflow must be reported and the image stay finite
    nd = 4000
    dense = gaussian_cloud(np.zeros((nd, 3), np.float32),
                           np.full((nd, 3), 0.2), [[1, 0, 0, 0]] * nd,
                           [0.3] * nd, rng.rand(nd, 3).astype(np.float32))
    capped, st1 = render_gaussians(dense, view, proj, W, H,
                                   pairs_cap_factor=1, return_stats=True,
                                   interpret=True)
    assert np.isfinite(np.asarray(capped)).all()
    assert int(st1["overflow_pairs"]) > 0


@pytest.mark.parametrize("payload", [True, False])
def test_exact_seg_matches_single_chunk(payload):
    # exact-mode multi-chunk composite steps (exact_seg > 1) must be
    # BIT-identical to one-chunk-per-step: both re-check the saturation
    # early-out at every 128-pair boundary, so the composited prefix is
    # the same — only grid sequencing changes
    view, proj = camera()
    cloud = random_cloud(700, seed=12, extent=0.5,
                         scale_range=(0.03, 0.1))
    base = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                       payload_sort=payload,
                                       exact_seg=1, interpret=True))
    for seg in (2, 8):        # 8 = the exact-mode default
        img = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                          payload_sort=payload,
                                          exact_seg=seg, interpret=True))
        np.testing.assert_array_equal(img, base), seg


def test_ky_span_knob():
    # smaller vertical span = harder radius clamp, still finite + close
    view, proj = camera()
    cloud = random_cloud(100, seed=8, extent=0.7, scale_range=(0.02, 0.05))
    img4 = np.asarray(render_gaussians(cloud, view, proj, W, H, ky=4,
                                       interpret=True))
    img3 = np.asarray(render_gaussians(cloud, view, proj, W, H, ky=3,
                                       interpret=True))
    assert np.isfinite(img3).all()
    # small scene, small radii: outputs nearly identical
    assert np.abs(img4 - img3).mean() < 0.01


def test_compact_lod_matches_exact_when_not_binding():
    # a max_splats_per_tile larger than any tile's list must reproduce the
    # exact render bit-for-bit (same pairs, same order, compact layout)
    view, proj = camera()
    cloud = random_cloud(800, seed=5, extent=0.8, scale_range=(0.02, 0.08))
    a = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                    interpret=True))
    b = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                    max_splats_per_tile=4096,
                                    interpret=True))
    assert np.abs(a - b).max() < 1e-6


def test_lossless_certificate():
    # stats["lossless"]: True must guarantee the LOD render differs from
    # exact only past the saturation epsilon (every truncated tile
    # saturated inside its kept list — sub-_T_EPS error); an unsaturated
    # truncation must report False
    view, proj = camera()
    # the saturation early-out is WHOLE-TILE (every pixel T < eps), so
    # the fixture must blanket tiles: depth layers of overlapping
    # near-opaque grids (transmittance ~0.05^layer)
    g = np.stack(np.meshgrid(np.linspace(-4.0, 4.0, 17),
                             np.linspace(-2.0, 2.0, 11),
                             np.linspace(-0.5, 0.5, 24)), -1)
    means = g.reshape(-1, 3).astype(np.float32)
    n = means.shape[0]
    opaque = gaussian_cloud(means, np.full((n, 3), 0.5),
                            [[1, 0, 0, 0]] * n, [0.95] * n,
                            np.tile(np.linspace([1, 0, 0], [0, 0, 1],
                                                24), (17 * 11, 1)))
    exact = np.asarray(render_gaussians(opaque, view, proj, W, H,
                                        interpret=True))
    # 2-chunk budget: the saturation early-out is CHUNK-granular, so the
    # certificate can only prove saturation when it fires before the
    # LAST kept chunk (exec < kept)
    img, st = render_gaussians(opaque, view, proj, W, H,
                               max_splats_per_tile=2 * gs.CHUNK,
                               return_stats=True, interpret=True)
    assert int(st["overflow_pairs"]) > 0          # the cap really binds
    assert bool(st["lossless"])
    # sub-epsilon: dropped tails sit behind T < _T_EPS; remaining delta
    # is f32 reassociation across the aligned-vs-direct chunk grouping
    assert np.abs(np.asarray(img) - exact).max() < 3.0 * gs._T_EPS
    # same geometry, nearly transparent: no saturation -> dry tiles ->
    # certificate must be withdrawn (and the image really differs)
    thin = gaussian_cloud(means, np.full((n, 3), 0.5),
                          [[1, 0, 0, 0]] * n, [0.02] * n,
                          np.tile(np.linspace([1, 0, 0], [0, 0, 1], 24),
                                  (17 * 11, 1)))
    exact_t = np.asarray(render_gaussians(thin, view, proj, W, H,
                                          interpret=True))
    img_t, st_t = render_gaussians(thin, view, proj, W, H,
                                   max_splats_per_tile=gs.CHUNK,
                                   return_stats=True, interpret=True)
    assert not bool(st_t["lossless"])
    assert np.abs(np.asarray(img_t) - exact_t).max() > 3.0 * gs._T_EPS
    # exact mode self-reports lossless via the overflow counters
    _, st_e = render_gaussians(opaque, view, proj, W, H,
                               return_stats=True, interpret=True)
    assert bool(st_e["lossless"])
    # exact mode with a starved positional pair cap drops WHOLE trailing
    # tiles (they never even become visited) — the certificate must be
    # withdrawn via the overflow counter, not fooled by the dry gate
    # (round-3 code-review finding: '& visited' masked kept=0 tiles)
    # exact_seg=1: multi-chunk steps pad the positional cap up to a
    # CHUNK*seg boundary, which on this small scene restores most of the
    # dropped tail (the certificate stays conservatively False but the
    # visible difference this asserts would vanish)
    img_c, st_c = render_gaussians(opaque, view, proj, W, H,
                                   pairs_cap_factor=1, exact_seg=1,
                                   return_stats=True, interpret=True)
    assert int(st_c["overflow_pairs"]) > 0
    assert not bool(st_c["lossless"])
    assert np.abs(np.asarray(img_c) - exact).max() > 3.0 * gs._T_EPS


def test_max_splats_per_tile_lod():
    # per-tile cap: dropping the farthest splats of deep tiles — the near
    # (opaque) splat must survive, and output stays finite everywhere
    view, proj = camera()
    # 200 coincident splats stacked in depth at screen center (more than
    # one CHUNK, so a CHUNK-sized cap actually drops the far tail)
    n = 200
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(-0.5, 0.5, n)    # nearest first at z=-0.5
    cloud = gaussian_cloud(means, np.full((n, 3), 0.08),
                           [[1, 0, 0, 0]] * n, [0.4] * n,
                           np.linspace([1, 0, 0], [0, 0, 1], n))
    full = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                       interpret=True))
    capped = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                         max_splats_per_tile=gs.CHUNK,
                                         interpret=True))
    assert np.isfinite(capped).all()
    c_full = full[H // 2, W // 2]
    c_cap = capped[H // 2, W // 2]
    # near splats dominate; capping far ones changes little at the center
    assert np.abs(c_full - c_cap).max() < 0.1, (c_full, c_cap)
    # and the capped image is not identical (far splats were dropped)
    assert not np.allclose(full, capped)


def test_project_fast_matches_jnp():
    # the Pallas projection kernel vs the autodiff jnp path: same
    # _project_math body, so outputs must agree to float tolerance
    view, proj = camera()
    cloud = random_cloud(1500, seed=13, extent=0.9,
                         scale_range=(0.005, 0.3))
    a = project_gaussians(cloud.means, cloud.scales, cloud.quats,
                          cloud.opacities, cloud.colors, view, proj, W, H)
    b = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                         cloud.opacities, cloud.colors, view, proj, W, H,
                         interpret=True)
    va, vb = np.isfinite(np.asarray(a.depth)), np.isfinite(
        np.asarray(b.depth))
    np.testing.assert_array_equal(va, vb)
    for name in ("mean2d", "conic", "depth", "radius"):
        xa = np.asarray(getattr(a, name))[va]
        xb = np.asarray(getattr(b, name))[vb]
        np.testing.assert_allclose(xa, xb, rtol=2e-5, atol=2e-4,
                                   err_msg=name)


def test_big_splat_two_level_matches_reference():
    # splats larger than the level-1 radius clamp (15 px) render through
    # the coarse KX2xKY2 fan instead of being truncated: the two-level
    # render must match the float64 oracle with the RAISED radius ceiling
    view, proj = camera()
    rng = np.random.RandomState(3)
    n = 40
    means = (rng.rand(n, 3).astype(np.float32) - 0.5) * 1.2
    scales = np.full((n, 3), 0.02, np.float32)
    scales[:12] = 0.30          # big near-camera splats: radius 15..111 px
    cloud = gaussian_cloud(means, scales, [[1, 0, 0, 0]] * n,
                           [0.6] * n, rng.rand(n, 3).astype(np.float32))
    bg = (0.05, 0.05, 0.1)
    got = np.asarray(render_gaussians(cloud, view, proj, W, H, bg,
                                      big_splat_cap=16, interpret=True))
    # oracle uses the same projection the render used (the binning
    # footprint rule is discrete in radius/mean, so a different projection
    # implementation could flip a tile-inclusion test)
    ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                          cloud.opacities, cloud.colors, view, proj, W, H,
                          max_radius=gs.level2_max_radius(),
                          interpret=True)
    r = np.asarray(ps.radius)[np.isfinite(np.asarray(ps.depth))]
    assert (r > gs.level1_max_radius()).sum() > 0, "scene has no big splat"
    want, sens = reference_composite(ps, W, H, bg, two_level=True,
                                     return_sensitive=True)
    err = np.abs(got - want).max(axis=-1)
    assert sens.mean() < 0.01, "scene too knife-edgy to be a golden test"
    assert err[~sens].max() < 2e-3, f"max err {err[~sens].max()}"
    assert err.max() < 0.05        # even knife-edge flips stay tiny
    # and the clamped single-level render is measurably different
    clamped = np.asarray(render_gaussians(cloud, view, proj, W, H, bg,
                                          interpret=True))
    assert np.abs(clamped - want).max() > 0.02


def test_mid_splat_three_level_matches_reference():
    # THREE-level binning (mid_splat_cap): splats in (15, 47] px route
    # through the 16-slot mid fan, >47 px through the 64-slot coarse fan
    # — pure routing change, so the render must still match the float64
    # oracle at the level-2 radius ceiling (and exercise BOTH channels)
    view, proj = camera()
    rng = np.random.RandomState(3)
    n = 40
    means = (rng.rand(n, 3).astype(np.float32) - 0.5) * 1.2
    scales = np.full((n, 3), 0.02, np.float32)
    scales[:6] = 0.25           # mid-sized: radius 15..47 px
    scales[6:12] = 0.75         # giants: radius > 47 px (coarse channel)
    cloud = gaussian_cloud(means, scales, [[1, 0, 0, 0]] * n,
                           [0.6] * n, rng.rand(n, 3).astype(np.float32))
    bg = (0.05, 0.05, 0.1)
    got = np.asarray(render_gaussians(cloud, view, proj, W, H, bg,
                                      big_splat_cap=16, mid_splat_cap=16,
                                      interpret=True))
    ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                          cloud.opacities, cloud.colors, view, proj, W, H,
                          max_radius=gs.level2_max_radius(),
                          interpret=True)
    r = np.asarray(ps.radius)[np.isfinite(np.asarray(ps.depth))]
    r1, rm = gs.level1_max_radius(), gs.level_mid_max_radius()
    assert ((r > r1) & (r <= rm)).sum() > 0, "no mid-channel splat"
    assert (r > rm).sum() > 0, "no coarse-channel splat"
    want, sens = reference_composite(ps, W, H, bg, two_level=True,
                                     return_sensitive=True)
    err = np.abs(got - want).max(axis=-1)
    assert sens.mean() < 0.01, "scene too knife-edgy to be a golden test"
    assert err[~sens].max() < 2e-3, f"max err {err[~sens].max()}"
    assert err.max() < 0.05
    # mid-channel overflow is counted in overflow_big_splats: a 1-splat
    # mid budget with several mid-sized splats must trip the alarm
    _, stats = render_gaussians(cloud, view, proj, W, H, bg,
                                big_splat_cap=16, mid_splat_cap=1,
                                return_stats=True, interpret=True)
    assert int(stats["overflow_big_splats"]) > 0


def test_big_splat_cap_overflow_reported():
    view, proj = camera()
    n = 24
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = np.linspace(-0.6, 0.6, n)
    cloud = gaussian_cloud(means, np.full((n, 3), 0.3), [[1, 0, 0, 0]] * n,
                           [0.5] * n, np.ones((n, 3), np.float32) * 0.5)
    img, stats = render_gaussians(cloud, view, proj, W, H,
                                  big_splat_cap=4, return_stats=True,
                                  interpret=True)
    assert np.isfinite(np.asarray(img)).all()
    assert int(stats["overflow_big_splats"]) > 0
    img2, stats2 = render_gaussians(cloud, view, proj, W, H,
                                    big_splat_cap=64, return_stats=True,
                                    interpret=True)
    assert int(stats2["overflow_big_splats"]) == 0


def test_ply_roundtrip(tmp_path):
    cloud = random_cloud(64, seed=9)
    path = str(tmp_path / "scene.ply")
    save_ply(path, cloud)
    loaded = load_ply(path)
    np.testing.assert_allclose(np.asarray(loaded.means),
                               np.asarray(cloud.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(loaded.scales),
                               np.asarray(cloud.scales), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(loaded.opacities),
                               np.asarray(cloud.opacities), atol=1e-5)
    np.testing.assert_allclose(np.asarray(loaded.colors),
                               np.asarray(cloud.colors), atol=1e-5)


def test_lod_pool_keeps_deep_content_tiles():
    # regression: the pooled depth cut must never empty a tile whose
    # content simply STARTS deeper than its neighbors' cut depth (the
    # shell-scene black-column bug, BENCHLOG round 2). Tile A holds many
    # near splats (shallow cut); tile B holds only far splats — B must
    # still render them.
    view, proj = camera()
    rng = np.random.RandomState(5)
    # near cluster projecting into the left half, far cluster to the right
    near = (rng.rand(600, 3).astype(np.float32) - 0.5) * np.array(
        [0.4, 0.6, 0.05], np.float32) + np.array([-0.45, 0, -0.2],
                                                 np.float32)
    far = (rng.rand(40, 3).astype(np.float32) - 0.5) * np.array(
        [0.3, 0.5, 0.05], np.float32) + np.array([0.55, 0, 0.9],
                                                 np.float32)
    means = np.concatenate([near, far])
    n = means.shape[0]
    cloud = gaussian_cloud(
        means, np.full((n, 3), 0.05, np.float32), [[1, 0, 0, 0]] * n,
        [0.9] * n,
        np.concatenate([np.tile([[1, 0, 0]], (600, 1)),
                        np.tile([[0, 1, 0]], (40, 1))]).astype(np.float32))
    full = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                       interpret=True))
    capped = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                         max_splats_per_tile=gs.CHUNK,
                                         interpret=True))
    # wherever the exact render shows the far (green) cluster, the capped
    # render must not be black
    green = (full[..., 1] > 0.2) & (full[..., 0] < 0.1)
    assert green.sum() > 50, "fixture should show the far cluster"
    assert (capped[green].max(-1) > 0.05).mean() > 0.95, \
        "far-only tiles must not be emptied by neighbors' shallow cuts"


def test_tail_sums_match_numpy():
    # the block-partial-sum segment reduction vs direct float64 sums
    rng = np.random.RandomState(7)
    m = 3000
    la = rng.rand(m).astype(np.float32) * 0.2
    cols = rng.rand(m, 3).astype(np.float32)
    q = np.clip((np.sqrt(la / gs._TAIL_LA_MAX) * 32767.0 + 0.5)
                .astype(np.int64), 0, 32767)
    r5 = (cols[:, 0] * 31 + 0.5).astype(np.int64)
    g6 = (cols[:, 1] * 63 + 0.5).astype(np.int64)
    b5 = (cols[:, 2] * 31 + 0.5).astype(np.int64)
    aux = ((q << 16) | (r5 << 11) | (g6 << 5) | b5).astype(np.int32)
    lo = np.sort(rng.randint(0, m, 17)).astype(np.int32)
    hi = np.minimum(lo + rng.randint(0, m // 4, 17), m).astype(np.int32)
    got = np.asarray(gs._tail_sums(jnp.asarray(aux), jnp.asarray(lo),
                                   jnp.asarray(hi)))
    laq = (q / 32767.0) ** 2 * gs._TAIL_LA_MAX
    ch = np.stack([laq, laq * (r5 / 31.0), laq * (g6 / 63.0),
                   laq * (b5 / 31.0)])
    want = np.stack([ch[:, a:b].sum(1) for a, b in zip(lo, hi)], -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lod_tail_proxy_recovers_dropped_energy():
    # a deep stack of FAINT splats: the LOD drops most of the list, losing
    # visible energy; the homogeneous tail slab must recover most of it
    view, proj = camera()
    n = 4000
    rng = np.random.RandomState(11)
    # splats spread uniformly across the view (the tile-average slab
    # approximation's regime — real fog, not a coincident stack)
    means = (rng.rand(n, 3).astype(np.float32) - 0.5) * np.array(
        [1.4, 0.8, 1.0], np.float32)
    cloud = gaussian_cloud(means, np.full((n, 3), 0.06),
                           [[1, 0, 0, 0]] * n, [0.15] * n,
                           np.tile([[0.9, 0.7, 0.3]], (n, 1)))
    exact = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                        interpret=True))
    lod_no = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                         max_splats_per_tile=gs.CHUNK,
                                         lod_tail=False, interpret=True))
    lod_tail = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                           max_splats_per_tile=gs.CHUNK,
                                           lod_tail=True, interpret=True))
    err_no = np.abs(lod_no - exact).mean()
    err_tail = np.abs(lod_tail - exact).mean()
    assert err_no > 0.01, "fixture must actually drop visible energy"
    # this 6-tile fixture exaggerates the slab's bilinear cross-tile
    # bleed (2 of 6 tiles are border tiles); real 510-tile frames do
    # better — the bench's min-PSNR gate over sampled frames is the
    # production arbiter. Here we require a solid fraction recovered.
    assert err_tail < 0.7 * err_no, (err_no, err_tail)


def test_temporal_lod_budget_converges():
    # temporal adaptive LOD: executed-depth telemetry from frame N drives
    # frame N+1's per-tile budgets. A deep stack of OPAQUE splats
    # saturates within a few chunks, so its executed depth (and hence the
    # next budget) is far below the full list — and re-rendering with
    # that tighter budget must not change the image.
    view, proj = camera()
    n = 600
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(-0.5, 0.5, n)
    cloud = gaussian_cloud(means, np.full((n, 3), 0.08),
                           [[1, 0, 0, 0]] * n, [0.95] * n,
                           np.tile([[1.0, 0.5, 0.2]], (n, 1)))
    mpt = gs.CHUNK
    img1, stats = render_gaussians(cloud, view, proj, W, H,
                                   max_splats_per_tile=mpt,
                                   return_stats=True, interpret=True)
    ntx, nty = gs.num_tiles(W, H)
    texec = np.asarray(stats["tile_exec"])
    assert texec.shape == (ntx * nty,)
    assert texec.max() > 0
    # opaque stack: executed depth saturates far below the full count
    assert texec.max() <= 3 * gs.CHUNK
    budget = gs.update_lod_budget(stats["tile_exec"], mpt, ntx, nty)
    assert budget.shape == (ntx * nty,)
    img2 = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                       max_splats_per_tile=mpt,
                                       lod_budget=budget, interpret=True))
    assert np.isfinite(img2).all()
    # the saturated core is stable under re-budgeting; fringe tiles may
    # re-allocate the (deliberately tiny) test pool differently
    a1, a2 = np.asarray(img1), img2
    np.testing.assert_allclose(a1[H // 2, W // 2], a2[H // 2, W // 2],
                               atol=1e-3)
    assert np.abs(a1 - a2).mean() < 0.01


def test_lod_budget_dry_tiles_fill_need_channel():
    # a tile that walked its whole truncated list without saturating
    # (exec == kept < count) RAN DRY: its full list size goes to the
    # dry-need channel (surplus-funded), while the floor channel keeps
    # geometric 1.5x growth for everyone
    ntx, nty = 4, 2
    nt = ntx * nty
    exec_ = np.zeros(nt, np.int32)
    kept = np.zeros(nt, np.int32)
    count = np.zeros(nt, np.int32)
    exec_[0], kept[0], count[0] = 500, 500, 8000    # ran dry
    exec_[5], kept[5], count[5] = 300, 500, 8000    # saturated at 300
    mpt = 384
    b = np.asarray(gs.update_lod_budget(
        jnp.asarray(exec_), mpt, ntx, nty,
        jnp.asarray(kept), jnp.asarray(count)))
    assert b.shape == (nt, 2)
    floor = b[:, 0].reshape(nty, ntx)
    need = b[:, 1].reshape(nty, ntx)
    # a DRY tile's floor jumps to min(count, _DRY_FLOOR_CAP*mpt) in one
    # frame (geometric growth alone froze the allocation on dry-heavy
    # scenes: temporal 33.4 dB vs static 42.5 dB on inria — exp_cert
    # 2026-08-19); its neighbors keep the pooled geometric growth
    assert floor[0, 0] == min(8000, gs._DRY_FLOOR_CAP * mpt)
    assert floor[1, 1] == int(500 * 1.5) + gs.CHUNK   # 3x3 pool of tile 0
    # dry tile 0's full count lands in the need channel UNPOOLED (the
    # surplus concentrates on the starved tile itself — pooling diluted
    # it 9x, BENCHLOG round 3); the saturated tile contributes no need
    assert need[0, 0] == 8000
    assert need[0, 1] == 0 and need[1, 1] == 0 and need[1, 3] == 0
    # without kept/count: 1-channel geometric budget
    b2 = np.asarray(gs.update_lod_budget(
        jnp.asarray(exec_), mpt, ntx, nty)).reshape(nty, ntx)
    assert b2[0, 0] == int(500 * 1.5) + gs.CHUNK


def test_lod_budget_static_dry_floor_is_revisit_robust():
    # dry_floor="static": a DRY tile's floor channel reverts to the
    # uniform static baseline every frame (exec is allocation-bounded
    # for dry tiles — feeding it back freezes the warm-up distribution
    # on dry-heavy scenes); saturated tiles keep the exec-driven shrink,
    # and the dry need channel is unchanged
    ntx, nty = 4, 2
    nt = ntx * nty
    exec_ = np.zeros(nt, np.int32)
    kept = np.zeros(nt, np.int32)
    count = np.zeros(nt, np.int32)
    exec_[0], kept[0], count[0] = 500, 500, 8000    # ran dry
    exec_[5], kept[5], count[5] = 300, 500, 8000    # saturated at 300
    mpt = 384
    b = np.asarray(gs.update_lod_budget(
        jnp.asarray(exec_), mpt, ntx, nty,
        jnp.asarray(kept), jnp.asarray(count), dry_floor="static"))
    floor = b[:, 0].reshape(nty, ntx)
    need = b[:, 1].reshape(nty, ntx)
    # dry tile: STATIC floor, not a jump and not frozen 1.5x exec
    assert floor[0, 0] == mpt
    # saturated tile keeps the pooled exec-driven budget (shrinks below
    # mpt when saturation is shallow — that's the surplus source);
    # tile 5's 3x3 pool sees tile 0's exec=500
    assert floor[1, 1] == int(500 * 1.5) + gs.CHUNK
    # a tile FAR from both (no dry/sat neighbors) shrinks toward CHUNK
    assert floor[1, 3] == gs.CHUNK
    # need channel identical to the jump mode
    assert need[0, 0] == 8000 and need[1, 1] == 0
    # FIXED POINT under an all-dry frame: feeding the static-floor
    # allocation's own telemetry back must reproduce the same floors
    # (no drift — the freeze failure mode is structurally impossible)
    exec2 = np.minimum(count, mpt)      # every tile walks its grant dry
    b2 = np.asarray(gs.update_lod_budget(
        jnp.asarray(exec2), mpt, ntx, nty,
        jnp.asarray(np.minimum(count, mpt)), jnp.asarray(count),
        dry_floor="static"))
    dry_tiles = (np.minimum(count, mpt) < count) & (count > 0)
    assert (b2[dry_tiles, 0] == mpt).all()


def test_corner_channel_matches_full_fan():
    # K-reduction: the 2-slot fan + budgeted 2x2 corner channel must
    # reproduce the 4-slot fan bit-exactly when the budget is generous
    # (same pairs reach the same tiles; the sort ignores stream order)
    view, proj = camera()
    cloud = random_cloud(800, seed=9, extent=0.9,
                         scale_range=(0.02, 0.09))
    for tw in (32, 128):
        base = np.asarray(render_gaussians(
            cloud, view, proj, W, H, interpret=True, tile_w=tw))
        kred, st = render_gaussians(
            cloud, view, proj, W, H, interpret=True, tile_w=tw,
            corner_cap=800, return_stats=True)
        assert int(st["overflow_big_splats"]) == 0
        np.testing.assert_allclose(np.asarray(kred), base, atol=1e-6,
                                   err_msg=f"tile_w={tw}")
        # LOD path too
        base_l = np.asarray(render_gaussians(
            cloud, view, proj, W, H, interpret=True, tile_w=tw,
            max_splats_per_tile=128))
        kred_l = np.asarray(render_gaussians(
            cloud, view, proj, W, H, interpret=True, tile_w=tw,
            max_splats_per_tile=128, corner_cap=800))
        np.testing.assert_allclose(kred_l, base_l, atol=1e-6,
                                   err_msg=f"lod tile_w={tw}")


def test_corner_channel_overflow_counted():
    view, proj = camera()
    cloud = random_cloud(600, seed=4, extent=0.7,
                         scale_range=(0.05, 0.12))
    img, st = render_gaussians(cloud, view, proj, W, H, interpret=True,
                               tile_w=32, corner_cap=8,
                               return_stats=True)
    # a tight budget on a large-splat cloud must overflow and report it
    assert int(st["overflow_big_splats"]) > 0
    assert np.isfinite(np.asarray(img)).all()


def test_lod_seg_matches_single_chunk():
    # LOD multi-chunk composite steps (lod_seg > 1) must be BIT-identical
    # to one-block-per-step: pool grants and the packed layout are
    # unchanged, only the grid-step grouping differs (gs.render_gaussians
    # lod_seg; the straddling steps mask [lo, hi) direct-layout style)
    view, proj = camera()
    cloud = random_cloud(900, seed=13, extent=0.6,
                         scale_range=(0.02, 0.09))
    for mpt in (gs.CHUNK, 300):        # block-exact and mid-block grants
        base = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                           max_splats_per_tile=mpt,
                                           lod_seg=1, interpret=True))
        for seg in (2, 4, 8):
            img = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                              max_splats_per_tile=mpt,
                                              lod_seg=seg,
                                              interpret=True))
            np.testing.assert_array_equal(img, base, err_msg=f"{mpt}/{seg}")


def test_lod_seg_stats_match():
    # telemetry (exec/kept/count, certificate) must survive the step
    # regrouping — temporal budgets consume it
    view, proj = camera()
    cloud = random_cloud(700, seed=3, extent=0.5, scale_range=(0.03, 0.1))
    _, st1 = render_gaussians(cloud, view, proj, W, H,
                              max_splats_per_tile=gs.CHUNK, lod_seg=1,
                              return_stats=True, interpret=True)
    _, st4 = render_gaussians(cloud, view, proj, W, H,
                              max_splats_per_tile=gs.CHUNK, lod_seg=4,
                              return_stats=True, interpret=True)
    assert int(st1["overflow_pairs"]) == int(st4["overflow_pairs"])
    np.testing.assert_array_equal(np.asarray(st1["tile_kept"]),
                                  np.asarray(st4["tile_kept"]))
    np.testing.assert_array_equal(np.asarray(st1["tile_exec"]),
                                  np.asarray(st4["tile_exec"]))
    assert bool(st1["lossless"]) == bool(st4["lossless"])


def test_compact_channels_matches_single():
    # the shared-sort multi-channel compaction must reproduce per-channel
    # _compact_channel exactly (indices ascending, validity, counts) for
    # disjoint masks, including over-cap truncation and cap > n padding
    rng = np.random.default_rng(7)
    n = 1000
    lab = rng.integers(0, 4, n)          # 3 channels + "none"
    masks = [jnp.asarray(lab == c) for c in range(3)]
    for caps in ((64, 128, 1200), (8, 1, 16)):
        merged = gs._compact_channels(list(masks), list(caps))
        for c, (m, cap) in enumerate(zip(masks, caps)):
            nref, iref, vref = gs._compact_channel(m, cap)
            nm, im, vm = merged[c]
            assert int(nm) == int(nref), c
            np.testing.assert_array_equal(np.asarray(vm),
                                          np.asarray(vref), err_msg=str(c))
            np.testing.assert_array_equal(
                np.asarray(im)[np.asarray(vm)],
                np.asarray(iref)[np.asarray(vref)], err_msg=str(c))


def test_mid_lo_splat_four_level_matches_reference():
    # FOUR-level binning (mid_lo_splat_cap): splats in (15, 31] px ride
    # the half-size mid-lo fan — pure routing change, so the render must
    # match the float64 oracle while all four channels carry splats
    view, proj = camera()
    rng = np.random.RandomState(6)
    n = 48
    means = (rng.rand(n, 3).astype(np.float32) - 0.5) * 1.2
    scales = np.full((n, 3), 0.02, np.float32)
    scales[:6] = 0.14           # mid-lo: radius 15..31 px
    scales[6:10] = 0.32         # mid: 31..47 px
    scales[10:14] = 0.75        # giants: > 47 px (coarse channel)
    cloud = gaussian_cloud(means, scales, [[1, 0, 0, 0]] * n,
                           [0.6] * n, rng.rand(n, 3).astype(np.float32))
    bg = (0.05, 0.05, 0.1)
    got = np.asarray(render_gaussians(cloud, view, proj, W, H, bg,
                                      big_splat_cap=16, mid_splat_cap=16,
                                      mid_lo_splat_cap=16,
                                      interpret=True))
    base = np.asarray(render_gaussians(cloud, view, proj, W, H, bg,
                                       big_splat_cap=16, mid_splat_cap=32,
                                       interpret=True))
    ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                          cloud.opacities, cloud.colors, view, proj, W, H,
                          max_radius=gs.level2_max_radius(),
                          interpret=True)
    fin = np.isfinite(np.asarray(ps.depth))
    rx = np.asarray(ps.ext[:, 0])[fin]
    ry = np.asarray(ps.ext[:, 1])[fin]
    r1 = gs.level1_max_radius()
    rlx = (gs._kxml(gs.TILE_W) - 1) * gs.TILE_W // 2 - 1
    rly = (gs.KY_ML - 1) * gs.TILE_H // 2 - 1
    over1 = ~((rx <= r1) & (ry <= r1))
    lo = over1 & (rx <= rlx) & (ry <= rly)
    assert lo.sum() > 0, "no mid-lo-channel splat"
    assert (over1 & ~lo).sum() > 0, "no mid/coarse-channel splat"
    # the split is a routing change only: identical pairs, same sort
    np.testing.assert_allclose(got, base, atol=1e-6)
    # mid-lo overflow is counted: a 1-splat budget must trip the alarm
    _, stats = render_gaussians(cloud, view, proj, W, H, bg,
                                big_splat_cap=16, mid_splat_cap=16,
                                mid_lo_splat_cap=1,
                                return_stats=True, interpret=True)
    assert int(stats["overflow_big_splats"]) > 0
    with pytest.raises(ValueError, match="mid_lo_splat_cap"):
        render_gaussians(cloud, view, proj, W, H, bg, big_splat_cap=16,
                         mid_lo_splat_cap=16, interpret=True)


def test_tail_decim1_matches_deeper_exact():
    # DECIMATED-TAIL pipeline proof: with the decimation factor pinned
    # to 1 the tail is the SAME math as a deeper head (entry-T chaining,
    # grant, pack, steps all exercised) — head+tail must reproduce the
    # exact render to float noise when the combined pools cover every
    # pair
    view, proj = camera()
    cloud = random_cloud(600, seed=3, extent=0.5,
                         scale_range=(0.03, 0.09))
    exact = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                        interpret=True))
    old = gs._TAIL_D
    gs._TAIL_D = 1
    try:
        both = np.asarray(render_gaussians(
            cloud, view, proj, W, H, interpret=True,
            max_splats_per_tile=128, lod_tail_decim=512))
    finally:
        gs._TAIL_D = old
    mse = float(np.mean((both - exact) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 100.0, psnr


def test_tail_decim2_beats_head_only():
    # production decim=2: the tail recovers most of the truncated
    # content at quarter pixel cost — strictly better than dropping it
    view, proj = camera()
    cloud = random_cloud(600, seed=3, extent=0.5,
                         scale_range=(0.03, 0.09))
    exact = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                        interpret=True))
    head = np.asarray(render_gaussians(
        cloud, view, proj, W, H, interpret=True,
        max_splats_per_tile=128))
    both, st = render_gaussians(
        cloud, view, proj, W, H, interpret=True,
        max_splats_per_tile=128, lod_tail_decim=512,
        return_stats=True)
    both = np.asarray(both)
    assert np.isfinite(both).all()

    def psnr(a):
        mse = float(np.mean((a - exact) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    assert psnr(both) > psnr(head) + 5.0, (psnr(head), psnr(both))
    # dropped-pair accounting moved behind the tail
    assert int(st["overflow_pairs"]) >= 0


def test_tail_skips_saturated_tiles():
    # a tile whose head saturated must get a bit-identical image with
    # and without the tail (the tail kernel's init-time early-out)
    view, proj = camera()
    n = 600
    means = np.zeros((n, 3), np.float32)
    means[:, 2] = np.linspace(-0.5, 0.5, n)
    # all splats project to the image center; sigma ~8 px, so the head's
    # 256-pair grant drives T below _T_EPS across the whole center patch
    # (alpha >= 0.4/splat there) while staying inside the ky radius clamp
    cloud = gaussian_cloud(means, np.full((n, 3), 0.3),
                           [[1, 0, 0, 0]] * n, [0.98] * n,
                           np.tile([[0.9, 0.4, 0.1]], (n, 1)))
    a = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                    interpret=True,
                                    max_splats_per_tile=2 * gs.CHUNK))
    b = np.asarray(render_gaussians(cloud, view, proj, W, H,
                                    interpret=True,
                                    max_splats_per_tile=2 * gs.CHUNK,
                                    lod_tail_decim=256))
    # deep inside saturation (>=6 quads from any unsaturated quad, so
    # bilinear tail upsampling cannot reach in)
    core = np.s_[H // 2 - 8: H // 2 + 8, W // 2 - 10: W // 2 + 10]
    assert float(a[core].min()) > 0.05  # the patch is actually covered
    np.testing.assert_allclose(a[core], b[core], atol=1e-5)
