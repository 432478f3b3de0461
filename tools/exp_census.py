"""Footprint census → RECOMMENDED CAP SET for a cloud + tile_w.

One tool replacing the exp_lod/exp_inria overlap (VERDICT round-4 weak
item 6): given a scene (or a trained PLY via RAYEATER_BENCH_PLY), it
projects the bench flythrough's sampled views, reproduces _bin_splats'
per-axis level routing exactly, and prints

  * per-view channel populations (level-1 / corner / mid-lo / mid /
    coarse) and their emitted pair-slot cost,
  * the recommended budget caps = max over views x 1.25 margin,
    snapped to clean fractions of n (what bench.resolve_knobs wants),
  * with RAYEATER_CENSUS_SAT=1 (needs a device; one LOD render per
    view at a huge pool): the per-view saturation need and the
    recommended CERTIFIED pool mpt = ceil(max-view need / ntiles),
    128-snapped — the "pool ≈ saturation need" sizing rule
    (BENCHLOG 2026-08-17).

Final line is one JSON object with the cap set, consumable directly.

Env: RAYEATER_BENCH_SCENE (inria default) / RAYEATER_BENCH_PLY,
RAYEATER_BENCH_SPLATS, RAYEATER_BENCH_TILEW (scene default),
RAYEATER_CENSUS_VIEWS (6), RAYEATER_CENSUS_SAT (0).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _snap_frac(k: int, n: int) -> tuple[int, str]:
    """Smallest clean fraction n//d (d in descending powers-ish ladder)
    that covers k; falls back to exact k if k > n//2."""
    for d in (64, 48, 32, 24, 16, 12, 8, 6, 5, 4, 3, 2):
        if n // d >= k:
            return n // d, f"n//{d}"
    return k, f"{k}"


def main():
    import jax
    import jax.numpy as jnp

    import bench
    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops import gs

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "inria")
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    W, H = (int(v) for v in os.environ.get(
        "RAYEATER_BENCH_RES", "1920x1080").split("x"))
    nviews = int(os.environ.get("RAYEATER_CENSUS_VIEWS", 6))
    do_sat = os.environ.get("RAYEATER_CENSUS_SAT", "0") != "0"
    ctx = re.Context()

    if scene == "shell":
        cloud = shell_cloud(n, seed=1)
    elif scene == "inria":
        cloud = inria_cloud(n, seed=1)
    elif scene == "trained":
        from ray_eater_tpu.models.gaussians import load_ply
        cloud = load_ply(os.environ["RAYEATER_BENCH_PLY"])
        n = cloud.num_splats
    else:
        cloud = random_cloud(n, seed=1, extent=1.0,
                             scale_range=(0.004, 0.02))
    knobs = bench.resolve_knobs(scene, n)
    TW = knobs["tile_w"]
    ntx, nty = gs.num_tiles(W, H, tile_w=TW)
    ntiles = ntx * nty
    print(f"census: scene={scene} n={n} tile_w={TW} ntiles={ntiles} "
          f"views={nviews} device={ctx.device}", flush=True)
    cloud = jax.device_put(cloud)
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    # routing thresholds — EXACTLY _bin_splats' per-axis predicates
    r1x = (gs.KX - 1) * TW // 2 - 1
    r1y = (gs.KY - 1) * gs.TILE_H // 2 - 1
    kxl, kxm = gs._kxml(TW), gs._kxm(TW)
    rlx = (kxl - 1) * TW // 2 - 1
    rly = (gs.KY_ML - 1) * gs.TILE_H // 2 - 1
    rmx = (kxm - 1) * TW // 2 - 1
    rmy = (gs.KY_M - 1) * gs.TILE_H // 2 - 1
    slots = {"lvl1": 2, "corner": gs.KX * gs.KY,
             "midlo": kxl * gs.KY_ML, "mid": kxm * gs.KY_M,
             "big": gs._kx2(TW) * gs.KY2}

    @jax.jit
    def census(c, t):
        view, prj = bench.flythrough_camera(t, W, H)
        ps = gs._project_fast(c.means, c.scales, c.quats, c.opacities,
                              c.colors, view, prj, W, H,
                              max_radius=float(gs.level2_max_radius(TW)),
                              interpret=ctx.interpret)
        valid = jnp.isfinite(ps.depth)
        rx, ry = ps.ext[:, 0], ps.ext[:, 1]
        mx, my = ps.mean2d[:, 0], ps.mean2d[:, 1]
        small = valid & (rx <= r1x) & (ry <= r1y)
        tx0 = jnp.floor((mx - rx) / TW).astype(jnp.int32).clip(0, ntx - 1)
        tx1 = jnp.floor((mx + rx) / TW).astype(jnp.int32).clip(0, ntx - 1)
        ty0 = jnp.floor((my - ry) / gs.TILE_H).astype(jnp.int32) \
            .clip(0, nty - 1)
        ty1 = jnp.floor((my + ry) / gs.TILE_H).astype(jnp.int32) \
            .clip(0, nty - 1)
        corner = small & (tx1 > tx0) & (ty1 > ty0)
        over1 = valid & ~small
        fits_lo = over1 & (rx <= rlx) & (ry <= rly)
        fits_mid = over1 & ~fits_lo & (rx <= rmx) & (ry <= rmy)
        big = over1 & ~fits_lo & ~fits_mid
        cnt = lambda m: jnp.sum(m.astype(jnp.int32))
        return (cnt(valid), cnt(corner), cnt(fits_lo), cnt(fits_mid),
                cnt(big), cnt(small))

    peaks = dict(corner=0, midlo=0, mid=0, big=0)
    for k in range(nviews):
        t = np.float32(59 * k / max(nviews - 1, 1) / 60.0)
        nv, c_, lo_, mi_, bg_, sm_ = (int(x) for x in census(cloud, t))
        print(f"view {k}: valid={nv} lvl1={sm_} corner={c_} "
              f"midlo={lo_} mid={mi_} big={bg_} | pair slots: "
              f"lvl1 {sm_ * slots['lvl1']} corner {c_ * slots['corner']} "
              f"midlo {lo_ * slots['midlo']} mid {mi_ * slots['mid']} "
              f"big {bg_ * slots['big']}", flush=True)
        peaks["corner"] = max(peaks["corner"], c_)
        peaks["midlo"] = max(peaks["midlo"], lo_)
        peaks["mid"] = max(peaks["mid"], mi_)
        peaks["big"] = max(peaks["big"], bg_)

    rec = {}
    for ch, peak in peaks.items():
        want = int(peak * 1.25)
        cap, label = _snap_frac(want, n) if want else (0, "0")
        rec[ch] = cap
        print(f"recommend {ch}_cap = {label} = {cap} "
              f"(peak {peak} x1.25 margin; {cap * slots[ch]} sort slots)",
              flush=True)

    out = {"scene": scene, "n": n, "tile_w": TW,
           "corner_cap": rec["corner"], "mid_lo_splat_cap": rec["midlo"],
           "mid_splat_cap": rec["mid"], "big_splat_cap": rec["big"]}

    if do_sat:
        # saturation need: one near-exact LOD render per view with the
        # recommended channel caps; tile_exec = per-tile pairs walked
        # before saturation. Certified pool = the pool at which every
        # truncated tile saturates => mpt_cert ~ ceil(need / ntiles).
        kw = bench.render_kwargs(knobs, exact=False,
                                 interpret=ctx.interpret)
        # 2048/tile: pool = ntiles*2048 >= any scene's whole emission
        # (~3.4M pairs at 1M splats), i.e. effectively exact — and the
        # composite grid stays under the Mosaic per-dimension step
        # limit that 4096 blew at tile_w=32 (67k grid steps)
        kw.update(max_splats_per_tile=2048,
                  lod_tail_decim=None,   # probe the HEAD pool only
                  big_splat_cap=rec["big"] or None,
                  mid_splat_cap=rec["mid"] or None,
                  mid_lo_splat_cap=rec["midlo"] or None,
                  corner_cap=rec["corner"] or None)

        @jax.jit
        def sat(c, t):
            view, prj = bench.flythrough_camera(t, W, H)
            _, st = gs.render_gaussians(c, view, prj, W, H, **kw)
            e = st["tile_exec"]
            kept, count = st["tile_kept"], st["tile_count"]
            dry = (kept > 0) & (e >= kept) & (kept < count)
            return (jnp.sum(e), jnp.sum(dry.astype(jnp.int32)),
                    st["overflow_big_splats"])

        need_pk = 0
        for k in range(nviews):
            t = np.float32(59 * k / max(nviews - 1, 1) / 60.0)
            tot, ndry, ovb = (int(x) for x in sat(cloud, t))
            print(f"view {k}: saturation need {tot} pairs "
                  f"(dry@2048={ndry}, big_overflow={ovb})", flush=True)
            need_pk = max(need_pk, tot)
        mpt_cert = -(-int(need_pk * 1.05) // (ntiles * 128)) * 128
        print(f"recommend CERTIFIED mpt = {mpt_cert} "
              f"(peak need {need_pk} x1.05 / {ntiles} tiles, 128-snap)",
              flush=True)
        out["mpt_certified"] = mpt_cert

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
