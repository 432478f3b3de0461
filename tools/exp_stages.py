"""LOD-mode stage decomposition at the PRODUCTION bench knob set —
where does an inria (or any scene's) frame go? Stages are cumulative
prefixes of render_gaussians' LOD path (project → bin → pack →
composite); deltas are per-stage costs. Knobs come from
bench.resolve_knobs, so this measures exactly what bench.py runs.

Env: RAYEATER_BENCH_SCENE / RAYEATER_BENCH_SPLATS + every
RAYEATER_BENCH_* knob override bench.py accepts. Timing FETCHES scalars
(relay-blind hazard, BENCHLOG 2026-08-18).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    import ray_eater_tpu as re
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops import gs

    W, H = (int(v) for v in os.environ.get(
        "RAYEATER_BENCH_RES", "1920x1080").split("x"))
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    scene = os.environ.get("RAYEATER_BENCH_SCENE", "inria")
    knobs = bench.resolve_knobs(scene, n)
    ctx = re.Context()
    print(f"device: {ctx.device} scene={scene}", flush=True)
    print("knobs: " + " ".join(f"{k}={v}" for k, v in knobs.items()),
          flush=True)

    if scene == "shell":
        cloud = shell_cloud(n, seed=1)
    elif scene == "inria":
        cloud = inria_cloud(n, seed=1)
    else:
        cloud = random_cloud(n, seed=1, extent=1.0,
                             scale_range=(0.004, 0.02))
    cloud = jax.device_put(cloud)
    proj = rmproj = None

    from ray_eater_tpu import rmath
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    TW = knobs["tile_w"]
    mpt = knobs["max_splats_per_tile"]
    big, mid, midlo = (knobs["big_splat_cap"], knobs["mid_splat_cap"],
                       knobs["mid_lo_splat_cap"])
    corner = knobs["corner_cap"]
    ntx, nty = gs.num_tiles(W, H, tile_w=TW)
    ntiles = ntx * nty
    print(f"ntiles={ntiles} pool_steps~{-(-ntiles * (mpt or 0) // 128)}",
          flush=True)

    def loop(body):
        def run(t0):
            def it(i, carry):
                return body(carry + jnp.float32(i) / 60.0)
            return lax.fori_loop(0, ITERS, it, t0)
        return run

    def mk_view(t):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        return rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))

    max_radius = (float(gs.level2_max_radius(TW))
                  if big is not None else None)

    def proj_rec(t):
        v = mk_view(t)
        ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                              cloud.opacities, cloud.colors, v, proj,
                              W, H, max_radius=max_radius,
                              interpret=ctx.interpret)
        return ps, gs._make_records(ps)

    def st_project(t):
        ps, recs = proj_rec(t)
        return t + ps.mean2d[0, 0] * 1e-12 + recs[0, 0] * 1e-12

    def bin_out(t):
        ps, recs = proj_rec(t)
        out = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty,
            4 * n + ntiles * gs.CHUNK,
            max_per_tile=mpt, big_cap=big, mid_cap=mid, mid_lo_cap=midlo,
            corner_cap=corner, tile_w=TW, nseg=knobs["lod_seg"],
            ext=ps.ext, tail_decim=knobs["lod_tail_decim"])
        return recs, out

    def st_bin(t):
        recs, (pidx, steps, vis, ov, ovb, _, _, bt) = bin_out(t)
        return (t + pidx[0].astype(jnp.float32) * 1e-12
                + recs[0, 0] * 1e-12
                + steps[0][0].astype(jnp.float32) * 1e-12
                + (bt[0][0].astype(jnp.float32) * 1e-12
                   if bt is not None else 0.0))

    def st_pack(t):
        recs, (pidx, steps, vis, ov, ovb, _, _, bt) = bin_out(t)
        packed = gs._pack_records(recs, pidx)
        acc = t + packed[0, 0] * 1e-12
        if bt is not None:                 # tail records pack too
            acc = acc + gs._pack_records(recs, bt[0])[0, 0] * 1e-12
        return acc

    def st_full(t):
        v = mk_view(t)
        img = gs.render_gaussians(
            cloud, v, proj, W, H,
            **bench.render_kwargs(knobs, exact=False,
                                  interpret=ctx.interpret))[0]
        return t + img[0, 0, 0] * 1e-12

    def timeit(name, fn):
        f = jax.jit(loop(fn))
        t0 = time.perf_counter()
        float(np.asarray(f(np.float32(0.0))))
        print(f"{name:44s} compile {time.perf_counter() - t0:5.0f}s",
              flush=True)
        best = 1e9
        for w in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(np.float32(1.0 + w))))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:44s} {best:8.2f} ms/iter", flush=True)
        return best

    t_proj = timeit("project+records", st_project)
    t_bin = timeit("+bin (channels + sort + LOD layout)", st_bin)
    t_pack = timeit("+pack (block row gather)", st_pack)
    t_full = timeit("full LOD frame", st_full)
    print(f"deltas: bin {t_bin - t_proj:6.2f}  pack {t_pack - t_bin:6.2f}"
          f"  composite+fin {t_full - t_pack:6.2f}", flush=True)


if __name__ == "__main__":
    main()
