"""LOD-mode stage decomposition at the inria bench config — where do
the ~41 ms of a tw=64 mpt=768 inria frame go? Stages are cumulative
prefixes of render_gaussians' LOD path; deltas are per-stage costs.

Env: RAYEATER_BENCH_SCENE (inria default), RAYEATER_EXP_TILEW (64),
RAYEATER_EXP_MPT (768), RAYEATER_BENCH_SPLATS. Timing fetches scalars
(relay-blind hazard, BENCHLOG 2026-08-18)."""
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

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops import gs

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "inria")
    W, H = 1920, 1080
    N = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    TW = int(os.environ.get("RAYEATER_EXP_TILEW", 64))
    MPT = int(os.environ.get("RAYEATER_EXP_MPT", 768))
    ctx = re.Context()
    print(f"device: {ctx.device} scene={scene} tw={TW} mpt={MPT}",
          flush=True)
    if scene == "shell":
        cloud = shell_cloud(N, seed=1)
    elif scene == "inria":
        cloud = inria_cloud(N, seed=1)
    else:
        cloud = random_cloud(N, seed=1, extent=1.0,
                             scale_range=(0.004, 0.02))
    cloud = jax.device_put(cloud)
    big = N // 32
    mid = N // 5
    if os.environ.get("RAYEATER_EXP_NOBIG", "0") != "0":
        big = mid = None   # ablation: level-1-only binning (radius clamp)
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    ntx, nty = gs.num_tiles(W, H, tile_w=TW)
    ntiles = ntx * nty
    cap_pairs = N * gs.KX * gs.KY + ntiles * gs.CHUNK
    if big is not None:
        cap_pairs += (big * gs._kx2(TW) * gs.KY2
                      + mid * gs._kxm(TW) * gs.KY_M)
    cap_pairs = gs._pad_to(cap_pairs, gs.CHUNK)
    print(f"ntiles={ntiles} pool={MPT * ntiles} cap_pairs={cap_pairs}",
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

    def proj_rec(t):
        v = mk_view(t)
        mr = (float(gs.level2_max_radius(TW)) if big is not None
              else None)
        ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                              cloud.opacities, cloud.colors, v, proj,
                              W, H, max_radius=mr)
        return ps, gs._make_records(ps)

    def do_bin(ps):
        return gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_pairs,
            max_per_tile=MPT, big_cap=big, mid_cap=mid,
            tile_w=TW, nseg=1, ext=ps.ext)

    def st_project(t):
        ps, recs = proj_rec(t)
        return t + ps.mean2d[0, 0] * 1e-12 + recs[0, 0] * 1e-12

    def st_bin(t):
        ps, recs = proj_rec(t)
        pidx, steps, vis, ov, ovb, _, _ = do_bin(ps)
        return (t + pidx[0].astype(jnp.float32) * 1e-12
                + steps[0][0].astype(jnp.float32) * 1e-12
                + recs[0, 0] * 1e-12)

    def st_pack(t):
        ps, recs = proj_rec(t)
        pidx, steps, vis, ov, ovb, _, _ = do_bin(ps)
        packed = gs._pack_records(recs, pidx)
        return (t + packed[0, 0] * 1e-12
                + steps[0][0].astype(jnp.float32) * 1e-12)

    def st_full(t):
        v = mk_view(t)
        img = gs.render_gaussians(cloud, v, proj, W, H,
                                  max_splats_per_tile=MPT,
                                  big_splat_cap=big, mid_splat_cap=mid,
                                  tile_w=TW, interpret=ctx.interpret)
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
    t_bin = timeit("+bin (emit+compact+sort+pool+steps)", st_bin)
    t_pack = timeit("+pack (block row gather)", st_pack)
    t_full = timeit("full LOD frame", st_full)
    print(f"deltas: bin {t_bin - t_proj:6.2f}  pack "
          f"{t_pack - t_bin:6.2f}  composite+fin {t_full - t_pack:6.2f}",
          flush=True)


if __name__ == "__main__":
    main()
