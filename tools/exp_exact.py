"""Exact-mode (payload-sort) stage decomposition at the bench config —
where do the ~49 ms of an exact tw=32 fog frame go? Stages are cumulative
prefixes of render_gaussians' exact path; the deltas are the per-stage
costs. RAYEATER_EXP_TILEW / RAYEATER_EXP_SEG / RAYEATER_BENCH_SPLATS as
usual; timing FETCHES scalars (relay-blind hazard, BENCHLOG 2026-08-18)."""
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
    from ray_eater_tpu.models.gaussians import random_cloud
    from ray_eater_tpu.ops import gs

    W, H = 1920, 1080
    N = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    TW = int(os.environ.get("RAYEATER_EXP_TILEW", 32))
    SEG = int(os.environ.get("RAYEATER_EXP_SEG", 8))
    ctx = re.Context()
    print(f"device: {ctx.device} tw={TW} seg={SEG}", flush=True)
    cloud = random_cloud(N, seed=1, extent=1.0, scale_range=(0.004, 0.02))
    cloud = jax.device_put(cloud)
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    ntx = (W + TW - 1) // TW
    nty = (H + gs.TILE_H - 1) // gs.TILE_H
    cap_pairs = N * gs.KX * gs.KY + ntx * nty * gs.CHUNK
    print(f"ntiles={ntx * nty} cap_pairs={cap_pairs}", flush=True)

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
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        return ps, gs._make_records(ps)

    def st_project(t):
        ps, recs = proj_rec(t)
        return t + ps.mean2d[0, 0] * 1e-12 + recs[0, 0] * 1e-12

    def st_bin_payload(t):
        # emission + ONE payload sort + direct layout: pack_idx IS the
        # packed record array in this mode
        ps, recs = proj_rec(t)
        pack, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_pairs,
            tile_w=TW, records=recs, nseg=SEG)
        return (t + pack[0, 0] * 1e-12
                + steps[0][0].astype(jnp.float32) * 1e-12)

    def st_bin_keysort(t):
        # ablation: the same binning WITHOUT the payload columns (key+id
        # sort only, no pack) — isolates what the payload columns add
        ps, recs = proj_rec(t)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_pairs,
            tile_w=TW, nseg=SEG)
        return (t + pidx[0].astype(jnp.float32) * 1e-12
                + recs[0, 0] * 1e-12)

    def st_full(t):
        v = mk_view(t)
        img = gs.render_gaussians(cloud, v, proj, W, H,
                                  pairs_cap_factor=None, tile_w=TW,
                                  exact_seg=SEG, interpret=ctx.interpret)
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
    t_keys = timeit("+bin (key-only sort, no pack)", st_bin_keysort)
    t_bin = timeit("+bin (PAYLOAD sort -> packed)", st_bin_payload)
    t_full = timeit(f"full exact frame (seg={SEG})", st_full)
    print(f"deltas: bin-keys {t_keys - t_proj:6.2f}  payload adds "
          f"{t_bin - t_keys:6.2f}  composite+fin {t_full - t_bin:6.2f}",
          flush=True)


if __name__ == "__main__":
    main()
