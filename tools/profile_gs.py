"""Same-process GS stage + primitive microbenchmarks on the real TPU.

Each measurement is a jitted lax.fori_loop of ITERS dependent iterations
(one dispatch, one final block) — the only timing shape that is reliable
through the axon tunnel (single-op jit timings report nonsense; see
CLAUDE.md / memory notes). Prints ms/iter per case.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


def timeit(name, fn, *args):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
    print(f"{name:55s} {best:8.2f} ms/iter", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import random_cloud
    from ray_eater_tpu.ops import gs

    W, H = 1920, 1080
    N = 1_000_000
    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    cloud = random_cloud(N, seed=1, extent=1.0, scale_range=(0.004, 0.02))
    view = rmath.look_at_zforward(rmath.vec(2.5, 0.8, 0.0),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    TW = int(os.environ.get("RAYEATER_PROF_TILEW", gs.TILE_W))
    ntx = (W + TW - 1) // TW
    nty = (H + gs.TILE_H - 1) // gs.TILE_H
    ntiles = ntx * nty
    ky = gs.KY
    K = gs.KX * ky
    M = N * K
    cap_pairs = N * gs.KX * ky + ntiles * gs.CHUNK
    capc = cap_pairs // gs.CHUNK
    print(f"ntiles={ntiles} M={M} cap_pairs={cap_pairs}", flush=True)

    # ---- stage prefixes (each fori_loop perturbs view via t) --------------
    def loop(body):
        def run(t0):
            def it(i, carry):
                return body(carry + jnp.float32(i) * 1e-6)
            return lax.fori_loop(0, ITERS, it, t0)
        return run

    def mk_view(t):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        return rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))

    def st_project(t):
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        return t + ps.mean2d[0, 0] * 1e-12

    def st_records(t):
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        recs = gs._make_records(ps)
        return t + recs[0, 0] * 1e-12

    def st_bin(t):
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        recs = gs._make_records(ps)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_pairs, tile_w=TW)
        return t + pidx[0].astype(jnp.float32) * 1e-12 + recs[0, 0] * 1e-12

    def st_pack(t):
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        recs = gs._make_records(ps)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_pairs, tile_w=TW)
        packed = gs._pack_records(recs, pidx)
        return t + packed[0, 0] * 1e-12

    def st_full(t):
        v = mk_view(t)
        img = gs.render_gaussians(cloud, v, proj, W, H,
                                  interpret=ctx.interpret, tile_w=TW)
        return t + img[0, 0, 0] * 1e-12

    # ---- bench-config stages (capf=4, mpt=512 compact LOD layout) --------
    MPT = int(os.environ.get("RAYEATER_PROF_MPT", 512))
    cap_b = min(cap_pairs, 4 * N + ntiles * gs.CHUNK)
    cap_b = (cap_b + gs.CHUNK - 1) // gs.CHUNK * gs.CHUNK

    def st_bin_m(t):
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        recs = gs._make_records(ps)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_b,
            max_per_tile=MPT, tile_w=TW)
        return t + pidx[0].astype(jnp.float32) * 1e-12 + recs[0, 0] * 1e-12

    def st_pack_m(t):
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        recs = gs._make_records(ps)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_b,
            max_per_tile=MPT, tile_w=TW)
        packed = gs._pack_records(recs, pidx)
        return t + packed[0, 0] * 1e-12

    def st_full_m(t):
        v = mk_view(t)
        img = gs.render_gaussians(cloud, v, proj, W, H,
                                  pairs_cap_factor=4, max_splats_per_tile=MPT,
                                  interpret=ctx.interpret, tile_w=TW)
        return t + img[0, 0, 0] * 1e-12

    def st_comp_m(t):
        # full pipeline minus finalize/untile: stop at the raw planes
        v = mk_view(t)
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, v, proj,
                                  W, H)
        recs = gs._make_records(ps)
        pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_b,
            max_per_tile=MPT, tile_w=TW)
        packed = gs._pack_records(recs, pidx)
        r, g, b, tt, _ = gs._composite_call(packed, steps, nty, ntx,
                                            ctx.interpret, TW)
        return t + (r[0, 0, 0] + g[0, 0, 0] + b[0, 0, 0]
                    + tt[0, 0, 0]) * 1e-12

    if os.environ.get("RAYEATER_PROF_BENCHCFG", "0") != "0":
        t_proj = timeit("stage: project", loop(st_project), np.float32(0))
        t_rec = timeit("stage: +records", loop(st_records), np.float32(0))
        t_bin = timeit(f"stage: +bin[mpt={MPT}]", loop(st_bin_m),
                       np.float32(0))
        t_pack = timeit(f"stage: +pack[mpt={MPT}]", loop(st_pack_m),
                        np.float32(0))
        t_comp = timeit(f"stage: +composite[mpt={MPT}]", loop(st_comp_m),
                        np.float32(0))
        t_full = timeit(f"stage: full[capf=4 mpt={MPT}]", loop(st_full_m),
                        np.float32(0))
        print(f"deltas: project {t_proj:.1f}  rec {t_rec - t_proj:.1f}  "
              f"bin {t_bin - t_rec:.1f}  pack {t_pack - t_bin:.1f}  "
              f"composite {t_comp - t_pack:.1f}  "
              f"finalize {t_full - t_comp:.1f}", flush=True)
        return

    if os.environ.get("RAYEATER_PROF_STAGES", "1") != "0":
        t_proj = timeit("stage: project", loop(st_project), np.float32(0))
        t_rec = timeit("stage: +records+depth_sort", loop(st_records),
                       np.float32(0))
        t_bin = timeit("stage: +bin", loop(st_bin), np.float32(0))
        t_pack = timeit("stage: +pack", loop(st_pack), np.float32(0))
        t_full = timeit("stage: full frame", loop(st_full), np.float32(0))
        print(f"deltas: project {t_proj:.1f}  "
              f"rec+dsort {t_rec - t_proj:.1f}  "
              f"bin {t_bin - t_rec:.1f}  pack {t_pack - t_bin:.1f}  "
              f"composite+fin {t_full - t_pack:.1f}", flush=True)

        # ---- real pair statistics ----------------------------------------
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors, view, proj,
                                  W, H)
        pidx, steps, vis, ov = jax.jit(
            functools.partial(gs._bin_splats, ntx=ntx, nty=nty,
                              cap_pairs=cap_pairs))(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth)
        live = int((np.asarray(steps[4]) - np.asarray(steps[3])).clip(
            0).sum())   # lo/hi are block-local row ranges
        chunks = int((np.asarray(steps[0]) < ntiles).sum())
        r = np.asarray(ps.radius)
        val = np.isfinite(np.asarray(ps.depth))
        print(f"live slots={live} real chunks={chunks} capc={capc} "
              f"valid splats={val.sum()} radius mean={r[val].mean():.1f} "
              f"clamped@15={np.mean(r[val] >= 15) * 100:.0f}%", flush=True)

    # ---- primitive microbenches ------------------------------------------
    rng = np.random.RandomState(0)

    def bench_sort(name, m, kdtype, stable, with_payload=True):
        keys0 = jnp.asarray(rng.randint(0, ntiles + 1, m), kdtype)

        def body(c):
            keys = (keys0 + c[0].astype(kdtype))
            ops = (keys, jnp.arange(m, dtype=jnp.int32)) if with_payload \
                else (keys,)
            out = lax.sort(ops, num_keys=1, is_stable=stable)
            return (out[-1][:1].astype(jnp.int32),)

        return timeit(f"sort {name}", lambda c: lax.fori_loop(
            0, ITERS, lambda i, cc: body(cc), c),
            (jnp.zeros(1, jnp.int32),))

    bench_sort(f"{M // 1000}k int16+iota stable", M, jnp.int16, True)
    bench_sort(f"{M // 1000}k int16+iota unstable", M, jnp.int16, False)
    bench_sort(f"{M // 1000}k int32+iota unstable", M, jnp.int32, False)
    bench_sort(f"{M // 1000}k int32 keyonly unstable", M, jnp.int32, False,
               with_payload=False)
    bench_sort("4000k int16+iota stable", 4_000_000, jnp.int16, True)
    bench_sort("3000k int16+iota stable", 3_000_000, jnp.int16, True)
    bench_sort("1000k f32+iota (depth argsort shape)", 1_000_000,
               jnp.float32, False)

    # batched axis sort vs flat sort
    def bench_axis_sort(g, b):
        keys0 = jnp.asarray(rng.randint(0, ntiles + 1, (g, b)), jnp.int16)
        pay = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32), (g, b))

        def body(c):
            k, p = lax.sort((keys0 + c[0].astype(jnp.int16), pay),
                            num_keys=1, is_stable=True, dimension=1)
            return (k[:1, 0].astype(jnp.int32),)

        timeit(f"axis-sort ({g}x{b}) int16+iota stable",
               lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c),
               (jnp.zeros(1, jnp.int32),))

    bench_axis_sort(M // 65536, 65536)
    bench_axis_sort(M // 8192, 8192)

    # row gathers (pack shape): CAP slots from (N,16)
    recs_np = jnp.asarray(rng.rand(N, 16).astype(np.float32))

    def bench_take(name, nidx, dead_frac=0.0):
        idx0 = rng.randint(0, N, nidx).astype(np.int32)
        dead = rng.rand(nidx) < dead_frac
        idx0[dead] = 0
        idx = jnp.asarray(idx0)

        def body(c):
            out = jnp.take(recs_np, (idx + c) % N, axis=0)
            return out[0, :1].astype(jnp.int32)

        timeit(f"take rows {name}",
               lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c),
               jnp.zeros(1, jnp.int32))

    bench_take("6.16M all-live", cap_pairs)
    bench_take("6.16M 50%dead", cap_pairs, 0.5)
    bench_take("3.2M", 3_200_000)
    bench_take("1.07M", 1_070_000)

    # scatter rate (for counting-sort feasibility)
    def bench_scatter(m):
        idx = jnp.asarray(rng.permutation(m).astype(np.int32))
        val = jnp.arange(m, dtype=jnp.int32)

        def body(c):
            out = jnp.zeros(m, jnp.int32).at[(idx + c) % m].set(val)
            return out[:1]

        timeit(f"scatter {m // 1000}k int32 perm",
               lambda c: lax.fori_loop(0, ITERS, lambda i, cc: body(cc), c),
               jnp.zeros(1, jnp.int32))

    bench_scatter(6_000_000)
    bench_scatter(1_000_000)


if __name__ == "__main__":
    main()
