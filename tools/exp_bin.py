"""Dissect the _bin_splats stage on the real TPU: emission / sort /
searchsorted / compact-layout sub-timings, plus layout variants (stack-
interleave vs concatenate) — same fori_loop harness as profile_gs.py.
"""

from __future__ import annotations

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
    for _ in range(3):
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
    from ray_eater_tpu.utils import pad_to

    W, H = 1920, 1080
    N = 1_000_000
    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    cloud = random_cloud(N, seed=1, extent=1.0, scale_range=(0.004, 0.02))
    view = rmath.look_at_zforward(rmath.vec(2.5, 0.8, 0.0),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    ntx = (W + gs.TILE_W - 1) // gs.TILE_W
    nty = (H + gs.TILE_H - 1) // gs.TILE_H
    ntiles = ntx * nty
    ky = gs.KY
    MPT = 512

    ps = jax.jit(lambda: gs.project_gaussians(
        cloud.means, cloud.scales, cloud.quats, cloud.opacities,
        cloud.colors, view, proj, W, H))()
    jax.block_until_ready(ps)
    mx, my = ps.mean2d[:, 0], ps.mean2d[:, 1]
    rad, depth = ps.radius, ps.depth
    valid = jnp.isfinite(depth)

    def loop(body):
        def run(c0):
            return lax.fori_loop(0, ITERS, lambda i, c: body(c, i), c0)
        return run

    # ---------------- emission variants -------------------------------
    tile_bits = max(ntiles.bit_length(), 1)
    db = min(31 - tile_bits, 22)
    qmax = (1 << db) - 1
    sentinel = ntiles << db

    def emit(mx, my, rad, valid, depth, mode):
        r = rad.astype(jnp.float32)
        dfin = jnp.where(valid, depth, jnp.inf)
        dmin = jnp.min(dfin)
        dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
        dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
        span = jnp.maximum(dmax - dmin, 1e-9)
        qd = jnp.clip((dfin - dmin) / span * qmax, 0.0, float(qmax))
        qd = jnp.clip(qd.astype(jnp.int32), 0, qmax)
        qd = jnp.where(valid, qd, 0)
        tx0 = jnp.floor((mx - r) / gs.TILE_W).astype(jnp.int32).clip(0, ntx - 1)
        tx1 = jnp.floor((mx + r) / gs.TILE_W).astype(jnp.int32).clip(0, ntx - 1)
        ty0 = jnp.floor((my - r) / gs.TILE_H).astype(jnp.int32).clip(0, nty - 1)
        ty1 = jnp.floor((my + r) / gs.TILE_H).astype(jnp.int32).clip(0, nty - 1)
        r2 = r * r
        keys = []
        for dy in range(ky):
            for dx in range(gs.KX):
                ty = ty0 + dy
                tx = tx0 + dx
                ok = valid & (ty <= ty1) & (tx <= tx1)
                rx0 = (tx * gs.TILE_W).astype(jnp.float32)
                ry0 = (ty * gs.TILE_H).astype(jnp.float32)
                ddx = jnp.maximum(jnp.maximum(rx0 - mx, mx - (rx0 + gs.TILE_W)), 0.0)
                ddy = jnp.maximum(jnp.maximum(ry0 - my, my - (ry0 + gs.TILE_H)), 0.0)
                ok &= ddx * ddx + ddy * ddy <= r2
                keys.append(jnp.where(ok, ((ty * ntx + tx) << db) | qd, sentinel))
        if mode == "stack":
            key_flat = jnp.stack(keys, -1).reshape(-1)
            splat = jnp.stack([jnp.arange(N, dtype=jnp.int32)] * len(keys),
                              -1).reshape(-1)
        else:
            key_flat = jnp.concatenate(keys)
            splat = jnp.tile(jnp.arange(N, dtype=jnp.int32), len(keys))
        return key_flat, splat

    def mk(mode, stop):
        def body(c, i):
            k, s = emit(mx + c * 1e-6, my, rad, valid, depth, mode)
            if stop == "emit":
                return c + (k[0] + s[0]).astype(jnp.float32) * 1e-12
            sk, ss = lax.sort((k, s), num_keys=1, is_stable=False)
            if stop == "sort":
                return c + (sk[0] + ss[0]).astype(jnp.float32) * 1e-12
            tvec = jnp.arange(ntiles + 1, dtype=jnp.int32)
            start = jnp.searchsorted(sk, tvec << db, side="left").astype(jnp.int32)
            startc = start[:-1]
            count = start[1:] - startc
            if stop == "search":
                return c + (startc[0] + count[0]).astype(jnp.float32) * 1e-12
            pidx, steps, vis, ov, _, _, _, _ = gs._bin_splats(
                mx + c * 1e-6, my, rad, valid, depth, ntx, nty,
                N * gs.KX * ky, max_per_tile=MPT)
            return c + (pidx[0] + steps[0][0]).astype(jnp.float32) * 1e-12
        return body

    for mode in ("stack", "concat"):
        timeit(f"emit[{mode}]", loop(mk(mode, "emit")), np.float32(0))
        timeit(f"emit[{mode}]+sort", loop(mk(mode, "sort")), np.float32(0))
        timeit(f"emit[{mode}]+sort+search", loop(mk(mode, "search")),
               np.float32(0))
        timeit(f"emit[{mode}]+sort+search+compact", loop(mk(mode, "full")),
               np.float32(0))


if __name__ == "__main__":
    main()
