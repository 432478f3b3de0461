"""Certified-lossless / temporal-mode operating-point ladder.

For each mpt rung x temporal mode this measures, same-process:

  - device-loop window FPS (10-frame fori_loop, fetched)
  - per-sampled-frame: lossless flag, dropped pairs, PSNR vs exact,
    and the DRY-TILE COUNT (tiles that walked their whole truncated
    list unsaturated — the certificate's failure term)

Knobs come from bench.resolve_knobs (the production set: channels,
corner, tile_w), with mpt overridden per rung. Modes:

  - ``off``    — static budgets (lod_budget=None)
  - ``jump``   — temporal, round-3 dry-tile floor jump
  - ``static`` — temporal, revisit-robust static dry floors
                 (gs.update_lod_budget dry_floor="static")

Env: RAYEATER_BENCH_SCENE (fog default), RAYEATER_EXP_MPTS (csv),
RAYEATER_EXP_MODES (csv of off/jump/static), RAYEATER_BENCH_SPLATS,
plus every RAYEATER_BENCH_* knob bench.py accepts (e.g. _TILEW).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    import ray_eater_tpu as re
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops import gs

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "fog")
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    W, H = (int(v) for v in os.environ.get(
        "RAYEATER_BENCH_RES", "1920x1080").split("x"))
    mpts = [int(v) for v in os.environ.get(
        "RAYEATER_EXP_MPTS", "256,320,384").split(",")]
    modes = os.environ.get("RAYEATER_EXP_MODES", "off,jump,static") \
        .split(",")
    ctx = re.Context()
    knobs = bench.resolve_knobs(scene, n)
    print(f"device: {ctx.device} scene={scene} mpts={mpts} modes={modes}",
          flush=True)
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
    TW = knobs["tile_w"]
    ntx, nty = gs.num_tiles(W, H, tile_w=TW)

    from ray_eater_tpu import rmath

    def frame(c, t, mpt, budget=None, stats=False):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)
        kw = bench.render_kwargs(knobs, exact=mpt is None,
                                 interpret=ctx.interpret)
        if mpt is not None:
            kw["max_splats_per_tile"] = mpt
            kw["return_stats"] = stats
        return gs.render_gaussians(c, view, proj, W, H,
                                   lod_budget=budget, **kw)

    exact_fn = jax.jit(lambda c, t: frame(c, t, None))

    def psnr(a, b):
        mse = float(jnp.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    for mpt in mpts:
        budget0 = jnp.stack(
            [jnp.full((ntx * nty,), mpt, jnp.int32),
             jnp.zeros((ntx * nty,), jnp.int32)], -1)
        for mode in modes:
            temporal = mode != "off"

            def upd(st, mpt=mpt, mode=mode):
                return gs.update_lod_budget(
                    st["tile_exec"], mpt, ntx, nty,
                    st.get("tile_kept"), st.get("tile_count"),
                    dry_floor=mode)

            def window_fn(c, t0, b0, mpt=mpt, temporal=temporal,
                          upd=upd):
                def body(i, carry):
                    acc, b = carry
                    img, st = frame(c, t0 + i.astype(jnp.float32)
                                    / 60.0, mpt,
                                    b if temporal else None, True)
                    nb = upd(st) if temporal else b
                    return acc + img[0, 0, 0] * 1e-12, nb
                return lax.fori_loop(0, FRAMES, body, (t0, b0))

            wjit = jax.jit(window_fn)
            jax.block_until_ready(wjit(cloud, np.float32(0.0), budget0))
            best = 1e9
            for w in range(3):
                t0 = time.perf_counter()
                out = wjit(cloud, np.float32(w), budget0)
                float(np.asarray(out[0]))
                best = min(best, (time.perf_counter() - t0) / FRAMES)
            fps = 1.0 / best

            @jax.jit
            def warmed(c, t, mpt=mpt, temporal=temporal, upd=upd):
                def body(i, b):
                    _, st = frame(c, t - (8 - i.astype(jnp.float32))
                                  / 60.0, mpt, b if temporal else None,
                                  True)
                    return upd(st) if temporal else b
                b = lax.fori_loop(0, 8, body, budget0)
                img, st = frame(c, t, mpt,
                                b if temporal else None, True)
                kept, count = st["tile_kept"], st["tile_count"]
                dry = ((kept < count) & (st["tile_exec"] >= kept)
                       & (count > 0))
                return (img, st["lossless"], st["overflow_pairs"],
                        jnp.sum(dry.astype(jnp.int32)))

            certs, drops, drys, ps = [], [], [], []
            for k in range(6):
                ts = np.float32(59 * k / 5 / 60.0)
                img, cert, ov, ndry = warmed(cloud, ts)
                certs.append(bool(cert))
                drops.append(int(ov))
                drys.append(int(ndry))
                ps.append(psnr(img, exact_fn(cloud, ts)))
            print(f"mpt={mpt:4d} mode={mode:6s}: "
                  f"{fps:6.2f} FPS  min {min(ps):5.1f} dB "
                  f"[{' '.join(f'{p:.0f}' for p in ps)}]  "
                  f"lossless={certs}  dry_tiles={drys}  "
                  f"dropped={drops}", flush=True)


if __name__ == "__main__":
    main()
