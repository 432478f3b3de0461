"""Decimated-tail composite operating-point ladder (VERDICT r4 task 1).

For each ``head_mpt:tail_decim`` combo this measures, same-process:

  - device-loop window FPS (10-frame fori_loop, fetched)
  - per-sampled-frame PSNR vs the exact render, lossless flag,
    dropped pairs (now counted BEHIND the tail)

The tail composites the next-deeper pairs at 2x2-decimated resolution
(quarter pixel cost per pair), so a combo like 384:1536 walks the same
effective depth as head-only 768 at ~equal composite cost — the
question is where the quality/FPS frontier beats the head-only ladder.
Knobs come from bench.resolve_knobs (production channels/corner/tile_w).

Env: RAYEATER_BENCH_SCENE (inria default here), RAYEATER_EXP_COMBOS
(csv of head:tail, e.g. "768:0,384:1024,256:2048"), RAYEATER_BENCH_*
overrides. Record results in BENCHLOG.md.
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

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "inria")
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    W, H = (int(v) for v in os.environ.get(
        "RAYEATER_BENCH_RES", "1920x1080").split("x"))
    combos = [tuple(int(x) for x in c.split(":")) for c in os.environ.get(
        "RAYEATER_EXP_COMBOS", "768:0,512:1024,384:1536,256:2048")
        .split(",")]
    ctx = re.Context()
    knobs = bench.resolve_knobs(scene, n)
    print(f"device: {ctx.device} scene={scene} combos={combos}", flush=True)
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

    def frame(c, t, mpt, tail, stats=False):
        view, proj = bench.flythrough_camera(t, W, H)
        kw = bench.render_kwargs(knobs, exact=mpt is None,
                                 interpret=ctx.interpret)
        if mpt is not None:
            kw["max_splats_per_tile"] = mpt
            kw["lod_tail_decim"] = tail or None
            kw["return_stats"] = stats
        return gs.render_gaussians(c, view, proj, W, H, **kw)

    exact_fn = jax.jit(lambda c, t: frame(c, t, None, None))

    def psnr(a, b):
        mse = float(jnp.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    for mpt, tail in combos:
        def window_fn(c, t0, mpt=mpt, tail=tail):
            def body(i, acc):
                img = frame(c, t0 + i.astype(jnp.float32) / 60.0, mpt,
                            tail)
                return acc + img[0, 0, 0] * 1e-12
            return lax.fori_loop(0, FRAMES, body, t0)

        wjit = jax.jit(window_fn)
        t0 = time.perf_counter()
        jax.block_until_ready(wjit(cloud, np.float32(0.0)))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for w in range(3):
            t0 = time.perf_counter()
            out = wjit(cloud, np.float32(w))
            float(np.asarray(out))
            best = min(best, (time.perf_counter() - t0) / FRAMES)
        fps = 1.0 / best

        sample = jax.jit(lambda c, t, mpt=mpt, tail=tail:
                         frame(c, t, mpt, tail, True))
        certs, drops, ps = [], [], []
        for k in range(6):
            ts = np.float32(59 * k / 5 / 60.0)
            img, st = sample(cloud, ts)
            certs.append(bool(st["lossless"]))
            drops.append(int(st["overflow_pairs"]))
            ps.append(psnr(img, exact_fn(cloud, ts)))
        print(f"head={mpt:4d} tail={tail:5d}: {fps:6.2f} FPS  "
              f"min {min(ps):5.1f} dB "
              f"[{' '.join(f'{p:.0f}' for p in ps)}]  "
              f"lossless={certs}  dropped={drops}  "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
