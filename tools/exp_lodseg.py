"""Same-process A/B: LOD multi-chunk steps (lod_seg) x corner K-reduction
on the inria bench config — the two round-4 bin/composite levers. Prints
window FPS per config plus one PSNR-vs-exact gate on the hardest frame.

Env: RAYEATER_BENCH_SCENE / RAYEATER_BENCH_SPLATS / RAYEATER_EXP_TILEW /
RAYEATER_EXP_MPT as usual."""
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

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops import gs

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "inria")
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    W, H = 1920, 1080
    TW = int(os.environ.get("RAYEATER_EXP_TILEW", 64))
    MPT = int(os.environ.get("RAYEATER_EXP_MPT", 768))
    ctx = re.Context()
    print(f"device: {ctx.device} scene={scene} tw={TW} mpt={MPT}",
          flush=True)
    if scene == "shell":
        cloud = shell_cloud(n, seed=1)
    elif scene == "inria":
        cloud = inria_cloud(n, seed=1)
    else:
        cloud = random_cloud(n, seed=1, extent=1.0,
                             scale_range=(0.004, 0.02))
    cloud = jax.device_put(cloud)
    big = {"inria": n // 32}.get(scene, 0) or None
    mid = ({"inria": n // 5}.get(scene, 0) or None) if big else None
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    def frame(c, t, seg, ccap):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        return gs.render_gaussians(c, view, proj, W, H,
                                   max_splats_per_tile=MPT,
                                   big_splat_cap=big, mid_splat_cap=mid,
                                   corner_cap=ccap, tile_w=TW,
                                   lod_seg=seg, interpret=ctx.interpret)

    def psnr(a, b):
        mse = float(jnp.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    exact_fn = jax.jit(lambda c, t: gs.render_gaussians(
        cloud, rmath.look_at_zforward(
            jnp.stack([2.5 * jnp.cos(rmath.radians(30.0) * t),
                       jnp.float32(0.8),
                       2.5 * jnp.sin(rmath.radians(30.0) * t)]),
            rmath.vec(0.0, 0.0, 0.0)), proj, W, H,
        big_splat_cap=big, mid_splat_cap=mid, tile_w=TW,
        interpret=ctx.interpret))
    ref = None

    for seg in (1, 4, 8):
        for ccap in (None, n // 8):
            def window(c, t0, seg=seg, ccap=ccap):
                def body(i, acc):
                    img = frame(c, t0 + i.astype(jnp.float32) / 60.0,
                                seg, ccap)
                    return acc + img[0, 0, 0] * 1e-12
                return lax.fori_loop(0, FRAMES, body, t0)

            wjit = jax.jit(window)
            t0 = time.perf_counter()
            jax.block_until_ready(wjit(cloud, np.float32(0.0)))
            ct = time.perf_counter() - t0
            best = 1e9
            for w in range(3):
                t0 = time.perf_counter()
                float(np.asarray(wjit(cloud, np.float32(1.0 + w))))
                best = min(best, (time.perf_counter() - t0) / FRAMES)
            # PSNR gate on the t=0.59 frame (hardest of the bench set)
            ts = np.float32(0.59)
            img = jax.jit(lambda c, t, seg=seg, ccap=ccap:
                          frame(c, t, seg, ccap))(cloud, ts)
            if ref is None:
                ref = exact_fn(cloud, ts)
            p = psnr(img, ref)
            print(f"lod_seg={seg} corner={'n//8' if ccap else 'off ':4s}: "
                  f"{1.0 / best:6.2f} FPS  psnr-vs-exact {p:5.1f} dB "
                  f"(compile {ct:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
