"""Same-process A/B: exact-mode multi-chunk composite steps (exact_seg).

Exact/direct frames sequence one grid step per 128-pair block and the
saturation early-out skips most bodies, so the fixed ~0.66 us/step
sequencing dominates (BENCHLOG round-3 inventory item 4). exact_seg
streams N chunks per grid step with the early-out re-checked between
sub-chunks. RAYEATER_BENCH_SCENE / RAYEATER_EXP_TILEW / RAYEATER_EXP_REPS
as in exp_payload.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops import gs

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "fog")
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    tw = int(os.environ.get("RAYEATER_EXP_TILEW", 32))
    reps = int(os.environ.get("RAYEATER_EXP_REPS", 10))
    W, H = 1920, 1080
    print(f"device: {jax.devices()[0]} scene={scene} n={n} tile_w={tw}",
          flush=True)

    cloud = {"shell": shell_cloud, "inria": inria_cloud}.get(
        scene, lambda n, seed: random_cloud(
            n, seed=seed, extent=1.0, scale_range=(0.004, 0.02)))(n, seed=1)
    cloud = jax.device_put(cloud)
    big = {"inria": n // 16}.get(scene, 0) or None

    def frame(c, t, seg: int):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)
        return gs.render_gaussians(c, view, proj, W, H,
                                   pairs_cap_factor=None,
                                   big_splat_cap=big, tile_w=tw,
                                   exact_seg=seg)

    imgs = {}
    for seg in (1, 2, 4, 8):
        # the PSNR frame (t=0.7) rides the timed window: ONE compiled
        # program per seg (cold exact-mode relay compiles are the
        # bottleneck); timing fetches only the scalar, the image stays
        # device-resident
        def win(c, t0, seg=seg):
            acc = lax.fori_loop(
                0, reps, lambda i, acc: acc + frame(
                    c, t0 + i.astype(jnp.float32) / 60.0,
                    seg)[0, 0, 0] * 1e-9, t0)
            return acc, frame(c, jnp.float32(0.7), seg)
        fn = jax.jit(win)
        t0 = time.perf_counter()
        _, img = fn(cloud, np.float32(0.0))
        img = jax.block_until_ready(img)
        print(f"seg={seg}: compile+first window "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        best = 1e9
        for w in range(3):
            t0 = time.perf_counter()
            acc, _ = fn(cloud, np.float32(1.0 + w))
            float(np.asarray(acc))                  # FETCH, not block
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"exact seg={seg}   {best * 1e3:8.2f} ms/frame "
              f"({1.0 / best:.1f} FPS)", flush=True)
        imgs[seg] = img

    for seg in (2, 4, 8):
        mse = float(jnp.mean((imgs[seg] - imgs[1]) ** 2))
        print(f"seg={seg} vs seg=1 PSNR "
              f"{10 * np.log10(1.0 / max(mse, 1e-12)):.1f} dB", flush=True)

    # exact-mode hardware eyeball PNGs (CLAUDE.md: always view a real-TPU
    # frame after touching geometry-path code)
    from ray_eater_tpu.io.image import save_png, to_srgb_u8
    for seg in (1, 4):
        save_png(f"/tmp/r3b_exact_seg{seg}.png", to_srgb_u8(imgs[seg]))
        print(f"wrote /tmp/r3b_exact_seg{seg}.png", flush=True)


if __name__ == "__main__":
    main()
