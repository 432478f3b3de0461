"""Same-process A/B of the LOD tail-slab proxy (round-3 quality work).

For sampled frames of the bench flythrough: PSNR vs the exact render with
the tail slab ON vs OFF, plus device-loop frame time for both variants.
Decides whether the slab ships default-on (it must not degrade typical
frames to buy the grazing views). RAYEATER_BENCH_SCENE selects the scene
(fog default / shell / inria); RAYEATER_EXP_MPT the LOD depth (384)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import (inria_cloud, random_cloud,
                                                shell_cloud)
    from ray_eater_tpu.ops.gs import render_gaussians

    scene = os.environ.get("RAYEATER_BENCH_SCENE", "fog")
    n = int(os.environ.get("RAYEATER_BENCH_SPLATS", 1_000_000))
    mpt = int(os.environ.get("RAYEATER_EXP_MPT", 384))
    W, H = 1920, 1080
    print(f"device: {jax.devices()[0]}  scene={scene} n={n} mpt={mpt}",
          flush=True)

    if scene == "shell":
        cloud = shell_cloud(n, seed=1)
    elif scene == "inria":
        cloud = inria_cloud(n, seed=1)
    else:
        cloud = random_cloud(n, seed=1, extent=1.0,
                             scale_range=(0.004, 0.02))
    cloud = jax.device_put(cloud)
    big = {"inria": n // 16}.get(scene, 0) or None

    def cam(t):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)
        return view, proj

    def frame(c, t, tail):
        view, proj = cam(t)
        return render_gaussians(c, view, proj, W, H,
                                max_splats_per_tile=mpt, lod_tail=tail,
                                big_splat_cap=big)

    def exact(c, t):
        view, proj = cam(t)
        return render_gaussians(c, view, proj, W, H, big_splat_cap=big)

    f_on = jax.jit(lambda c, t: frame(c, t, True))
    f_off = jax.jit(lambda c, t: frame(c, t, False))
    f_ex = jax.jit(exact)

    def psnr(a, b):
        mse = float(jnp.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    for k in range(6):
        t = np.float32(59 * k / 5 / 60.0)
        ex = f_ex(cloud, t)
        on = psnr(f_on(cloud, t), ex)
        off = psnr(f_off(cloud, t), ex)
        print(f"frame {k}: tail ON {on:6.1f} dB   OFF {off:6.1f} dB",
              flush=True)

    # device-loop timing (10-frame fori through the carry)
    def loop(fn):
        def body(c, _):
            img = fn(cloud, c)
            return c + img[0, 0, 0] * 1e-12 + 1.0 / 60.0, None
        def run(c0):
            c, _ = jax.lax.scan(body, c0, None, length=20)
            return c
        j = jax.jit(run)
        jax.block_until_ready(j(jnp.float32(0)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(j(jnp.float32(0)))
            best = min(best, (time.perf_counter() - t0) / 20 * 1000)
        return best

    t_on = loop(lambda c, t: frame(c, t, True))
    t_off = loop(lambda c, t: frame(c, t, False))
    print(f"frame time: tail ON {t_on:.2f} ms   OFF {t_off:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
