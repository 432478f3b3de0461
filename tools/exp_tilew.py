"""Same-process A/B of composite tile WIDTH (round-3 footprint-tight
compositing, VERDICT task 1 / BENCHLOG known-bottleneck 3).

tile_w in {128, 64, 32} changes the pixel area a chunk evaluates (4096 /
2048 / 1024 px) while the emission fan stays K=4 and the sort size is
unchanged — so narrow tiles trade step-count overhead (more tiles x 2
fixed steps) for 2-4x cheaper chunk bodies. Expected: wash on
saturation-bound fog, big wins on list-depth-bound scenes (shell
surfaces, exact mode).

Measures, per scene (fog/shell/inria via RAYEATER_BENCH_SCENE):
  - exact-mode device-loop frame time for each tile_w
  - LOD frame time + min PSNR over sampled frames at an EQUAL pair-pool
    budget (mpt scaled by tile area: 512/256/128)
"""

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
    W, H = 1920, 1080
    widths = [int(w) for w in os.environ.get(
        "RAYEATER_EXP_WIDTHS", "128,32").split(",")]
    mpt_base = int(os.environ.get("RAYEATER_EXP_MPT", 512))  # at tile_w=128
    print(f"device: {jax.devices()[0]}  scene={scene} n={n} "
          f"widths={widths} mpt128={mpt_base}", flush=True)

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

    def frame(c, t, tw, mpt):
        view, proj = cam(t)
        return render_gaussians(c, view, proj, W, H,
                                max_splats_per_tile=mpt, big_splat_cap=big,
                                tile_w=tw)

    def loop(fn, nframes=20):
        def body(c, _):
            img = fn(cloud, c)
            return c + img[0, 0, 0] * 1e-12 + 1.0 / 60.0, None

        def run(c0):
            c, _ = jax.lax.scan(body, c0, None, length=nframes)
            return c
        j = jax.jit(run)
        t0 = time.perf_counter()
        jax.block_until_ready(j(jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(j(jnp.float32(0)))
            best = min(best, (time.perf_counter() - t0) / nframes * 1000)
        return best, compile_s

    def psnr(a, b):
        mse = float(jnp.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    exact_fns = {}
    for tw in widths:
        f_ex = jax.jit(lambda c, t, tw=tw: frame(c, t, tw, None))
        exact_fns[tw] = f_ex
        ms, cs = loop(f_ex)
        print(f"tile_w={tw:4d} EXACT: {ms:8.2f} ms/frame "
              f"({1000.0 / ms:5.1f} FPS)  [compile {cs:.0f}s]", flush=True)

    ref = exact_fns[widths[0]]
    for tw in widths:
        mpt = max(mpt_base * tw // 128, 128)
        f_lod = jax.jit(lambda c, t, tw=tw, mpt=mpt: frame(c, t, tw, mpt))
        ms, cs = loop(f_lod)
        ps = []
        for k in range(5):
            t = np.float32(59 * k / 4 / 60.0)
            ps.append(psnr(f_lod(cloud, t), ref(cloud, t)))
        print(f"tile_w={tw:4d} LOD mpt={mpt}: {ms:8.2f} ms/frame "
              f"({1000.0 / ms:5.1f} FPS)  min {min(ps):.1f} dB "
              f"[{' '.join(f'{p:.1f}' for p in ps)}]  [compile {cs:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
