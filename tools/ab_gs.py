"""Same-process A/B of render_gaussians configs on the real TPU.

Measures FPS (fori_loop-of-10 frames, one dispatch) and PSNR vs the
baseline config on the same frame — the only comparison shape that is
reliable through the tunnel. Usage: edit CONFIGS, run.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10

CONFIGS = [
    ("exact capf4", dict(pairs_cap_factor=4)),
    ("mpt=512", dict(pairs_cap_factor=4, max_splats_per_tile=512)),
    ("mpt=448", dict(pairs_cap_factor=4, max_splats_per_tile=448)),
    ("mpt=384", dict(pairs_cap_factor=4, max_splats_per_tile=384)),
    ("mpt=256", dict(pairs_cap_factor=4, max_splats_per_tile=256)),
]


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import random_cloud
    from ray_eater_tpu.ops.gs import render_gaussians

    W, H = 1920, 1080
    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    cloud = jax.device_put(random_cloud(1_000_000, seed=1, extent=1.0,
                                        scale_range=(0.004, 0.02)))

    def frame(c, t, **kw):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)
        return render_gaussians(c, view, proj, W, H,
                                interpret=ctx.interpret, **kw)

    imgs = {}
    for name, kw in CONFIGS:
        f1 = jax.jit(lambda c, t: frame(c, t, **kw))
        imgs[name] = np.asarray(jax.block_until_ready(
            f1(cloud, jnp.float32(0.35))))

        @jax.jit
        def loop(c, t0):
            def it(i, t):
                img = frame(c, t, **kw)
                return t + 1.0 / 60.0 + img[0, 0, 0] * 1e-12
            return lax.fori_loop(0, ITERS, it, t0)

        jax.block_until_ready(loop(cloud, jnp.float32(0.0)))
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(cloud, jnp.float32(0.0)))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        base = imgs[CONFIGS[0][0]]
        mse = float(np.mean((imgs[name] - base) ** 2))
        psnr = 10 * np.log10(1.0 / mse) if mse > 0 else float("inf")
        print(f"{name:28s} {1 / best:6.2f} FPS  ({best * 1000:.1f} ms)  "
              f"PSNR vs base: {psnr:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
