"""Same-process A/B: jnp EWA projection vs the fused Pallas projection
kernel, isolated and in the full bench-config pipeline (fori_loop
harness — see tools/profile_gs.py docstring for why)."""
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
    print(f"{name:48s} {best:8.2f} ms/iter", flush=True)
    return best


def main():
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
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

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

    def proj_jnp(t):
        ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                  cloud.opacities, cloud.colors,
                                  mk_view(t), proj, W, H)
        return (t + ps.mean2d[0, 0] * 1e-12 + ps.depth[0] * 1e-18
                + ps.conic[0, 0] * 1e-12)

    def proj_pallas(t):
        ps = gs._project_fast(cloud.means, cloud.scales, cloud.quats,
                              cloud.opacities, cloud.colors,
                              mk_view(t), proj, W, H,
                              interpret=ctx.interpret)
        return (t + ps.mean2d[0, 0] * 1e-12 + ps.depth[0] * 1e-18
                + ps.conic[0, 0] * 1e-12)

    timeit("project: jnp", loop(proj_jnp), np.float32(0))
    timeit("project: pallas fused", loop(proj_pallas), np.float32(0))

    MPT = 512

    def full(t):
        img = gs.render_gaussians(cloud, mk_view(t), proj, W, H,
                                  pairs_cap_factor=4,
                                  max_splats_per_tile=MPT,
                                  interpret=ctx.interpret)
        return t + img[0, 0, 0] * 1e-12

    t_full = timeit(f"full bench-config [mpt={MPT}] (pallas proj)",
                    loop(full), np.float32(0))
    print(f"full-pipeline FPS estimate: {1000.0 / t_full:.1f}", flush=True)


if __name__ == "__main__":
    main()
