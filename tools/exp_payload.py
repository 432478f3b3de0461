"""Same-process A/B: exact-mode pack via PAYLOAD-SORT vs row gather.

The exact/direct layout's pack stage is a (CAP, 12) row gather from the
(N, 12) record table (~30 ms at 4.2M rows, tools/exp_gather.py) while an
unstable sort carrying the 9 record columns as payload operands costs
~5.3 ms — this tool measures the END-TO-END exact frame both ways in one
process (CLAUDE.md: only same-process A/Bs are trustworthy here).

RAYEATER_BENCH_SCENE=fog|shell|inria, RAYEATER_EXP_TILEW, frames via
RAYEATER_EXP_REPS.
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

    def frame(c, t, payload: bool):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)
        if payload:
            return gs.render_gaussians(c, view, proj, W, H,
                                       pairs_cap_factor=None,
                                       big_splat_cap=big, tile_w=tw)
        # gather variant: replicate render_gaussians' exact path but
        # force the legacy pack (records=None -> pack_idx + take)
        colors = c.colors
        maxr = (float(gs.level2_max_radius(tw)) if big else None)
        ps = gs._project_fast(c.means, c.scales, c.quats, c.opacities,
                              colors, view, proj, W, H,
                              max_radius=maxr, interpret=False)
        records = gs._make_records(ps)
        ntx = gs._pad_to(W, tw) // tw
        nty = gs._pad_to(H, gs.TILE_H) // gs.TILE_H
        cap = gs._pad_to(c.num_splats * gs.KX * gs.KY
                         + ntx * nty * gs.CHUNK
                         + (big * gs._kx2(tw) * gs.KY2 if big else 0),
                         gs.CHUNK)
        pack_idx, steps, visited, ov, ovb, _, _, _ = gs._bin_splats(
            ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
            jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap,
            big_cap=big, tile_w=tw)
        packed = gs._pack_records(records, pack_idx)
        r, g_, b, t_, _ = gs._composite_call(packed, steps, nty, ntx,
                                             False, tw)
        img = gs.finalize_planes(r, g_, b, t_, visited, nty, ntx,
                                 (0.0, 0.0, 0.0), tile_w=tw)
        return img[:H, :W]

    for name, pay in (("payload-sort", True), ("gather-pack", False)):
        fn = jax.jit(lambda c, t0, pay=pay: lax.fori_loop(
            0, reps, lambda i, acc: acc + frame(
                c, t0 + i.astype(jnp.float32) / 60.0, pay)[0, 0, 0] * 1e-9,
            t0))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(cloud, np.float32(0.0)))
        print(f"{name}: compile+first window {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = 1e9
        # each window gets a DIFFERENT t0 (identical (executable, args)
        # re-dispatches can be served from a relay-side cache) AND the
        # scalar result is FETCHED to host: block_until_ready alone on a
        # scalar-only output returns immediately through the relay
        # (0.01 ms/frame "measured", 195k FPS — physically impossible)
        for w in range(3):
            t0 = time.perf_counter()
            float(fn(cloud, np.float32(1.0 + w)))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:14s} {best*1e3:8.2f} ms/frame "
              f"({1.0/best:.1f} FPS)", flush=True)

    # pixel parity (tie order may differ between the two sorts)
    a = jax.jit(lambda c: frame(c, np.float32(0.7), True))(cloud)
    b = jax.jit(lambda c: frame(c, np.float32(0.7), False))(cloud)
    mse = float(jnp.mean((a - b) ** 2))
    print(f"payload vs gather PSNR {10*np.log10(1.0/max(mse,1e-12)):.1f} dB",
          flush=True)


if __name__ == "__main__":
    main()
