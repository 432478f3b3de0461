"""Diagnose the inria scene's ~29-30 dB LOD quality floor (BENCHLOG
round 3: quality saturates past mpt=512, so the floor is NOT pool
starvation).  Suspects, in test order:

1. big-splat budget overflow (splats with r > level1 ceiling beyond
   ``big_splat_cap`` are dropped WHOLE — and the bench PSNR gate renders
   its exact reference with the SAME cap, so the drop is invisible to it:
   the corner-channel lesson, BENCHLOG 2026-08-17);
2. level-2 radius ceiling (111 px): near-eye floaters clamp to 111 px on
   BOTH sides of the gate — again invisible;
3. temporal misallocation (pool-side; would NOT saturate with mpt).

Stage A (this file, CPU, projection only): per-view census — how many
splats are big, how many overflow the n/16 cap, how many hit the level-2
ceiling, and the emitted pair mass per category.

Run: JAX_PLATFORMS=cpu python tools/exp_inria.py
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_eater_tpu import rmath
    from ray_eater_tpu.models.gaussians import inria_cloud
    from ray_eater_tpu.ops import gs

    n = int(os.environ.get("N", 1_000_000))
    W, H = 1920, 1080
    tile_w = 32
    cloud = inria_cloud(n, seed=1)
    big_cap = n // 16
    r1 = gs.level1_max_radius(gs.KY, tile_w)
    r2 = gs.level2_max_radius(tile_w)
    kx2 = gs._kx2(tile_w)
    print(f"r1={r1} r2={r2} kx2={kx2} KY2={gs.KY2} big_cap={big_cap}")

    frames = 60
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    @jax.jit
    def census(t):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        # level-2 ceiling projection (what the renderer uses with big_cap)
        p = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                 cloud.opacities, cloud.colors, view, proj,
                                 W, H, max_radius=float(r2))
        r = p.radius
        valid = jnp.isfinite(p.depth) & (r > 0)
        big = valid & (r > r1)
        nbig = jnp.sum(big)
        # splats already AT the level-2 ceiling = clamped (footprint cut)
        clamped = valid & (r >= r2)
        # pair mass: level-1 fan emits KX*KY slots, level-2 kx2*KY2
        small_pairs = jnp.sum(valid & (r <= r1)) * gs.KX * gs.KY
        big_pairs = nbig * kx2 * gs.KY2
        # the cap drops the LAST nbig-cap big splats in ARRAY order;
        # measure the opacity-weighted footprint mass that loses
        order = jnp.cumsum(big.astype(jnp.int32))
        dropped = big & (order > big_cap)
        area = jnp.pi * r.astype(jnp.float32) ** 2
        mass = jnp.where(valid, p.opacity * area, 0.0)
        return (nbig, jnp.sum(dropped), jnp.sum(clamped),
                small_pairs, big_pairs,
                jnp.sum(jnp.where(dropped, mass, 0.0)), jnp.sum(mass),
                jnp.max(jnp.where(valid, r, 0)))

    for k in range(6):
        t = np.float32((frames - 1) * k / 5 / 60.0)
        nbig, ndrop, nclamp, sp, bp, mdrop, mtot, rmax = \
            [np.asarray(v) for v in census(t)]
        print(f"view {k}: big={int(nbig):7d} (cap {big_cap}) "
              f"dropped={int(ndrop):6d} at-ceiling={int(nclamp):5d} "
              f"rmax={int(rmax):4d} | pairs small={int(sp)/1e6:.2f}M "
              f"big={int(bp)/1e6:.2f}M | dropped mass "
              f"{float(mdrop / mtot) * 100:.2f}%")

    # stage B: the THREE-level split the fix ships (mid fan 16 slots to
    # 47 px, coarse 64 slots above) — verify the bench caps cover every
    # view and report the static slot cost vs the coarse-only budget
    rm = gs.level_mid_max_radius(tile_w)
    kxm = gs._kxm(tile_w)
    mid_cap, big_cap3 = n // 5, n // 32

    @jax.jit
    def census3(t):
        ang = rmath.radians(30.0) * t
        eye = jnp.stack([2.5 * jnp.cos(ang), jnp.float32(0.8),
                         2.5 * jnp.sin(ang)])
        view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        p = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                                 cloud.opacities, cloud.colors, view, proj,
                                 W, H, max_radius=float(r2))
        r = p.radius
        valid = jnp.isfinite(p.depth) & (r > 0)
        return (jnp.sum(valid & (r > r1) & (r <= rm)),
                jnp.sum(valid & (r > rm)))

    print(f"\nthree-level (mid<=%d px cap=%d, coarse cap=%d): static "
          "slots mid %.2fM + big %.2fM = %.2fM (coarse-only n/16: %.2fM)"
          % (rm, mid_cap, big_cap3, mid_cap * kxm * gs.KY_M / 1e6,
             big_cap3 * kx2 * gs.KY2 / 1e6,
             (mid_cap * kxm * gs.KY_M + big_cap3 * kx2 * gs.KY2) / 1e6,
             (n // 16) * kx2 * gs.KY2 / 1e6))
    for k in range(6):
        t = np.float32((frames - 1) * k / 5 / 60.0)
        nm, nb = [int(np.asarray(v)) for v in census3(t)]
        print(f"view {k}: mid={nm:7d}/{mid_cap}  big={nb:6d}/{big_cap3}"
              f"  overflow={'YES' if nm > mid_cap or nb > big_cap3 else 'no'}")


if __name__ == "__main__":
    main()
