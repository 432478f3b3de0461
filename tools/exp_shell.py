"""Round-3 probe: WHY is the shell (surface) scene 14-21 dB under LOD?

Renders one hard frame of the 1M shell scene exact + LOD, localizes the
error per tile, and correlates it with the binning stats (count, desired,
kept, pool scale) of the same frame so the failure mode is visible:
depth-cut too shallow? whole-tile step loss? pool misallocation?

Usage: python tools/exp_shell.py [--tw 32] [--mpt 384] [--frame 59]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tw", type=int, default=32)
    ap.add_argument("--mpt", type=int, default=384)
    ap.add_argument("--frame", type=int, default=59)
    ap.add_argument("--splats", type=int, default=1_000_000)
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--out", default="/tmp/exp_shell")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.io.image import save_png, to_srgb_u8
    from ray_eater_tpu.models.gaussians import shell_cloud
    from ray_eater_tpu.ops import gs

    ctx = re.Context()
    W, H = (int(v) for v in args.res.split("x"))
    tw, mpt = args.tw, args.mpt
    ntx, nty = gs.num_tiles(W, H, tile_w=tw)
    cloud = shell_cloud(args.splats, seed=1)
    t = args.frame

    ang = rmath.radians(30.0) * t
    eye = np.array([2.5 * np.cos(ang), 0.8, 2.5 * np.sin(ang)], np.float32)
    view = rmath.look_at_zforward(jnp.asarray(eye), rmath.vec(0, 0, 0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.05, 50.0)

    def render(c, mpt_):
        return gs.render_gaussians(c, view, proj, W, H,
                                   pairs_cap_factor=None,
                                   max_splats_per_tile=mpt_,
                                   return_stats=True,
                                   interpret=ctx.interpret, tile_w=tw)

    exact, est = jax.jit(lambda c: render(c, None))(cloud)
    exact = np.asarray(exact)
    # exact-mode executed depth = the information-theoretic minimum pool
    # for perfect quality with per-tile prefix lists
    need = np.asarray(est["tile_exec"])
    print(f"exact executed pairs: total {need.sum()}  max/tile "
          f"{need.max()}  p99 {np.percentile(need, 99):.0f}", flush=True)
    lod, _ = jax.jit(lambda c: render(c, mpt))(cloud)
    lod = np.asarray(lod)
    err = ((exact - lod) ** 2).mean(-1)
    mse = float(err.mean())
    print(f"tw={tw} mpt={mpt} frame={t}: PSNR "
          f"{10 * np.log10(1.0 / max(mse, 1e-12)):.2f} dB", flush=True)

    # per-tile mean error map (logical extent; pad rows/cols excluded)
    th = gs.TILE_H
    errp = np.zeros((nty * th, ntx * tw), err.dtype)
    errp[:H, :W] = err
    tile_err = errp.reshape(nty, th, ntx, tw).mean((1, 3))

    # binning stats for the same frame, straight from _bin_splats' own
    # (kept, count) return — no duplicated allocator math to drift
    ps = gs.project_gaussians(cloud.means, cloud.scales, cloud.quats,
                              cloud.opacities, cloud.colors, view, proj,
                              W, H)
    ntiles = ntx * nty
    CHUNK = gs.CHUNK
    cap = gs._pad_to(cloud.num_splats * gs.KX * gs.KY
                     + ntiles * CHUNK, CHUNK)
    _, _, _, overflow, _, _, (kept, count), _ = gs._bin_splats(
        ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
        jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap,
        max_per_tile=mpt, tile_w=tw)
    cap_steps = -(-ntiles * mpt // CHUNK)
    pool_pairs = cap_steps * CHUNK
    desired = kept          # the snap grants at most `desired`
    cut_qd = pooled = jnp.zeros_like(kept)   # no longer replicated
    scale = jnp.float32(1.0)

    count, desired, kept = (np.asarray(x) for x in (count, desired, kept))
    cut_qd, pooled = np.asarray(cut_qd), np.asarray(pooled)
    scale = float(scale)
    active = count > 0
    print(f"tiles {ntiles} active {active.sum()}  pairs {count.sum()}  "
          f"pool_pairs {pool_pairs}  sum(desired) {desired.sum()}  "
          f"scale {scale:.3f}  kept {kept.sum()}  "
          f"dropped {(count - kept).sum()}", flush=True)

    # correlate tile error with binning stats
    te = tile_err.reshape(-1)
    order = np.argsort(-te)
    print("\nworst 20 tiles by error:")
    print(" tile  (ty,tx)  err      count desired kept  cut_qd  pooled")
    for i in order[:20]:
        print(f"{i:6d} ({i // ntx:3d},{i % ntx:3d}) {te[i]:.5f} "
              f"{count[i]:6d} {desired[i]:6d} {kept[i]:5d} "
              f"{cut_qd[i]:7d} {pooled[i]:7d}")

    # bucket: how much error comes from tiles where kept < count vs ==
    full = kept >= count
    print(f"\nerr mass: full-kept tiles {te[full.reshape(-1)].sum():.3f}  "
          f"truncated tiles {te[~full.reshape(-1)].sum():.3f}")
    frac = kept / np.maximum(count, 1)
    for lo, hi in [(0.0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 0.999),
                   (0.999, 2.0)]:
        sel = active & (frac >= lo) & (frac < hi)
        if sel.sum():
            print(f"  kept/count in [{lo:.2f},{hi:.2f}): {sel.sum():5d} "
                  f"tiles, mean err {te[sel].mean():.5f}, "
                  f"err mass {te[sel].sum():.3f}")

    os.makedirs(args.out, exist_ok=True)
    save_png(os.path.join(args.out, f"exact_f{t}.png"), to_srgb_u8(exact))
    save_png(os.path.join(args.out, f"lod_tw{tw}_mpt{mpt}_f{t}.png"),
             to_srgb_u8(lod))
    emap = (np.sqrt(tile_err) / max(np.sqrt(tile_err).max(), 1e-9))
    save_png(os.path.join(args.out, f"errmap_tw{tw}_mpt{mpt}_f{t}.png"),
             np.repeat((emap * 255).astype(np.uint8)[..., None], 3, -1))
    print(f"\nsaved {args.out}/", flush=True)


if __name__ == "__main__":
    main()
