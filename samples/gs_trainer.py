"""gs_trainer — fit a Gaussian-splat scene to a rendered target image.

End-to-end training demo: renders a target image from a hidden scene, then
optimizes a randomly-initialized cloud against it with Adam (optionally
data-parallel over all local devices). Demonstrates the differentiable
splatting path (models/gs_training.py).

Run: ``python samples/gs_trainer.py [--splats N] [--steps N] [--dp]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import optax

import ray_eater_tpu as re
from ray_eater_tpu import rmath
from ray_eater_tpu.io.image import save_png, to_srgb_u8
from ray_eater_tpu.models.gaussians import random_cloud
from ray_eater_tpu.models.gs_training import (make_train_step,
                                              make_train_step_dp,
                                              make_train_step_pallas,
                                              params_from_cloud,
                                              render_diff,
                                              render_diff_pallas)
from ray_eater_tpu.parallel.sharded import make_device_mesh
from ray_eater_tpu.utils.logging import scoped

log = scoped("application")


def train_adc(args):
    """From-scratch multi-view reconstruction with the INRIA adaptive
    density control loop: clone/split high-gradient splats, prune
    transparent ones, reset opacities — the training recipe of the 3DGS
    paper the reference cites (README.md:7)."""
    import jax.numpy as jnp

    from ray_eater_tpu.models.gs_densify import (densify_and_prune,
                                                 init_densify_state,
                                                 make_train_window_adc,
                                                 pad_params,
                                                 reset_new_slots,
                                                 reset_opacity)

    ctx = re.Context()
    W, H = args.width, args.height
    cap = args.capacity or 4 * args.splats
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)

    # hidden scene + a ring of training cameras
    target_cloud = random_cloud(args.splats, seed=42, extent=0.5,
                                scale_range=(0.03, 0.08))
    path = args.path or ("pallas" if cap > 4096 else "jnp")
    use_pallas = path == "pallas"
    render = (render_diff if not use_pallas
              else lambda p, v, pr, w, h: render_diff_pallas(
                  p, v, pr, w, h, interpret=ctx.interpret))
    views, targets = [], []
    tp = params_from_cloud(target_cloud)
    # training ring + 2 HELD-OUT views at half-offset angles (never
    # trained on — the reconstruction metric, not the fit metric)
    for k in range(args.views + 2):
        held = k >= args.views
        ang = 2.0 * np.pi * ((k + 0.5) if held else k) / args.views
        eye = rmath.vec(2.3 * np.cos(ang), 0.4, 2.3 * np.sin(ang))
        v = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
        views.append(v)
        targets.append(jax.block_until_ready(render(tp, v, proj, W, H)))
    holdout_views, holdout_targets = views[-2:], targets[-2:]
    views, targets = views[:-2], targets[:-2]
    log.info("rendered %d target views (+2 held out) of a hidden "
             "%d-splat scene", args.views, args.splats)

    n0 = max(args.splats // 16, 16)
    params = pad_params(
        params_from_cloud(random_cloud(n0, seed=7, extent=0.5,
                                       scale_range=(0.05, 0.1))), cap)
    dstate = init_densify_state(cap, n0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    # DEVICE-RESIDENT windows of densify_every steps: one dispatch per
    # densify event instead of one per step (the fixed ~28 ms tunnel
    # round-trip capped host-looped ADC at ~3.3 steps/s — BENCHLOG)
    window = make_train_window_adc(opt, W, H, use_pallas=use_pallas,
                                   interpret=ctx.interpret,
                                   nsteps=args.densify_every)
    windows = {args.densify_every: window}
    targets_s = jnp.stack(targets)
    views_s = jnp.stack(views)
    key = jax.random.PRNGKey(0)

    last_densify = args.steps - 2 * args.densify_every
    t0 = time.perf_counter()
    timed_from = 0
    pos = 0
    while pos < args.steps:
        nwin = min(args.densify_every, args.steps - pos)
        if nwin not in windows:        # remainder window (one extra jit)
            windows[nwin] = make_train_window_adc(
                opt, W, H, use_pallas=use_pallas,
                interpret=ctx.interpret, nsteps=nwin)
        params, opt_state, dstate, loss = windows[nwin](
            params, opt_state, dstate, targets_s, views_s, proj,
            jnp.int32(pos))
        if pos == 0:
            jax.block_until_ready(loss)
            log.info("compiled %d-step adc window on %s (capacity %d)",
                     nwin, ctx.device, cap)
            t0, timed_from = time.perf_counter(), nwin
        pos += nwin
        i = pos - 1                    # last executed global step
        if (i % args.densify_every == args.densify_every - 1
                and i < last_densify):
            # threshold = a live-quantile of the mean view-space gradient
            # (self-normalizing across resolutions/losses; the INRIA
            # absolute 2e-4 assumes their NDC gradient scale)
            avg = np.asarray(dstate.grad_accum) / np.maximum(
                np.asarray(dstate.grad_count), 1.0)
            lv = np.asarray(dstate.live)
            thr = float(np.quantile(avg[lv], 0.7)) if lv.any() else 0.0
            key, kk = jax.random.split(key)
            prev = dstate.live
            params, dstate, st = densify_and_prune(
                params, dstate, kk, grad_threshold=max(thr, 1e-12),
                scene_extent=1.0, prune_scale3d=0.5)
            opt_state = reset_new_slots(opt_state, prev, dstate.live)
            log.info("step %4d densify: +%d clone +%d split -%d prune "
                     "-> %d live; loss %.6f", i, int(st["n_clone"]),
                     int(st["n_split"]), int(st["n_prune"]),
                     int(st["n_live"]), float(loss))
        # fire when the window CROSSED a 1500-step boundary (pos only
        # visits multiples of densify_every, which need not divide 1500)
        if (pos // 1500) > ((pos - nwin) // 1500) and i < last_densify:
            params = reset_opacity(params, dstate)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    psnrs, hpsnrs = [], []
    for vlist, tlist, out in ((views, targets, psnrs),
                              (holdout_views, holdout_targets, hpsnrs)):
        for v, t in zip(vlist, tlist):
            mse = float(jnp.mean((render(params, v, proj, W, H) - t) ** 2))
            out.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    final = render(params, views[0], proj, W, H)
    os.makedirs(args.out, exist_ok=True)
    save_png(os.path.join(args.out, "target.png"),
             to_srgb_u8(targets[0]))
    save_png(os.path.join(args.out, "fitted.png"), to_srgb_u8(final))
    n_live = int(jnp.sum(dstate.live))
    if args.save_ply:
        # training→rendering closed loop (VERDICT round-3 task 4): export
        # the LIVE reconstructed splats so bench.py can flythrough-render
        # them (RAYEATER_BENCH_SCENE=trained RAYEATER_BENCH_PLY=<path>)
        from ray_eater_tpu.models.gaussians import save_ply
        from ray_eater_tpu.models.gs_training import cloud_from_params
        live = np.asarray(dstate.live)
        full = cloud_from_params(params)
        trained = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)[live]), full)
        save_ply(args.save_ply, trained)
        log.info("saved %d live splats to %s", n_live, args.save_ply)
    print(f"gs_trainer[adc/{path}]: {args.steps} steps, {n0} -> "
          f"{n_live} live splats (cap {cap}), {args.views} views "
          f"{W}x{H} on {ctx.device.platform}, "
          f"{max(args.steps - timed_from, 1) / dt:.1f} steps/s; "
          f"mean PSNR {np.mean(psnrs):.1f} dB (min {min(psnrs):.1f}), "
          f"held-out {np.mean(hpsnrs):.1f} dB "
          f"(saved {args.out}/fitted.png)")
    return float(np.mean(hpsnrs))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--path", choices=("pallas", "jnp"), default=None,
                    help="differentiable renderer: the Pallas custom-VJP "
                         "kernels (scales to 1M splats) or the pure-jnp "
                         "reference. Default: pallas above 4096 splats")
    ap.add_argument("--adc", action="store_true",
                    help="scene RECONSTRUCTION with adaptive density "
                         "control: start from a small random init, fit "
                         "multi-view targets, densify/prune on the INRIA "
                         "schedule (models/gs_densify.py)")
    ap.add_argument("--capacity", type=int, default=0,
                    help="--adc slot capacity (default 4x --splats)")
    ap.add_argument("--views", type=int, default=6,
                    help="--adc camera count around the scene")
    ap.add_argument("--densify-every", type=int, default=100)
    ap.add_argument("--save-ply", default=None,
                    help="--adc: export the reconstructed live splats as "
                         "PLY (bench them: RAYEATER_BENCH_SCENE=trained "
                         "RAYEATER_BENCH_PLY=<path> python bench.py)")
    ap.add_argument("--out", default="/tmp/rayeater_train")
    args = ap.parse_args(argv)
    if args.adc:
        return train_adc(args)
    if args.steps < 1:
        ap.error("--steps must be >= 1")
    os.makedirs(args.out, exist_ok=True)   # fail fast on unwritable --out

    ctx = re.Context()
    W, H = args.width, args.height
    view = rmath.look_at_zforward(rmath.vec(0.0, 0.3, -2.5),
                                  rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(60.0), W / H, 0.1, 30.0)

    target_cloud = random_cloud(args.splats, seed=42, extent=0.6,
                                scale_range=(0.04, 0.1))
    path = args.path or ("pallas" if args.splats > 4096 else "jnp")
    render = (render_diff if path == "jnp"
              else lambda p, v, pr, w, h: render_diff_pallas(
                  p, v, pr, w, h, interpret=ctx.interpret))
    target = render(params_from_cloud(target_cloud), view, proj, W, H)

    params = params_from_cloud(
        random_cloud(args.splats, seed=7, extent=0.6,
                     scale_range=(0.04, 0.1)))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    if args.dp:
        mesh = make_device_mesh()
        step = make_train_step_dp(opt, view, proj, mesh)
        log.info("dp training over %d devices", mesh.shape[mesh.axis_names[0]])
    elif path == "pallas":
        step = make_train_step_pallas(opt, view, proj,
                                      interpret=ctx.interpret)
    else:
        step = make_train_step(opt, view, proj)

    # warm-up compile outside the timed loop (TPU compiles can take minutes)
    params, opt_state, loss0 = step(params, opt_state, target)
    jax.block_until_ready(loss0)
    loss0 = float(loss0)
    log.info("compiled train step on %s; initial loss %.6f",
             ctx.device, loss0)

    t0 = time.perf_counter()
    loss = loss0
    for i in range(1, args.steps):
        params, opt_state, loss = step(params, opt_state, target)
        if i % max(1, args.steps // 10) == 0:
            log.info("step %4d  loss %.6f", i, float(loss))
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    final = render(params, view, proj, W, H)
    save_png(os.path.join(args.out, "target.png"), to_srgb_u8(target))
    save_png(os.path.join(args.out, "fitted.png"), to_srgb_u8(final))
    steps_timed = max(args.steps - 1, 1)
    print(f"gs_trainer[{'dp' if args.dp else path}]: {args.steps} steps "
          f"{args.splats} splats {W}x{H} on {ctx.device.platform}, "
          f"{steps_timed / dt:.1f} steps/s (post-compile); "
          f"loss {loss0:.5f} -> {float(loss):.5f} "
          f"(saved {args.out}/fitted.png)")
    return float(loss)


if __name__ == "__main__":
    main()
