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
    ap.add_argument("--out", default="/tmp/rayeater_train")
    args = ap.parse_args(argv)
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
