"""gs_viewer — 3D Gaussian Splatting scenes (BASELINE configs 4 & 5).

Renders a splat scene (a 3DGS PLY file, or a synthetic N-splat cloud) with
an animated orbit-camera flythrough: EWA projection, per-frame re-binning,
per-tile depth-ordered compositing — the full pipeline, one jitted frame
program per frame.

Run: ``python samples/gs_viewer.py [--splats N | --ply FILE] [--frames N]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import ray_eater_tpu as re
from ray_eater_tpu import rmath
from ray_eater_tpu.io.image import save_png, to_srgb_u8
from ray_eater_tpu.models.gaussians import load_ply, random_cloud
from ray_eater_tpu.ops.gs import render_gaussians
from ray_eater_tpu.utils.logging import scoped

log = scoped("application")


def orbit_camera(t, radius=2.5, height=0.8, fov_deg=60.0, aspect=16 / 9):
    """Flythrough path: orbit around the scene origin. jax-traceable in t —
    call it INSIDE the jitted frame; eager per-frame camera math costs
    ~100 ms/frame in tiny device dispatches through the tunnel."""
    ang = rmath.radians(30.0) * t
    return orbit_at(ang, height, radius, fov_deg=fov_deg, aspect=aspect)


def orbit_at(azimuth, height, radius, fov_deg=60.0, aspect=16 / 9):
    """Orbit camera from explicit (azimuth, height, radius) state — the
    interactive form: mouse drag steers azimuth/height, wheel zooms
    radius (all jax-traceable scalars)."""
    import jax.numpy as jnp
    az = jnp.float32(azimuth)
    eye = jnp.stack([jnp.float32(radius) * jnp.cos(az),
                     jnp.float32(height),
                     jnp.float32(radius) * jnp.sin(az)])
    view = rmath.look_at_zforward(eye, rmath.vec(0.0, 0.0, 0.0))
    proj = rmath.perspective(rmath.radians(fov_deg), aspect, 0.05, 50.0)
    return view, proj, eye


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_000_000)
    ap.add_argument("--ply", default=None)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--static-camera", action="store_true",
                    help="config 4 (static scene) instead of flythrough")
    ap.add_argument("--max-per-tile", type=int, default=192,
                    help="per-tile LOD step-pool average (pairs/tile); "
                         "temporal budgets allocate it by need each "
                         "frame (57 FPS @ min 42.5 dB on the 1M bench "
                         "flythrough at the defaults — BENCHLOG round "
                         "3). 0 = exact")
    ap.add_argument("--tile-w", type=int, default=32,
                    help="composite tile width (32 = footprint-tight, "
                         "the round-3 flagship config)")
    ap.add_argument("--cap-factor", type=int, default=4,
                    help="pair buffer size in pairs/splat (0 = exact "
                         "worst case)")
    ap.add_argument("--big-splat-cap", type=int, default=0,
                    help="two-level binning budget: splats above the "
                         "15 px level-1 radius limit render through the "
                         "coarse 3x8-tile fan (radius up to 111 px) "
                         "instead of being clamped; N//16 is a good "
                         "INRIA-scene value. 0 = off (clamp radii)")
    ap.add_argument("--out", default="/tmp/rayeater_gs")
    ap.add_argument("--serve", type=int, default=0, metavar="PORT",
                    help="serve a live MJPEG viewer (open "
                         "http://HOST:PORT/ in a browser); WASD orbits "
                         "the camera, Escape quits. 0 = off")
    args = ap.parse_args(argv)

    ctx = re.Context()
    interpret = ctx.interpret
    W, H = args.width, args.height

    if args.ply:
        cloud = load_ply(args.ply)
    else:
        cloud = random_cloud(args.splats, seed=1, extent=1.0,
                             scale_range=(0.004, 0.02))
    n = cloud.num_splats
    log.info("scene: %d splats", n)

    # cloud passed as a jit argument: keeps the splat data in HBM once
    # rather than baked into the executable as constants
    cloud = jax.device_put(cloud)

    from ray_eater_tpu.ops.gs import num_tiles, update_lod_budget
    ntx, nty = num_tiles(W, H, tile_w=args.tile_w)
    mpt = args.max_per_tile or None

    def frame_t(t, budget=None):
        view, proj, eye = orbit_camera(t, aspect=W / H)
        return render_gaussians(cloud, view, proj, W, H,
                                background=(0.0, 0.0, 0.0),
                                cam_pos=eye,   # view-dependent SH colors
                                max_splats_per_tile=mpt,
                                pairs_cap_factor=args.cap_factor or None,
                                big_splat_cap=args.big_splat_cap or None,
                                return_stats=bool(mpt),
                                lod_budget=budget,
                                tile_w=args.tile_w,
                                interpret=interpret)

    if mpt:
        # temporal adaptive LOD: previous frame's executed depth + dry
        # need drive this frame's per-tile budgets (bench.py shape)
        def frame_budgeted(t, budget):
            img, stats = frame_t(t, budget)
            nb = update_lod_budget(stats["tile_exec"], mpt, ntx, nty,
                                   stats["tile_kept"],
                                   stats["tile_count"])
            return img, nb
    else:
        frame_budgeted = None

    os.makedirs(args.out, exist_ok=True)

    if args.serve:
        return _serve_live(args, cloud, ctx, interpret)

    # device-resident loop: the flythrough is ONE dispatch (per-frame
    # host dispatches through a tunnel both cost ~100 ms AND report
    # async-skewed timings)
    dt0 = 0.0 if args.static_camera else 1.0 / 60.0
    if frame_budgeted is not None:
        import jax.numpy as jnp
        b0 = jnp.stack([jnp.full((ntx * nty,), mpt, jnp.int32),
                        jnp.zeros((ntx * nty,), jnp.int32)], -1)
        run = lambda: re.render_animation(frame_budgeted, args.frames,
                                          dt=dt0, carry=b0)
    else:
        run = lambda: re.render_animation(frame_t, args.frames, dt=dt0)
    frames = run()
    jax.block_until_ready(frames)      # warm-up compile
    log.info("compiled %d-frame gs scan on %s", args.frames, ctx.device)

    t0 = time.perf_counter()
    frames = jax.block_until_ready(run())
    dt = time.perf_counter() - t0

    save_png(os.path.join(args.out, "frame_last.png"),
             np.asarray(frames[-1]))
    fps = args.frames / dt
    mode = "static" if args.static_camera else "flythrough"
    print(f"gs_viewer[{mode}]: {args.frames} frames {W}x{H} {n} splats in "
          f"{dt:.3f}s -> {fps:.2f} FPS on {ctx.device.platform} "
          f"(saved {os.path.join(args.out, 'frame_last.png')})")
    return fps


def _serve_live(args, cloud, ctx, interpret):
    """Interactive present loop: one jitted frame per iteration, egress
    through the MJPEG LiveViewer (the glfw window/pollEvents analog —
    frame loop shape basic_planes.zig:316-350).

    Camera: LEFT-DRAG orbits (azimuth + height), WHEEL zooms, WASD
    nudges, Escape (or /close) exits. A browser-window resize rebuilds
    the frame program at the new extent (bucketed to 64 px to bound
    recompiles — the swapchain-recreation path the reference deferred,
    swapchain.zig:229)."""
    import jax.numpy as jnp

    from ray_eater_tpu.core.swapchain import encode_present
    from ray_eater_tpu.io.viewer import LiveViewer

    from ray_eater_tpu.ops.gs import num_tiles, update_lod_budget
    mpt = args.max_per_tile or None

    def build(W, H):
        ntx, nty = num_tiles(W, H, tile_w=args.tile_w)

        def frame(az, hgt, rad, budget):
            view, proj, eye = orbit_at(az, hgt, rad, aspect=W / H)
            out = render_gaussians(cloud, view, proj, W, H,
                                   cam_pos=eye,
                                   max_splats_per_tile=mpt,
                                   pairs_cap_factor=args.cap_factor
                                   or None,
                                   big_splat_cap=args.big_splat_cap
                                   or None,
                                   return_stats=bool(mpt),
                                   lod_budget=(budget if mpt else None),
                                   tile_w=args.tile_w,
                                   interpret=interpret)
            if mpt:
                img, stats = out
                nb = update_lod_budget(stats["tile_exec"], mpt, ntx,
                                       nty, stats["tile_kept"],
                                       stats["tile_count"])
            else:
                img, nb = out, budget
            return encode_present(img, W, H), nb

        b0 = jnp.stack([jnp.full((ntx * nty,), mpt or 0, jnp.int32),
                        jnp.zeros((ntx * nty,), jnp.int32)], -1)
        return jax.jit(frame), b0

    W, H = args.width, args.height
    fj, budget = build(W, H)
    viewer = LiveViewer(port=args.serve)
    log.info("live viewer: http://0.0.0.0:%d/ (drag orbits, wheel zooms, "
             "Escape quits)", viewer.port)
    az, hgt, rad = 0.0, 0.8, 2.5
    lx, ly = None, None
    nframes, t0 = 0, time.perf_counter()
    try:
        while not viewer.should_close:
            keys = viewer.poll_events()
            ms = viewer.poll_mouse()
            if not args.static_camera:
                az += 1.0 / 60.0 * rmath.radians(30.0)
            if 0 in ms.buttons:                     # left-drag orbit
                if lx is not None:
                    az += (ms.x - lx) * 4.0
                    hgt = float(np.clip(hgt - (ms.y - ly) * 4.0,
                                        -3.0, 3.0))
                lx, ly = ms.x, ms.y
            else:
                lx = ly = None
            if ms.wheel:                            # zoom
                rad = float(np.clip(rad * (1.0 + 0.001 * ms.wheel),
                                    0.3, 20.0))
            az += 0.05 * (keys.get("a", 0) - keys.get("d", 0))
            hgt += 0.05 * (keys.get("w", 0) - keys.get("s", 0))
            rq = viewer.poll_resize()
            if rq:
                w2 = max(256, min(3840, rq[0] // 64 * 64))
                h2 = max(256, min(2160, rq[1] // 64 * 64))
                if (w2, h2) != (W, H):
                    W, H = w2, h2
                    log.info("resize -> %dx%d (recompiling)", W, H)
                    fj, budget = build(W, H)
            frame_u8, budget = fj(jnp.float32(az), jnp.float32(hgt),
                                  jnp.float32(rad), budget)
            viewer.present(np.asarray(frame_u8))
            nframes += 1
    except KeyboardInterrupt:
        pass
    finally:
        viewer.stop()
    el = time.perf_counter() - t0
    print(f"gs_viewer[serve]: {nframes} frames in {el:.1f}s "
          f"-> {nframes / max(el, 1e-9):.2f} FPS served")
    return nframes


if __name__ == "__main__":
    main()
