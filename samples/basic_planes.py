"""basic_planes — the canonical end-to-end graphics sample.

Re-creation of samples/basic_planes.zig on the TPU backend: two textured
quads (8 vertices / 12 indices), per-vertex colors + uvs, depth-tested,
model rotating around Y at 45°/s, camera at (2,2,2) looking at the origin,
45° perspective — presented via the swapchain ring to PNG frames instead of
a window (basic_planes.zig:245-267, 295-350).

Run: ``python samples/basic_planes.py [--frames N] [--out DIR]``
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
from ray_eater_tpu.io.image import save_png
from ray_eater_tpu.utils.logging import scoped

log = scoped("application")

WIDTH, HEIGHT = 900, 600  # swapchain extent (basic_planes.zig:126-128)

#: texture search order: the reference asset if mounted, else procedural
TEXTURE_CANDIDATES = (
    os.environ.get("RAYEATER_TEXTURE", ""),
    "/root/reference/textures/shrek.png",
)


def load_texture() -> re.Texture:
    for path in TEXTURE_CANDIDATES:
        if path and os.path.exists(path):
            log.info("texture: %s", path)
            return re.texture_from_file(path)
    # procedural checkerboard fallback (keeps the sample self-contained)
    y, x = np.mgrid[0:256, 0:256]
    checker = ((x // 32 + y // 32) % 2).astype(np.float32)
    rgba = np.stack([checker, 0.5 * np.ones_like(checker), 1 - checker,
                     np.ones_like(checker)], -1)
    return re.texture_from_array((rgba * 255).astype(np.uint8))


def frame_uniforms(t, aspect=WIDTH / HEIGHT):
    """Per-frame UBO (basic_planes.zig:295-314)."""
    return {
        "model": rmath.rotate_y(rmath.identity(), rmath.radians(45.0) * t),
        "view": rmath.look_at(rmath.vec(2.0, 2.0, 2.0),
                              rmath.vec(0.0, 0.0, 0.0)),
        "projection": rmath.perspective(rmath.radians(45.0),
                                        aspect, 0.1, 30.0),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="/tmp/rayeater_basic_planes")
    ap.add_argument("--width", type=int, default=WIDTH)
    ap.add_argument("--height", type=int, default=HEIGHT)
    ap.add_argument("--host-loop", action="store_true",
                    help="one dispatch per frame + swapchain ring present "
                         "(the reference's loop shape) instead of the "
                         "device-resident scan")
    ap.add_argument("--no-present", action="store_true",
                    help="with --host-loop: skip per-frame host readback")
    ap.add_argument("--save-every", type=int, default=0,
                    help="save every Nth frame (0 = last frame only)")
    args = ap.parse_args(argv)
    w, h = args.width, args.height

    ctx = re.Context()
    mesh = re.two_planes()
    tex = load_texture()
    pipe = re.GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                               fragment_fn=re.shaders.textured_border_fragment,
                               name="basic_planes")

    interpret = ctx.interpret

    def frame_program_t(t):
        fb = re.create_framebuffer(w, h)
        uni = frame_uniforms(t, w / h)
        return re.render_mesh(pipe, mesh, uni, {"tex": tex}, fb,
                              interpret=interpret)

    os.makedirs(args.out, exist_ok=True)

    if not args.host_loop:
        # device-resident loop: the whole animation is ONE dispatch
        # (lax.scan over t), so the per-frame tunnel RPC disappears.
        # Warm up with the SAME frame count — the scan length is baked
        # into the compiled program
        frames = re.render_animation(frame_program_t, args.frames, dt=0.0)
        jax.block_until_ready(frames)   # warm-up compile
        log.info("compiled %d-frame scan on %s", args.frames, ctx.device)
        t0 = time.perf_counter()
        frames = jax.block_until_ready(
            re.render_animation(frame_program_t, args.frames))
        dt = time.perf_counter() - t0
        frames = np.asarray(frames)
        if args.save_every:
            for i in range(0, args.frames, args.save_every):
                save_png(os.path.join(args.out, f"frame_{i:04d}.png"),
                         frames[i])
        last = frames[-1]
    else:
        frame_program = jax.jit(frame_program_t)
        sc = re.Swapchain(ctx, w, h)
        fb = frame_program(np.float32(0.0))
        ctx.wait_idle(fb.color)
        log.info("compiled frame program on %s", ctx.device)

        t0 = time.perf_counter()
        img = None
        for i in range(args.frames):
            t = np.float32(i / 60.0)
            fb = frame_program(t)
            if args.no_present:
                continue
            img = sc.present(fb)
            if img is not None and args.save_every \
                    and (i % args.save_every == 0):
                save_png(os.path.join(args.out, f"frame_{i:04d}.png"), img)
        if args.no_present:
            jax.block_until_ready(fb.color)
            img = sc.present(fb)
        tail = list(sc.drain())
        dt = time.perf_counter() - t0
        last = tail[-1] if tail else img

    save_png(os.path.join(args.out, "frame_last.png"), last)
    fps = args.frames / dt
    mode = "host-loop" if args.host_loop else "device-loop"
    print(f"basic_planes[{mode}]: {args.frames} frames {w}x{h} "
          f"in {dt:.3f}s -> {fps:.1f} FPS on {ctx.device.platform} "
          f"(saved {os.path.join(args.out, 'frame_last.png')})")
    return fps


if __name__ == "__main__":
    main()
