"""compute_drawing — compute + graphics interop sample.

Re-creation of samples/compute_drawing/main.zig: a compute pass splats 1024
randomly-placed yellow 40px squares into a 900×600 storage image **once** at
startup (main.zig:306-319), and the per-frame graphics pass samples that
image onto a fullscreen quad (render_quad.zig:116-127).

Note: the reference's dispatch indexes particles by global-invocation x only
(compute_slime.glsl:31), so with its 4x4x1 dispatch of 8x8 groups only 32
of the 1024 particles are effectively drawn — here the compute kernel splats
all 1024 as intended.

Run: ``python samples/compute_drawing.py [--frames N] [--out DIR]``
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
from ray_eater_tpu.io.image import save_png
from ray_eater_tpu.ops.splat import splat_particles
from ray_eater_tpu.utils.logging import scoped

log = scoped("application")

WIDTH, HEIGHT = 900, 600
PARTICLE_COUNT = 1024           # main.zig:82
PIXELS_RAD = 20                 # main.zig:276
COLOR = (1.0, 1.0, 0.0)         # main.zig:273 — yellow


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default="/tmp/rayeater_compute_drawing")
    ap.add_argument("--device-loop", action="store_true",
                    help="render all frames in one dispatch (device "
                         "FPS) instead of presenting each frame")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    ctx = re.Context()
    interpret = ctx.interpret

    # randomize particle positions on host (main.zig:279-300)
    rng = np.random.RandomState(args.seed)
    positions = np.stack([rng.rand(PARTICLE_COUNT) * WIDTH,
                          rng.rand(PARTICLE_COUNT) * HEIGHT],
                         -1).astype(np.float32)

    # one-shot compute dispatch (testCompute, main.zig:306-319); the layout
    # transition general→shader_read_only is a data dependency here
    @jax.jit
    def compute_pass(pos):
        image = np.zeros((HEIGHT, WIDTH, 4), np.float32)
        image = jax.numpy.asarray(image).at[..., 3].set(1.0)
        return splat_particles(image, pos, COLOR, PIXELS_RAD,
                               interpret=interpret)

    render_target = compute_pass(positions)
    ctx.wait_idle(render_target)
    log.info("compute pass done")

    tex = re.Texture(data=render_target,
                     sampler=re.Sampler(address_mode=re.AddressMode.CLAMP_TO_EDGE))
    quad = re.fullscreen_quad()
    pipe = re.GraphicsPipeline(
        vertex_fn=re.shaders.passthrough_vertex,
        fragment_fn=re.shaders.quad_sample_fragment,
        state=re.RasterState(depth_test=False, depth_write=False),
        name="render_quad")

    def frame_program_t(t):
        fb = re.create_framebuffer(WIDTH, HEIGHT)
        uniforms = {"time": t}   # declared but unused, frag.glsl:6-9
        return re.render_mesh(pipe, quad, uniforms,
                              {"compute_image": tex}, fb,
                              interpret=interpret)

    frame_program = jax.jit(frame_program_t)

    sc = re.Swapchain(ctx, WIDTH, HEIGHT, srgb=False)
    os.makedirs(args.out, exist_ok=True)

    fb = frame_program(np.float32(0.0))
    ctx.wait_idle(fb.color)

    if args.device_loop:
        # whole animation as ONE dispatch (cf. basic_planes device loop):
        # per-frame host present through the tunnel costs ~28 ms/dispatch
        frames_u8 = re.render_animation(frame_program_t, args.frames,
                                        srgb=False, keep="last")
        jax.block_until_ready(frames_u8)    # warm-up compile
        t0 = time.perf_counter()
        last = np.asarray(jax.block_until_ready(re.render_animation(
            frame_program_t, args.frames, srgb=False, keep="last")))
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        img = None
        for i in range(args.frames):
            fb = frame_program(np.float32(i / 60.0))
            out = sc.present(fb)
            img = out if out is not None else img
        tail = list(sc.drain())
        dt = time.perf_counter() - t0
        last = tail[-1] if tail else img
    save_png(os.path.join(args.out, "frame_last.png"), last)
    fps = args.frames / dt
    print(f"compute_drawing: {args.frames} frames {WIDTH}x{HEIGHT} in "
          f"{dt:.3f}s -> {fps:.1f} FPS on {ctx.device.platform} "
          f"(saved {os.path.join(args.out, 'frame_last.png')})")
    return fps


if __name__ == "__main__":
    main()
