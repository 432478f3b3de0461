"""multipass — depth prepass + lit textured meshes through the render graph.

BASELINE.json config 3. Demonstrates the render graph the reference only
sketched (src/graph/render_graph.zig:6-36): two passes over the same
framebuffer — a depth-only prepass, then a textured lit pass with
LESS_EQUAL depth — validated, toposorted, and fused into ONE jitted XLA
frame program.

Run: ``python samples/multipass.py [--frames N] [--width W --height H]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import ray_eater_tpu as re
from ray_eater_tpu import rmath
from ray_eater_tpu.graph.render_graph import RenderGraph
from ray_eater_tpu.io.image import save_png
from ray_eater_tpu.utils.logging import scoped
from basic_planes import load_texture

log = scoped("application")


def make_scene(n_grid: int = 4):
    """A grid of textured quads at varying heights (several meshes' worth
    of triangles in one buffer — 2*n^2 triangles)."""
    pos, col, uv, idx = [], [], [], []
    rng = np.random.RandomState(7)
    for gy in range(n_grid):
        for gx in range(n_grid):
            x0 = -1.0 + 2.0 * gx / n_grid
            z0 = -1.0 + 2.0 * gy / n_grid
            s = 2.0 / n_grid
            y = float(rng.rand() * 0.6)
            base = len(pos)
            pos += [[x0, y, z0], [x0 + s, y, z0],
                    [x0 + s, y, z0 + s], [x0, y, z0 + s]]
            c = rng.rand(3).tolist()
            col += [c, c, c, c]
            uv += [[1, 0], [0, 0], [0, 1], [1, 1]]
            idx += [[base, base + 1, base + 2], [base + 2, base + 3, base]]
    return re.mesh(pos, idx, color=col, uv=uv)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--grid", type=int, default=4)
    ap.add_argument("--obj", default=None,
                    help="render a Wavefront OBJ mesh instead of the grid")
    ap.add_argument("--no-present", action="store_true",
                    help="with --host-loop: skip per-frame host readback")
    ap.add_argument("--host-loop", action="store_true",
                    help="one dispatch per frame + swapchain present "
                         "instead of the device-resident scan")
    ap.add_argument("--out", default="/tmp/rayeater_multipass")
    args = ap.parse_args(argv)

    W, H = args.width, args.height
    ctx = re.Context()
    interpret = ctx.interpret
    if args.obj:
        from ray_eater_tpu.io.obj import load_obj
        scene = load_obj(args.obj)
    else:
        scene = make_scene(args.grid)
    tex = load_texture()

    depth_only = re.GraphicsPipeline(
        vertex_fn=re.shaders.mvp_vertex,
        fragment_fn=lambda v, r: jnp.zeros((*v["uv"].shape[:-1], 4),
                                           jnp.float32),
        name="depth_prepass")
    lit = re.GraphicsPipeline(
        vertex_fn=re.shaders.mvp_vertex,
        fragment_fn=re.shaders.textured_border_fragment,
        state=re.RasterState(depth_compare=re.CompareOp.LESS_EQUAL),
        name="lit")

    def setup(i):
        # per-frame state built in-trace: the only external is the scalar
        # time, so each frame is exactly ONE device dispatch
        t = i["t"]
        uniforms = {
            "model": rmath.rotate_y(rmath.identity(),
                                    rmath.radians(30.0) * t),
            "view": rmath.look_at(rmath.vec(2.0, 2.0, 2.0),
                                  rmath.vec(0.0, 0.0, 0.0)),
            "projection": rmath.perspective(rmath.radians(45.0), W / H,
                                            0.1, 30.0),
        }
        return {"fb": re.create_framebuffer(W, H), "uniforms": uniforms}

    def prepass(i):
        return {"fb": re.render_mesh(depth_only, scene, i["uniforms"], {},
                                     i["fb"], interpret=interpret)}

    def litpass(i):
        return {"fb": re.render_mesh(lit, scene, i["uniforms"],
                                     {"tex": tex}, i["fb"],
                                     interpret=interpret)}

    graph = (RenderGraph("prepass_lit")
             .external("t")
             .add_pass("setup", setup, reads=("t",),
                       writes=("fb", "uniforms"))
             .add_pass("depth_prepass", prepass, reads=("fb", "uniforms"),
                       writes=("fb",))
             .add_pass("lit", litpass, reads=("fb", "uniforms"),
                       writes=("fb",))
             .output("fb"))
    frame = graph.bake()
    log.info("baked: %s", frame.pass_names)

    os.makedirs(args.out, exist_ok=True)

    if not args.host_loop:
        # device-resident loop: scan the baked graph over the time axis —
        # the whole animation is one dispatch
        frame_t = lambda t: frame(t=t)["fb"]
        frames = re.render_animation(frame_t, args.frames, dt=0.0)
        jax.block_until_ready(frames)       # warm-up compile
        t0 = time.perf_counter()
        frames = jax.block_until_ready(
            re.render_animation(frame_t, args.frames))
        dt = time.perf_counter() - t0
        last = np.asarray(frames[-1])
    else:
        sc = re.Swapchain(ctx, W, H)
        fb = frame(t=np.float32(0.0))["fb"]
        ctx.wait_idle(fb.color)

        t0 = time.perf_counter()
        img = None
        for i in range(args.frames):
            fb = frame(t=np.float32(i / 60.0))["fb"]
            if not args.no_present:
                out = sc.present(fb)
                img = out if out is not None else img
        if args.no_present:
            jax.block_until_ready(fb.color)
            img = sc.present(fb)
        tail = list(sc.drain())
        dt = time.perf_counter() - t0
        last = tail[-1] if tail else img

    save_png(os.path.join(args.out, "frame_last.png"), last)
    fps = args.frames / dt
    mpix = W * H * fps / 1e6
    print(f"multipass: {args.frames} frames {W}x{H} "
          f"({scene.num_triangles} tris x2 passes) in {dt:.3f}s -> "
          f"{fps:.1f} FPS, {mpix:.0f} Mpix/s on {ctx.device.platform}")
    return fps


if __name__ == "__main__":
    main()
