"""Raster-path stage decomposition on the real TPU at 1080p (fori-loop
harness; NOTE: every dispatch pays a fixed ~28 ms tunnel round-trip, so
absolute numbers carry +28/ITERS ms — trust the deltas)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def timeit(name, fn, *args):
    import jax
    f = jax.jit(fn)
    # fetch (not just block): scalar-only outputs return from
    # block_until_ready BEFORE tunnel execution completes (BENCHLOG
    # 2026-08-18 relay hazard)
    float(np.asarray(f(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)))
        best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
    print(f"{name:52s} {best:8.2f} ms/iter", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import ray_eater_tpu as re
    from ray_eater_tpu import rmath
    from ray_eater_tpu.ops import raster

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "samples"))
    import basic_planes as bp

    W, H = 1920, 1080
    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    mesh = re.two_planes()
    tex = bp.load_texture()
    pipe = re.GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                               fragment_fn=re.shaders.textured_border_fragment,
                               name="basic_planes")
    flat_pipe = re.GraphicsPipeline(
        vertex_fn=re.shaders.mvp_vertex,
        fragment_fn=lambda vary, res: jnp.concatenate(
            [vary["color"], jnp.ones_like(vary["color"][..., :1])], -1),
        name="flat")

    def loop(body):
        def run(t0):
            def it(i, carry):
                return body(carry + jnp.float32(i) * (1.0 / 60.0))
            return lax.fori_loop(0, ITERS, it, t0)
        return run

    def full(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        fb = re.render_mesh(pipe, mesh, uni, {"tex": tex}, fb,
                            interpret=ctx.interpret)
        return t + fb.color[0, 0, 0] * 1e-12

    def flat(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        fb = re.render_mesh(flat_pipe, mesh, uni, {}, fb,
                            interpret=ctx.interpret)
        return t + fb.color[0, 0, 0] * 1e-12

    def carry_only(t):
        return t * (1.0 + 1e-9)

    t0 = timeit("carry only (dispatch floor)", loop(carry_only),
                np.float32(0))
    t1 = timeit("flat shade (no texture)", loop(flat), np.float32(0))
    t2 = timeit("full textured frame", loop(full), np.float32(0))
    print(f"deltas: flat-frame {t1 - t0:.2f}  texture {t2 - t1:.2f}",
          flush=True)





def big_scene():
    """10k-triangle grid at 1080p — the VERDICT #7 scale check."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import ray_eater_tpu as re
    from ray_eater_tpu.models.mesh import mesh as make_mesh

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "samples"))
    import basic_planes as bp

    W, H = 1920, 1080
    ctx = re.Context()
    g = 71                                 # 71x71 quads = 10082 triangles
    rng = np.random.RandomState(3)
    xs, ys = np.meshgrid(np.linspace(-1.1, 1.1, g + 1),
                         np.linspace(-1.1, 1.1, g + 1))
    pos = np.stack([xs, ys, 0.2 * rng.rand(g + 1, g + 1)], -1).reshape(-1, 3)
    col = rng.rand((g + 1) * (g + 1), 3)
    uv = np.stack([xs, ys], -1).reshape(-1, 2) * 0.5 + 0.5
    quads = []
    for j in range(g):
        for i in range(g):
            a = j * (g + 1) + i
            quads += [[a, a + 1, a + g + 2], [a + g + 2, a + g + 1, a]]
    m = make_mesh(pos, quads, color=col, uv=uv)
    print(f"triangles: {m.num_triangles}", flush=True)
    tex = bp.load_texture()
    if os.environ.get("RAYEATER_PROF_MIP"):
        # mipmapped sampler: engages the subtile window sampler
        # (sampling._sample_subtile) unless RAYEATER_SUBTILE=0 — the
        # three-way texture A/B (packed non-mip / mip gather / subtile)
        from ray_eater_tpu.core.resources import Sampler
        import ray_eater_tpu.core.resources as res_mod
        u8 = np.clip(np.asarray(tex.data) * 255, 0, 255).astype(np.uint8)
        tex = res_mod.texture_from_array(
            u8, Sampler(mipmap=True, max_anisotropy=4.0), srgb=False)
        print("mip sampler; win_table:",
              None if tex.win_table is None else tex.win_table.shape,
              flush=True)
    from ray_eater_tpu.core.pipeline import CullMode, RasterState
    # double-sided: a backface-culled grid would understate the cost
    pipe = re.GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                               fragment_fn=re.shaders.textured_border_fragment,
                               state=RasterState(cull_mode=CullMode.NONE),
                               name="big")

    def loop(body):
        def run(t0):
            def it(i, carry):
                return body(carry + jnp.float32(i) * (1.0 / 60.0))
            return lax.fori_loop(0, ITERS, it, t0)
        return run

    def full(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        fb = re.render_mesh(pipe, m, uni, {"tex": tex}, fb,
                            interpret=ctx.interpret)
        return t + fb.color[0, 0, 0] * 1e-12

    flat_pipe = re.GraphicsPipeline(
        vertex_fn=re.shaders.mvp_vertex,
        fragment_fn=lambda vary, res: jnp.concatenate(
            [vary["color"], jnp.ones_like(vary["color"][..., :1])], -1),
        name="flat")

    def flat(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        fb = re.render_mesh(flat_pipe, m, uni, {}, fb,
                            interpret=ctx.interpret)
        return t + fb.color[0, 0, 0] * 1e-12

    from ray_eater_tpu.ops import raster as raster_ops

    def raster_only(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        clip, _ = flat_pipe.vertex_fn(m.positions, m.attributes, uni)
        setup, inv_w, z_tri, bary_mix = raster_ops._triangle_setup(
            clip, m.indices, flat_pipe.state, W, H)
        gdepth, gtri, gl0, gl1, _ = raster_ops._raster_call(
            setup, fb.depth, W, H, depth_test=True, last_wins=False,
            interpret=ctx.interpret, n_tris=inv_w.shape[0])
        return t + gdepth[0, 0] * 1e-12 + gl0[0, 0] * 1e-12 \
            + gtri[0, 0].astype(jnp.float32) * 1e-12

    def bin_only(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        clip, _ = flat_pipe.vertex_fn(m.positions, m.attributes, uni)
        setup, inv_w, z_tri, bary_mix = raster_ops._triangle_setup(
            clip, m.indices, flat_pipe.state, W, H)
        ntx, nty = 1920 // raster_ops.TILE_W, 1088 // raster_ops.TILE_H
        pack, _, steps, visited, ovb = raster_ops._bin_triangles(
            setup, ntx, nty)
        return t + pack[0, 0] * 1e-12 + steps[0][0].astype(
            jnp.float32) * 1e-12

    timeit("10k: bin only (emit+sort+layout+pack)", loop(bin_only),
           np.float32(0))
    timeit("10k: raster (bin + kernel)", loop(raster_only), np.float32(0))
    timeit("10k: flat frame", loop(flat), np.float32(0))
    timeit("10k-tri textured frame 1080p", loop(full), np.float32(0))


if __name__ == "__main__":
    big_scene() if os.environ.get("RAYEATER_PROF_BIG") else main()
