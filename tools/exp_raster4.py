"""SAME-PROCESS 4-way raster A/B at 10k tris / 1080p (VERDICT round-2
tasks 3+4): the in-kernel winner-feature fetch (raster._shade_fetch_kernel
+ payload-sorted feature pack) and the zero-gather subtile texture sampler
(sampling._sample_subtile) vs the row-gather paths they replace.

  A: shade-fetch kernel, packed (non-mip) texture
  B: gather shade,       packed (non-mip) texture   <- round-2 baseline
  C: shade-fetch kernel, mip texture, SUBTILE sampler
  D: shade-fetch kernel, mip texture, gather sampler

Also prints PSNR C-vs-D (subtile LOD quantization on a real frame) and
A-vs-B (must be ~exact). Timing windows FETCH the scalar (relay hazard,
BENCHLOG 2026-08-18)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import ray_eater_tpu as re
    from ray_eater_tpu.core.pipeline import CullMode, RasterState
    from ray_eater_tpu.core.resources import Sampler
    import ray_eater_tpu.core.resources as res_mod
    from ray_eater_tpu.models.mesh import mesh as make_mesh
    from ray_eater_tpu.ops import raster as raster_ops

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "samples"))
    import basic_planes as bp

    W, H = 1920, 1080
    ctx = re.Context()
    print("device:", ctx.device, flush=True)

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
    u8 = np.clip(np.asarray(tex.data) * 255, 0, 255).astype(np.uint8)
    tex_mip = res_mod.texture_from_array(
        u8, Sampler(mipmap=True, max_anisotropy=4.0), srgb=False)
    print("mip win_table:", None if tex_mip.win_table is None
          else tex_mip.win_table.shape, flush=True)

    pipe = re.GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                               fragment_fn=re.shaders.textured_border_fragment,
                               state=RasterState(cull_mode=CullMode.NONE),
                               name="big")

    def frame(t, texture):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        fb = re.render_mesh(pipe, m, uni, {"tex": texture}, fb,
                            interpret=ctx.interpret)
        return fb

    def loop(texture):
        # the PSNR/eyeball frame (t=0.35) rides the timed window's carry:
        # ONE compiled program per config (cold relay compiles are the
        # session bottleneck, 30+ min each for 10k-tri frame programs)
        def run(t0):
            img0 = jnp.zeros((H, W, 4), jnp.float32)

            def it(i, carry):
                acc, _ = carry
                fb = frame(acc + jnp.float32(i) * (1.0 / 60.0), texture)
                return acc + fb.color[0, 0, 0] * 1e-12, fb.color

            acc, _ = lax.fori_loop(0, ITERS, it, (t0, img0))
            fb = frame(jnp.float32(0.35), texture)
            return acc, fb.color
        return run

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        acc, img = f(*args)
        img = np.asarray(img)                # fetch (relay-blind hazard)
        print(f"{name:56s} compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc, im = f(*args)
            # FETCH the scalar (forces completion; relay-blind hazard)
            # but leave the 33 MB frame device-resident
            float(np.asarray(acc))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:56s} {best:8.2f} ms/iter", flush=True)
        return best, img

    results = {}
    imgs = {}
    configs = [
        ("A shade-kernel + packed tex", True, tex, "1"),
        ("B gather shade + packed tex", False, tex, "1"),
        ("C shade-kernel + mip SUBTILE", True, tex_mip, "1"),
        ("D shade-kernel + mip gather", True, tex_mip, "0"),
    ]
    for name, sf, texture, sub in configs:
        raster_ops._SHADE_FETCH = sf
        os.environ["RAYEATER_SUBTILE"] = sub
        try:
            results[name], imgs[name] = timeit(name, loop(texture),
                                               np.float32(0))
        finally:
            raster_ops._SHADE_FETCH = True
            os.environ["RAYEATER_SUBTILE"] = "1"

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    ka, kb, kc, kd = (c[0] for c in configs)
    print(f"A vs B PSNR {psnr(imgs[ka], imgs[kb]):6.1f} dB "
          "(shade kernel parity; expect >100)", flush=True)
    print(f"C vs D PSNR {psnr(imgs[kc], imgs[kd]):6.1f} dB "
          "(subtile LOD quantization in-frame)", flush=True)
    print(f"A vs C PSNR {psnr(imgs[ka], imgs[kc]):6.1f} dB "
          "(mip trilinear vs single-level packed)", flush=True)

    # save the winning-config frame for the hardware PNG eyeball
    from ray_eater_tpu.io.image import save_png
    for key, fname in ((ka, "/tmp/r3b_rasterA.png"),
                       (kc, "/tmp/r3b_rasterC.png")):
        img = np.clip(imgs[key][..., :4], 0, 1)
        save_png(fname, (img * 255).astype(np.uint8))
        print("wrote", fname, flush=True)


if __name__ == "__main__":
    main()
