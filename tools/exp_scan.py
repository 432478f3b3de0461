"""Why is lax.scan-of-frames slow? Time N-frame scans vs N standalone
frame dispatches for the basic_planes frame program on the real TPU."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "samples"))


def main():
    import jax
    import jax.numpy as jnp

    import ray_eater_tpu as re
    import basic_planes as bp

    ctx = re.Context()
    print("device:", ctx.device, flush=True)
    mesh = re.two_planes()
    tex = bp.load_texture()
    pipe = re.GraphicsPipeline(
        vertex_fn=re.shaders.mvp_vertex,
        fragment_fn=re.shaders.textured_border_fragment)

    w, h = 900, 600

    def frame_t(t):
        fb = re.create_framebuffer(w, h)
        uni = bp.frame_uniforms(t, w / h)
        return re.render_mesh(pipe, mesh, uni, {"tex": tex}, fb,
                              interpret=ctx.interpret)

    # plain jit frame, timed over 20 sequential dispatches
    f = jax.jit(lambda t: frame_t(t).color)
    jax.block_until_ready(f(np.float32(0.0)))
    t0 = time.perf_counter()
    for i in range(20):
        out = f(np.float32(i / 60))
    jax.block_until_ready(out)
    print(f"host-loop: {(time.perf_counter() - t0) / 20 * 1000:.1f} "
          f"ms/frame", flush=True)

    # scan variants
    for n in (4, 16, 64):
        for mode in ("color", "u8"):
            @jax.jit
            def run(ts):
                def step(c, t):
                    fb = frame_t(t)
                    img = fb.color
                    if mode == "u8":
                        from ray_eater_tpu.core.swapchain import \
                            encode_present
                        img = encode_present(img, w, h, True)
                    return c, img
                _, imgs = jax.lax.scan(step, 0, ts)
                return imgs

            ts = jnp.arange(n, dtype=jnp.float32) / 60
            jax.block_until_ready(run(ts))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(run(ts))
                best = min(best, (time.perf_counter() - t0) / n * 1000)
            print(f"scan n={n:3d} {mode:6s}: {best:7.1f} ms/frame",
                  flush=True)


if __name__ == "__main__":
    main()
