"""Subtile-sampler stage decomposition on a REAL raster frame's uv field
(the exp_raster4 10k-tri scene at 1080p): where do the in-frame ~8.7 ms
of the texture stage go? Stages are cumulative prefixes of
sampling._sample_subtile; deltas are per-stage costs.

The uv/coverage planes are captured once from the deferred G-buffer and
fed as device arrays, so only sampler work is timed."""
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
    from ray_eater_tpu.core.pipeline import (CullMode, GraphicsPipeline,
                                             RasterState)
    from ray_eater_tpu.core import resources as res_mod
    from ray_eater_tpu.core.resources import Sampler
    from ray_eater_tpu.models.mesh import mesh as make_mesh
    from ray_eater_tpu.ops import sampling as sa

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "samples"))
    import basic_planes as bp

    W, H = 1920, 1080
    ctx = re.Context()
    print("device:", ctx.device, flush=True)

    g = 71
    rng = np.random.RandomState(3)
    xs, ys = np.meshgrid(np.linspace(-1.1, 1.1, g + 1),
                         np.linspace(-1.1, 1.1, g + 1))
    pos = np.stack([xs, ys, 0.2 * rng.rand(g + 1, g + 1)],
                   -1).reshape(-1, 3)
    col = rng.rand((g + 1) * (g + 1), 3)
    uvv = np.stack([xs, ys], -1).reshape(-1, 2) * 0.5 + 0.5
    quads = []
    for j in range(g):
        for i in range(g):
            a = j * (g + 1) + i
            quads += [[a, a + 1, a + g + 2], [a + g + 2, a + g + 1, a]]
    m = make_mesh(pos, quads, color=col, uv=uvv)

    tex = bp.load_texture()
    u8 = np.clip(np.asarray(tex.data) * 255, 0, 255).astype(np.uint8)
    tmip = res_mod.texture_from_array(
        u8, Sampler(mipmap=True, max_anisotropy=4.0), srgb=False)

    # capture the G-buffer uv + coverage once (fragment shader that
    # RETURNS uv instead of sampling)
    def uv_fragment(varyings, resources):
        uv = varyings["uv"]
        cov = varyings["_coverage"].astype(jnp.float32)
        return jnp.concatenate([uv, cov[..., None],
                                jnp.ones_like(cov)[..., None]], -1)

    pipe = GraphicsPipeline(vertex_fn=re.shaders.mvp_vertex,
                            fragment_fn=uv_fragment,
                            state=RasterState(cull_mode=CullMode.NONE),
                            name="uvcap")

    @jax.jit
    def capture(t):
        fb = re.create_framebuffer(W, H)
        uni = bp.frame_uniforms(t, W / H)
        fb = re.render_mesh(pipe, m, uni, {}, fb, interpret=ctx.interpret)
        return fb.color

    cap = capture(np.float32(0.35))
    uv = cap[..., :2]
    valid = cap[..., 2] > 0.5
    uv, valid = jax.device_put(uv), jax.device_put(valid)
    print("coverage:", float(jnp.mean(valid.astype(jnp.float32))),
          flush=True)

    s = tmip.sampler
    nlev = len(tmip.win_dims)
    h0, w0 = tmip.mip_dims[0][0], tmip.mip_dims[0][1]
    _SUB, _SPIX = sa._SUB, sa._SPIX

    def stage_lod(uv, valid):
        u, v = uv[..., 0], uv[..., 1]

        def ddiff(a, axis):
            d = jnp.diff(a, axis=axis)
            edge = jax.lax.slice_in_dim(d, d.shape[axis] - 1,
                                        d.shape[axis], axis=axis)
            return jnp.concatenate([d, edge], axis=axis)

        dudx, dvdx = ddiff(u, -1) * w0, ddiff(v, -1) * h0
        dudy, dvdy = ddiff(u, -2) * w0, ddiff(v, -2) * h0
        ddx = dudx * dudx + dvdx * dvdx
        ddy = dudy * dudy + dvdy * dvdy
        r_max = jnp.sqrt(jnp.maximum(jnp.maximum(ddx, ddy), 1e-20))
        r_min = jnp.sqrt(jnp.maximum(jnp.minimum(ddx, ddy), 1e-20))
        aniso = jnp.clip(r_max / r_min, 1.0, float(s.max_anisotropy))
        lod = jnp.clip(jnp.log2(jnp.maximum(r_max / aniso, 1.0)),
                       0.0, float(nlev - 1))
        return u, v, lod

    def stage_subtile(uv, valid):
        u, v, lod = stage_lod(uv, valid)
        cu = jnp.mod(u, 2.0)
        cu = jnp.where(cu <= 1.0, cu, 2.0 - cu)
        cv = jnp.mod(v, 2.0)
        cv = jnp.where(cv <= 1.0, cv, 2.0 - cv)
        Hp, Wp = -(-H // _SUB) * _SUB, -(-W // _SUB) * _SUB
        if (Hp, Wp) != (H, W):
            pad = ((0, Hp - H), (0, Wp - W))
            cu, cv, lod = (jnp.pad(a, pad, mode="edge")
                           for a in (cu, cv, lod))
            valid = jnp.pad(valid, pad, mode="edge")
        ns = (Hp // _SUB) * (Wp // _SUB)

        def st(a):
            return a.reshape(Hp // _SUB, _SUB, Wp // _SUB,
                             _SUB).transpose(0, 2, 1, 3).reshape(ns, _SPIX)

        cus, cvs, lods = st(cu), st(cv), st(lod)
        vs = st(valid)
        cnt = jnp.maximum(jnp.sum(vs, axis=1, keepdims=True), 1)
        mu = jnp.sum(jnp.where(vs, cus, 0.0), axis=1,
                     keepdims=True) / cnt
        mv = jnp.sum(jnp.where(vs, cvs, 0.0), axis=1,
                     keepdims=True) / cnt
        ml = jnp.max(jnp.where(vs, lods, 0.0), axis=1, keepdims=True)
        cus = jnp.where(vs, cus, mu)
        cvs = jnp.where(vs, cvs, mv)
        lods = jnp.where(vs, lods, ml)
        return cus, cvs, lods

    def mk(body):
        def run(t0):
            def it(i, acc):
                out = body(uv + acc * 1e-20, valid)
                leaves = jax.tree.leaves(out)
                return acc + leaves[0].reshape(-1)[0].astype(
                    jnp.float32) * 1e-12
            return lax.fori_loop(0, ITERS, it, t0)
        return run

    def timeit(name, body):
        f = jax.jit(mk(body))
        float(np.asarray(f(np.float32(0.0))))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(np.float32(1.0))))
            best = min(best, (time.perf_counter() - t0) / ITERS * 1000)
        print(f"{name:44s} {best:8.2f} ms/iter", flush=True)
        return best

    timeit("per-pixel LOD (deriv+aniso)", stage_lod)
    timeit("+prewrap+subtile reshape+cov mask", stage_subtile)
    timeit("FULL _sample_subtile (f32 windows)",
           lambda uv, valid: sa._sample_subtile(tmip, uv, valid=valid))
    timeit("gather _sample_mip (D path)", lambda uv, valid: sa._sample_mip(
        tmip, uv))

    os.environ["RAYEATER_WIN_BF16"] = "1"
    tbf = res_mod.texture_from_array(
        u8, Sampler(mipmap=True, max_anisotropy=4.0), srgb=False)
    os.environ.pop("RAYEATER_WIN_BF16")
    assert tbf.win_table.dtype == jnp.bfloat16
    timeit("FULL _sample_subtile (bf16 windows)",
           lambda uv, valid: sa._sample_subtile(tbf, uv, valid=valid))
    a = jax.jit(lambda: sa._sample_subtile(tmip, uv, valid=valid))()
    b = jax.jit(lambda: sa._sample_subtile(tbf, uv, valid=valid))()
    d = jnp.where(valid[..., None], a - b, 0.0)
    mse = float(jnp.mean(d * d))
    print(f"bf16-vs-f32 covered-pixel PSNR: "
          f"{10 * np.log10(1.0 / max(mse, 1e-12)):.1f} dB", flush=True)


if __name__ == "__main__":
    main()
