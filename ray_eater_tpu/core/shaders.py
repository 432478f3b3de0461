"""Built-in shading functions with the reference shaders' exact semantics.

The reference compiles GLSL at runtime (shader.zig:70-114); here "shaders"
are jittable JAX functions compiled by XLA. These four reproduce the
reference's shipped shader set:

* :func:`mvp_vertex`          — shaders/shader.vert
* :func:`textured_border_fragment` — shaders/shader.frag
* :func:`quad_sample_fragment` — samples/compute_drawing/shaders/frag.glsl
* the compute-slime kernel lives in ops/splat.py (compute_slime.glsl)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.sampling import sample


def mvp_vertex(positions, attrs, uniforms):
    """``gl_Position = proj * view * model * vec4(pos, 1)``; passes color and
    uv through (shader.vert:16-19). ``uniforms`` carries the UBO of
    basic_planes.zig:66-70: {model, view, projection} row-major (4,4).

    One fused (N,4)x(4,4) MXU matmul — the whole vertex buffer at once.
    """
    from .. import rmath
    mvp = rmath.mul(rmath.mul(uniforms["projection"], uniforms["view"]),
                    uniforms["model"])
    clip = rmath.transform_points(mvp, positions)
    return clip, {"color": attrs["color"], "uv": attrs["uv"]}


def textured_border_fragment(varyings, resources):
    """shader.frag:10-21: white border where uv is within LINE_WIDTH/2 of
    any edge, else ``texture(tex, uv) * vec4(color, 1)``."""
    uv = varyings["uv"]
    color = varyings["color"]
    tex = resources["tex"]
    lw = 0.1 * 0.5
    upper = 1.0 - lw
    u, v = uv[..., 0], uv[..., 1]
    border = (u <= lw) | (u > upper) | (v <= lw) | (v > upper)
    texel = sample(tex, uv, valid=varyings.get("_coverage"))
    shaded = texel * jnp.concatenate(
        [color, jnp.ones((*color.shape[:-1], 1), jnp.float32)], -1)
    return jnp.where(border[..., None], jnp.float32(1.0), shaded)


def passthrough_vertex(positions, attrs, uniforms):
    """NDC passthrough for fullscreen quads (render_quad.zig:28-52's
    embedded vertex shader: positions already in clip space, w=1)."""
    ones = jnp.ones((positions.shape[0], 1), jnp.float32)
    clip = jnp.concatenate([positions[:, :2],
                            jnp.zeros_like(ones) + 0.5, ones], -1)
    return clip, {"uv": attrs["uv"]}


def quad_sample_fragment(varyings, resources):
    """compute_drawing frag.glsl:19 — sample the compute-written image."""
    return sample(resources["compute_image"], varyings["uv"],
                  valid=varyings.get("_coverage"))
