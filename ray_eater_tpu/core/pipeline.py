"""Pipelines — programmable stages + fixed-function raster state.

TPU-native replacement for GraphicsPipeline/FixedFunctionState
(graphics_pipeline.zig:17-330) and Compute (compute.zig). A "shader module"
here is any jittable Python function (the shader compiler is XLA+Mosaic —
replaces the runtime GLSL→SPIR-V path, shader.zig:70-114); descriptors
become named resources passed to the stage functions (descriptor.zig's
binding model → plain kwargs).

Stage signatures:

* ``vertex_fn(positions (N,3), attrs {name: (N,K)}, uniforms pytree)
  -> (clip (N,4), varyings {name: (N,K)})``
* ``fragment_fn(varyings {name: (H,W,K)}, resources pytree)
  -> rgba (H,W,4) linear``
* compute: any jitted array function, or a Pallas kernel with an explicit
  grid (the local_size/dispatch analog, compute_slime.glsl:25).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable


class CullMode(enum.Enum):
    NONE = "none"
    BACK = "back"     # reference default (graphics_pipeline.zig:137-139)
    FRONT = "front"


class FrontFace(enum.Enum):
    CLOCKWISE = "cw"          # reference default (graphics_pipeline.zig:140)
    COUNTER_CLOCKWISE = "ccw"


class CompareOp(enum.Enum):
    LESS = "less"             # reference default (graphics_pipeline.zig:262)
    LESS_EQUAL = "less_equal"
    ALWAYS = "always"


class BlendMode(enum.Enum):
    NONE = "none"             # reference default: blending off
    ALPHA = "alpha"           # src_alpha / one_minus_src_alpha


@dataclasses.dataclass(frozen=True)
class RasterState:
    """Fixed-function state (FixedFunctionState, graphics_pipeline.zig:26-218).
    Defaults mirror the reference: fill, cull back, clockwise front face,
    no MSAA, no blending, depth test+write on with LESS."""
    cull_mode: CullMode = CullMode.BACK
    front_face: FrontFace = FrontFace.CLOCKWISE
    depth_test: bool = True
    depth_write: bool = True
    depth_compare: CompareOp = CompareOp.LESS
    blend: BlendMode = BlendMode.NONE


@dataclasses.dataclass(frozen=True)
class GraphicsPipeline:
    """A graphics pipeline = two jittable shading functions + raster state
    (GraphicsPipeline.init, graphics_pipeline.zig:235-307). Immutable and
    hashable so it can key the Context's compile cache."""
    vertex_fn: Callable
    fragment_fn: Callable
    state: RasterState = RasterState()
    name: str = "graphics"


@dataclasses.dataclass(frozen=True)
class ComputePipeline:
    """A compute pipeline = one jittable function (compute.zig:28-89).
    ``fn(resources...) -> outputs``; grids live inside Pallas kernels."""
    fn: Callable
    name: str = "compute"


def blend_color(mode: BlendMode, src, dst):
    """Framebuffer blend (graphics_pipeline.zig:166-201; reference ships
    blending off — ALPHA provided for the 3DGS/OIT paths)."""
    if mode is BlendMode.NONE:
        return src
    import jax.numpy as jnp
    a = src[..., 3:4]
    rgb = src[..., :3] * a + dst[..., :3] * (1.0 - a)
    out_a = a + dst[..., 3:] * (1.0 - a)   # standard over-operator coverage
    return jnp.concatenate([rgb, out_a], -1)
