"""Mesh — vertex/index data as struct-of-arrays pytrees.

Replaces the reference's comptime vertex reflection (vertex_buffer.zig:33-76
derives VkVertexInputAttributeDescriptions from an extern struct) with the
TPU-native layout: one ``(N, K)`` array per attribute (struct-of-arrays, the
layout XLA and the MXU want), plus an ``(T, 3)`` int32 index buffer
(index_buffer.zig:10-17 — u16/u32 both become int32 here).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.resources import pytree_dataclass


@pytree_dataclass
class Mesh:
    """positions ``(N, 3)`` f32; attributes: name → ``(N, K)`` f32;
    indices ``(T, 3)`` int32 (triangle list, the reference's only input
    assembly topology, graphics_pipeline.zig:83-86)."""

    positions: jnp.ndarray
    attributes: dict[str, jnp.ndarray]
    indices: jnp.ndarray

    @property
    def num_vertices(self) -> int:
        return self.positions.shape[0]

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]


def mesh(positions, indices, **attributes) -> Mesh:
    """Build a Mesh from host data. ``setData`` analog: one device_put per
    array instead of the staging-buffer chain (vertex_buffer.zig:108-120)."""
    pos = jnp.asarray(np.asarray(positions, np.float32).reshape(-1, 3))
    idx = jnp.asarray(np.asarray(indices, np.int32).reshape(-1, 3))
    attrs = {k: jnp.asarray(np.asarray(v, np.float32).reshape(pos.shape[0], -1))
             for k, v in attributes.items()}
    return Mesh(positions=pos, attributes=attrs, indices=idx)


def two_planes() -> Mesh:
    """The basic_planes test geometry: two stacked quads, 8 vertices /
    12 indices, with per-vertex color + uv (basic_planes.zig:245-267)."""
    positions = [
        [-0.5, 0.0, -0.5], [0.5, 0.0, -0.5], [0.5, 0.0, 0.5], [-0.5, 0.0, 0.5],
        [-0.5, 0.5, -0.5], [0.5, 0.5, -0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
    ]
    colors = [
        [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1],
        [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1],
    ]
    uvs = [
        [1, 0], [0, 0], [0, 1], [1, 1],
        [1, 0], [0, 0], [0, 1], [1, 1],
    ]
    indices = [[0, 1, 2], [2, 3, 0], [4, 5, 6], [6, 7, 4]]
    return mesh(positions, indices, color=colors, uv=uvs)


def fullscreen_quad() -> Mesh:
    """The RenderQuad geometry (render_quad.zig:28-52): two triangles
    covering NDC, uv (0,0) at top-left."""
    positions = [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]]
    uvs = [[0, 0], [1, 0], [1, 1], [0, 1]]
    indices = [[0, 1, 2], [2, 3, 0]]
    return mesh(positions, indices, uv=uvs)
