"""Particle splatting — the compute-pipeline scatter kernel.

TPU-native port of the compute_drawing compute pass
(samples/compute_drawing/shaders/compute_slime.glsl): each particle writes a
``2*radius``-wide square of uniform color into a storage image. The GLSL
version scatters with ``imageStore`` from one thread per particle; scatter
is the wrong shape for a dense-SIMD machine, so this kernel inverts it into
a *gather*: a Pallas grid over (8, 128) image tiles folds the particle list
(positions in SMEM) into a per-pixel coverage mask, with a scalar
tile-vs-box rejection test (``pl.when``) skipping particles that don't touch
the tile. Color is applied as one fused select afterwards — matching the
GLSL exactly, which writes the single uniform color ``uniforms.col``
(compute_slime.glsl:46).

Boundary semantics preserved: ``pos = ivec2(int(x), int(y))`` truncation,
box = [max(0, p-rad), min(res, p+rad)) half-open (compute_slime.glsl:32-43).
The GLSL's thread-indexing quirks (``>`` instead of ``>=`` at the count
bound; indexing by global x only, which draws just 32 of 1024 particles
under the sample's 4x4x1 dispatch) are *not* reproduced — this kernel splats
every particle passed to it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import pad_to as _pad_to
from ..utils.logging import scoped

_log = scoped("splat")

TILE_H = 8
TILE_W = 128
CHUNK = 128


def _splat_kernel(pos_ref, mask_ref, *, radius, width, height):
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        mask_ref[:] = jnp.zeros_like(mask_ref[:])

    ty0 = i * TILE_H          # tile origin (pixels)
    tx0 = j * TILE_W
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + ty0
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + tx0

    def fold(c, _):
        px = pos_ref[0, c]
        py = pos_ref[1, c]
        live = pos_ref[2, c]
        xi = px.astype(jnp.int32)        # int() truncation (glsl:32-35)
        yi = py.astype(jnp.int32)
        xb0 = jnp.maximum(0, xi - radius)
        xb1 = jnp.minimum(width, xi + radius)
        yb0 = jnp.maximum(0, yi - radius)
        yb1 = jnp.minimum(height, yi + radius)
        # scalar reject: does the particle's box touch this tile?
        hit = ((xb1 > tx0) & (xb0 < tx0 + TILE_W)
               & (yb1 > ty0) & (yb0 < ty0 + TILE_H) & (live > 0.5))

        @pl.when(hit)
        def _():
            covered = ((col >= xb0) & (col < xb1)
                       & (row >= yb0) & (row < yb1))
            mask_ref[:] = jnp.where(covered, 1.0, mask_ref[:])

    jax.lax.fori_loop(0, CHUNK, fold, None)


def splat_mask(positions: jnp.ndarray, height: int, width: int,
               radius: int, interpret: bool = False) -> jnp.ndarray:
    """Coverage mask (Hpad, Wpad) f32 of square splats at ``positions``
    (N, 2) pixel coords. Pure function of its inputs — composes under jit."""
    n = positions.shape[0]
    npad = max(_pad_to(n, CHUNK), CHUNK)
    # SMEM layout: rows = x, y, live-flag; lanes = particles
    packed = jnp.zeros((4, npad), jnp.float32)
    packed = packed.at[0, :n].set(positions[:, 0])
    packed = packed.at[1, :n].set(positions[:, 1])
    packed = packed.at[2, :n].set(1.0)

    hp, wp = _pad_to(height, TILE_H), _pad_to(width, TILE_W)
    grid = (hp // TILE_H, wp // TILE_W, npad // CHUNK)
    kernel = functools.partial(_splat_kernel, radius=radius,
                               width=width, height=height)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((4, CHUNK), lambda i, j, k: (0, k),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((TILE_H, TILE_W), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        interpret=interpret,
    )(packed)


def splat_particles(image: jnp.ndarray, positions: jnp.ndarray,
                    color, radius: int, interpret: bool = False):
    """Full compute-pass semantics: splat ``color`` squares over ``image``
    (H, W, 4). Returns the updated image (functional ``imageStore``)."""
    h, w = image.shape[0], image.shape[1]
    mask = splat_mask(positions, h, w, radius, interpret)[:h, :w]
    col = jnp.asarray(color, jnp.float32)
    if col.shape[-1] == 3:
        col = jnp.concatenate([col, jnp.ones((1,), jnp.float32)])
    return jnp.where(mask[..., None] > 0.5, col, image)
