"""Triangle rasterization as a tiled Pallas megakernel.

TPU-native replacement for the reference's entire draw path: vertex fetch +
vkCmdDrawIndexed + fixed-function raster + fragment dispatch
(base.zig:608-642, graphics_pipeline.zig). Design (SURVEY.md §7 step 4):

1. **Vertex stage** (jnp, MXU): transform the whole vertex buffer with one
   (N,4)x(4,4) matmul, gather per-triangle corners, viewport-transform, and
   bake each triangle into *screen-space plane equations* — two barycentric
   planes (λ0, λ1) and one depth plane — so the hot kernel evaluates three
   fused multiply-adds per triangle per pixel.
2. **Raster kernel** (Pallas, VPU): grid over (32, 128)-pixel framebuffer
   tiles × triangle chunks (chunks right-sized to the draw). Plane
   coefficients ride in SMEM; each triangle is three fused multiply-adds +
   compares over the whole tile as dense VPU ops, folded into the running
   per-pixel winner (depth LESS == running min). Culled/degenerate
   triangles skip via a real branch (``pl.when``) costing only a scalar
   load. No atomics, static shapes. Scenes past _BIN_MIN_TRIS post-clip
   triangles take the BINNED path instead: per-triangle bbox → (tile,
   column) keys → one unstable sort → per-tile chunk runs (the 3DGS
   binning design applied to triangles; see _bin_triangles).
3. **Deferred shade** (jnp): the kernel emits a G-buffer (depth, winning
   triangle id, barycentrics); varyings are gathered per visible pixel,
   perspective-corrected, and fed to the pipeline's ``fragment_fn`` — all
   fused by XLA into one shading program per pass.

Vulkan semantics preserved: pixel centers at +0.5, viewport y-down NDC,
depth in [0,1], clockwise-front/back-cull (graphics_pipeline.zig:137-140),
depth compare LESS (graphics_pipeline.zig:262), near-plane clipping
(z_clip = 0 in homogeneous space, 1 → ≤2 triangles, exact attribute
interpolation via clip-barycentric mixing). Known delta (documented): no
top-left fill rule. NOTE this cannot cause double-blending — the deferred
design folds every covering triangle into ONE winner per pixel per draw,
so a shared-edge pixel shades exactly once either way; the only
divergence from Vulkan is WHICH triangle wins the measure-zero
edge-on-pixel-center case.
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import pad_to as _pad_to
from ..core.pipeline import (CompareOp, CullMode, FrontFace,
                             GraphicsPipeline, blend_color)
from ..core.resources import Framebuffer
from ..models.mesh import Mesh
from ..utils.logging import scoped

_log = scoped("raster")

TILE_H = 32    # tile rows: 510 grid steps at 1080p (vs 2025 at 8) — the
               # kernel is step-overhead-bound for small scenes
TILE_W = 128   # lane tile
CHUNK = 128    # MAX triangles per grid step; scenes with fewer triangles
               # use one right-sized chunk (the in-kernel fold loop runs
               # chunk iterations, so a 4-triangle draw must not pay 128)

# setup-plane rows (see _triangle_setup). XMIN..YMAX is the screen bbox
# and GID the original triangle id (exact in f32 below 2^24) — consumed by
# the binned large-scene path.
_ROWS = 16     # padded to the f32 sublane multiple
(_A0, _B0, _C0, _A1, _B1, _C1, _AZ, _BZ, _CZ, _VALID,
 _XMIN, _XMAX, _YMIN, _YMAX, _GID) = range(15)

#: triangle counts (post-clip) above this use GS-style tile binning — the
#: dense kernel folds every triangle into every tile, which is quadratic
#: work the moment scenes scale (293 ms at 10k tris/1080p, BENCHLOG)
_BIN_MIN_TRIS = 512
#: budget of triangles whose bbox exceeds the 2x2-tile level-1 fan; they
#: emit a candidate pair for EVERY tile their bbox touches
_BIG_TRI_CAP = 512

_W_EPS = 1e-6
_AREA_EPS = 1e-12


def viewport_transform(clip: jnp.ndarray, width: int, height: int):
    """Clip → framebuffer coords (Vulkan viewport, y-down NDC):
    ``x_fb=(x/w+1)/2*W``, ``y_fb=(y/w+1)/2*H``, ``z=z/w`` in [0,1].
    Returns (xy (N,2), z (N,), inv_w (N,))."""
    w = clip[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < _W_EPS, _W_EPS, w)
    ndc = clip[..., :3] * inv_w[..., None]
    x = (ndc[..., 0] + 1.0) * 0.5 * width
    y = (ndc[..., 1] + 1.0) * 0.5 * height
    return jnp.stack([x, y], -1), ndc[..., 2], inv_w


def _clip_near(tri_clip: jnp.ndarray):
    """Clip (T, 3, 4) clip-space triangles against the near plane z = 0.

    Vulkan's fixed-function clipper (the view-volume clip the reference
    inherits via its graphics pipeline, graphics_pipeline.zig:88-111) splits
    primitives crossing z_clip = 0; x/y planes are handled downstream by
    the scissor/tile bounds. Each input triangle yields up to two output
    triangles, returned stacked as (2T, 3, 4) — slot t is the primary
    (identity for fully-inside triangles), slot T+t the secondary from the
    two-inside case. Also returns ``bary`` (2T, 3, 3): row i of triangle j
    holds corner i's barycentric coordinates w.r.t. the ORIGINAL corners
    (clipping lerps homogeneously, so attributes mix with the same
    weights), and ``valid`` (2T,) bool.
    """
    t3 = tri_clip.shape[0]
    z = tri_clip[..., 2]                               # (T, 3)
    inside = z >= 0.0
    count = inside.sum(-1).astype(jnp.int32)           # (T,)

    # rotate so the canonical layout holds: count==1 → inside vertex at
    # slot 0; count==2 → outside vertex at slot 2 (cyclic → preserves
    # winding)
    first_in = jnp.argmax(inside, -1).astype(jnp.int32)
    first_out = jnp.argmax(~inside, -1).astype(jnp.int32)
    rot = jnp.where(count == 1, first_in,
                    jnp.where(count == 2, (first_out + 1) % 3, 0))
    # rotate corners by static-permutation SELECT, not take_along_axis —
    # XLA miscompiles broadcasted take_along_axis on these tiny shapes
    # under jit on TPU (columns beyond the first came back zero; caught
    # by eye on the fullscreen-quad samples, round 2)
    r1 = tri_clip[:, (1, 2, 0)]
    r2 = tri_clip[:, (2, 0, 1)]
    rr = rot[:, None, None]
    v = jnp.where(rr == 0, tri_clip, jnp.where(rr == 1, r1, r2))  # (T,3,4)
    zv = v[..., 2]

    def isect(a, b, za, zb):
        """Lerp factor t with z=0 on segment a→b (guarded)."""
        den = za - zb
        t = za / jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        return jnp.clip(t, 0.0, 1.0)[:, None]

    t01 = isect(v[:, 0], v[:, 1], zv[:, 0], zv[:, 1])
    t12 = isect(v[:, 1], v[:, 2], zv[:, 1], zv[:, 2])
    t20 = isect(v[:, 2], v[:, 0], zv[:, 2], zv[:, 0])
    i01 = v[:, 0] + t01 * (v[:, 1] - v[:, 0])
    i12 = v[:, 1] + t12 * (v[:, 2] - v[:, 1])
    i20 = v[:, 2] + t20 * (v[:, 0] - v[:, 2])
    # barycentrics of the intersection points w.r.t. ROTATED corners
    e = jnp.eye(3, dtype=jnp.float32)
    b01 = (1 - t01) * e[0] + t01 * e[1]                 # (T, 3)
    b12 = (1 - t12) * e[1] + t12 * e[2]
    b20 = (1 - t20) * e[2] + t20 * e[0]

    c1 = (count == 1)[:, None, None]
    c2 = (count == 2)[:, None, None]
    c3 = (count == 3)[:, None, None]
    # primary triangle: count==3 → (v0,v1,v2); ==2 → (v0,v1,i12);
    # ==1 → (v0,i01,i20)
    tri_a = jnp.where(
        c3, v, jnp.where(c2, jnp.stack([v[:, 0], v[:, 1], i12], 1),
                         jnp.stack([v[:, 0], i01, i20], 1)))
    bary_a = jnp.where(
        c3, e[None], jnp.where(
            c2, jnp.stack([jnp.broadcast_to(e[0], (t3, 3)),
                           jnp.broadcast_to(e[1], (t3, 3)), b12], 1),
            jnp.stack([jnp.broadcast_to(e[0], (t3, 3)), b01, b20], 1)))
    # secondary triangle (two-inside case only): (v0, i12, i20)
    tri_b = jnp.stack([v[:, 0], i12, i20], 1)
    bary_b = jnp.stack([jnp.broadcast_to(e[0], (t3, 3)), b12, b20], 1)

    valid_a = count >= 1
    valid_b = count == 2
    # un-rotate the barycentric columns back to original corner order:
    # output column j = rotated column (j - rot) % 3 — same static-select
    # formulation as the rotation above
    def unrot(b):
        u1 = b[:, :, (2, 0, 1)]
        u2 = b[:, :, (1, 2, 0)]
        return jnp.where(rr == 0, b, jnp.where(rr == 1, u1, u2))
    tris = jnp.concatenate([tri_a, tri_b], 0)           # (2T, 3, 4)
    bary = jnp.concatenate([unrot(bary_a), unrot(bary_b)], 0)
    valid = jnp.concatenate([valid_a, valid_b], 0)
    return tris, bary, valid


def _triangle_setup(clip: jnp.ndarray, indices: jnp.ndarray,
                    state, width: int, height: int):
    """Bake triangles into plane equations for the raster kernel.

    Clips against the near plane first (1 input → ≤2 output triangles, so
    all shapes below are 2T). Returns ``setup`` (16, Tpad) f32 laid out
    triangle-per-lane: rows a0,b0,c0 / a1,b1,c1 are the normalized
    barycentric planes (λi = a·px + b·py + c); az,bz,cz is the depth
    plane; row VALID is the cull/degenerate mask. Also returns per-corner
    inv_w (2T, 3) and NDC z (2T, 3) of the CLIPPED corners, and the
    attribute-mix matrix ``bary_mix`` (2T, 3, 3) mapping original corner
    attributes to clipped-corner attributes.
    """
    tri_clip, bary_mix, clip_valid = _clip_near(clip[indices])  # (2T,3,4)
    xy, z, inv_w = viewport_transform(tri_clip, width, height)
    x0, x1, x2 = xy[:, 0, 0], xy[:, 1, 0], xy[:, 2, 0]
    y0, y1, y2 = xy[:, 0, 1], xy[:, 1, 1], xy[:, 2, 1]

    # signed doubled area; in y-down screen space clockwise > 0
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    front_sign = 1.0 if state.front_face is FrontFace.CLOCKWISE else -1.0
    facing = area2 * front_sign
    if state.cull_mode is CullMode.BACK:
        keep = facing > 0
    elif state.cull_mode is CullMode.FRONT:
        keep = facing < 0
    else:
        keep = jnp.abs(area2) > _AREA_EPS
    keep &= clip_valid
    # post-clip safety: degenerate projections (w ≈ 0 at z ≥ 0) are culled
    keep &= jnp.all(tri_clip[..., 3] > _W_EPS, axis=-1)
    keep &= jnp.abs(area2) > _AREA_EPS

    inv_area = 1.0 / jnp.where(jnp.abs(area2) < _AREA_EPS, 1.0, area2)
    # λ0 plane: edge v1→v2
    a0 = -(y2 - y1) * inv_area
    b0 = (x2 - x1) * inv_area
    c0 = ((y2 - y1) * x1 - (x2 - x1) * y1) * inv_area
    # λ1 plane: edge v2→v0
    a1 = -(y0 - y2) * inv_area
    b1 = (x0 - x2) * inv_area
    c1 = ((y0 - y2) * x2 - (x0 - x2) * y2) * inv_area
    # depth plane: z(p) = λ0 z0 + λ1 z1 + (1-λ0-λ1) z2
    z0, z1, z2 = z[:, 0], z[:, 1], z[:, 2]
    az = a0 * (z0 - z2) + a1 * (z1 - z2)
    bz = b0 * (z0 - z2) + b1 * (z1 - z2)
    cz = c0 * (z0 - z2) + c1 * (z1 - z2) + z2

    t2 = x0.shape[0]
    rows = jnp.stack([a0, b0, c0, a1, b1, c1, az, bz, cz,
                      keep.astype(jnp.float32),
                      jnp.minimum(jnp.minimum(x0, x1), x2),
                      jnp.maximum(jnp.maximum(x0, x1), x2),
                      jnp.minimum(jnp.minimum(y0, y1), y2),
                      jnp.maximum(jnp.maximum(y0, y1), y2),
                      jnp.arange(t2, dtype=jnp.float32)])  # (15, 2T)
    # setup blocks stay a full CHUNK wide: narrower SMEM blocks MISCOMPILE
    # under jit on this Mosaic toolchain (a (16, 8) block read garbage —
    # eager worked, jit rendered black; the small-draw speed win lives in
    # the kernel's fold-loop bound instead, see _raster_call nfold)
    tpad = max(_pad_to(rows.shape[1], CHUNK), CHUNK)
    setup = jnp.zeros((_ROWS, tpad), jnp.float32)
    setup = setup.at[:15, :rows.shape[1]].set(rows)
    return setup, inv_w, z, bary_mix


def _raster_kernel(setup_ref, depth_init_ref, depth_ref, tri_ref,
                   l0_ref, l1_ref, *, width, height, depth_test, last_wins,
                   chunk, nfold, less_equal=False, static_test=False):
    """One (tile, chunk) grid step: fold CHUNK triangles into the tile.

    ``static_test`` models Vulkan's depth_test=on/depth_write=off: every
    fragment tests against the *unchanged* incoming depth buffer and the
    last passing fragment in draw order wins (the kernel's depth plane then
    holds last-wins sort keys, not depth)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        depth_ref[:] = (depth_init_ref[:] if depth_test and not static_test
                        else jnp.full_like(depth_init_ref[:], jnp.inf))
        tri_ref[:] = jnp.full_like(tri_ref[:], -1)
        l0_ref[:] = jnp.zeros_like(l0_ref[:])
        l1_ref[:] = jnp.zeros_like(l1_ref[:])

    # pixel-center coordinates of this tile: (TILE_H, TILE_W)
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0
                                   ).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1
                                   ).astype(jnp.float32)
    py = (i * TILE_H).astype(jnp.float32) + row + 0.5
    px = (j * TILE_W).astype(jnp.float32) + col + 0.5
    scissor = (px < width) & (py < height)

    def fold(c, _):
        """Fold triangle ``c`` of this chunk into the per-pixel winner."""
        valid = setup_ref[_VALID, c]

        @pl.when(valid > 0.5)
        def _():
            a0, b0, c0 = (setup_ref[_A0, c], setup_ref[_B0, c],
                          setup_ref[_C0, c])
            a1, b1, c1 = (setup_ref[_A1, c], setup_ref[_B1, c],
                          setup_ref[_C1, c])
            az, bz, cz = (setup_ref[_AZ, c], setup_ref[_BZ, c],
                          setup_ref[_CZ, c])
            lam0 = a0 * px + b0 * py + c0             # (TH, TW)
            lam1 = a1 * px + b1 * py + c1
            zval = az * px + bz * py + cz
            covered = (lam0 >= 0.0) & (lam1 >= 0.0) & (lam0 + lam1 <= 1.0)
            covered &= scissor & (zval >= 0.0) & (zval <= 1.0)
            if static_test:
                # write-off test: compare against the incoming buffer only
                covered &= ((zval <= depth_init_ref[:]) if less_equal
                            else (zval < depth_init_ref[:]))

            gid = k * chunk + c
            if last_wins:
                # without depth test the last covering primitive wins:
                # sort key = descending global index
                key = jnp.where(covered, -(gid).astype(jnp.float32),
                                jnp.inf)
            else:
                key = jnp.where(covered, zval, jnp.inf)

            cur = depth_ref[:]
            # LESS_EQUAL: equal-depth fragments win in draw order
            # (the depth-prepass + lit-pass pattern)
            upd = (key <= cur) if less_equal else (key < cur)
            depth_ref[:] = jnp.where(upd, key, cur)
            tri_ref[:] = jnp.where(upd, gid, tri_ref[:])
            l0_ref[:] = jnp.where(upd, lam0, l0_ref[:])
            l1_ref[:] = jnp.where(upd, lam1, l1_ref[:])

    # fold only the (8-padded) real triangle count — a 4-triangle draw
    # must not pay a 128-iteration scalar loop per tile
    jax.lax.fori_loop(0, nfold, fold, None)


def _bin_triangles(setup, ntx: int, nty: int, feat=None):
    """GS-style tile binning for triangles (design cf. ops/gs._bin_splats:
    emit → one sort → direct chunk layout with block-local [lo, hi)).

    Each live triangle emits candidate ``tile << idb | column`` keys for
    the tiles its screen bbox touches: a static 2x2 fan for triangles
    within 2x2 tiles (the common case at scale), and a budgeted
    (_BIG_TRI_CAP) all-tiles fan for larger ones. One UNSTABLE int32 sort
    groups pairs into per-tile runs; low bits carry the setup column, so
    runs are in draw order (ties under LESS_EQUAL resolve identically to
    the dense kernel) and the sort needs no payload. When ``feat`` (t2, F)
    per-triangle shade features is given, feature rows are packed into
    pair order by the same id gather as the setup rows (cheap at triangle
    scale — see the in-body note on why this is NOT a payload-sort).

    Returns (pack (cap, _ROWS) pair-ordered setup rows, fpack — (cap, F)
    pair-ordered feature rows or None, steps scalar-prefetch tuple,
    visited (ntiles,), overflow_big scalar)."""
    t2 = setup.shape[1]
    ntiles = ntx * nty
    idb = max(t2 - 1, 1).bit_length()
    assert ntiles.bit_length() + idb <= 31, "tile|id key overflows int32"
    sentinel = ntiles << idb
    col = jnp.arange(t2, dtype=jnp.int32)
    valid = setup[_VALID] > 0.5
    tx0 = jnp.floor(setup[_XMIN] / TILE_W).astype(jnp.int32).clip(0, ntx - 1)
    tx1 = jnp.floor(setup[_XMAX] / TILE_W).astype(jnp.int32).clip(0, ntx - 1)
    ty0 = jnp.floor(setup[_YMIN] / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    ty1 = jnp.floor(setup[_YMAX] / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    small = valid & (tx1 - tx0 < 2) & (ty1 - ty0 < 2)
    keys = []
    for dy in range(2):
        for dx in range(2):
            ty, tx = ty0 + dy, tx0 + dx
            ok = small & (ty <= ty1) & (tx <= tx1)
            keys.append(jnp.where(ok, ((ty * ntx + tx) << idb) | col,
                                  sentinel))
    # budgeted big-triangle stream: bbox-culled all-tiles fan
    big = valid & ~small
    csum = jnp.cumsum(big.astype(jnp.int32))
    nbig = csum[-1]
    overflow_big = jnp.maximum(nbig - _BIG_TRI_CAP, 0)
    slot = jnp.arange(_BIG_TRI_CAP, dtype=jnp.int32)
    bidx = jnp.clip(jnp.searchsorted(csum, slot + 1, side="left"),
                    0, t2 - 1).astype(jnp.int32)
    bvalid = slot < nbig
    btx0, btx1 = tx0[bidx], tx1[bidx]
    bty0, bty1 = ty0[bidx], ty1[bidx]
    tid = jnp.arange(ntiles, dtype=jnp.int32)
    t_x, t_y = tid % ntx, tid // ntx
    bok = (bvalid[:, None] & (t_x[None, :] >= btx0[:, None])
           & (t_x[None, :] <= btx1[:, None])
           & (t_y[None, :] >= bty0[:, None])
           & (t_y[None, :] <= bty1[:, None]))            # (B, ntiles)
    bkey = jnp.where(bok, (tid[None, :] << idb) | bidx[:, None], sentinel)
    key_flat = jnp.concatenate(keys + [bkey.reshape(-1)])
    m = key_flat.shape[0]
    cap = _pad_to(m, CHUNK)
    sorted_key = jax.lax.sort(key_flat, is_stable=False)
    if cap > m:
        sorted_key = jnp.concatenate(
            [sorted_key, jnp.full(cap - m, sentinel, jnp.int32)])
    ids = jnp.clip(sorted_key & ((1 << idb) - 1), 0, t2 - 1)
    # pack the setup columns into pair order: one (cap, _ROWS) gather.
    # NOTE triangle binning deliberately does NOT payload-sort (unlike
    # gs._bin_splats): ids already ride the key's low bits, the pack is
    # only ~cap≈10·t2 rows (sub-ms at 10k tris, gathers run ~140-210M
    # rows/s), and a key+_ROWS+F-operand lax.sort (~35 operands) blows up
    # XLA sort-comparator compilation (observed: >40 min vs seconds).
    pack = jnp.take(setup.T, ids, axis=0)
    fpack = None
    if feat is not None:
        if feat.shape[0] < t2:       # setup lanes are CHUNK-padded
            feat = jnp.pad(feat, ((0, t2 - feat.shape[0]), (0, 0)))
        fpack = jnp.take(feat, ids, axis=0)                # (cap, F)

    tvec = jnp.arange(ntiles + 1, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_key, tvec << idb,
                             side="left").astype(jnp.int32)
    startc = start[:-1]
    count = start[1:] - startc
    # direct chunk layout (= gs._bin_splats exact path): step s streams
    # one contiguous CHUNK block of the sorted pairs, masked block-local
    cap_steps = cap // CHUNK + ntiles
    maxblk = cap // CHUNK - 1
    end = startc + count
    first_block = startc // CHUNK
    nsteps = jnp.where(count > 0,
                       (end + CHUNK - 1) // CHUNK - first_block, 0)
    step_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(nsteps).astype(jnp.int32)])
    total_steps = step_off[-1]
    sid = jnp.arange(cap_steps, dtype=jnp.int32)
    owner = jnp.clip(jnp.searchsorted(step_off, sid, side="right")
                     .astype(jnp.int32) - 1, 0, ntiles - 1)
    live_step = sid < total_steps
    step_tile = jnp.where(live_step, owner, ntiles)
    step_first = ((sid == step_off[owner]) & live_step).astype(jnp.int32)
    orig_block = jnp.clip(first_block[owner] + (sid - step_off[owner]),
                          0, maxblk)
    blk_base = orig_block * CHUNK
    step_lo = jnp.where(live_step,
                        jnp.clip(startc[owner] - blk_base, 0, CHUNK), 0)
    step_hi = jnp.where(live_step,
                        jnp.clip(end[owner] - blk_base, 0, CHUNK), 0)
    steps = (step_tile, step_first, orig_block, step_lo, step_hi)
    return pack, fpack, steps, count > 0, overflow_big


def _raster_kernel_binned(step_tile_ref, step_first_ref, step_block_ref,
                          step_lo_ref, step_hi_ref, pack_ref,
                          depth_init_ref, depth_ref, tri_ref, l0_ref,
                          l1_ref, slot_ref, *, width, height, depth_test,
                          last_wins, ntx, ntiles, less_equal=False,
                          static_test=False):
    """Binned variant of :func:`_raster_kernel`: a 1-D grid over
    scalar-prefetched steps; step s folds the [lo, hi) rows of pack block
    ``step_block[s]`` into its owning tile (same fold semantics as the
    dense kernel — winner id comes from the packed _GID column). Also
    records the winner's global PACK SLOT (block*CHUNK + row) per pixel —
    the key the shade-fetch kernel's per-step one-hot matmul needs
    (tools/exp_shade.py: in-kernel one-hot fetch beats the per-pixel row
    gather 2.65 vs 6.13 ms at 510 steps)."""
    si = pl.program_id(0)
    tile = step_tile_ref[si]

    @pl.when(tile < ntiles)
    def _():
        @pl.when(step_first_ref[si] == 1)
        def _init():
            depth_ref[:] = (depth_init_ref[:]
                            if depth_test and not static_test
                            else jnp.full_like(depth_init_ref[:], jnp.inf))
            tri_ref[:] = jnp.full_like(tri_ref[:], -1)
            l0_ref[:] = jnp.zeros_like(l0_ref[:])
            l1_ref[:] = jnp.zeros_like(l1_ref[:])
            slot_ref[:] = jnp.full_like(slot_ref[:], -1)

        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0
                                       ).astype(jnp.float32)
        colf = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1
                                        ).astype(jnp.float32)
        py = ((tile // ntx) * TILE_H).astype(jnp.float32) + row + 0.5
        px = ((tile % ntx) * TILE_W).astype(jnp.float32) + colf + 0.5
        scissor = (px < width) & (py < height)
        lo = step_lo_ref[si]
        hi = step_hi_ref[si]

        def fold(c, _):
            live = (c >= lo) & (c < hi) & (pack_ref[c, _VALID] > 0.5)

            @pl.when(live)
            def _():
                a0, b0, c0 = (pack_ref[c, _A0], pack_ref[c, _B0],
                              pack_ref[c, _C0])
                a1, b1, c1 = (pack_ref[c, _A1], pack_ref[c, _B1],
                              pack_ref[c, _C1])
                az, bz, cz = (pack_ref[c, _AZ], pack_ref[c, _BZ],
                              pack_ref[c, _CZ])
                lam0 = a0 * px + b0 * py + c0
                lam1 = a1 * px + b1 * py + c1
                zval = az * px + bz * py + cz
                covered = ((lam0 >= 0.0) & (lam1 >= 0.0)
                           & (lam0 + lam1 <= 1.0))
                covered &= scissor & (zval >= 0.0) & (zval <= 1.0)
                if static_test:
                    covered &= ((zval <= depth_init_ref[:]) if less_equal
                                else (zval < depth_init_ref[:]))
                gid = pack_ref[c, _GID].astype(jnp.int32)
                if last_wins:
                    key = jnp.where(covered, -gid.astype(jnp.float32),
                                    jnp.inf)
                else:
                    key = jnp.where(covered, zval, jnp.inf)
                cur = depth_ref[:]
                upd = (key <= cur) if less_equal else (key < cur)
                depth_ref[:] = jnp.where(upd, key, cur)
                tri_ref[:] = jnp.where(upd, gid, tri_ref[:])
                l0_ref[:] = jnp.where(upd, lam0, l0_ref[:])
                l1_ref[:] = jnp.where(upd, lam1, l1_ref[:])
                slot_ref[:] = jnp.where(
                    upd, step_block_ref[si] * CHUNK + c, slot_ref[:])

        jax.lax.fori_loop(0, CHUNK, fold, None)


def _shade_fetch_kernel(step_tile_ref, step_first_ref, step_block_ref,
                        step_lo_ref, step_hi_ref, slot_ref, fpack_ref,
                        o_ref, *, ntiles, pix):
    """Steps-driven winner-feature fetch: for each binning step, a
    (CHUNK, PIX) one-hot of (winner slot == this block's rows) contracted
    against the step's (CHUNK, F) feature block on the MXU — replacing the
    per-pixel (P, F) row gather, which is the raster frame's largest cost
    at scale (BENCHLOG known-bottleneck 1/5; tools/exp_shade3.py: 4.0 ms
    at 3060 steps vs 6.6 ms gather). Precision HIGHEST: features carry
    geometry (inv_w, z, uv) that a single bf16 pass would corrupt
    (tools/exp_shade2.py) — the 0/1 one-hot operand is bf16-exact, so the
    3-pass product is f32-faithful.

    A pixel's winner slot lies inside its own tile's pack run, so the
    block-row equality needs no [lo, hi) masking; straddle blocks shared
    by two tiles accumulate into different out blocks."""
    si = pl.program_id(0)
    tile = step_tile_ref[si]

    @pl.when(tile < ntiles)
    def _():
        @pl.when(step_first_ref[si] == 1)
        def _init():
            o_ref[:] = jnp.zeros_like(o_ref[:])
        sl = slot_ref[:].reshape(1, pix) - step_block_ref[si] * CHUNK
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, pix), 0)
        oh = (rows == sl).astype(jnp.float32)
        o_ref[:] += jax.lax.dot_general(
            fpack_ref[:], oh, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)[None]


def _shade_fetch_call(fpack, steps, slot_plane, ntx, nty, interpret):
    """Run :func:`_shade_fetch_kernel` over the binning steps; returns
    per-pixel features (H, W, F) untiled from the (ntiles, F, PIX)
    accumulator."""
    ntiles = ntx * nty
    nfeat = fpack.shape[1]
    pix = TILE_H * TILE_W
    nsteps = steps[0].shape[0]
    kernel = functools.partial(_shade_fetch_kernel, ntiles=ntiles, pix=pix)

    def tmap(si, st, sf, sb, sl, sh):
        return (jnp.minimum(st[si], ntiles - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda si, st, sf, sb, sl, sh: (
                             jnp.minimum(st[si], ntiles - 1) // ntx,
                             jnp.minimum(st[si], ntiles - 1) % ntx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nfeat),
                         lambda si, st, sf, sb, sl, sh: (sb[si], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, nfeat, pix),
            lambda si, st, sf, sb, sl, sh: (
                jnp.minimum(st[si], ntiles - 1), 0, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, nfeat, pix), jnp.float32),
        interpret=interpret,
    )(*steps, slot_plane, fpack)
    # untile (ntiles, F, PIX) -> (H, W, F)
    feats = out.reshape(nty, ntx, nfeat, TILE_H, TILE_W)
    return feats.transpose(0, 3, 1, 4, 2).reshape(
        nty * TILE_H, ntx * TILE_W, nfeat)


def _raster_call_binned(setup, depth_init, width, height, depth_test,
                        last_wins, interpret, less_equal=False,
                        static_test=False, feat_table=None):
    hp, wp = depth_init.shape
    ntx, nty = wp // TILE_W, hp // TILE_H
    ntiles = ntx * nty
    pack, fpack, steps, visited, _ = _bin_triangles(setup, ntx, nty,
                                                    feat=feat_table)
    nsteps = steps[0].shape[0]
    kernel = functools.partial(
        _raster_kernel_binned, width=float(width), height=float(height),
        depth_test=depth_test, last_wins=last_wins, less_equal=less_equal,
        static_test=static_test, ntx=ntx, ntiles=ntiles)

    def tmap(si, st, sf, sb, sl, sh):
        t = jnp.minimum(st[si], ntiles - 1)   # dead tail parks on last tile
        return (t // ntx, t % ntx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CHUNK, _ROWS),
                         lambda si, st, sf, sb, sl, sh: (sb[si], 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, TILE_W), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((TILE_H, TILE_W), tmap,
                                memory_space=pltpu.VMEM)] * 5,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),   # winner pack slot
        ],
        interpret=interpret,
    )(*steps, pack, depth_init)
    # tiles no step visited keep garbage — fill with the cleared state
    vis = jnp.repeat(jnp.repeat(visited.reshape(nty, ntx), TILE_H, 0),
                     TILE_W, 1)
    init_depth = (depth_init if depth_test and not static_test
                  else jnp.full_like(depth_init, jnp.inf))
    feats = None
    if fpack is not None:
        feats = _shade_fetch_call(fpack, steps, out[4], ntx, nty,
                                  interpret)
        feats = jnp.where(vis[..., None], feats, 0.0)
    return [jnp.where(vis, out[0], init_depth),
            jnp.where(vis, out[1], -1),
            jnp.where(vis, out[2], 0.0),
            jnp.where(vis, out[3], 0.0),
            feats]


def _raster_call(setup, depth_init, width, height, depth_test, last_wins,
                 interpret, less_equal=False, static_test=False,
                 n_tris=None, feat_table=None):
    """Returns [depth/key, winner id, λ0, λ1, feats] — ``feats`` is the
    (H, W, F) per-pixel winner-feature plane when the binned path ran
    with a ``feat_table``, else None (callers fetch features themselves)."""
    hp0, wp = depth_init.shape
    # tiles are TILE_H tall; pad framebuffer rows up (pad rows fail the
    # scissor test, outputs are sliced back)
    hp = max(_pad_to(hp0, TILE_H), TILE_H)
    if hp != hp0:
        depth_init = jnp.pad(depth_init, ((0, hp - hp0), (0, 0)),
                             constant_values=jnp.inf)
    tpad = setup.shape[1]
    if n_tris is not None and n_tris > _BIN_MIN_TRIS:
        out = _raster_call_binned(setup, depth_init, width, height,
                                  depth_test, last_wins, interpret,
                                  less_equal=less_equal,
                                  static_test=static_test,
                                  feat_table=feat_table)
        if hp != hp0:
            out = [o[:hp0] if o is not None else None for o in out]
        return out
    chunk = min(CHUNK, tpad)
    # single-chunk draws bound the fold loop by the real triangle count
    nfold = (max(_pad_to(n_tris, 8), 8)
             if (n_tris is not None and tpad == chunk) else chunk)
    grid = (hp // TILE_H, wp // TILE_W, tpad // chunk)
    kernel = functools.partial(
        _raster_kernel, width=float(width), height=float(height),
        depth_test=depth_test, last_wins=last_wins, less_equal=less_equal,
        static_test=static_test, chunk=chunk, nfold=nfold)
    tile = lambda i, j, k: (i, j)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # plane coefficients are consumed scalar-wise → SMEM
            pl.BlockSpec((_ROWS, chunk), lambda i, j, k: (0, k),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), tile, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),   # depth / key
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),     # winner tri id
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),   # λ0
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),   # λ1
        ],
        interpret=interpret,
    )(setup, depth_init)
    if hp != hp0:
        out = [o[:hp0] for o in out]
    return list(out) + [None]


#: triangle counts up to this use the one-hot-matmul attribute fetch
_ONEHOT_MAX_TRIS = 256

#: binned scenes fetch winner features via the in-kernel one-hot matmul
#: pipeline (payload-sorted feature pack + _shade_fetch_kernel); False
#: (or RAYEATER_SHADE_FETCH=0) restores the per-pixel row gather — the
#: A/B escape hatch
_SHADE_FETCH = os.environ.get("RAYEATER_SHADE_FETCH", "1") != "0"


def _feature_table(tri_vary: dict, inv_w, z_tri=None):
    """ONE combined per-triangle feature table [inv_w (3) | z (3)? |
    per-varying (3*K)...] — the layout :func:`_shade` fetches per pixel.
    Shared by the in-shade fetch paths and the binned kernel's
    payload-sort + one-hot fetch pipeline."""
    num_tris = inv_w.shape[0]
    cols = [inv_w]                                    # (T, 3)
    if z_tri is not None:
        cols.append(z_tri)                            # (T, 3)
    for name in tri_vary:
        cols.append(tri_vary[name].reshape(num_tris, -1))
    return jnp.concatenate(cols, -1)                  # (T, F)


def _shade(pipe: GraphicsPipeline, fb: Framebuffer, gdepth, gtri, gl0, gl1,
           tri_vary: dict, inv_w, resources,
           z_tri=None, feats=None) -> Framebuffer:
    """Deferred shading: perspective-correct varyings for winner triangles,
    run fragment_fn, merge into the framebuffer.

    ``tri_vary`` maps varying name → per-triangle corner attributes
    (T, 3, K) — already clip-mixed by the caller, so near-plane-clipped
    triangles interpolate exactly.

    Attribute fetch: per-pixel gathers are the slowest op on TPU, so for
    small scenes (T ≤ 256) the winner-triangle attributes are fetched with
    one (pixels, T) one-hot × (T, features) MXU matmul instead — ~100x
    faster than 11M random gathers at 900x600.

    ``z_tri`` (T, 3): per-corner NDC depth. When given, the framebuffer
    depth is interpolated from the winner's depth plane instead of taken
    from ``gdepth`` — required in last-wins modes, where the kernel's depth
    buffer holds sort keys (-triangle_id), not depth."""
    mask = gtri >= 0
    t = jnp.maximum(gtri, 0)                          # (H, W)
    l2 = 1.0 - gl0 - gl1
    lam = jnp.stack([gl0, gl1, l2], -1)               # (H, W, 3)

    num_tris = inv_w.shape[0]
    names = list(tri_vary)
    hw = t.shape
    # ONE combined feature table [inv_w (3) | z (3)? | per-varying
    # (3*K)...] regardless of scene size, fetched per pixel either by a
    # one-hot MXU matmul (small T) or by a single flat-index row gather
    # (large T: TPU gathers are ROW-count bound at ~140-210M rows/s, so
    # one (P, F) row fetch beats a take per attribute by the attribute
    # count; image-shaped 2D indexing is another 1.55x slower — BENCHLOG
    # round 2 gather probes).
    if feats is None:
        table = _feature_table(tri_vary, inv_w, z_tri)        # (T, F)
        if num_tris <= _ONEHOT_MAX_TRIS:
            onehot = (t.reshape(-1)[:, None]
                      == jnp.arange(num_tris, dtype=gtri.dtype)[None, :]
                      ).astype(jnp.float32)           # (P, T)
            feats = jnp.matmul(onehot, table,
                               preferred_element_type=jnp.float32)
        else:
            feats = jnp.take(table, t.reshape(-1), axis=0)    # (P, F)
        feats = feats.reshape(*hw, -1)                # (H, W, F)
    iw = feats[..., :3]
    offs = 3
    z_px = None
    if z_tri is not None:
        z_px = feats[..., 3:6]                        # (H, W, 3)
        offs = 6
    fetched = {}
    for name in names:
        k = tri_vary[name].shape[-1]
        fetched[name] = feats[..., offs:offs + 3 * k].reshape(
            *hw, 3, k)
        offs += 3 * k

    lp = lam * iw
    denom = jnp.sum(lp, -1, keepdims=True)
    lp = lp / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)

    vary_px = {}
    for name in names:
        vary_px[name] = jnp.einsum("hwi,hwik->hwk", lp, fetched[name])
    # deferred-coverage mask for fragment shaders: uncovered pixels carry
    # triangle 0's varyings (their output is discarded below), but block
    # samplers like ops.sampling._sample_subtile need to EXCLUDE them from
    # per-subtile footprints — silhouette subtiles otherwise fall to a
    # coarse mip for their real pixels too. Built-in shaders forward this
    # to sample(valid=...); user shaders may ignore it.
    vary_px["_coverage"] = mask

    rgba = pipe.fragment_fn(vary_px, resources)       # (H, W, 4)
    out = blend_color(pipe.state.blend, rgba, fb.color)
    color = jnp.where(mask[..., None], out, fb.color)

    if z_px is not None and pipe.state.depth_write:
        # last-wins/ALWAYS: gdepth holds sort keys; interpolate true depth
        # from the winner's plane (screen-space barycentrics — NDC z is
        # linear in screen space)
        depth_interp = jnp.sum(lam * z_px, -1)
        depth = jnp.where(mask, depth_interp, fb.depth)
    elif pipe.state.depth_test and pipe.state.depth_write:
        depth = gdepth        # kernel already min-folded against fb depth
    elif pipe.state.depth_write:
        depth = jnp.where(mask, gdepth, fb.depth)
    else:
        depth = fb.depth
    return Framebuffer(color=color, depth=depth,
                       width=fb.width, height=fb.height)


def render_mesh(pipe: GraphicsPipeline, mesh_: Mesh, uniforms: Any,
                resources: Any, fb: Framebuffer,
                interpret: bool = False) -> Framebuffer:
    """Draw one mesh through a graphics pipeline into ``fb`` — the analog of
    the reference's bind-and-drawIndexed sequence (basic_planes.zig:329-335).
    Fully jittable; compose under jax.jit / the render graph."""
    with jax.named_scope("raster.vertex"):
        clip, varyings = pipe.vertex_fn(mesh_.positions, mesh_.attributes,
                                        uniforms)
    state = pipe.state
    with jax.named_scope("raster.setup"):
        setup, inv_w, z_tri, bary_mix = _triangle_setup(
            clip, mesh_.indices, state, fb.width, fb.height)
        # clipped-corner attributes: corner i of output triangle j mixes
        # the original corners with bary_mix[j, i] (identity when unclipped)
        tri_vary = {}
        for name, vals in varyings.items():
            tv = vals[mesh_.indices]                       # (T, 3, K)
            tv2 = jnp.concatenate([tv, tv], 0)             # (2T, 3, K)
            tri_vary[name] = (
                bary_mix[..., 0, None] * tv2[:, 0:1]
                + bary_mix[..., 1, None] * tv2[:, 1:2]
                + bary_mix[..., 2, None] * tv2[:, 2:3])
    last_wins = not state.depth_test
    depth_cmp = state.depth_compare
    if depth_cmp is CompareOp.ALWAYS:
        last_wins = True
    # Vulkan depth_test-on/write-off: fragments test against the unchanged
    # buffer and the last passing one in draw order wins — NOT min-fold
    static_test = (state.depth_test and not state.depth_write
                   and depth_cmp is not CompareOp.ALWAYS)
    if static_test:
        last_wins = True
    zt = z_tri if (last_wins and state.depth_write) else None
    # binned scenes fetch winner features IN-KERNEL (payload-sorted pack
    # + per-step one-hot MXU matmul) instead of the per-pixel row gather
    feat_table = (_feature_table(tri_vary, inv_w, zt)
                  if (_SHADE_FETCH and inv_w.shape[0] > _BIN_MIN_TRIS)
                  else None)
    with jax.named_scope("raster.kernel"):
        gdepth, gtri, gl0, gl1, feats = _raster_call(
            setup, fb.depth, fb.width, fb.height,
            depth_test=state.depth_test, last_wins=last_wins,
            interpret=interpret,
            less_equal=depth_cmp is CompareOp.LESS_EQUAL,
            static_test=static_test, n_tris=inv_w.shape[0],
            feat_table=feat_table)
    with jax.named_scope("raster.shade"):
        return _shade(pipe, fb, gdepth, gtri, gl0, gl1, tri_vary,
                      inv_w, resources, z_tri=zt, feats=feats)
