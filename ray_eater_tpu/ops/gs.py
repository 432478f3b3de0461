"""3D Gaussian Splatting — EWA project, tile bin, depth sort, composite.

The flagship pipeline (BASELINE.json north star; the reference's stated but
unbuilt goal, README.md:7). TPU-first design:

1. **Project** (jnp, dense): quats→rotations→3D covariances, EWA first-order
   projection to screen-space conics, radius from eigenvalues — all (N,·)
   vector math, one shot, MXU/VPU friendly.
2. **Depth sort** (XLA): one global argsort of view depth. Front-to-back
   order is then preserved through binning because the tile sort below is
   stable.
3. **Tile binning** (XLA sort + scatter/gather, no atomics): each splat
   emits up to K=KX·KY (tile, splat) candidate pairs; a stable sort by tile
   id groups pairs into per-tile runs which are repacked *chunk-aligned*
   (each tile's run padded to a multiple of CHUNK splats with null entries)
   so the composite kernel can stream fixed-size blocks.
4. **Composite** (Pallas): a 1-D grid over chunks. Scalar-prefetched maps
   assign each chunk to its framebuffer tile — the output BlockSpec's index
   map reads them, so consecutive chunks of one tile accumulate in a
   resident VMEM block (transmittance + RGB), written back exactly once per
   tile. Per splat: conic quadratic → alpha → front-to-back transmittance
   fold over the whole (16, 128)-pixel tile as dense VPU ops.

Known round-1 limits (documented, perf/LOD work tracked in BENCHLOG.md):
radius is clamped so a splat spans at most KX×KY tiles (large near-camera
splats truncate); compositing is strictly sequential per chunk.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logging import scoped

_log = scoped("gs")

TILE_H = 16
TILE_W = 128
CHUNK = 128      # splats per kernel grid step
KX = 2           # max horizontal tile span per splat
KY = 4           # max vertical tile span per splat
_ALPHA_MIN = 1.0 / 255.0   # 3DGS convention: skip ultra-faint contributions
_ALPHA_MAX = 0.99

# record rows (lanes = splats)
_MX, _MY, _CA, _CB, _CC, _OP, _CR, _CG, _CB2, _VAL = range(10)
_ROWS = 16


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(N,4) wxyz quaternions → (N,3,3) rotation matrices."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


class ProjectedSplats(NamedTuple):
    mean2d: jnp.ndarray    # (N, 2) screen px
    conic: jnp.ndarray     # (N, 3) inverse-covariance (a, b, c)
    depth: jnp.ndarray     # (N,) view depth (+inf if culled)
    radius: jnp.ndarray    # (N,) int32 extent in px
    color: jnp.ndarray     # (N, 3)
    opacity: jnp.ndarray   # (N,)


def project_gaussians(means, scales, quats, opacities, colors,
                      view, proj, width: int, height: int,
                      near: float = 0.05,
                      max_radius: float | None = None) -> ProjectedSplats:
    """EWA splat projection under this framework's camera conventions
    (rmath.look_at/perspective: visible geometry at +z_view, y-down NDC)."""
    n = means.shape[0]
    R = quat_to_rotmat(quats)                                   # (N,3,3)
    S = scales[..., None, :] * jnp.eye(3, dtype=jnp.float32)    # (N,3,3)
    M = jnp.matmul(R, S, preferred_element_type=jnp.float32)
    cov3d = jnp.matmul(M, jnp.swapaxes(M, -1, -2),
                       preferred_element_type=jnp.float32)      # (N,3,3)

    # view transform
    Rv, tv = view[:3, :3], view[:3, 3]
    pv = means @ Rv.T + tv                                      # (N,3)
    zv = pv[:, 2]
    cov_v = jnp.einsum("ij,njk,lk->nil", Rv, cov3d, Rv,
                       preferred_element_type=jnp.float32)

    # perspective Jacobian of the screen mapping:
    #   x_s = (proj00 * x/z + 1) * W/2,  y_s = (proj11 * y/z + 1) * H/2
    fx = proj[0, 0] * width * 0.5
    fy = proj[1, 1] * height * 0.5
    z_safe = jnp.where(zv > near, zv, near)
    inv_z = 1.0 / z_safe
    # clamp the frustum-tangent like 3DGS to bound the Jacobian
    lim_x = 1.3 * (width * 0.5) / jnp.abs(fx)
    lim_y = 1.3 * (height * 0.5) / jnp.abs(fy)
    txz = jnp.clip(pv[:, 0] * inv_z, -lim_x, lim_x)
    tyz = jnp.clip(pv[:, 1] * inv_z, -lim_y, lim_y)

    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z
    # cov2d = J Σv Jᵀ, J = [[j00, 0, j02], [0, j11, j12]]
    c00, c01, c02 = cov_v[:, 0, 0], cov_v[:, 0, 1], cov_v[:, 0, 2]
    c11, c12, c22 = cov_v[:, 1, 1], cov_v[:, 1, 2], cov_v[:, 2, 2]
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + 0.3
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + 0.3

    det = a * c - b * b
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    if max_radius is None:
        # span limit: a splat may cover at most KX×KY tiles
        max_radius = min((KY - 1) * TILE_H // 2 - 1,
                         (KX - 1) * TILE_W // 2 - 1)
    radius = jnp.minimum(radius, float(max_radius))

    inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mx = (pv[:, 0] * inv_z * proj[0, 0] + 1.0) * 0.5 * width
    my = (pv[:, 1] * inv_z * proj[1, 1] + 1.0) * 0.5 * height

    valid = ((zv > near) & (det > 1e-12) & (radius >= 1.0)
             & (mx + radius > 0) & (mx - radius < width)
             & (my + radius > 0) & (my - radius < height)
             & (opacities > _ALPHA_MIN))
    depth = jnp.where(valid, zv, jnp.inf)
    return ProjectedSplats(
        mean2d=jnp.stack([mx, my], -1), conic=conic, depth=depth,
        radius=radius.astype(jnp.int32), color=colors, opacity=opacities)


def _sort_by_depth(ps: ProjectedSplats) -> ProjectedSplats:
    order = jnp.argsort(ps.depth)         # culled (inf) sink to the back
    g = lambda x: jnp.take(x, order, axis=0)
    return ProjectedSplats(*(g(f) for f in ps))


def _bin_splats(ps: ProjectedSplats, ntx: int, nty: int, cap_pairs: int):
    """Chunk-aligned tile lists. Returns (packed_idx (CAP,) int32 splat
    indices with -1 nulls, chunk_tile (CAPC,) int32 with ntiles sentinel,
    chunk_first (CAPC,) int32, overflow (scalar))."""
    n = ps.depth.shape[0]
    ntiles = ntx * nty
    mx, my = ps.mean2d[:, 0], ps.mean2d[:, 1]
    r = ps.radius.astype(jnp.float32)
    valid = jnp.isfinite(ps.depth)

    tx0 = jnp.floor((mx - r) / TILE_W).astype(jnp.int32).clip(0, ntx - 1)
    tx1 = jnp.floor((mx + r) / TILE_W).astype(jnp.int32).clip(0, ntx - 1)
    ty0 = jnp.floor((my - r) / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    ty1 = jnp.floor((my + r) / TILE_H).astype(jnp.int32).clip(0, nty - 1)

    # K candidate tiles per splat (static small fan-out)
    tids = []
    for dy in range(KY):
        for dx in range(KX):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = valid & (ty <= ty1) & (tx <= tx1)
            tids.append(jnp.where(ok, ty * ntx + tx, ntiles))
    tid_flat = jnp.stack(tids, -1).reshape(-1)              # (N*K,)
    splat_flat = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None],
        (n, KX * KY)).reshape(-1)

    # stable sort by tile keeps depth order within each tile
    perm = jnp.argsort(tid_flat, stable=True)
    sorted_tid = tid_flat[perm]
    sorted_splat = splat_flat[perm]

    tvec = jnp.arange(ntiles + 1, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_tid, tvec, side="left")  # (ntiles+1,)
    count = start[1:] - start[:-1]                           # (ntiles,)
    nchunks = (count + CHUNK - 1) // CHUNK
    chunk_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(nchunks).astype(jnp.int32)])
    total_chunks = chunk_off[-1]

    # chunk-aligned destination of every sorted pair
    m = sorted_tid.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    tid_safe = jnp.minimum(sorted_tid, ntiles - 1)
    rank = pos - start[tid_safe]
    dst = chunk_off[tid_safe] * CHUNK + rank
    dst = jnp.where(sorted_tid < ntiles, dst, cap_pairs)     # drop invalid
    packed_idx = jnp.full((cap_pairs,), -1, jnp.int32)
    packed_idx = packed_idx.at[dst].set(sorted_splat, mode="drop")

    capc = cap_pairs // CHUNK
    cid = jnp.arange(capc, dtype=jnp.int32)
    owner = jnp.searchsorted(chunk_off, cid, side="right").astype(
        jnp.int32) - 1
    owner = jnp.clip(owner, 0, ntiles - 1)
    chunk_tile = jnp.where(cid < total_chunks, owner, ntiles)
    chunk_first = (cid == chunk_off[jnp.minimum(owner, ntiles - 1)]
                   ).astype(jnp.int32)
    overflow = jnp.maximum(total_chunks - capc, 0)
    # a tile is visited iff its FIRST chunk fits under the cap — tiles whose
    # chunks overflowed must fall back to background, not garbage
    visited = (count > 0) & (chunk_off[:-1] < capc)          # (ntiles,)
    return packed_idx, chunk_tile, chunk_first, visited, overflow


def _pack_records(ps: ProjectedSplats, packed_idx: jnp.ndarray):
    """Gather splat records into the chunk-aligned layout: (16, CAP) f32,
    rows = features, lanes = splats; nulls have VAL=0."""
    safe = jnp.maximum(packed_idx, 0)
    g = lambda x: jnp.take(x, safe, axis=0)
    live = (packed_idx >= 0).astype(jnp.float32)
    rows = jnp.stack([
        g(ps.mean2d[:, 0]), g(ps.mean2d[:, 1]),
        g(ps.conic[:, 0]), g(ps.conic[:, 1]), g(ps.conic[:, 2]),
        g(ps.opacity), g(ps.color[:, 0]), g(ps.color[:, 1]),
        g(ps.color[:, 2]), live,
    ])                                                      # (10, CAP)
    rows = rows * live[None, :]
    pad = jnp.zeros((_ROWS - rows.shape[0], rows.shape[1]), jnp.float32)
    return jnp.concatenate([rows, pad], 0)


def _composite_kernel(chunk_tile_ref, chunk_first_ref, rec_ref,
                      r_ref, g_ref, b_ref, t_ref, *, ntx, ntiles):
    ci = pl.program_id(0)
    tile = chunk_tile_ref[ci]

    @pl.when(tile < ntiles)
    def _():
        @pl.when(chunk_first_ref[ci] == 1)
        def _init():
            r_ref[:] = jnp.zeros_like(r_ref[:])
            g_ref[:] = jnp.zeros_like(g_ref[:])
            b_ref[:] = jnp.zeros_like(b_ref[:])
            t_ref[:] = jnp.ones_like(t_ref[:])

        ty0 = (tile // ntx) * TILE_H
        tx0 = (tile % ntx) * TILE_W
        py = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
              + ty0).astype(jnp.float32) + 0.5
        px = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
              + tx0).astype(jnp.float32) + 0.5

        def fold(i, _):
            live = rec_ref[_VAL, i]

            @pl.when(live > 0.5)
            def _():
                dx = px - rec_ref[_MX, i]
                dy = py - rec_ref[_MY, i]
                ca = rec_ref[_CA, i]
                cb = rec_ref[_CB, i]
                cc = rec_ref[_CC, i]
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = rec_ref[_OP, i] * jnp.exp(power)
                alpha = jnp.minimum(alpha, _ALPHA_MAX)
                alpha = jnp.where(alpha < _ALPHA_MIN, 0.0, alpha)
                t_cur = t_ref[:]
                w = alpha * t_cur                       # front-to-back
                r_ref[:] = r_ref[:] + w * rec_ref[_CR, i]
                g_ref[:] = g_ref[:] + w * rec_ref[_CG, i]
                b_ref[:] = b_ref[:] + w * rec_ref[_CB2, i]
                t_ref[:] = t_cur * (1.0 - alpha)

        jax.lax.fori_loop(0, CHUNK, fold, None)


def _composite_call(records, chunk_tile, chunk_first, nty, ntx, interpret):
    ntiles = nty * ntx
    capc = chunk_tile.shape[0]
    hp = (nty + 1) * TILE_H          # one extra tile row = sentinel target
    wp = ntx * TILE_W
    kernel = functools.partial(_composite_kernel, ntx=ntx, ntiles=ntiles)

    def out_map(ci, ct, cf):
        t = jnp.minimum(ct[ci], ntiles)       # sentinel → extra row, col 0
        return (t // ntx, t % ntx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(capc,),
        in_specs=[
            pl.BlockSpec((_ROWS, CHUNK), lambda ci, ct, cf: (0, ci),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), out_map,
                         memory_space=pltpu.VMEM)] * 4,
    )
    out_shape = [jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 4
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(chunk_tile, chunk_first, records)


def render_gaussians(cloud, view, proj, width: int, height: int,
                     background=(0.0, 0.0, 0.0),
                     pairs_cap_factor: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Render a GaussianCloud → (height, width, 3) f32 linear image.
    Fully jittable (static: width/height/cap factor).

    ``pairs_cap_factor=None`` (default) sizes the pair buffer for the exact
    worst case (K pairs per splat + one chunk of alignment padding per
    tile) so no work is ever dropped; an integer factor trades memory/grid
    steps for graceful far-splat dropping under extreme duplication.
    """
    ps = project_gaussians(cloud.means, cloud.scales, cloud.quats,
                           cloud.opacities, cloud.colors, view, proj,
                           width, height)
    ps = _sort_by_depth(ps)

    ntx = _pad_to(width, TILE_W) // TILE_W
    nty = _pad_to(height, TILE_H) // TILE_H
    n = cloud.num_splats
    ntiles = ntx * nty
    if pairs_cap_factor is None:
        cap_pairs = n * KX * KY + ntiles * CHUNK
    else:
        cap_pairs = max(pairs_cap_factor * n, 4 * CHUNK) + ntiles * CHUNK
    cap_pairs = _pad_to(cap_pairs, CHUNK)
    packed_idx, chunk_tile, chunk_first, visited, overflow = _bin_splats(
        ps, ntx, nty, cap_pairs)
    records = _pack_records(ps, packed_idx)

    r, g, b, t = _composite_call(records, chunk_tile, chunk_first,
                                 nty, ntx, interpret)
    rgb = jnp.stack([r, g, b], -1)[:nty * TILE_H]
    tr = t[:nty * TILE_H]
    # tiles no chunk ever visited keep garbage — mask them to background
    vis = visited.reshape(nty, ntx)
    vis_px = jnp.repeat(jnp.repeat(vis, TILE_H, 0), TILE_W, 1)
    bg = jnp.asarray(background, jnp.float32)
    rgb = jnp.where(vis_px[..., None], rgb, 0.0)
    tr = jnp.where(vis_px, tr, 1.0)
    img = rgb + tr[..., None] * bg
    return img[:height, :width]
