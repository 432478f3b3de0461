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

from ..utils import pad_to as _pad_to
from ..utils.logging import scoped

_log = scoped("gs")

TILE_H = 16
TILE_W = 128
CHUNK = 128      # splats per kernel grid step
KX = 2           # max horizontal tile span per splat
#: default max vertical tile span per splat. 3 clamps splat radii to 15 px
#: and is ~1.9x faster end-to-end than 4 (radius ≤ 23 px) at 38.9 dB PSNR
#: on the 1M-splat benchmark scene (see BENCHLOG.md); pass ky=4+ to
#: render_gaussians for scenes dominated by large near-camera splats.
KY = 3
_ALPHA_MIN = 1.0 / 255.0   # 3DGS convention: skip ultra-faint contributions
_ALPHA_MAX = 0.99
_T_EPS = 1e-4              # 3DGS termination: tile saturated when T < eps

# record columns (records are (N, 16) rows — one contiguous 64-byte row
# per splat so every binning gather is a row DMA, not 10 scalar gathers).
# NOTE: 12 columns would suffice but (CHUNK, 12) record blocks produce
# wrong results in this Mosaic version — keep the 16-column layout.
_MX, _MY, _CA, _CB, _CC, _OP, _CR, _CG, _CB2, _VAL, _RAD, _DEPTH = range(12)
_ROWS = 16


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
                      max_radius: float | None = None,
                      ky: int = KY) -> ProjectedSplats:
    """EWA splat projection under this framework's camera conventions
    (``rmath.look_at_zforward`` + ``rmath.perspective``: view depth = +z =
    distance in front, y-down NDC). Do NOT pass ``rmath.look_at`` here — it
    is the reference's mirrored matrix kept for raster parity and inverts
    depth ordering (see rmath.look_at_zforward)."""
    # Fully scalar-expanded covariance math: (N,) vector ops only. The
    # (N,3,3)-batched einsum formulation compiles pathologically on TPU
    # (XLA unrolls the tiny contractions; ~5 min compile at 1M splats) and
    # runs on lane-starved shapes; the expansion compiles in seconds and is
    # pure VPU.
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    sx, sy, sz = scales[:, 0], scales[:, 1], scales[:, 2]
    # rotation columns scaled: M[i][j] = R[i][j] * s[j]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    m = [[r00 * sx, r01 * sy, r02 * sz],
         [r10 * sx, r11 * sy, r12 * sz],
         [r20 * sx, r21 * sy, r22 * sz]]

    # view transform
    Rv, tv = view[:3, :3], view[:3, 3]
    pv = means @ Rv.T + tv                                      # (N,3)
    zv = pv[:, 2]
    # B = Rv @ M  (rows 0..2); cov_view = B Bᵀ
    b = [[sum(Rv[i, k] * m[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]

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
    # cov2d = J Σv Jᵀ, J = [[j00, 0, j02], [0, j11, j12]],
    # Σv = B Bᵀ expanded component-wise
    c00 = b[0][0] ** 2 + b[0][1] ** 2 + b[0][2] ** 2
    c01 = b[0][0] * b[1][0] + b[0][1] * b[1][1] + b[0][2] * b[1][2]
    c02 = b[0][0] * b[2][0] + b[0][1] * b[2][1] + b[0][2] * b[2][2]
    c11 = b[1][0] ** 2 + b[1][1] ** 2 + b[1][2] ** 2
    c12 = b[1][0] * b[2][0] + b[1][1] * b[2][1] + b[1][2] * b[2][2]
    c22 = b[2][0] ** 2 + b[2][1] ** 2 + b[2][2] ** 2
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + 0.3
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + 0.3

    det = a * c - b * b
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    if max_radius is None:
        # span limit: a splat may cover at most KX×ky tiles
        max_radius = min((ky - 1) * TILE_H // 2 - 1,
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


def _make_records(ps: ProjectedSplats) -> jnp.ndarray:
    """(N, 16) f32 splat records, one contiguous row per splat."""
    n = ps.depth.shape[0]
    valid = jnp.isfinite(ps.depth).astype(jnp.float32)
    cols = jnp.stack([
        ps.mean2d[:, 0], ps.mean2d[:, 1],
        ps.conic[:, 0], ps.conic[:, 1], ps.conic[:, 2],
        ps.opacity, ps.color[:, 0], ps.color[:, 1], ps.color[:, 2],
        valid, ps.radius.astype(jnp.float32),
        jnp.where(valid > 0.5, ps.depth, jnp.inf),
    ], -1)                                                  # (N, 12)
    pad = jnp.zeros((n, _ROWS - cols.shape[1]), jnp.float32)
    return jnp.concatenate([cols, pad], -1)


def _sort_records_by_depth(records: jnp.ndarray) -> jnp.ndarray:
    order = jnp.argsort(records[:, _DEPTH])
    return jnp.take(records, order, axis=0)       # one row-gather


def _bin_splats(records: jnp.ndarray, ntx: int, nty: int, cap_pairs: int,
                ky: int = KY, max_per_tile: int | None = None):
    """Chunk-aligned tile lists from depth-sorted (N, 16) records.
    Returns (packed_idx (CAP,) int32 splat indices with -1 nulls,
    chunk_tile (CAPC,) int32 with ntiles sentinel, chunk_first (CAPC,)
    int32, visited (ntiles,) bool, overflow (scalar))."""
    n = records.shape[0]
    ntiles = ntx * nty
    mx, my = records[:, _MX], records[:, _MY]
    r = records[:, _RAD]
    valid = records[:, _VAL] > 0.5

    tx0 = jnp.floor((mx - r) / TILE_W).astype(jnp.int32).clip(0, ntx - 1)
    tx1 = jnp.floor((mx + r) / TILE_W).astype(jnp.int32).clip(0, ntx - 1)
    ty0 = jnp.floor((my - r) / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    ty1 = jnp.floor((my + r) / TILE_H).astype(jnp.int32).clip(0, nty - 1)

    # K candidate tiles per splat (static small fan-out)
    tids = []
    for dy in range(ky):
        for dx in range(KX):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = valid & (ty <= ty1) & (tx <= tx1)
            tids.append(jnp.where(ok, ty * ntx + tx, ntiles))
    tid_flat = jnp.stack(tids, -1).reshape(-1)              # (N*K,)
    m = tid_flat.shape[0]

    # stable sort by tile keeps depth order within each tile; carrying the
    # iota through the sort yields the permutation without an extra gather.
    # int16 keys (tile counts stay < 32767 up to 8K resolution) halve the
    # comparator bandwidth of the dominant sort.
    key_dtype = jnp.int16 if ntiles + 1 < 32767 else jnp.int32
    sorted_tid, perm = jax.lax.sort(
        (tid_flat.astype(key_dtype), jnp.arange(m, dtype=jnp.int32)),
        num_keys=1, is_stable=True)
    sorted_tid = sorted_tid.astype(jnp.int32)

    tvec = jnp.arange(ntiles + 1, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_tid, tvec, side="left")  # (ntiles+1,)
    count = start[1:] - start[:-1]                           # (ntiles,)
    if max_per_tile is not None:
        # per-tile depth-ordered LOD drop: splats are front-to-back within
        # each tile's run, so capping the count discards the FARTHEST
        # splats of pathological tiles — never whole tiles (contrast the
        # global cap_pairs tail-drop). Also hard-bounds total chunks at
        # ntiles * ceil(max_per_tile / CHUNK).
        count = jnp.minimum(count, max_per_tile)
    nchunks = (count + CHUNK - 1) // CHUNK
    capc = cap_pairs // CHUNK
    total_need = jnp.sum(nchunks)
    overflow = jnp.maximum(total_need - capc, 0)
    # graceful degradation under a tight cap: scale every tile's chunk
    # budget by capc/total_need, dropping the FARTHEST chunks of each
    # tile proportionally (splats are depth-ordered within a run) instead
    # of losing whole tiles off the end of the chunk array (which cost
    # 16.7 dB in round 1, BENCHLOG.md). Exact when total_need <= capc.
    scale_num = jnp.minimum(total_need, capc)
    nchunks = jnp.where(
        total_need > capc,
        jnp.maximum((nchunks * scale_num) // jnp.maximum(total_need, 1),
                    jnp.minimum(nchunks, 1)),
        nchunks)
    count = jnp.minimum(count, nchunks * CHUNK)
    chunk_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(nchunks).astype(jnp.int32)])
    total_chunks = chunk_off[-1]

    # chunk maps + gather-based packing (scatter-free): destination slot d
    # in chunk c of tile t reads sorted pair start[t] + (d - dst_base(t,c))
    cid = jnp.arange(capc, dtype=jnp.int32)
    owner = jnp.searchsorted(chunk_off, cid, side="right").astype(
        jnp.int32) - 1
    owner = jnp.clip(owner, 0, ntiles - 1)
    chunk_tile = jnp.where(cid < total_chunks, owner, ntiles)
    chunk_first = (cid == chunk_off[owner]).astype(jnp.int32)
    src_base = start[owner] + (cid - chunk_off[owner]) * CHUNK  # (capc,)
    src_end = start[owner] + count[owner]                       # (capc,)

    lane = jnp.tile(jnp.arange(CHUNK, dtype=jnp.int32), capc)   # (CAP,)
    src = jnp.repeat(src_base, CHUNK) + lane
    live = ((src < jnp.repeat(src_end, CHUNK))
            & jnp.repeat(cid < total_chunks, CHUNK))
    # pair index → splat index is arithmetic: pairs were emitted K per splat
    pair = jnp.take(perm, jnp.where(live, src, 0))              # monotonic
    packed_idx = jnp.where(live, pair // (KX * ky), -1)
    # a tile is visited iff its FIRST chunk fits under the cap — tiles whose
    # chunks overflowed must fall back to background, not garbage
    visited = (count > 0) & (chunk_off[:-1] < capc)          # (ntiles,)
    return packed_idx, chunk_tile, chunk_first, visited, overflow


def _pack_records(records: jnp.ndarray, packed_idx: jnp.ndarray):
    """One row-gather of (N, 16) records into the chunk-aligned (CAP, 16)
    layout; null entries (-1) get VAL=0 rows."""
    safe = jnp.maximum(packed_idx, 0)
    packed = jnp.take(records, safe, axis=0)                # (CAP, 16)
    live = (packed_idx >= 0)[:, None]
    return jnp.where(live, packed, 0.0)


_PIX = TILE_H * TILE_W          # pixels per tile, flattened (2048)


def _composite_kernel(chunk_tile_ref, chunk_first_ref, rec_ref,
                      r_ref, g_ref, b_ref, t_ref, sat_ref, *,
                      ntx, ntiles):
    """Whole-chunk vectorized compositing over a tile-flattened (1, 2048)
    pixel block — no per-splat scalar loop.

    Front-to-back alpha compositing is a linear recurrence
    ``T_{i+1} = T_i (1-α_i)``; its prefix is computed in closed form as
    ``exp(L @ log(1-α))`` with L strictly-lower-triangular — one (C,C) x
    (C,P) MXU matmul — so all C splats of the chunk composite in parallel.
    The color accumulation is a second MXU contraction over the splat axis.
    """
    ci = pl.program_id(0)
    tile = chunk_tile_ref[ci]

    @pl.when(tile < ntiles)
    def _():
        @pl.when(chunk_first_ref[ci] == 1)
        def _init():
            r_ref[0] = jnp.zeros((1, _PIX), jnp.float32)
            g_ref[0] = jnp.zeros((1, _PIX), jnp.float32)
            b_ref[0] = jnp.zeros((1, _PIX), jnp.float32)
            t_ref[0] = jnp.ones((1, _PIX), jnp.float32)
            sat_ref[0] = 0

        # early-out: once every pixel of the tile saturated (T < eps, the
        # 3DGS termination rule), remaining chunks — typically most of a
        # deep tile's list — cost one scalar SMEM read. The flag is set by
        # the chunk body from the T it just computed.
        @pl.when(sat_ref[0] == 0)
        def _run():
            _composite_chunk(rec_ref, r_ref, g_ref, b_ref, t_ref, sat_ref,
                             tile, ntx)


def _composite_chunk(rec_ref, r_ref, g_ref, b_ref, t_ref, sat_ref, tile,
                     ntx):
    ty0 = (tile // ntx) * TILE_H
    tx0 = (tile % ntx) * TILE_W
    # flat pixel index → (x, y) within the tile (TILE_W is 2^7)
    i = jax.lax.broadcasted_iota(jnp.int32, (1, _PIX), 1)
    px = (jax.lax.bitwise_and(i, TILE_W - 1) + tx0
          ).astype(jnp.float32) + 0.5
    py = (jax.lax.shift_right_logical(i, 7) + ty0
          ).astype(jnp.float32) + 0.5

    col = lambda c: rec_ref[:, c:c + 1]             # (C, 1)
    dx = px - col(_MX)                              # (C, P)
    dy = py - col(_MY)
    power = (-0.5 * (col(_CA) * dx * dx + col(_CC) * dy * dy)
             - col(_CB) * dx * dy)
    alpha = col(_OP) * jnp.exp(power)
    alpha = jnp.minimum(alpha, _ALPHA_MAX)
    live = col(_VAL) > 0.5
    alpha = jnp.where(live & (alpha >= _ALPHA_MIN), alpha, 0.0)

    log_om = jnp.log(jnp.maximum(1.0 - alpha, 1e-6))     # (C, P)
    # strictly-lower-triangular ones → exclusive prefix over splats
    ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    ltri = (ri > cj).astype(jnp.float32)
    prefix = jax.lax.dot_general(
        ltri, log_om, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (C, P)
    t_in = t_ref[0]                                      # (1, P)
    w = alpha * jnp.exp(prefix) * t_in                   # (C, P)

    # rgb accumulation: contract the splat axis on the MXU
    rgb = jax.lax.dot_general(
        rec_ref[:, _CR:_CB2 + 1], w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (3, P)
    r_ref[0] = r_ref[0] + rgb[0:1]
    g_ref[0] = g_ref[0] + rgb[1:2]
    b_ref[0] = b_ref[0] + rgb[2:3]
    t_new = t_in * jnp.exp(jnp.sum(log_om, axis=0, keepdims=True))
    t_ref[0] = t_new
    sat_ref[0] = (jnp.max(t_new) < _T_EPS).astype(jnp.int32)


def _composite_call(records, chunk_tile, chunk_first, nty, ntx, interpret):
    """Returns 4 tile-flattened planes (ntiles+1, 2048): r, g, b, T.
    Row ``ntiles`` is the sentinel dump for unused chunks; use
    :func:`_untile` to get image-shaped planes."""
    ntiles = nty * ntx
    capc = chunk_tile.shape[0]
    kernel = functools.partial(_composite_kernel, ntx=ntx, ntiles=ntiles)

    def out_map(ci, ct, cf):
        return (jnp.minimum(ct[ci], ntiles), 0, 0)  # sentinel → extra row

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(capc,),
        in_specs=[
            pl.BlockSpec((CHUNK, _ROWS), lambda ci, ct, cf: (ci, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _PIX), out_map,
                         memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    out_shape = [jax.ShapeDtypeStruct((ntiles + 1, 1, _PIX),
                                      jnp.float32)] * 4
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(chunk_tile, chunk_first, records)


def finalize_planes(r, g, b, t, visited, nty: int, ntx: int,
                    background) -> jnp.ndarray:
    """Shared composite tail: mask never-visited tiles (garbage blocks) to
    background, untile the flat planes, and blend the background through
    the remaining transmittance. Used by both the single-device and the
    sharded render paths."""
    vis = jnp.concatenate([visited, jnp.zeros((1,), bool)])[:, None, None]
    rgbt = [jnp.where(vis, p, 0.0 if i < 3 else 1.0)
            for i, p in enumerate((r, g, b, t))]
    planes = [_untile(p, nty, ntx) for p in rgbt]
    rgb = jnp.stack(planes[:3], -1)
    bg = jnp.asarray(background, jnp.float32)
    return rgb + planes[3][..., None] * bg


def _untile(plane: jnp.ndarray, nty: int, ntx: int) -> jnp.ndarray:
    """(ntiles+1, 1, 2048) tile-flattened → (nty*16, ntx*128) image plane
    (one cheap XLA transpose in HBM)."""
    t = plane[:nty * ntx].reshape(nty, ntx, TILE_H, TILE_W)
    return t.transpose(0, 2, 1, 3).reshape(nty * TILE_H, ntx * TILE_W)


def render_gaussians(cloud, view, proj, width: int, height: int,
                     background=(0.0, 0.0, 0.0),
                     pairs_cap_factor: int | None = None,
                     cam_pos=None,
                     ky: int = KY,
                     max_splats_per_tile: int | None = None,
                     return_stats: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Render a GaussianCloud → (height, width, 3) f32 linear image.
    Fully jittable (static: width/height/cap factor).

    ``pairs_cap_factor=None`` (default) sizes the pair buffer for the exact
    worst case (K pairs per splat + one chunk of alignment padding per
    tile) so no work is ever dropped; an integer factor trades memory/grid
    steps for graceful far-splat dropping under extreme duplication.

    ``cam_pos`` (world-space camera position) enables view-dependent SH
    color evaluation when the cloud carries higher-order SH bands.

    ``ky`` caps a splat's vertical tile span (quality/speed knob): smaller
    ky emits fewer binning pairs (faster sort/pack) but clamps large-splat
    radii harder — ky=4 allows radius <= 23 px, ky=3 <= 15 px.

    ``max_splats_per_tile`` caps each tile's depth-sorted list, discarding
    only the *farthest* splats of over-deep tiles (graceful LOD) while
    hard-bounding binning memory. An undersized ``pairs_cap_factor`` now
    also degrades gracefully: every tile's chunk budget is scaled
    proportionally (dropping farthest chunks per tile), never whole tiles.

    ``return_stats=True`` additionally returns a dict with
    ``overflow_chunks`` (device scalar: how many 128-splat chunks the cap
    dropped this frame — 0 means the render was exact) so cap overflows
    are detectable at runtime instead of silently degrading (the 16.7 dB
    incident, BENCHLOG.md).
    """
    colors = cloud.colors
    if cam_pos is not None and getattr(cloud, "sh_rest", None) is not None:
        from ..models.gaussians import eval_sh_colors
        with jax.named_scope("gs.sh_colors"):
            colors = eval_sh_colors(cloud, cam_pos)
    with jax.named_scope("gs.project"):
        ps = project_gaussians(cloud.means, cloud.scales, cloud.quats,
                               cloud.opacities, colors, view, proj,
                               width, height, ky=ky)
    with jax.named_scope("gs.depth_sort"):
        records = _sort_records_by_depth(_make_records(ps))

    ntx = _pad_to(width, TILE_W) // TILE_W
    nty = _pad_to(height, TILE_H) // TILE_H
    n = cloud.num_splats
    ntiles = ntx * nty
    if pairs_cap_factor is None:
        cap_pairs = n * KX * ky + ntiles * CHUNK
    else:
        cap_pairs = max(pairs_cap_factor * n, 4 * CHUNK) + ntiles * CHUNK
    if max_splats_per_tile is not None:
        # per-tile cap hard-bounds the chunk-aligned total
        cap_pairs = min(cap_pairs,
                        ntiles * _pad_to(max_splats_per_tile, CHUNK))
    cap_pairs = _pad_to(cap_pairs, CHUNK)
    with jax.named_scope("gs.bin"):
        packed_idx, chunk_tile, chunk_first, visited, overflow = _bin_splats(
            records, ntx, nty, cap_pairs, ky=ky,
            max_per_tile=max_splats_per_tile)
    with jax.named_scope("gs.pack"):
        packed = _pack_records(records, packed_idx)

    with jax.named_scope("gs.composite"):
        r, g, b, t = _composite_call(packed, chunk_tile, chunk_first,
                                     nty, ntx, interpret)
    img = finalize_planes(r, g, b, t, visited, nty, ntx, background)
    img = img[:height, :width]
    if return_stats:
        return img, {"overflow_chunks": overflow,
                     "live_pairs": jnp.sum(packed_idx >= 0)}
    return img
