"""3D Gaussian Splatting — EWA project, tile bin, depth sort, composite.

The flagship pipeline (BASELINE.json north star; the reference's stated but
unbuilt goal, README.md:7). TPU-first design:

1. **Project**: static world covariances (hoisted out of frame loops) +
   one fused Pallas EWA projection kernel over stacked splat planes;
   training differentiates the identical-math jnp path.
2. **Fused bin+sort** (XLA, no atomics): each splat emits K=KX·ky
   candidate (tile, splat) pairs keyed ``tile << db | quantized_depth``;
   ONE stable int32 sort yields per-tile runs that are front-to-back
   within each run (the classic 3DGS combined radix key). Corner tiles a
   splat's circular footprint misses are culled at emission.
3. **Direct chunk layout**: the kernel streams contiguous 128-pair blocks
   of the sorted array; scalar-prefetched per-step maps carry the owning
   tile and a block-local [lo, hi) row mask, and blocks straddling a tile
   boundary run once per adjacent tile with complementary masks. With the
   LOD (``max_splats_per_tile``: a global step pool allocated by per-tile
   need under a smoothed depth cut), only the pool's blocks are packed,
   via one block-granular row gather. The only other data movement
   between sort and kernel is one row gather of the (N, 12) record table
   into pack order.
4. **Composite** (Pallas): a 1-D grid over steps. Consecutive steps of one
   tile accumulate in a resident VMEM block (transmittance + RGB), written
   back once per tile. Per chunk: conic quadratic → alpha over the whole
   (32, 128)-pixel tile, exclusive transmittance prefix as a
   multiplicative doubling scan over the splat axis (log2(C) shifted VPU
   multiplies), RGB accumulation as one MXU contraction, SMEM saturation
   early-out.

Known limits (perf/LOD work tracked in BENCHLOG.md): radius is clamped so
a splat spans at most KX×ky tiles (large near-camera splats truncate);
compositing is strictly sequential per step within a tile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import pad_to as _pad_to
from ..utils.logging import scoped

_log = scoped("gs")

TILE_H = 32
TILE_W = 128
CHUNK = 128      # splats per kernel grid step
KX = 2           # max horizontal tile span per splat
#: default max vertical tile span per splat. With (32, 128) tiles, ky=2
#: clamps splat radii to 15 px (identical clamp to round 1's ky=3 on
#: 16-tall tiles) while emitting K = 4 instead of 6 candidate pairs per
#: splat — a 33% smaller binning sort. The composite is step-overhead
#: bound, so the doubled per-tile pixel count is nearly free (BENCHLOG
#: round 2). ky=3 raises the clamp to 31 px for scenes dominated by
#: large near-camera splats.
KY = 2
#: coarse (level-2) fan for LARGE splats under two-level binning
#: (``big_splat_cap``): a large splat may cover up to KX2 × KY2 tiles,
#: raising the radius ceiling from level1_max_radius (15 px at ky=2) to
#: level2_max_radius (111 px) for a budgeted subset of splats.
KY2 = 8
KX2 = 3
#: per-tile LOD desire ceiling, in multiples of max_splats_per_tile.
#: Grazing-angle surface tiles legitimately need 20-30x the pool average
#: (shell frame 59: silhouette tiles hold 8-12k pairs whose front
#: surface spans most of that depth; the old 4x cap rendered their far
#: halves black — 14-21 dB, tools/exp_shell.py). The floor-guaranteed
#: pool allocation below makes a high ceiling safe: greedy tiles can
#: only consume the pool's surplus, never a tile's baseline share.
LOD_DESIRE_CAP = 32
#: dry-tile FLOOR-channel jump ceiling (in units of max_splats_per_tile):
#: see update_lod_budget — large enough to recover a starved tile in one
#: frame, small enough that an all-dry scene stays ≈ the balanced static
#: allocation
_DRY_FLOOR_CAP = 4
#: default decimation factor of the lod_tail_decim tail composite (2 =
#: one sample per 2x2 pixel quad, quarter cost; 4 = 1/16 cost, −0.3 dB
#: on inria — tools/exp_tail.py 2026-08-21). Module-level default so
#: tests can pin 1 (bit-near-exact equivalence); per-call override via
#: render_gaussians(lod_tail_d=...). Env var is the global A/B knob.
_TAIL_D = int(__import__("os").environ.get("RAYEATER_TAIL_D", "2"))
#: multi-chunk steps of the tail composite: the tail's per-step body is
#: decim²-smaller than the head's, so the fixed ~0.66 us/step sequencing
#: cost dominates at nseg=1 (measured: tail pairs priced ~equal to head
#: pairs instead of 4x cheaper, tools/exp_tail.py 2026-08-20)
_TAIL_SEG = 8
_ALPHA_MIN = 1.0 / 255.0   # 3DGS convention: skip ultra-faint contributions
_ALPHA_MAX = 0.99
_T_EPS = 1e-4              # 3DGS termination: tile saturated when T < eps

# record columns — one contiguous row per splat so the pack gather is a
# row DMA. The XLA row gather is ELEMENT-count bound (~2.2G elem/s
# measured, tools/exp_blocks.py), so the table carries only what the
# composite kernel reads: 9 columns padded to 12 (Mosaic (CHUNK, 12)
# blocks re-validated correct on this toolchain — the round-1 corruption
# did not reproduce; tools/exp_blocks.py probes it each run).
# Validity is encoded as op == 0; radius/depth live in ProjectedSplats
# and never enter the kernel table.
_MX, _MY, _CA, _CB, _CC, _OP, _CR, _CG, _CB2 = range(9)
_ROWS = 12
#: projection-kernel block rows (x128 lanes). The kernel is LATENCY-bound
#: (a ~150-op serial dependency chain on small blocks starves the VPU
#: pipeline), so bigger blocks = more independent instructions per op.
_PROJ_BR = int(__import__("os").environ.get("RAYEATER_PROJ_BR", "256"))


def level1_max_radius(ky: int = KY, tile_w: int = TILE_W) -> int:
    """Largest radius whose [m-r, m+r] span fits in KX×ky tiles."""
    return min((ky - 1) * TILE_H // 2 - 1, (KX - 1) * tile_w // 2 - 1)


def _kx2(tile_w: int) -> int:
    """Horizontal slot count of the coarse (level-2) fan for a given tile
    width, chosen so the level-2 radius ceiling stays vertical-bound (111
    px at KY2=8) regardless of ``tile_w``: 3 slots at 128-wide tiles, 5 at
    64, 8 at 32."""
    r2v = (KY2 - 1) * TILE_H // 2 - 1
    return -(-2 * (r2v + 1) // tile_w) + 1


def level2_max_radius(tile_w: int = TILE_W) -> int:
    """Radius ceiling of the coarse _kx2×KY2 fan (two-level binning)."""
    return min((KY2 - 1) * TILE_H // 2 - 1,
               (_kx2(tile_w) - 1) * tile_w // 2 - 1)


#: mid (level-1.5) fan vertical span: 4 tiles → 47 px radius ceiling.
#: Trained-scene radius histograms are log-normal (tools/exp_census.py:
#: of ~192k splats over the 15 px level-1 ceiling, ~168k are <= 47 px),
#: so routing them through the 64-slot KX2×KY2 fan wastes 4x pairs —
#: the 16-slot mid fan carries the bulk and the coarse fan only the
#: ~24k true giants.
KY_M = 4


def _kxm(tile_w: int) -> int:
    """Horizontal slot count of the mid fan (KY_M-bounded ceiling)."""
    rmv = (KY_M - 1) * TILE_H // 2 - 1
    return -(-2 * (rmv + 1) // tile_w) + 1


def level_mid_max_radius(tile_w: int = TILE_W) -> int:
    """Radius ceiling of the mid _kxm×KY_M fan (three-level binning)."""
    return min((KY_M - 1) * TILE_H // 2 - 1,
               (_kxm(tile_w) - 1) * tile_w // 2 - 1)


#: mid-LO fan vertical span: 3 tiles → 31 px radius ceiling. The inria
#: census (tools/exp_census.py 2026-08-19) puts ~140k of the ~188k over-15px
#: splats under 31 px and only ~27k in (31, 47] — so a 6-slot (tw=64)
#: mid-lo fan carries the bulk at HALF the 12-slot mid fan's sort-slot
#: cost (~1.2M static slots saved per frame at the bench caps).
KY_ML = 3


def _kxml(tile_w: int) -> int:
    """Horizontal slot count of the mid-lo fan (KY_ML-bounded ceiling)."""
    rlv = (KY_ML - 1) * TILE_H // 2 - 1
    return -(-2 * (rlv + 1) // tile_w) + 1


def level_midlo_max_radius(tile_w: int = TILE_W) -> int:
    """Radius ceiling of the mid-lo _kxml×KY_ML fan (four-level
    binning via ``mid_lo_cap``)."""
    return min((KY_ML - 1) * TILE_H // 2 - 1,
               (_kxml(tile_w) - 1) * tile_w // 2 - 1)


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
    radius: jnp.ndarray    # (N,) int32 circumscribed extent in px
    color: jnp.ndarray     # (N, 3)
    opacity: jnp.ndarray   # (N,)
    ext: jnp.ndarray | None = None   # (N, 2) int32 per-axis bbox extents
    #                        (rx, ry) ≤ radius — see _project_math; None
    #                        degrades binning to the isotropic footprint


def project_gaussians(means, scales, quats, opacities, colors,
                      view, proj, width: int, height: int,
                      near: float = 0.05,
                      max_radius: float | None = None,
                      ky: int = KY) -> ProjectedSplats:
    """EWA splat projection under this framework's camera conventions
    (``rmath.look_at_zforward`` + ``rmath.perspective``: view depth = +z =
    distance in front, y-down NDC). Do NOT pass ``rmath.look_at`` here — it
    is the reference's mirrored matrix kept for raster parity and inverts
    depth ordering (see rmath.look_at_zforward).

    This is the autodiff-friendly jnp path (training differentiates
    through it); :func:`_project_fast` runs the SAME math
    (:func:`_project_math`) as one fused Pallas kernel for the render
    path."""
    if max_radius is None:
        max_radius = level1_max_radius(ky)
    scal = _project_scalars(view, proj, width, height, near,
                            float(max_radius))
    cov = _cov3d_math(scales[:, 0], scales[:, 1], scales[:, 2],
                      quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3])
    mx, my, ca, cb, cc, depth, radius, rx, ry = _project_math(
        means[:, 0], means[:, 1], means[:, 2], *cov, opacities, scal)
    return ProjectedSplats(
        mean2d=jnp.stack([mx, my], -1),
        conic=jnp.stack([ca, cb, cc], -1), depth=depth,
        radius=radius.astype(jnp.int32), color=colors, opacity=opacities,
        ext=jnp.stack([rx, ry], -1).astype(jnp.int32))


def _project_scalars(view, proj, width, height, near, max_radius):
    """(24,) f32 scalar packet consumed by _project_math: 12 view scalars
    (row-major R, then t), then fx, fy, proj00, proj11, W, H, near,
    max_radius (+ padding)."""
    Rv, tv = view[:3, :3], view[:3, 3]
    fx = proj[0, 0] * width * 0.5
    fy = proj[1, 1] * height * 0.5
    return jnp.concatenate([
        Rv.reshape(-1), tv.reshape(-1),
        jnp.stack([fx, fy, proj[0, 0], proj[1, 1],
                   jnp.float32(width), jnp.float32(height),
                   jnp.float32(near), jnp.float32(max_radius)]),
        jnp.zeros((4,), jnp.float32)]).astype(jnp.float32)


def _cov3d_math(sx, sy, sz, qw, qx, qy, qz):
    """(scales, quats) → the 6 unique entries of the WORLD-space 3D
    covariance Σ = (R S)(R S)ᵀ — elementwise, shape-polymorphic.

    Split out of :func:`_project_math` because Σ is VIEW-INDEPENDENT: in
    device-resident frame loops (lax.scan/fori over a camera path, the
    bench shape) XLA hoists this whole chain out of the loop, so steady
    state frames pay only the view congruence (~25% less projection math;
    the projection kernel is compute-bound, tools/exp_project.py)."""
    inv_n = jax.lax.rsqrt(
        jnp.maximum(qw * qw + qx * qx + qy * qy + qz * qz, 1e-24))
    w, x, y, z = qw * inv_n, qx * inv_n, qy * inv_n, qz * inv_n
    # rotation columns scaled: M[i][j] = R[i][j] * s[j]
    m = [[(1 - 2 * (y * y + z * z)) * sx, 2 * (x * y - w * z) * sy,
          2 * (x * z + w * y) * sz],
         [2 * (x * y + w * z) * sx, (1 - 2 * (x * x + z * z)) * sy,
          2 * (y * z - w * x) * sz],
         [2 * (x * z - w * y) * sx, 2 * (y * z + w * x) * sy,
          (1 - 2 * (x * x + y * y)) * sz]]
    dot = lambda i, j: (m[i][0] * m[j][0] + m[i][1] * m[j][1]
                        + m[i][2] * m[j][2])
    return dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)


def _project_math(px_, py_, pz_, s00, s01, s02, s11, s12, s22, op, scal):
    """Elementwise EWA projection core — shape-polymorphic (works on (N,)
    columns in the jnp path and on (64, 128) VMEM blocks in the Pallas
    kernel; ``scal`` indexes the _project_scalars packet; s** are the
    static world covariance entries from :func:`_cov3d_math`).

    Fully scalar-expanded covariance math: elementwise ops only. The
    (N,3,3)-batched einsum formulation compiles pathologically on TPU
    (XLA unrolls the tiny contractions; ~5 min compile at 1M splats) and
    runs on lane-starved shapes; the expansion is pure VPU.

    Returns (mx, my, conic_a, conic_b, conic_c, depth(+inf culled),
    radius_f32, rx_f32, ry_f32).

    ``radius`` is the CIRCUMSCRIBED extent (λ_max eigenvalue), ``rx``/
    ``ry`` the tight per-axis bbox extents of the same contour ellipse
    (extent_x of {d: dᵀΣ⁻¹d ≤ s²} is s·√Σxx — exact, not an eigenvalue
    bound). All three use the OPACITY-AWARE cutoff multiplier
    s = min(3, √(2·ln(op/_ALPHA_MIN))) instead of the blanket 3σ: the
    composite kernel zeroes per-pixel alpha < _ALPHA_MIN (the 3DGS
    convention, _composite_chunk), so every tile beyond the α=_ALPHA_MIN
    contour contributes EXACTLY zero — emitting it is pure waste. The
    shrink is therefore bit-exact w.r.t. the kernel while cutting real
    pair counts (composite bodies + LOD budget consumption) on
    faint-splat-heavy trained scenes (inria floaters: op~0.1 → s≈2.5,
    -30% footprint area; anisotropic shell disks: bbox ≤ half the
    circumscribed square)."""
    v = scal if callable(scal) else (lambda k: scal[k])
    r_v = [[v(0), v(1), v(2)], [v(3), v(4), v(5)], [v(6), v(7), v(8)]]
    tv = (v(9), v(10), v(11))
    fx, fy, p00, p11 = v(12), v(13), v(14), v(15)
    width, height, near, max_radius = v(16), v(17), v(18), v(19)

    # view transform
    pvx = r_v[0][0] * px_ + r_v[0][1] * py_ + r_v[0][2] * pz_ + tv[0]
    pvy = r_v[1][0] * px_ + r_v[1][1] * py_ + r_v[1][2] * pz_ + tv[1]
    zv = r_v[2][0] * px_ + r_v[2][1] * py_ + r_v[2][2] * pz_ + tv[2]
    # view covariance congruence Σv = Rv Σ Rvᵀ: t = Rv Σ, then t Rvᵀ
    sig = [[s00, s01, s02], [s01, s11, s12], [s02, s12, s22]]
    t = [[sum(r_v[i][k] * sig[k][j] for k in range(3)) for j in range(3)]
         for i in range(3)]

    # perspective Jacobian of the screen mapping:
    #   x_s = (proj00 * x/z + 1) * W/2,  y_s = (proj11 * y/z + 1) * H/2
    z_safe = jnp.maximum(zv, near)
    inv_z = 1.0 / z_safe
    # clamp the frustum-tangent like 3DGS to bound the Jacobian
    lim_x = 1.3 * (width * 0.5) / jnp.abs(fx)
    lim_y = 1.3 * (height * 0.5) / jnp.abs(fy)
    txz = jnp.clip(pvx * inv_z, -lim_x, lim_x)
    tyz = jnp.clip(pvy * inv_z, -lim_y, lim_y)

    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z
    # cov2d = J Σv Jᵀ, J = [[j00, 0, j02], [0, j11, j12]],
    # Σv entries from the congruence rows (cᵢⱼ = tᵢ · Rv[j])
    cv = lambda i, j: (t[i][0] * r_v[j][0] + t[i][1] * r_v[j][1]
                       + t[i][2] * r_v[j][2])
    c00 = cv(0, 0)
    c01 = cv(0, 1)
    c02 = cv(0, 2)
    c11 = cv(1, 1)
    c12 = cv(1, 2)
    c22 = cv(2, 2)
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + 0.3
    bb = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + 0.3

    det = a * c - bb * bb
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    # opacity-aware cutoff multiplier (see docstring): s ≤ 3, s → 0 as
    # op → _ALPHA_MIN (such splats are culled by the op test below)
    scut = jnp.minimum(3.0, jnp.sqrt(jnp.maximum(
        2.0 * jnp.log(jnp.maximum(op, _ALPHA_MIN) * (1.0 / _ALPHA_MIN)),
        1e-6)))
    radius = jnp.ceil(scut * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    radius = jnp.minimum(radius, max_radius)
    rx = jnp.minimum(jnp.ceil(scut * jnp.sqrt(jnp.maximum(a, 0.0))),
                     radius)
    ry = jnp.minimum(jnp.ceil(scut * jnp.sqrt(jnp.maximum(c, 0.0))),
                     radius)

    inv_det = 1.0 / jnp.where(det > 1e-12, det, 1.0)

    mx = (pvx * inv_z * p00 + 1.0) * 0.5 * width
    my = (pvy * inv_z * p11 + 1.0) * 0.5 * height

    valid = ((zv > near) & (det > 1e-12) & (radius >= 1.0)
             & (mx + rx > 0) & (mx - rx < width)
             & (my + ry > 0) & (my - ry < height)
             & (op > _ALPHA_MIN))
    depth = jnp.where(valid, zv, jnp.inf)
    return (mx, my, c * inv_det, -bb * inv_det, a * inv_det, depth,
            radius, rx, ry)


def _project_kernel(scal_ref, in_ref, out_ref):
    outs = _project_math(*(in_ref[k] for k in range(10)),
                         lambda k: scal_ref[0, k])
    for k, val in enumerate(outs):
        out_ref[k] = val


def _project_fast(means, scales, quats, opacities, colors, view, proj,
                  width: int, height: int, near: float = 0.05,
                  max_radius: float | None = None, ky: int = KY,
                  interpret: bool = False) -> ProjectedSplats:
    """Pallas projection: the whole EWA math as ONE fused elementwise
    kernel over (64, 128) splat blocks — a single HBM sweep (~90 MB at 1M
    splats). The 11 input planes and 8 output planes ride as ONE stacked
    (11, rows, 128) / (8, rows, 128) operand each, so a grid step issues 2
    large DMAs instead of 19 small ones — the kernel is DMA-issue-bound,
    not bandwidth-bound (19-operand (8, 128) version: 2.4 ms at 1M;
    tools/exp_project.py). Forward-only: training differentiates the jnp
    :func:`project_gaussians` (same :func:`_project_math` body)."""
    if max_radius is None:
        max_radius = level1_max_radius(ky)
    n = means.shape[0]
    npad = _pad_to(max(n, _PROJ_BR * 128), _PROJ_BR * 128)
    rows = npad // 128

    def plane(col):
        if npad > n:
            col = jnp.concatenate(
                [col, jnp.zeros((npad - n,), col.dtype)])
        return col.reshape(rows, 128)

    cov = _cov3d_math(scales[:, 0], scales[:, 1], scales[:, 2],
                      quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3])
    planes = jnp.stack(
        [plane(c) for c in
         (means[:, 0], means[:, 1], means[:, 2], *cov,
          opacities)])                                  # (10, rows, 128)
    scal = _project_scalars(view, proj, width, height, near,
                            float(max_radius)).reshape(1, 24)
    outs = pl.pallas_call(
        _project_kernel,
        grid=(rows // _PROJ_BR,),
        in_specs=[pl.BlockSpec((1, 24), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((10, _PROJ_BR, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9, _PROJ_BR, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, rows, 128), jnp.float32),
        interpret=interpret,
    )(scal, planes)
    mx, my, ca, cb, cc, depth, radius, rx, ry = [
        outs[k].reshape(-1)[:n] for k in range(9)]
    return ProjectedSplats(
        mean2d=jnp.stack([mx, my], -1),
        conic=jnp.stack([ca, cb, cc], -1), depth=depth,
        radius=radius.astype(jnp.int32), color=colors, opacity=opacities,
        ext=jnp.stack([rx, ry], -1).astype(jnp.int32))


def _make_records(ps: ProjectedSplats) -> jnp.ndarray:
    """(N, 12) f32 splat records, one contiguous row per splat. Culled
    splats carry opacity 0 (their pairs never reach a [lo, hi) range
    anyway — the zero is belt-and-braces)."""
    n = ps.depth.shape[0]
    valid = jnp.isfinite(ps.depth).astype(jnp.float32)
    cols = jnp.stack([
        ps.mean2d[:, 0], ps.mean2d[:, 1],
        ps.conic[:, 0], ps.conic[:, 1], ps.conic[:, 2],
        ps.opacity * valid,
        ps.color[:, 0], ps.color[:, 1], ps.color[:, 2],
    ], -1)                                                  # (N, 9)
    pad = jnp.zeros((n, _ROWS - cols.shape[1]), jnp.float32)
    return jnp.concatenate([cols, pad], -1)


def _emit_fan(mx, my, rx, ry, r, valid, qd, kx_fan: int, ky_fan: int,
              ntx: int, nty: int, db: int, tile_w: int = TILE_W):
    """Candidate (tile << db | qdepth) keys for a kx_fan×ky_fan tile fan.

    The tile span is the footprint ellipse's per-axis BBOX (``rx``,
    ``ry`` — tight and exact, see _project_math), and a circle-vs-rect
    test against the CIRCUMSCRIBED radius ``r`` additionally drops span
    corner tiles the footprint misses (for a rotated ellipse the
    circumscribed circle is the cheapest safe corner bound; the
    axis-normalized ellipse test is NOT conservative). Fewer real pairs
    means a smaller pack gather and fewer composite steps (the sort size
    is static regardless). Returns a list of (N,) int32 key streams;
    culled candidates hold the sentinel key."""
    ntiles = ntx * nty
    sentinel = ntiles << db
    tx0 = jnp.floor((mx - rx) / tile_w).astype(jnp.int32).clip(0, ntx - 1)
    tx1 = jnp.floor((mx + rx) / tile_w).astype(jnp.int32).clip(0, ntx - 1)
    ty0 = jnp.floor((my - ry) / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    ty1 = jnp.floor((my + ry) / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    r2 = r * r
    keys = []
    for dy in range(ky_fan):
        for dx in range(kx_fan):
            ty = ty0 + dy
            tx = tx0 + dx
            ok = valid & (ty <= ty1) & (tx <= tx1)
            rx0 = (tx * tile_w).astype(jnp.float32)
            ry0 = (ty * TILE_H).astype(jnp.float32)
            ddx = jnp.maximum(jnp.maximum(rx0 - mx, mx - (rx0 + tile_w)),
                              0.0)
            ddy = jnp.maximum(jnp.maximum(ry0 - my, my - (ry0 + TILE_H)),
                              0.0)
            ok &= ddx * ddx + ddy * ddy <= r2
            keys.append(jnp.where(ok, ((ty * ntx + tx) << db) | qd,
                                  sentinel))
    return keys


# ---------------------------------------------------------------------------
# LOD tail proxy: when the per-tile LOD truncates a depth-sorted list, the
# dropped tail is approximated as a HOMOGENEOUS SLAB per tile instead of
# vanishing. Per pair we carry a quantized "average alpha over the tile"
# aux payload through the binning sort (order-independent sums need no
# post-sort gather — the pack-gather wall, BENCHLOG item 1), take
# per-tile segment sums of the dropped range via one cumsum + boundary
# takes, and composite the slab behind the kept list through the
# per-pixel residual transmittance (bilinearly smoothed across tiles).
# The grazing fog views that broke the round-2 quality gate (24 dB) are
# thousands-deep stacks whose tail is spatially smooth — exactly the
# regime where a homogeneous-medium approximation is accurate.
# ---------------------------------------------------------------------------

#: aux quantization: -log1p(-alpha_eff) in 15 bits over [0, _TAIL_LA_MAX],
#: RGB as 5:6:5 in the low 16 bits
_TAIL_LA_MAX = 4.0


def _pack_tail_aux(alpha_full, colors, n_pairs,
                   pix: int = TILE_H * TILE_W):
    """Per-splat packed aux: alpha_full = op * 2π/sqrt(det(conic)) (the
    Gaussian's total alpha integral in px²), split evenly among its
    ``n_pairs`` emitted tiles and averaged over the tile area ``pix``."""
    a_eff = jnp.clip(alpha_full
                     / (pix * jnp.maximum(n_pairs, 1).astype(jnp.float32)),
                     0.0, 0.98)
    la = -jnp.log1p(-a_eff)
    # sqrt-domain quantization: typical fog a_eff is 1e-4..1e-2 — linear
    # 15-bit steps of 1.2e-4 would carry 30%+ relative error there, sqrt
    # steps stay <1% across the whole range
    q = jnp.clip((jnp.sqrt(la / _TAIL_LA_MAX) * 32767.0 + 0.5)
                 .astype(jnp.int32), 0, 32767)
    c = jnp.clip(colors, 0.0, 1.0)
    r5 = (c[:, 0] * 31.0 + 0.5).astype(jnp.int32)
    g6 = (c[:, 1] * 63.0 + 0.5).astype(jnp.int32)
    b5 = (c[:, 2] * 31.0 + 0.5).astype(jnp.int32)
    return (q << 16) | (r5 << 11) | (g6 << 5) | b5


_TAIL_BS = 512   # tail-sum block size


def _tail_sums(aux_sorted, lo, hi):
    """Order-independent homogeneous-slab sums over pair ranges [lo, hi)
    of the sorted array: returns (S_la, S_la*r, S_la*g, S_la*b) each
    (ntiles,). ``aux_sorted`` is the aux payload in sorted-pair order.

    A full cumsum at pair scale costs ~7 ms on v5e (tools/exp_gather.py);
    instead: per-block partial sums (one fused sweep) + a tiny exclusive
    block cumsum + masked remainder rows gathered only at the 2·ntiles
    boundary positions."""
    sq = ((aux_sorted >> 16) & 0x7fff).astype(jnp.float32) * (1.0 / 32767.0)
    la = sq * sq * _TAIL_LA_MAX
    cr = ((aux_sorted >> 11) & 31).astype(jnp.float32) * (1.0 / 31.0)
    cg = ((aux_sorted >> 5) & 63).astype(jnp.float32) * (1.0 / 63.0)
    cb = (aux_sorted & 31).astype(jnp.float32) * (1.0 / 31.0)
    m = aux_sorted.shape[0]
    bs = _TAIL_BS
    mb = _pad_to(m, bs)
    stack = jnp.stack([la, la * cr, la * cg, la * cb])      # (4, m)
    if mb > m:
        stack = jnp.concatenate(
            [stack, jnp.zeros((4, mb - m), jnp.float32)], 1)
    blocks = stack.reshape(4, mb // bs, bs)
    cumblk = jnp.concatenate(
        [jnp.zeros((4, 1), jnp.float32),
         jnp.cumsum(blocks.sum(-1), axis=1)], 1)            # exclusive

    def s_excl(p):                                          # (ntiles,)
        rows = jnp.take(blocks, p // bs, axis=1)            # (4, nt, bs)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
                < (p % bs)[:, None])
        part = jnp.sum(rows * mask[None], -1)               # (4, nt)
        return jnp.take(cumblk, p // bs, axis=1) + part

    return s_excl(hi) - s_excl(lo)


def _emit_pair(mx, my, rx, ry, valid, qd, ntx: int, nty: int, db: int,
               tile_w: int):
    """TWO-slot fan for splats spanning at most 2 tiles (≤1 grid-line
    crossing): slot 0 = home tile (tx0, ty0), slot 1 = the one crossed
    neighbor. Callers must route splats crossing BOTH a vertical and a
    horizontal line (up to 2x2 tiles) elsewhere — see ``corner_cap``.
    No footprint-vs-rect cull is needed: an ellipse whose bbox crosses
    one grid line within its row/column band always overlaps the
    neighbor rect on that axis."""
    ntiles = ntx * nty
    sentinel = ntiles << db
    tx0 = jnp.floor((mx - rx) / tile_w).astype(jnp.int32).clip(0, ntx - 1)
    tx1 = jnp.floor((mx + rx) / tile_w).astype(jnp.int32).clip(0, ntx - 1)
    ty0 = jnp.floor((my - ry) / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    ty1 = jnp.floor((my + ry) / TILE_H).astype(jnp.int32).clip(0, nty - 1)
    cx = (tx1 > tx0).astype(jnp.int32)
    cy = (ty1 > ty0).astype(jnp.int32)
    home = ty0 * ntx + tx0
    k0 = jnp.where(valid, (home << db) | qd, sentinel)
    other = (ty0 + cy) * ntx + (tx0 + cx)
    ok1 = valid & ((cx + cy) == 1)
    k1 = jnp.where(ok1, (other << db) | qd, sentinel)
    return [k0, k1]


def _compact_channel(ch_mask, ch_cap: int):
    """Budgeted channel compaction: indices of the first ``ch_cap`` set
    bits of ``ch_mask`` (N,), ascending — via ONE unstable key-only sort
    of ``where(mask, iota, N)`` (masked splats sort to the front in index
    order; ties are all-sentinel). Bit-identical to the former
    cumsum+searchsorted form but ~24x faster: XLA searchsorted is a
    per-query binary search riding the ~140-210M rows/s gather wall
    (tools/exp_compact.py: 29.5 ms vs 1.2 ms at 200k slots in 1M — the
    round-4 inria mid-fan regression was two of these per frame).

    Returns (n_set (scalar int32), idx (ch_cap,) int32 in [0, N-1],
    valid (ch_cap,) bool)."""
    n = ch_mask.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(ch_mask, iota, jnp.int32(n))
    (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    head = jax.lax.slice_in_dim(skey, 0, min(ch_cap, n))
    if ch_cap > n:        # budget exceeds the splat count: pad sentinels
        head = jnp.concatenate(
            [head, jnp.full(ch_cap - n, n, jnp.int32)])
    return (jnp.sum(ch_mask.astype(jnp.int32)),
            jnp.minimum(head, n - 1), head < n)


def _compact_channels(masks, caps):
    """:func:`_compact_channel` for several DISJOINT masks sharing ONE
    sort: the key carries the channel id in its high bits, so channel
    c's set indices land contiguously at dynamic offset Σ_{j<c} n_j of
    the sorted array. Cuts the per-frame compaction cost from one
    ~1.2 ms 1M-slot sort per channel to one total (the mid/big/corner
    channels of a three-level inria frame).

    Returns a list of (n_set, idx (cap,), valid (cap,)) triples."""
    n = masks[0].shape[0]
    nch = len(masks)
    if nch == 1:
        return [_compact_channel(masks[0], caps[0])]
    shift = max(n.bit_length(), 1)
    assert shift + (nch + 1).bit_length() < 31
    iota = jnp.arange(n, dtype=jnp.int32)
    key = jnp.full(n, jnp.int32(nch << shift))
    for c, m in enumerate(masks):
        key = jnp.where(m, jnp.int32(c << shift) | iota, key)
    (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    # sentinel pad so the per-channel dynamic_slice below never clamps
    # (a clamped start would silently pull in the previous channel's
    # rows); validity is the exact channel-id match, so over-cap reads
    # into the next channel's run are rejected too
    maxcap = max(caps)
    skey = jnp.concatenate(
        [skey, jnp.full(maxcap, jnp.int32(nch << shift))])
    counts = [jnp.sum(m.astype(jnp.int32)) for m in masks]
    out = []
    off = jnp.zeros((), jnp.int32)
    for c, cap in enumerate(caps):
        head = jax.lax.dynamic_slice(skey, (off,), (cap,))
        idx = head & ((1 << shift) - 1)
        vld = jax.lax.shift_right_logical(head, shift) == c
        out.append((counts[c], jnp.minimum(jnp.where(vld, idx, 0),
                                           n - 1), vld))
        off = off + counts[c]
    return out


def _pool_grant(floor, desired, pool_pairs):
    """FLOOR-GUARANTEED proportional pool allocation (pre-snap): every
    tile first receives its floor (scaled down only if the floors alone
    oversubscribe the pool), and the surplus funds the extra above it
    proportionally. The former all-proportional scale let a few
    ultra-deep tiles starve everyone (the shell silhouette failure,
    tools/exp_shell.py)."""
    fsum = jnp.sum(floor).astype(jnp.float32)
    fscale = jnp.minimum(1.0, pool_pairs / jnp.maximum(fsum, 1.0))
    floor = jnp.minimum((floor.astype(jnp.float32) * fscale)
                        .astype(jnp.int32), floor)
    extra = desired - floor
    spare = (pool_pairs - jnp.sum(floor)).astype(jnp.float32)
    escale = jnp.clip(spare / jnp.maximum(
        jnp.sum(extra), 1).astype(jnp.float32), 0.0, 1.0)
    return floor + (extra.astype(jnp.float32) * escale).astype(jnp.int32)


def _block_snap(kept, desired, cap_steps, ntiles):
    """BLOCK SNAP (largest remainder): grant whole CHUNK-pair blocks so
    sum(ceil(kept/CHUNK)) == sum(granted blocks) <= cap_steps exactly.
    Tiles whose whole grant is sub-block ("must" tiles) sort FIRST — a
    block must be spent on them anyway, so they receive a full block of
    content; after them, the largest fractional remainders round up
    until the block budget is spent, the rest round down. Zero-sum at
    the same pool."""
    kq = (kept // CHUNK) * CHUNK
    rem = kept - kq
    must = (kq == 0) & (kept > 0)
    nup = cap_steps - jnp.sum(kq) // CHUNK
    prio = jnp.where(must, rem + CHUNK,
                     jnp.where(rem > 0, rem, -1))
    order = jnp.argsort(-prio)
    rank = jnp.zeros(ntiles, jnp.int32).at[order].set(
        jnp.arange(ntiles, dtype=jnp.int32))
    bonus = (rank < nup) & (prio > 0)
    return jnp.where(bonus, jnp.minimum(desired, kq + CHUNK), kq)


def _aligned_pack_steps(bases, kept, cap_steps, sorted_splat, mpad: int,
                        nseg: int, ntiles: int):
    """ALIGNED chunk layout: every tile's kept list is repositioned to
    start at its own pack-block boundary, so a pack block belongs to
    exactly ONE tile — no boundary-straddle block. Pack block j of tile
    t covers sorted rows [bases_t + j*128, +128): built by gathering the
    two covering block-rows (2*cap_blocks cheap 128-int rows) and
    rotating each row left by (bases_t mod 128) with 7 branch-free
    conditional rolls. Returns (pack_idx (cap_blocks*CHUNK,) int32,
    steps 5-tuple). ``bases`` is each tile's first sorted-row (the head
    pack passes the tile starts; the decimated-tail pack passes
    start + head_kept)."""
    cap_blocks = _pad_to(cap_steps, nseg)
    nblocks_t = (kept + CHUNK - 1) // CHUNK
    blk_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(nblocks_t).astype(jnp.int32)])
    total_blocks = blk_off[-1]
    bid = jnp.arange(cap_blocks, dtype=jnp.int32)
    bowner = jnp.clip(jnp.searchsorted(blk_off, bid, side="right")
                      .astype(jnp.int32) - 1, 0, ntiles - 1)
    blive = bid < total_blocks
    jb = bid - blk_off[bowner]
    nblk = mpad // CHUNK
    # dead slots get DISTINCT block ids: gathers with repeated indices
    # run ~1.7x slower on TPU (BENCHLOG round 2)
    base = jnp.where(blive, bases[bowner] + jb * CHUNK,
                     (bid % nblk) * CHUNK)
    s2d = sorted_splat.reshape(nblk, CHUNK)
    b0 = base // CHUNK
    brows = jnp.stack([b0, jnp.minimum(b0 + 1, nblk - 1)], -1)
    rows = jnp.take(s2d, brows.reshape(-1), axis=0) \
              .reshape(cap_blocks, 2 * CHUNK)
    sh = base % CHUNK
    k = 1
    while k < CHUNK:
        rows = jnp.where((sh & k)[:, None] > 0,
                         jnp.roll(rows, -k, axis=1), rows)
        k *= 2
    pack_idx = rows[:, :CHUNK].reshape(-1)
    if nseg == 1:
        # one grid step per pack block (lo = 0 always)
        step_tile = jnp.where(blive, bowner, ntiles)
        step_first = ((bid == blk_off[bowner]) & blive).astype(jnp.int32)
        step_lo = jnp.zeros(cap_blocks, jnp.int32)
        step_hi = jnp.where(blive,
                            jnp.clip(kept[bowner] - jb * CHUNK,
                                     0, CHUNK), 0)
        step_block = bid
    else:
        # MULTI-CHUNK grid steps over the packed stream (``nseg`` pack
        # blocks per step): tile t owns packed rows [pstart_t, pstart_t
        # + kept_t); steps are built direct-layout style at blk =
        # nseg*128 granularity — straddling steps run once per adjacent
        # tile with complementary [lo, hi) masks. Divides the fixed
        # ~0.66 us per-step sequencing cost that dominates deep-pool LOD
        # frames (6120 aligned steps at tile_w=64/mpt=768).
        blkp = CHUNK * nseg
        pstart = blk_off[:-1] * CHUNK
        pend = pstart + kept
        first_blk = pstart // blkp
        nsteps = jnp.where(kept > 0,
                           (pend + blkp - 1) // blkp - first_blk, 0)
        step_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(nsteps)
                                    .astype(jnp.int32)])
        total_steps = step_off[-1]
        cap_gsteps = cap_blocks // nseg + ntiles
        sid = jnp.arange(cap_gsteps, dtype=jnp.int32)
        owner = jnp.clip(
            jnp.searchsorted(step_off, sid, side="right")
            .astype(jnp.int32) - 1, 0, ntiles - 1)
        live_step = sid < total_steps
        step_tile = jnp.where(live_step, owner, ntiles)
        step_first = ((sid == step_off[owner])
                      & live_step).astype(jnp.int32)
        maxgblk = cap_blocks // nseg - 1
        gblk = jnp.where(
            live_step,
            jnp.clip(first_blk[owner] + (sid - step_off[owner]),
                     0, maxgblk),
            sid % (maxgblk + 1))
        gbase = gblk * blkp
        step_lo = jnp.where(live_step,
                            jnp.clip(pstart[owner] - gbase, 0, blkp),
                            0)
        step_hi = jnp.where(live_step,
                            jnp.clip(pend[owner] - gbase, 0, blkp),
                            0)
        step_block = gblk
    return pack_idx, (step_tile, step_first, step_block, step_lo,
                      step_hi)


def _bin_splats(mx, my, rad, valid, depth, ntx: int, nty: int,
                cap_pairs: int, ky: int = KY,
                max_per_tile: int | None = None,
                big_cap: int | None = None,
                mid_cap: int | None = None,
                mid_lo_cap: int | None = None,
                corner_cap: int | None = None,
                budget=None, tail=None, tile_w: int = TILE_W,
                records=None, nseg: int = 1, ext=None,
                tail_decim: int | None = None):
    """Chunk-aligned per-tile splat lists via ONE fused sort.

    Each splat emits K = KX*ky candidate (tile, splat) pairs keyed by a
    combined int32 ``tile << db | quantized_depth`` — a single sort groups
    pairs into per-tile runs that are front-to-back within each run (the
    classic 3DGS combined tile|depth radix key), replacing round 1's
    two-pass global-depth-argsort + record-permute + tile-sort. Depth is
    quantized to the remaining 31 - ceil(log2(ntiles+2)) bits (≥ 19 even
    at 8K resolution). Candidate keys enter the sort in CONCATENATED
    stream order (K contiguous blocks), not interleaved — the unstable
    sort doesn't care, and the block layout fuses into the sort input
    without a strided transpose (~3 ms at 4M pairs, tools/exp_bin.py).

    Two layouts share one step-map builder (owner via searchsorted over
    the per-tile step-count prefix; [lo, hi) masks are BLOCK-LOCAL row
    ranges):

    * exact/direct (``max_per_tile=None``): kernel steps stream the
      contiguous CHUNK-blocks of the sorted pair array itself; the pack
      array IS the sorted order (one slice, no gather). ``cap_pairs``
      drops tail pairs positionally on overflow. When ``records`` is
      given, the record columns RIDE THE SORT as f32 payload operands
      (PAYLOAD-SORT): a 4.2M-slot unstable sort carrying 10 payload
      columns costs ~5.3 ms on v5e while the row gather it replaces
      costs ~30 ms at 4.2M x 12 (tools/exp_gather.py) — sort passes
      stream HBM sequentially, gathers pay random row access. The first
      returned value is then the packed (cap_pairs, _ROWS) record array
      itself instead of pack indices. Only the non-differentiable path
      may use this (the training path needs the ``jnp.take`` pack whose
      VJP is the gradient scatter).
    * capped direct (``max_per_tile=m``): each tile keeps only its
      nearest m pairs (``hi = startc + min(count, m)`` — depth-ordered
      LOD, farthest splats dropped first) and the pack array gathers only
      the ≤ ntiles·(m/CHUNK + 1) blocks the steps touch, at BLOCK
      granularity — a 128-contiguous-int row gather, ~40x faster than the
      former fixed-stride per-element gather (tools/exp_bin.py).

    ``big_cap`` enables TWO-LEVEL binning: splats whose radius exceeds
    the KX×ky span limit (callers must project with
    ``max_radius=level2_max_radius()``) emit through a coarse KX2×KY2
    fan instead of being radius-clamped; ``big_cap`` is the static budget
    of such splats per frame (overflowing ones are dropped entirely and
    counted).

    ``tail=(alpha_full (N,), colors (N, 3))`` enables the LOD tail proxy
    (see module comment above :func:`_pack_tail_aux`): per-pair quantized
    slab aux rides the sort as one extra int32 payload, and the pairs the
    LOD drops are summed per tile into a homogeneous slab.

    Returns (pack_idx (CAP,) int32 splat indices — or, with ``records``
    in exact mode, the packed (CAP, _ROWS) record array itself, steps — the
    (tile, first, block, lo, hi) scalar-prefetch tuple, visited (ntiles,)
    bool, overflow (scalar, in pairs), overflow_big (scalar: large splats
    beyond big_cap), tail_slab — None, or (tail_a (ntiles,),
    tail_rgb (ntiles, 3)) when ``tail`` is given).

    ``ext`` ((N, 2) per-axis bbox extents, see _project_math): tile spans
    and level routing become per-axis (an elongated splat routes to the
    cheapest fan that covers BOTH its axes); None degrades to the
    isotropic circumscribed footprint."""
    n = mx.shape[0]
    ntiles = ntx * nty
    r = rad.astype(jnp.float32)
    if ext is not None:
        rx, ry = ext[:, 0].astype(jnp.float32), ext[:, 1].astype(jnp.float32)
    else:
        rx = ry = r

    tile_bits = max(ntiles.bit_length(), 1)   # ids 0..ntiles-1 + sentinel
    # depth bits capped at 22: the f32 quantization product must stay
    # integer-exact (2^22 < 2^24 mantissa), or the deepest splat's qd can
    # round up into the tile bits and leak to the head of the next tile
    db = min(31 - tile_bits, 22)
    qmax = (1 << db) - 1
    dfin = jnp.where(valid, depth, jnp.inf)
    dmin = jnp.min(jnp.where(valid, depth, jnp.inf))
    dmax = jnp.max(jnp.where(valid, depth, -jnp.inf))
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
    span = jnp.maximum(dmax - dmin, 1e-9)
    qd = jnp.clip((dfin - dmin) / span * qmax, 0.0, float(qmax))
    qd = jnp.clip(qd.astype(jnp.int32), 0, qmax)   # int-space re-clamp
    qd = jnp.where(valid, qd, 0)

    # level-1 fan: splats whose PER-AXIS extents fit the KX×ky span
    # limits (all splats when two-level binning is off — projection
    # already clamped their radii)
    r1x = (KX - 1) * tile_w // 2 - 1
    r1y = (ky - 1) * TILE_H // 2 - 1
    small = valid if big_cap is None else (valid & (rx <= r1x)
                                           & (ry <= r1y))
    overflow_corner = jnp.zeros((), jnp.int32)
    overflow_big = jnp.zeros((), jnp.int32)
    comp = []     # budgeted side channels: (mask, cap, kx, ky, corner?)
    if corner_cap is not None and ky == 2 and KX == 2:
        # K-REDUCTION: most small splats cross at most ONE tile grid
        # line, so a 2-slot fan covers them — HALF the static sort
        # slots of the 2x2 fan. The minority crossing both a vertical
        # and a horizontal line (up to 4 tiles) route through a
        # ``corner_cap``-budgeted compacted side channel exactly like
        # the big-splat level-2 path (overflowers are dropped whole and
        # counted in overflow_big_splats).
        tx0 = jnp.floor((mx - rx) / tile_w).astype(jnp.int32) \
                 .clip(0, ntx - 1)
        tx1 = jnp.floor((mx + rx) / tile_w).astype(jnp.int32) \
                 .clip(0, ntx - 1)
        ty0 = jnp.floor((my - ry) / TILE_H).astype(jnp.int32) \
                 .clip(0, nty - 1)
        ty1 = jnp.floor((my + ry) / TILE_H).astype(jnp.int32) \
                 .clip(0, nty - 1)
        corner = small & (tx1 > tx0) & (ty1 > ty0)
        lvl1 = small & ~corner
        keys = _emit_pair(mx, my, rx, ry, lvl1, qd, ntx, nty, db, tile_w)
        comp.append((corner, corner_cap, KX, ky, True))
    else:
        keys = _emit_fan(mx, my, rx, ry, r, small, qd, KX, ky, ntx, nty,
                         db, tile_w)
    ids = [jnp.tile(jnp.arange(n, dtype=jnp.int32), len(keys))]
    pay_src = [(None, len(keys))]
    if tail is not None:
        sent1 = (ntx * nty) << db
        n_pairs = sum((k != sent1).astype(jnp.int32) for k in keys)
        aux_splat = _pack_tail_aux(tail[0], tail[1], n_pairs,
                                   TILE_H * tile_w)
        auxs = [jnp.tile(aux_splat, len(keys))]
    if big_cap is not None:
        # budgeted coarse fans for LARGE splats: channel indices compact
        # scatter-free, their binning columns ride one small row gather,
        # and their fan keys join the same single sort. With ``mid_cap``
        # the big subset splits THREE ways by radius (level-1 <= r1 <
        # mid <= rm < coarse): trained scenes' log-normal radius tails
        # put ~85% of over-r1 splats under the 47 px mid ceiling, where
        # the 16-slot fan costs 4x fewer sort slots than the 64-slot
        # coarse fan (tools/exp_census.py — the round-3 inria 29 dB floor
        # was 129k of 192k big splats dropped whole by a coarse-only
        # n/16 budget).
        if mid_cap is not None:
            kxm = _kxm(tile_w)
            rmx = (kxm - 1) * tile_w // 2 - 1
            rmy = (KY_M - 1) * TILE_H // 2 - 1
            fits_mid = (rx <= rmx) & (ry <= rmy)
            over1 = valid & ~small
            if mid_lo_cap is not None:
                # four-level binning: the (15, 31] px bulk of trained
                # scenes' log-normal tails rides the half-size mid-lo fan
                kxl = _kxml(tile_w)
                rlx = (kxl - 1) * tile_w // 2 - 1
                rly = (KY_ML - 1) * TILE_H // 2 - 1
                fits_lo = (rx <= rlx) & (ry <= rly)
                comp.append((over1 & fits_lo, mid_lo_cap, kxl, KY_ML,
                             False))
                comp.append((over1 & ~fits_lo & fits_mid, mid_cap, kxm,
                             KY_M, False))
            else:
                comp.append((over1 & fits_mid, mid_cap, kxm, KY_M,
                             False))
            comp.append((over1 & ~fits_mid, big_cap,
                         _kx2(tile_w), KY2, False))
        else:
            comp.append((valid & ~small, big_cap, _kx2(tile_w), KY2,
                         False))
    if comp:
        # ALL budgeted channels (corner/mid/coarse) compact through ONE
        # shared sort (_compact_channels — the masks are disjoint by
        # construction: corner ⊂ small, mid/coarse ⊂ ~small)
        side = jnp.stack([mx, my, rx, ry, r, qd.astype(jnp.float32)], -1)
        results = _compact_channels([c[0] for c in comp],
                                    [c[1] for c in comp])
        for (_, ch_cap, ch_kx, ch_ky, is_corner), (nset, bidx, bvalid) \
                in zip(comp, results):
            ov = jnp.maximum(nset - ch_cap, 0)
            if is_corner:
                overflow_corner = overflow_corner + ov
            else:
                overflow_big = overflow_big + ov
            bs = jnp.take(side, bidx, axis=0)           # (ch_cap, 6)
            bkeys = _emit_fan(bs[:, 0], bs[:, 1], bs[:, 2], bs[:, 3],
                              bs[:, 4], bvalid,
                              bs[:, 5].astype(jnp.int32), ch_kx, ch_ky,
                              ntx, nty, db, tile_w)
            keys += bkeys
            ids.append(jnp.tile(bidx, len(bkeys)))
            pay_src.append((bidx, len(bkeys)))
            if tail is not None:
                np_big = sum((k != sent1).astype(jnp.int32)
                             for k in bkeys)
                aux_big = _pack_tail_aux(jnp.take(tail[0], bidx),
                                         jnp.take(tail[1], bidx, axis=0),
                                         np_big, TILE_H * tile_w)
                auxs.append(jnp.tile(aux_big, len(bkeys)))
    # concatenated stream order (contiguous blocks), NOT interleaved:
    # the unstable sort doesn't care, and the block layout fuses into the
    # sort input without a strided transpose (~3 ms at 4M pairs,
    # tools/exp_bin.py)
    key_flat = jnp.concatenate(keys)                        # (M,)
    m = key_flat.shape[0]
    splat_of_pair = jnp.concatenate(ids)

    # one sort by (tile, depth); the payload carries splat ids so the
    # pack gather below needs no permutation indirection. UNSTABLE is
    # ~1.8x faster (8 vs 14 ms at 6M on v5e, tools/exp_sort.py) — ties
    # (same tile, same quantized depth: ~2^-21 of the depth range)
    # composite in arbitrary but deterministic order. The tail-proxy aux
    # rides as ONE extra payload (sorting is far cheaper than any
    # post-sort per-pair gather, tools/exp_gather.py).
    sorted_aux = None
    sorted_splat = None
    sorted_cols = None
    payload = records is not None and max_per_tile is None
    if payload:
        # PAYLOAD-SORT: the 9 real record columns ride the sort instead
        # of a post-sort (CAP, 12) row gather — sequential sort passes
        # vs random row access, ~6x cheaper at 4M pairs
        # (tools/exp_gather.py). The splat-id payload is dropped: exact
        # mode's pack was its only consumer.
        nreal = _CB2 + 1
        tabs = [(records if idx is None
                 else jnp.take(records, idx, axis=0), k)
                for idx, k in pay_src]
        paycols = tuple(
            jnp.concatenate([jnp.tile(tab[:, c], k) for tab, k in tabs])
            for c in range(nreal))
        ops = (key_flat,) + paycols
        if tail is not None:
            ops += (jnp.concatenate(auxs),)
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        sorted_key = out[0]
        sorted_cols = out[1:1 + nreal]
        if tail is not None:
            sorted_aux = out[-1]
    elif tail is not None:
        sorted_key, sorted_splat, sorted_aux = jax.lax.sort(
            (key_flat, splat_of_pair, jnp.concatenate(auxs)),
            num_keys=1, is_stable=False)
    else:
        sorted_key, sorted_splat = jax.lax.sort(
            (key_flat, splat_of_pair), num_keys=1, is_stable=False)
    mpad = _pad_to(m, CHUNK * nseg)
    if mpad > m:
        if sorted_splat is not None:
            sorted_splat = jnp.concatenate(
                [sorted_splat, jnp.zeros(mpad - m, jnp.int32)])
        if sorted_aux is not None:
            sorted_aux = jnp.concatenate(
                [sorted_aux, jnp.zeros(mpad - m, jnp.int32)])

    tvec = jnp.arange(ntiles + 1, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_key, tvec << db,
                             side="left").astype(jnp.int32)  # (ntiles+1,)
    startc = start[:-1]
    count = start[1:] - startc                               # (ntiles,)
    if max_per_tile is not None:
        # LOD as a GLOBAL STEP POOL allocated by per-tile need. Two ideas:
        #
        # 1. A uniform "nearest max_per_tile pairs per tile" cap wastes
        #    its static budget on inactive tiles while truncating dense
        #    ones, and adjacent tiles truncating at different depths show
        #    as tile-aligned bands/slivers (21.6 dB on the fog scene's
        #    densest view, BENCHLOG). Instead each tile DESIRES its pairs
        #    up to a depth cut: its max_per_tile-th pair's depth,
        #    3x3-max-pooled over the tile grid so neighbors agree how
        #    deep to composite (never below the tile's own
        #    min(count, max_per_tile) — a tile whose content starts deep
        #    must not be emptied by shallow neighbors), hard-capped at
        #    4x max_per_tile.
        # 2. The STATIC pool (cap_steps = ntiles * (max_per_tile/128 + 1)
        #    — the same pack/step cost as the uniform cap) is shared:
        #    when total desire exceeds it, every tile scales down
        #    proportionally (graceful, never whole-tile loss).
        qmask = (1 << db) - 1
        skey_pad = (jnp.concatenate(
            [sorted_key, jnp.full(mpad - m, jnp.int32(-1))])
            if mpad > m else sorted_key)
        # ``budget`` (temporal adaptive LOD): per-tile desired depth from
        # the previous frame's executed depth instead of the uniform
        # max_per_tile — early-saturating tiles release pool capacity to
        # tiles that genuinely need deep lists. The static pool size is
        # still governed by max_per_tile. A (ntiles, 2) budget carries a
        # second DRY-NEED channel (tiles that walked their whole
        # truncated list without saturating want their full list): it
        # raises ``desired`` — funded from pool SURPLUS only — but never
        # the floor, so on scenes where nothing saturates (fog grazing
        # views: every tile "dry") it cannot distort the baseline
        # allocation, while on surface scenes the idle pool flows to the
        # starved silhouette tiles (tools/exp_shell.py).
        dry_need = None
        if budget is not None and budget.ndim == 2:
            budget, dry_need = budget[:, 0], budget[:, 1]
        want = max_per_tile if budget is None else budget
        nthr = jnp.minimum(count, want)
        cut_i = jnp.clip(startc + nthr - 1, 0, mpad - 1)
        cut_qd = jnp.where(count > 0, jnp.take(skey_pad, cut_i) & qmask, 0)
        g = cut_qd.reshape(nty, ntx)
        gp = jnp.pad(g, 1, mode="edge")
        pooled = jnp.max(jnp.stack(
            [gp[i:i + nty, j:j + ntx] for i in range(3)
             for j in range(3)]), 0).reshape(-1)
        kend = jnp.searchsorted(
            sorted_key, (tvec[:-1] << db) | pooled,
            side="right").astype(jnp.int32)
        need = jnp.maximum(nthr, kend - startc)
        if dry_need is not None:
            need = jnp.maximum(need, jnp.minimum(count, dry_need))
        desired = jnp.clip(need, 0,
                           jnp.minimum(count, LOD_DESIRE_CAP
                                       * max_per_tile))
        # the REAL static cost is BLOCKS (grid steps + packed rows =
        # cap_steps x 128 regardless of how full each block is), so the
        # pool is sized and granted in block units: cap_steps =
        # ceil(ntiles*mpt/128) blocks, and the pair-level grant below is
        # snapped to block granularity by a largest-remainder pass —
        # packed rows carry ~100% content instead of ~60% (the old
        # +ntiles ceil-reserve was 2040 blocks = 261k gathered rows of
        # padding per frame at tile_w=32).
        cap_steps = -(-ntiles * max_per_tile // CHUNK)
        pool_pairs = cap_steps * CHUNK
        # floor = the uniform-cap share (or its temporal budget); the
        # surplus pool funds the pooled-depth-cut EXTRA proportionally,
        # then grants snap to whole 128-pair blocks (largest remainder)
        kept = _pool_grant(jnp.minimum(nthr, desired), desired,
                           pool_pairs)
        kept = _block_snap(kept, desired, cap_steps, ntiles)
        overflow = jnp.sum(count - kept)
        tail_out = None
        if tail_decim is not None:
            # DECIMATED-TAIL grant: the NEXT-deeper pairs beyond the
            # head grant composite at 2x2-decimated tile resolution
            # (quarter pixel cost per pair) from a SECOND pool averaging
            # ``tail_decim`` pairs/tile — uniform floor + proportional
            # surplus by remaining depth, block-snapped. The tail only
            # ever extends each tile's sorted prefix, so head+tail walk
            # the same front-to-back order.
            remc = count - kept
            cap_steps_tl = -(-ntiles * tail_decim // CHUNK)
            want_tl = jnp.minimum(remc, LOD_DESIRE_CAP * tail_decim)
            kept_tl = _pool_grant(jnp.minimum(want_tl, tail_decim),
                                  want_tl, cap_steps_tl * CHUNK)
            kept_tl = _block_snap(kept_tl, want_tl, cap_steps_tl,
                                  ntiles)
            overflow = jnp.sum(count - kept - kept_tl)
        maxblk = mpad // CHUNK - 1
    else:
        # the cap never needs to exceed the (padded) emission count;
        # multi-chunk grid steps (nseg > 1) stream BLK-sized blocks
        blk = CHUNK * nseg
        cap_pairs = min(_pad_to(min(cap_pairs, mpad), blk), mpad)
        total_pairs = start[ntiles]
        overflow = jnp.maximum(total_pairs - cap_pairs, 0)    # in pairs
        # global cap: pairs beyond cap_pairs are dropped positionally (the
        # sorted array's tail = the highest tile ids). Detect via
        # overflow / return_stats; max_per_tile is the graceful knob.
        kept = jnp.clip(jnp.minimum(count, cap_pairs - startc), 0)
        cap_steps = cap_pairs // blk + ntiles    # ≤1 boundary step/tile
        maxblk = cap_pairs // blk - 1

    if max_per_tile is not None:
        # ALIGNED chunk layout (see _aligned_pack_steps). The records
        # pack stays ONE block-granular row gather in block order (~40x
        # faster than per-element packing, tools/exp_bin.py).
        pack_idx, steps = _aligned_pack_steps(
            startc, kept, cap_steps, sorted_splat, mpad, nseg, ntiles)
        if tail_decim is not None:
            pack_tl, steps_tl = _aligned_pack_steps(
                startc + kept, kept_tl, cap_steps_tl, sorted_splat,
                mpad, _TAIL_SEG, ntiles)
            tail_out = (pack_tl, steps_tl, kept_tl)
    else:
        # DIRECT chunk layout (exact mode): kernel step s processes one
        # contiguous CHUNK-block of the sorted pair array itself, masked
        # to the owning tile's BLOCK-LOCAL [lo, hi) row range — blocks
        # straddling a tile boundary run once per adjacent tile with
        # complementary masks, and the pack array IS the sorted head
        # (one slice, no gather).
        end = startc + kept
        first_block = startc // blk
        nsteps = jnp.where(kept > 0,
                           (end + blk - 1) // blk - first_block, 0)
        step_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(nsteps).astype(jnp.int32)])
        total_steps = step_off[-1]
        sid = jnp.arange(cap_steps, dtype=jnp.int32)
        owner = jnp.clip(jnp.searchsorted(step_off, sid, side="right")
                         .astype(jnp.int32) - 1, 0, ntiles - 1)
        live_step = sid < total_steps
        step_tile = jnp.where(live_step, owner, ntiles)
        step_first = ((sid == step_off[owner])
                      & live_step).astype(jnp.int32)
        orig_block = jnp.where(
            live_step,
            jnp.clip(first_block[owner] + (sid - step_off[owner]), 0,
                     maxblk),
            sid % (maxblk + 1))
        blk_base = orig_block * blk
        step_lo = jnp.where(live_step,
                            jnp.clip(startc[owner] - blk_base, 0, blk),
                            0)
        step_hi = jnp.where(live_step,
                            jnp.clip(end[owner] - blk_base, 0, blk), 0)
        step_block = orig_block
        if payload:
            # assemble (cap_pairs, _ROWS) packed records from the sorted
            # payload columns; pairs past cap_pairs (positional overflow)
            # and the 3 pad columns are zeros
            def _fit(c):
                if c.shape[0] >= cap_pairs:
                    return jax.lax.slice(c, (0,), (cap_pairs,))
                return jnp.concatenate(
                    [c, jnp.zeros(cap_pairs - c.shape[0], c.dtype)])
            zero = jnp.zeros(cap_pairs, jnp.float32)
            pack_idx = jnp.stack(
                [_fit(c) for c in sorted_cols]
                + [zero] * (_ROWS - len(sorted_cols)), -1)
        else:
            pack_idx = jax.lax.slice(sorted_splat, (0,), (cap_pairs,))
        steps = (step_tile, step_first, step_block, step_lo, step_hi)
        tail_out = None
    visited = kept > 0                                       # (ntiles,)
    tail_slab = None
    if tail is not None:
        # homogeneous-slab sums over each tile's DROPPED range
        # [startc+kept, start[t+1]) — LOD depth-cut drops and positional
        # cap drops alike. tail_la = per-tile optical thickness
        # Σ −log1p(−α_eff); tail_rgb = energy-weighted mean color.
        s = _tail_sums(sorted_aux, startc + kept, start[1:])
        tail_rgb = (s[1:4] / jnp.maximum(s[0:1], 1e-9)).T    # (ntiles, 3)
        tail_slab = (s[0], tail_rgb)
    # (kept, count) per tile: with tile_exec telemetry they distinguish a
    # tile that SATURATED (exec < kept — needs less next frame) from one
    # that RAN DRY (exec == kept < count — jump its budget straight to
    # count; 1.5x-growth takes ~7 frames to recover a 10x truncation)
    # corner-channel overflowers are dropped whole, like big-splat ones
    overflow_big = overflow_big + overflow_corner
    return (pack_idx, steps, visited, overflow, overflow_big, tail_slab,
            (kept, count), tail_out)


def _pack_records(records: jnp.ndarray, pack_idx: jnp.ndarray):
    """One row-gather of (N, 16) records into sorted-pair order (CAP, 16).
    Rows past each tile's [lo, hi) pair range are masked in-kernel, so no
    slot masking is needed here."""
    return jnp.take(records, pack_idx, axis=0)              # (CAP, 16)


_PIX = TILE_H * TILE_W          # pixels per tile, flattened


def _composite_kernel(step_tile_ref, step_first_ref, step_block_ref,
                      step_lo_ref, step_hi_ref, rec_ref,
                      r_ref, g_ref, b_ref, t_ref, e_ref, sat_ref, *,
                      ntx, ntiles, tile_w, nseg=1):
    """Whole-chunk vectorized compositing over a tile-flattened (1, 2048)
    pixel block — no per-splat scalar loop.

    Grid step s streams the contiguous sorted-pair block
    ``step_block[s]`` masked to the owning tile's [lo, hi) pair range
    (direct layout — boundary blocks run once per adjacent tile).

    Front-to-back alpha compositing is a linear recurrence
    ``T_{i+1} = T_i (1-α_i)``; its prefix is computed in closed form as
    ``exp(L @ log(1-α))`` with L strictly-lower-triangular — one (C,C) x
    (C,P) MXU matmul — so all C splats of the chunk composite in parallel.
    The color accumulation is a second MXU contraction over the splat axis.
    """
    si = pl.program_id(0)
    tile = step_tile_ref[si]
    pix = TILE_H * tile_w

    @pl.when(tile < ntiles)
    def _():
        @pl.when(step_first_ref[si] == 1)
        def _init():
            r_ref[0] = jnp.zeros((1, pix), jnp.float32)
            g_ref[0] = jnp.zeros((1, pix), jnp.float32)
            b_ref[0] = jnp.zeros((1, pix), jnp.float32)
            t_ref[0] = jnp.ones((1, pix), jnp.float32)
            e_ref[0] = jnp.zeros((1, 128), jnp.int32)
            sat_ref[0] = 0

        # early-out: once every pixel of the tile saturated (T < eps, the
        # 3DGS termination rule), remaining chunks — typically most of a
        # deep tile's list — cost one scalar SMEM read. The flag is set by
        # the chunk body from the T it just computed.
        @pl.when(sat_ref[0] == 0)
        def _run():
            lo = step_lo_ref[si]
            hi = step_hi_ref[si]
            if nseg == 1:
                # executed-depth telemetry: pairs this tile actually
                # composited before saturating (drives temporal LOD
                # budgets); nseg > 1 accumulates per sub-chunk instead
                # so a mid-step saturation doesn't overcount
                e_ref[0] = e_ref[0] + (hi - lo)
                _composite_chunk(rec_ref, r_ref, g_ref, b_ref, t_ref,
                                 sat_ref, tile, ntx, lo, hi, tile_w)
            else:
                # MULTI-CHUNK step (exact mode): nseg CHUNK-sub-blocks
                # composite inside one grid step with the saturation
                # early-out re-checked between them — exact-mode grid
                # steps are mostly skipped ones, and their fixed
                # sequencing cost (~0.66 us/step) was the largest single
                # line of the exact frame (BENCHLOG round-3 inventory).
                for g in range(nseg):
                    glo = jnp.clip(lo - g * CHUNK, 0, CHUNK)
                    ghi = jnp.clip(hi - g * CHUNK, 0, CHUNK)

                    @pl.when((ghi > glo) & (sat_ref[0] == 0))
                    def _(g=g, glo=glo, ghi=ghi):
                        e_ref[0] = e_ref[0] + (ghi - glo)
                        _composite_chunk(rec_ref, r_ref, g_ref, b_ref,
                                         t_ref, sat_ref, tile, ntx, glo,
                                         ghi, tile_w, row0=g * CHUNK)


def _composite_chunk(rec_ref, r_ref, g_ref, b_ref, t_ref, sat_ref, tile,
                     ntx, lo, hi, tile_w=TILE_W, row0=0, decim=1):
    pix = (TILE_H // decim) * (tile_w // decim)
    twd = tile_w // decim
    shift = twd.bit_length() - 1             # tile widths are powers of 2
    ty0 = (tile // ntx) * TILE_H
    tx0 = (tile % ntx) * tile_w
    # flat pixel index → (x, y) within the tile. ``decim`` > 1 evaluates
    # the DECIMATED grid: one sample per decim x decim pixel quad, at
    # the quad center (x*decim + decim/2) — the tail composite's
    # quarter-cost resolution (upsampled bilinearly in finalize).
    i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    px = (jax.lax.bitwise_and(i, twd - 1) * decim + tx0
          ).astype(jnp.float32) + 0.5 * decim
    py = (jax.lax.shift_right_logical(i, shift) * decim + ty0
          ).astype(jnp.float32) + 0.5 * decim

    # ``row0``: static sub-block offset within a multi-chunk record block
    col = lambda c: rec_ref[row0:row0 + CHUNK, c:c + 1]      # (C, 1)
    # elementwise VPU quadratic. An MXU formulation (power = f·g with a
    # rank-6 tile-local bilinear form, one (C, 8)x(8, P) HIGHEST matmul
    # replacing these ~10 VPU ops) was built and measured 11% SLOWER
    # end-to-end (24.4 vs 27.3 FPS ABA, BENCHLOG 2026-08-19): K=8
    # uses 6% of the 128-deep systolic array and HIGHEST triples the
    # passes, so the matmul costs more than the VPU ops it replaces.
    dx = px - col(_MX)                              # (C, P)
    dy = py - col(_MY)
    power = (-0.5 * (col(_CA) * dx * dx + col(_CC) * dy * dy)
             - col(_CB) * dx * dy)
    alpha = col(_OP) * jnp.exp(power)
    alpha = jnp.minimum(alpha, _ALPHA_MAX)
    # rows outside this tile's block-local [lo, hi) row range belong to a
    # neighboring tile (boundary block) or the sentinel tail — mask them
    rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    live = (rows >= lo) & (rows < hi)
    alpha = jnp.where(live & (alpha >= _ALPHA_MIN), alpha, 0.0)

    # exclusive transmittance prefix over the splat (sublane) axis as a
    # MULTIPLICATIVE DOUBLING SCAN of (1-α): log2(C) shifted multiplies on
    # the VPU — no transcendentals, no MXU pass. Beats both the
    # exp(Ltri @ log(1-α)) formulation AND a two-level hybrid (3 VPU steps
    # + group-level MXU extract/prefix/broadcast — measured 4.6 FPS SLOWER
    # on the flagship, BENCHLOG round 2: the small matmuls + 16-row
    # log/exp cost more than the 4 saved full-size multiplies).
    om = 1.0 - alpha                                     # (C, P)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, pix), 0)
    p = om
    s = 1
    while s < CHUNK:
        p = p * jnp.where(ridx >= s, pltpu.roll(p, shift=s, axis=0), 1.0)
        s *= 2
    pre = jnp.where(ridx >= 1, pltpu.roll(p, shift=1, axis=0), 1.0)
    tprod = p[CHUNK - 1:CHUNK]
    t_in = t_ref[0]                                      # (1, P)
    w = alpha * pre * t_in                               # (C, P)

    # rgb accumulation: contract the splat axis on the MXU
    rgb = jax.lax.dot_general(
        rec_ref[row0:row0 + CHUNK, _CR:_CB2 + 1], w,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (3, P)
    r_ref[0] = r_ref[0] + rgb[0:1]
    g_ref[0] = g_ref[0] + rgb[1:2]
    b_ref[0] = b_ref[0] + rgb[2:3]
    t_new = t_in * tprod                                 # full-chunk prod
    t_ref[0] = t_new
    sat_ref[0] = (jnp.max(t_new) < _T_EPS).astype(jnp.int32)


def _composite_call(records, steps, nty, ntx, interpret,
                    tile_w: int = TILE_W, nseg: int = 1):
    """Returns 4 tile-flattened planes (ntiles+1, 1, _PIX): r, g, b, T,
    plus ``exec`` (ntiles+1, 1, 128) int32 — the pairs each tile actually
    composited before transmittance saturation (lane-replicated; rows of
    never-visited tiles are UNINITIALIZED — mask with ``visited``). Row
    ``ntiles`` is the sentinel dump for unused steps; use :func:`_untile`
    for image-shaped planes. ``steps`` is the (tile, first, block, lo, hi)
    scalar-prefetch tuple from _bin_splats."""
    ntiles = nty * ntx
    pix = TILE_H * tile_w
    step_tile, step_first, step_block, step_lo, step_hi = steps
    nsteps = step_tile.shape[0]
    kernel = functools.partial(_composite_kernel, ntx=ntx, ntiles=ntiles,
                               tile_w=tile_w, nseg=nseg)

    def out_map(si, st, sf, sb, sl, sh):
        return (jnp.minimum(st[si], ntiles), 0, 0)  # sentinel → extra row

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((nseg * CHUNK, _ROWS),
                         lambda si, st, sf, sb, sl, sh: (sb[si], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, pix), out_map,
                                memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((1, 1, 128), out_map, memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    out_shape = ([jax.ShapeDtypeStruct((ntiles + 1, 1, pix),
                                       jnp.float32)] * 4
                 + [jax.ShapeDtypeStruct((ntiles + 1, 1, 128), jnp.int32)])
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(step_tile, step_first, step_block, step_lo, step_hi, records)


def _composite_tail_kernel(step_tile_ref, step_first_ref, step_block_ref,
                           step_lo_ref, step_hi_ref, thead_ref, rec_ref,
                           r_ref, g_ref, b_ref, t_ref, sat_ref, *,
                           ntx, ntiles, tile_w, decim, nseg=1):
    """DECIMATED-TAIL composite: same front-to-back chunk body on a
    decim x decim-decimated tile grid, entered at the HEAD composite's
    per-quad transmittance (``thead_ref``, pre-decimated 2x2 means). A
    tile whose head already saturated skips its entire tail at init —
    the tail is free exactly where content is opaque. ``nseg`` chunk
    sub-blocks composite per grid step (saturation re-checked between
    them) to amortize the fixed per-step sequencing cost over the
    decim²-smaller bodies."""
    si = pl.program_id(0)
    tile = step_tile_ref[si]
    pixd = (TILE_H // decim) * (tile_w // decim)

    @pl.when(tile < ntiles)
    def _():
        @pl.when(step_first_ref[si] == 1)
        def _init():
            r_ref[0] = jnp.zeros((1, pixd), jnp.float32)
            g_ref[0] = jnp.zeros((1, pixd), jnp.float32)
            b_ref[0] = jnp.zeros((1, pixd), jnp.float32)
            t0 = thead_ref[0]
            t_ref[0] = t0
            sat_ref[0] = (jnp.max(t0) < _T_EPS).astype(jnp.int32)

        lo = step_lo_ref[si]
        hi = step_hi_ref[si]
        if nseg == 1:
            @pl.when(sat_ref[0] == 0)
            def _run():
                _composite_chunk(rec_ref, r_ref, g_ref, b_ref, t_ref,
                                 sat_ref, tile, ntx, lo, hi, tile_w,
                                 decim=decim)
        else:
            for g in range(nseg):
                glo = jnp.clip(lo - g * CHUNK, 0, CHUNK)
                ghi = jnp.clip(hi - g * CHUNK, 0, CHUNK)

                @pl.when((ghi > glo) & (sat_ref[0] == 0))
                def _(g=g, glo=glo, ghi=ghi):
                    _composite_chunk(rec_ref, r_ref, g_ref, b_ref,
                                     t_ref, sat_ref, tile, ntx, glo,
                                     ghi, tile_w, row0=g * CHUNK,
                                     decim=decim)


def _decimate_t(t_plane, tile_w: int, decim: int):
    """(ntiles+1, 1, pix) head transmittance → (ntiles+1, 1, pix/d²)
    per-quad 2x2 means (the tail kernel's entry T)."""
    nt1 = t_plane.shape[0]
    t4 = t_plane.reshape(nt1, TILE_H // decim, decim,
                         tile_w // decim, decim)
    return jnp.mean(t4, axis=(2, 4)).reshape(
        nt1, 1, (TILE_H // decim) * (tile_w // decim))


def _composite_tail_call(records, steps, t_head, nty, ntx, interpret,
                         tile_w: int = TILE_W, decim: int = 2,
                         nseg: int = 1):
    """Run the decimated-tail composite. Returns (r, g, b, t) planes of
    shape (ntiles+1, 1, pix/decim²); ``t`` is ABSOLUTE transmittance
    (head entry x tail product) at the decimated samples."""
    ntiles = nty * ntx
    pixd = (TILE_H // decim) * (tile_w // decim)
    step_tile, step_first, step_block, step_lo, step_hi = steps
    nsteps = step_tile.shape[0]
    kernel = functools.partial(_composite_tail_kernel, ntx=ntx,
                               ntiles=ntiles, tile_w=tile_w, decim=decim,
                               nseg=nseg)

    def out_map(si, st, sf, sb, sl, sh):
        return (jnp.minimum(st[si], ntiles), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, pixd), out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((nseg * CHUNK, _ROWS),
                         lambda si, st, sf, sb, sl, sh: (sb[si], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, pixd), out_map,
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    out_shape = [jax.ShapeDtypeStruct((ntiles + 1, 1, pixd),
                                      jnp.float32)] * 4
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(step_tile, step_first, step_block, step_lo, step_hi, t_head,
      records)


# ---------------------------------------------------------------------------
# Differentiable composite: custom-VJP Pallas forward/backward pair.
#
# The forward is the production kernel plus a per-step ENTRY-transmittance
# checkpoint (nsteps, 1, PIX) — exact backward reconstruction without the
# log-underflow of back-dividing T_final (deep tiles saturate f32). With
# the compact LOD layout the checkpoint is ntiles*pad(mpt)/CHUNK blocks
# (~66 MB at 1080p/mpt=384), which is what makes 1M-splat training fit.
# The backward sweeps each tile's steps in REVERSE, carrying one (1, PIX)
# suffix plane SB = Σ_{later splats} (c·dC)·w, and emits per-packed-row
# gradients; jnp.take's native VJP scatter-adds them onto the (N, 12)
# record table, from which JAX autodiff reaches the projection math.
# ---------------------------------------------------------------------------


def _composite_kernel_ckpt(step_tile_ref, step_first_ref, step_block_ref,
                           step_lo_ref, step_hi_ref, rec_ref,
                           r_ref, g_ref, b_ref, t_ref, tck_ref, sat_ref, *,
                           ntx, ntiles, tile_w):
    """Forward kernel + per-step entry-T checkpoint (training mode)."""
    si = pl.program_id(0)
    tile = step_tile_ref[si]
    pix = TILE_H * tile_w

    @pl.when(tile < ntiles)
    def _():
        @pl.when(step_first_ref[si] == 1)
        def _init():
            r_ref[0] = jnp.zeros((1, pix), jnp.float32)
            g_ref[0] = jnp.zeros((1, pix), jnp.float32)
            b_ref[0] = jnp.zeros((1, pix), jnp.float32)
            t_ref[0] = jnp.ones((1, pix), jnp.float32)
            sat_ref[0] = 0

        tck_ref[0] = t_ref[0]          # transmittance at chunk ENTRY

        @pl.when(sat_ref[0] == 0)
        def _run():
            _composite_chunk(rec_ref, r_ref, g_ref, b_ref, t_ref, sat_ref,
                             tile, ntx,
                             step_lo_ref[si], step_hi_ref[si], tile_w)


def _composite_call_ckpt(records, steps, nty, ntx, interpret,
                         tile_w: int = TILE_W):
    """Forward planes + (nsteps, 1, PIX) entry-T checkpoints."""
    ntiles = nty * ntx
    pix = TILE_H * tile_w
    step_tile, step_first, step_block, step_lo, step_hi = steps
    nsteps = step_tile.shape[0]
    kernel = functools.partial(_composite_kernel_ckpt, ntx=ntx,
                               ntiles=ntiles, tile_w=tile_w)

    def out_map(si, st, sf, sb, sl, sh):
        return (jnp.minimum(st[si], ntiles), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CHUNK, _ROWS),
                         lambda si, st, sf, sb, sl, sh: (sb[si], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, pix), out_map,
                                memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((1, 1, pix),
                        lambda si, st, sf, sb, sl, sh: (si, 0, 0),
                        memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    out_shape = ([jax.ShapeDtypeStruct((ntiles + 1, 1, pix),
                                       jnp.float32)] * 4
                 + [jax.ShapeDtypeStruct((nsteps, 1, pix), jnp.float32)])
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(step_tile, step_first, step_block, step_lo, step_hi, records)


def _composite_bwd_kernel(rt_ref, rfirst_ref, rb_ref, rl_ref, rh_ref,
                          newblk_ref, rsi_ref, rec_ref, tck_ref, tfin_ref,
                          dr_ref, dg_ref, db_ref, dtc_ref,
                          dpk_ref, sb_scr, *, ntx, ntiles, tile_w):
    """Reverse-sweep gradient of the composite w.r.t. packed records.

    Standard 3DGS backward: dL/dc_i = w_i·dC; dL/dα_i = (c_i·dC)·T_i −
    [Σ_{j>i}(c_j·dC)w_j + dT·T_N]/(1−α_i); α/conic/mean grads via the
    quadratic chain. The within-chunk suffix is one strictly-UPPER-
    triangular MXU matmul; the cross-chunk suffix rides a (1, PIX) VMEM
    scratch, and T_i comes from the forward's entry-T checkpoint."""
    si = pl.program_id(0)
    tile = rt_ref[si]
    pix = TILE_H * tile_w

    @pl.when(newblk_ref[si] == 1)
    def _zero():
        dpk_ref[...] = jnp.zeros((CHUNK, _ROWS), jnp.float32)

    @pl.when(tile < ntiles)
    def _():
        @pl.when(rfirst_ref[si] == 1)
        def _init():
            sb_scr[...] = jnp.zeros((1, pix), jnp.float32)

        t_entry = tck_ref[0]                             # (1, P)
        # forward skipped this chunk iff its entry T was saturated
        @pl.when(jnp.max(t_entry) >= _T_EPS)
        def _run():
            lo = rl_ref[si]
            hi = rh_ref[si]
            ty0 = (tile // ntx) * TILE_H
            tx0 = (tile % ntx) * tile_w
            rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            live = (rows >= lo) & (rows < hi)
            col = lambda c: rec_ref[:, c:c + 1]
            ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            cj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            ltri = (ri > cj).astype(jnp.float32)
            utri = (ri < cj).astype(jnp.float32)

            # (C, 1) per-splat accumulators summed over pixel sub-spans
            acc = [jnp.zeros((CHUNK, 1), jnp.float32) for _ in range(9)]
            # pixel axis processed in SPAN-wide slices: the full set of
            # (C, PIX) f32 temporaries (~13 of them) would need ~27 MB of
            # scoped VMEM at PIX=4096 — over the 16 MB limit
            span = min(1024, pix)
            for s0 in range(0, pix, span):
                sl_px = slice(s0, s0 + span)
                i = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1) + s0
                px = (jax.lax.bitwise_and(i, tile_w - 1) + tx0
                      ).astype(jnp.float32) + 0.5
                py = (jax.lax.shift_right_logical(i, tile_w.bit_length()
                                                  - 1) + ty0
                      ).astype(jnp.float32) + 0.5
                dx = px - col(_MX)                       # (C, S)
                dy = py - col(_MY)
                power = (-0.5 * (col(_CA) * dx * dx
                                 + col(_CC) * dy * dy)
                         - col(_CB) * dx * dy)
                alpha_raw = col(_OP) * jnp.exp(power)
                alpha = jnp.minimum(alpha_raw, _ALPHA_MAX)
                keep = live & (alpha_raw >= _ALPHA_MIN)
                alpha = jnp.where(keep, alpha, 0.0)

                log_om = jnp.log(jnp.maximum(1.0 - alpha, 1e-6))
                prefix = jax.lax.dot_general(
                    ltri, log_om, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (C, S)
                t_i = t_entry[:, sl_px] * jnp.exp(prefix)
                w = alpha * t_i

                dr = dr_ref[0][:, sl_px]                 # (1, S)
                dg = dg_ref[0][:, sl_px]
                db = db_ref[0][:, sl_px]
                dtc = dtc_ref[0][:, sl_px]
                tfin = tfin_ref[0][:, sl_px]

                rsum = lambda x: jnp.sum(x, axis=1, keepdims=True)
                # color grads: dc_i = Σ_p w_i dC
                acc[5] += rsum(w * dr)
                acc[6] += rsum(w * dg)
                acc[7] += rsum(w * db)

                # alpha grads
                a_dot = (col(_CR) * dr + col(_CG) * dg
                         + col(_CB2) * db)               # (C, S)
                aw = a_dot * w
                suffix = jax.lax.dot_general(
                    utri, aw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (C, S)
                suffix = suffix + sb_scr[:, sl_px]       # + later chunks
                inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-6)
                d_alpha = a_dot * t_i - (suffix + dtc * tfin) * inv_om

                # clamp/floor: no grad where alpha was clamped or floored
                g_mask = keep & (alpha_raw < _ALPHA_MAX)
                gpow = jnp.where(g_mask, alpha * d_alpha, 0.0)
                acc[4] += rsum(jnp.where(g_mask,
                                         jnp.exp(power) * d_alpha, 0.0))
                acc[0] += rsum(gpow * (col(_CA) * dx + col(_CB) * dy))
                acc[1] += rsum(gpow * (col(_CB) * dx + col(_CC) * dy))
                acc[2] += rsum(gpow * (-0.5) * dx * dx)
                acc[3] += rsum(gpow * (-dx * dy))
                acc[8] += rsum(gpow * (-0.5) * dy * dy)
                sb_scr[:, sl_px] = (sb_scr[:, sl_px]
                                    + jnp.sum(aw, axis=0, keepdims=True))

            zero = jnp.zeros((CHUNK, 1), jnp.float32)
            grad = jnp.concatenate(
                [acc[0], acc[1], acc[2], acc[3], acc[8], acc[4],
                 acc[5], acc[6], acc[7], zero, zero, zero],
                axis=1)                                  # (C, 12)
            dpk_ref[...] = dpk_ref[...] + grad


def _composite_bwd_call(packed, steps, t_plane, tck, dr, dg, db, dtc,
                        nty, ntx, interpret, tile_w: int = TILE_W):
    ntiles = nty * ntx
    pix = TILE_H * tile_w
    st, sf, sb, sl, sh = steps
    ns = st.shape[0]
    rev = lambda a: a[::-1]
    rt, rb, rl, rh = rev(st), rev(sb), rev(sl), rev(sh)
    rsi = jnp.arange(ns - 1, -1, -1, dtype=jnp.int32)   # forward step id
    rfirst = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (rt[1:] != rt[:-1]).astype(jnp.int32)])
    newblk = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (rb[1:] != rb[:-1]).astype(jnp.int32)])
    kernel = functools.partial(_composite_bwd_kernel, ntx=ntx,
                               ntiles=ntiles, tile_w=tile_w)

    def tile_map(si, rt_, rf_, rb_, rl_, rh_, nb_, ri_):
        return (jnp.minimum(rt_[si], ntiles), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((CHUNK, _ROWS),
                         lambda si, rt_, rf_, rb_, rl_, rh_, nb_, ri_:
                         (rb_[si], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pix),
                         lambda si, rt_, rf_, rb_, rl_, rh_, nb_, ri_:
                         (ri_[si], 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, 1, pix), tile_map,
                          memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((1, 1, pix), tile_map,
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((CHUNK, _ROWS),
                         lambda si, rt_, rf_, rb_, rl_, rh_, nb_, ri_:
                         (rb_[si], 0), memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((1, pix), jnp.float32)],
    )
    out_shape = jax.ShapeDtypeStruct(packed.shape, jnp.float32)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=[out_shape],
        interpret=interpret,
    )(rt, rfirst, rb, rl, rh, newblk, rsi,
      packed, tck, t_plane, dr, dg, db, dtc)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def composite_diff(packed, steps, nty, ntx, interpret, tile_w=TILE_W):
    """Differentiable composite: forward = the production Pallas kernel,
    backward = a reverse-sweep Pallas kernel (grads w.r.t. ``packed``).
    Use with the compact LOD layout for bounded checkpoint memory."""
    return tuple(_composite_call(packed, steps, nty, ntx, interpret,
                                 tile_w)[:4])


def _composite_diff_fwd(packed, steps, nty, ntx, interpret, tile_w=TILE_W):
    r, g, b, t, tck = _composite_call_ckpt(packed, steps, nty, ntx,
                                           interpret, tile_w)
    return (r, g, b, t), (packed, steps, t, tck)


def _composite_diff_bwd(nty, ntx, interpret, tile_w, res, cts):
    packed, steps, t_plane, tck = res
    dr, dg, db, dtc = cts
    d_packed = _composite_bwd_call(packed, steps, t_plane, tck,
                                   dr, dg, db, dtc, nty, ntx, interpret,
                                   tile_w)
    zeros_like_int = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return d_packed, tuple(zeros_like_int(s) for s in steps)


composite_diff.defvjp(_composite_diff_fwd, _composite_diff_bwd)


def render_gaussians_diff(means, scales, quats, opacities, colors,
                          view, proj, width: int, height: int,
                          background=(0.0, 0.0, 0.0),
                          max_splats_per_tile: int = 256,
                          ky: int = KY,
                          interpret: bool = False,
                          tile_w: int = TILE_W,
                          mean2d_offset=None) -> jnp.ndarray:
    """Differentiable Pallas render — the 1M-splat training path.

    Same pipeline as :func:`render_gaussians` (compact LOD layout
    required: it bounds the backward checkpoint memory), but compositing
    runs through :func:`composite_diff`, so gradients flow to every splat
    parameter: projection/record math via JAX autodiff, the composite via
    the custom Pallas VJP, and the pack gather via jnp.take's native
    scatter-add VJP. Binning decisions (keys, step maps) are
    stop-gradient, matching the original 3DGS.

    ``mean2d_offset`` (N, 2), usually zeros: added to the projected
    screen-space means, so its gradient is the per-splat VIEW-SPACE
    positional gradient — the densification statistic of the original
    3DGS adaptive density control (models/gs_densify.py).
    """
    ps = project_gaussians(means, scales, quats, opacities, colors,
                           view, proj, width, height, ky=ky)
    if mean2d_offset is not None:
        ps = ps._replace(mean2d=ps.mean2d + mean2d_offset)
    records = _make_records(ps)
    sg = jax.lax.stop_gradient
    ntx = _pad_to(width, tile_w) // tile_w
    nty = _pad_to(height, TILE_H) // TILE_H
    cap_pairs = _pad_to(means.shape[0] * KX * ky + ntx * nty * CHUNK,
                        CHUNK)
    pack_idx, steps, visited, _, _, _, _, _ = _bin_splats(
        sg(ps.mean2d[:, 0]), sg(ps.mean2d[:, 1]), ps.radius,
        jnp.isfinite(sg(ps.depth)), sg(ps.depth), ntx, nty, cap_pairs,
        ky=ky, max_per_tile=max_splats_per_tile, tile_w=tile_w,
        ext=ps.ext)
    packed = jnp.take(records, pack_idx, axis=0)
    r, g, b, t = composite_diff(packed, steps, nty, ntx, interpret,
                                tile_w)
    img = finalize_planes(r, g, b, t, visited, nty, ntx, background,
                          tile_w=tile_w)
    return img[:height, :width]


def finalize_planes(r, g, b, t, visited, nty: int, ntx: int,
                    background, tail_slab=None,
                    tile_w: int = TILE_W,
                    tail_decim_planes=None, decim: int = 2) -> jnp.ndarray:
    """Shared composite tail: mask never-visited tiles (garbage blocks) to
    background, untile the flat planes, composite the LOD tail slab (if
    any) behind the kept lists, and blend the background through the
    remaining transmittance. Used by both the single-device and the
    sharded render paths.

    ``tail_slab``: (tail_la (ntiles,) optical thickness, tail_rgb
    (ntiles, 3) mean color) — per-tile homogeneous proxy of LOD-dropped
    pairs (see :func:`_pack_tail_aux`). The per-tile fields are
    bilinearly interpolated across tile centers (no tile-aligned seams)
    and the thickness is MODULATED per pixel by the head's occupancy
    pattern (1−T normalized to its smoothed local mean): in smooth media
    the dropped tail is distributed like the kept head, so tiles only
    partially covered by the scene don't get a square halo of slab over
    their empty pixels. Tile-mean energy is conserved where the head has
    signal; tiles with nearly no head signal fall back to the uniform
    slab."""
    vis = jnp.concatenate([visited, jnp.zeros((1,), bool)])[:, None, None]
    rgbt = [jnp.where(vis, p, 0.0 if i < 3 else 1.0)
            for i, p in enumerate((r, g, b, t))]
    planes = [_untile(p, nty, ntx, tile_w) for p in rgbt]
    rgb = jnp.stack(planes[:3], -1)
    tt = planes[3]
    bg = jnp.asarray(background, jnp.float32)
    if tail_decim_planes is not None:
        # DECIMATED-TAIL combine: the tail kernel composited the
        # next-deeper pairs at decim x decim resolution ENTERED at the
        # head's per-quad transmittance, so its premultiplied color adds
        # directly after bilinear upsampling (half-pixel-aligned: the
        # decimated samples sit at quad centers); the head transmittance
        # is multiplied by the tail-only product (absolute tail T over
        # its entry T, guarded where the head already saturated).
        rt, gt, bt, tt_abs, td, vis_t = tail_decim_planes
        vt = jnp.concatenate([vis_t, jnp.zeros((1,), bool)])[:, None,
                                                             None]
        hw = (nty * TILE_H, ntx * tile_w)

        def upd(p, fill):
            p = jnp.where(vt, p, fill)
            return jax.image.resize(
                _untile_decim(p, nty, ntx, tile_w, decim), hw,
                "bilinear")

        ratio = jnp.clip(tt_abs / jnp.maximum(td, 1e-20), 0.0, 1.0)
        rgb = rgb + jnp.stack([upd(rt, 0.0), upd(gt, 0.0),
                               upd(bt, 0.0)], -1)
        tt = tt * upd(ratio, 1.0)
    if tail_slab is not None:
        tail_la, tail_rgb = tail_slab
        hw = (nty * TILE_H, ntx * tile_w)
        la_img = jax.image.resize(tail_la.reshape(nty, ntx), hw,
                                  "bilinear")
        c_img = jax.image.resize(tail_rgb.reshape(nty, ntx, 3),
                                 (*hw, 3), "bilinear")
        occ = 1.0 - tt                                    # head occupancy
        occ_mean = jnp.mean((1.0 - rgbt[3])[:-1, 0, :],
                            axis=-1)                      # (ntiles,)
        om_img = jax.image.resize(occ_mean.reshape(nty, ntx), hw,
                                  "bilinear")
        w = jnp.clip(occ / jnp.maximum(om_img, 1e-3), 0.0, 3.0)
        a_img = 1.0 - jnp.exp(-la_img * w)
        rgb = rgb + (tt * a_img)[..., None] * c_img
        tt = tt * (1.0 - a_img)
    return rgb + tt[..., None] * bg


def _untile(plane: jnp.ndarray, nty: int, ntx: int,
            tile_w: int = TILE_W) -> jnp.ndarray:
    """(ntiles+1, 1, PIX) tile-flattened → (nty*TILE_H, ntx*tile_w) image
    plane (one cheap XLA transpose in HBM)."""
    t = plane[:nty * ntx].reshape(nty, ntx, TILE_H, tile_w)
    return t.transpose(0, 2, 1, 3).reshape(nty * TILE_H, ntx * tile_w)


def _untile_decim(plane: jnp.ndarray, nty: int, ntx: int,
                  tile_w: int, decim: int) -> jnp.ndarray:
    """:func:`_untile` for decimated tail planes: (ntiles+1, 1, PIX/d²)
    → (nty*TILE_H/d, ntx*tile_w/d)."""
    th, tw = TILE_H // decim, tile_w // decim
    t = plane[:nty * ntx].reshape(nty, ntx, th, tw)
    return t.transpose(0, 2, 1, 3).reshape(nty * th, ntx * tw)


def render_gaussians(cloud, view, proj, width: int, height: int,
                     background=(0.0, 0.0, 0.0),
                     pairs_cap_factor: int | None = None,
                     cam_pos=None,
                     ky: int = KY,
                     max_splats_per_tile: int | None = None,
                     big_splat_cap: int | None = None,
                     mid_splat_cap: int | None = None,
                     mid_lo_splat_cap: int | None = None,
                     corner_cap: int | None = None,
                     lod_budget=None,
                     lod_tail: bool = False,
                     lod_tail_decim: int | None = None,
                     lod_tail_d: int | None = None,
                     return_stats: bool = False,
                     interpret: bool = False,
                     tile_w: int = TILE_W,
                     payload_sort: bool = True,
                     exact_seg: int = 8,
                     lod_seg: int = 1) -> jnp.ndarray:
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

    ``max_splats_per_tile`` enables the LOD: a GLOBAL step pool averaging
    max_splats_per_tile pairs per tile, allocated by per-tile need. Each
    tile desires its depth-sorted list up to a smoothed depth cut (its
    max_splats_per_tile-th pair's depth, 3x3-max-pooled over the tile
    grid so neighboring tiles truncate coherently — no tile-aligned
    banding), hard-capped at 4x; when total desire exceeds the pool every
    tile scales down proportionally (graceful, never whole-tile loss).
    Dropped pairs are counted in ``overflow_pairs`` and only ever the
    FARTHEST of over-deep tiles.

    ``lod_budget`` (with ``max_splats_per_tile``): an (ntiles,) int32
    per-tile desired depth for TEMPORAL adaptive LOD — feed each frame
    :func:`update_lod_budget` of the previous frame's ``tile_exec`` stat
    so early-saturating tiles release pool capacity to deep ones. Same
    static cost; strictly better allocation in flythroughs.

    ``big_splat_cap`` enables TWO-LEVEL binning: splats larger than the
    KX×ky span limit (15 px radius at the defaults) render through a
    coarse KX2×KY2 tile fan — raising the radius ceiling to
    ``level2_max_radius()`` (111 px) — instead of being radius-clamped.
    The value is the static per-frame budget of such large splats
    (overflowing ones are dropped entirely and reported via
    ``overflow_big_splats``).

    ``mid_splat_cap`` (with ``big_splat_cap``) adds a THIRD fan level:
    splats in (level1, level_mid_max_radius()] = (15, 47] px route
    through a 16-slot _kxm×KY_M fan under this budget, and only true
    giants (>47 px) pay the 64-slot coarse fan. Trained-scene radius
    tails are log-normal — ~85% of over-15 px splats fit under 47 px
    (tools/exp_census.py) — so for INRIA-like scenes size
    ``mid_splat_cap≈N//5`` and ``big_splat_cap≈N//32``: 4x cheaper in
    sort slots than a coarse-only budget covering the same splats, and
    a coarse-only N//16 budget silently dropped 52% of the footprint
    mass (the round-3 inria 29 dB floor — invisible to a PSNR gate
    whose reference shared the cap).

    ``mid_lo_splat_cap`` (with ``mid_splat_cap``) splits the mid fan:
    splats in (level1, level_midlo_max_radius()] = (15, 31] px ride a
    half-size _kxml×KY_ML fan under this budget — the bulk of a trained
    scene's over-15px tail (inria census: ~140k of 188k), at half the
    mid fan's sort-slot cost.

    ``lod_tail`` (default OFF, active only with ``max_splats_per_tile``):
    composite the pairs the LOD DROPS as a per-tile homogeneous slab
    (bilinearly smoothed across tiles) behind the kept lists instead of
    discarding their energy. MEASURED NET LOSS on the fog flythrough
    (tools/exp_tail.py, BENCHLOG round 3): the smeared slab costs 30-50
    dB on near-exact frames (72-91 → 39-41 dB) and buys only +1.3 dB on
    the grazing hard frame, at +3.5 ms/frame — tile-footprint energy is
    too coarse a proxy when drops are sparse and localized. Kept as an
    opt-in for catastrophic-drop regimes (tiny pools on deep scenes,
    where test_lod_tail_proxy_recovers_dropped_energy shows it recovers
    most of the lost energy); the production fix for LOD quality is the
    footprint-tight ``tile_w`` instead.

    ``return_stats=True`` additionally returns a dict with
    ``overflow_pairs`` (device scalar: LOD-dropped pairs — 0 means the
    render was exact) and ``overflow_big_splats`` so cap overflows are
    detectable at runtime instead of silently degrading (the 16.7 dB
    incident, BENCHLOG.md).

    ``corner_cap`` enables the K-REDUCTION fan (requires the default
    ky=2): most small splats cross at most one tile grid line, so
    level-1 emits a 2-slot fan — HALF the static sort slots, a
    proportionally smaller sort/pack/step budget in exact mode — and
    the minority crossing both a vertical and a horizontal line route
    through this budgeted 2x2 side channel (overflowers are dropped
    whole and counted in ``overflow_big_splats``). Size it generously:
    the corner fraction is (2r/tile_w)(2r/32) per splat; n//4 is safe
    for fog-like scenes at tile_w=32, n//8 at 64+.

    ``exact_seg``: chunks per composite grid step in exact/direct mode —
    exact frames sequence one grid step per 128-pair block and most steps
    are saturation-skipped, so their fixed ~0.66 us sequencing cost
    dominates; streaming ``exact_seg`` chunks per step with the early-out
    re-checked between sub-chunks divides it.

    ``lod_tail_decim`` (with ``max_splats_per_tile``): DECIMATED-TAIL
    compositing — a second step pool averaging this many pairs/tile
    extends each tile's sorted prefix beyond the head grant, composited
    at ``lod_tail_d`` x ``lod_tail_d``-decimated tile resolution
    (default module ``_TAIL_D``=2: quarter pixel cost per pair; 4 =
    1/16 cost at −0.3 dB on inria, tools/exp_tail.py 2026-08-21) and
    bilinearly upsampled under the head's transmittance. Deep lists'
    far content is heavily attenuated and spatially smooth, so the
    decimation error is far below the truncation error of simply
    dropping those pairs: ~4x the effective depth per composite
    millisecond. Tiles whose head saturated skip their whole tail at
    init (one SMEM read). Dropped-pair accounting moves behind the
    tail; the lossless certificate stays HEAD-based (conservative:
    tail coverage never falsely certifies).

    ``lod_seg``: the same knob for the LOD layout — multi-chunk steps
    are built over the block-aligned packed stream (straddling steps run
    once per adjacent tile, direct-layout style), dividing the per-step
    sequencing cost that dominates deep-pool frames (tile_w=64/mpt=768
    inria sequences 6120 aligned steps ≈ 4 ms at lod_seg=1). Pool
    grants and pack layout are unchanged — only the grid-step grouping
    differs, so images are bit-identical across lod_seg values.

    ``tile_w`` (32/64/128): composite tile width in pixels. Narrower
    tiles make the composite FOOTPRINT-TIGHT — a splat's chunk evaluates
    TILE_H*tile_w pixels, so at 32 the per-pair vector work drops 4x
    while the emission fan stays K=4 (a <=15 px-radius splat spans <=2
    columns of any width >=32) and the sort size is unchanged. Wins on
    list-depth-bound scenes (surface scenes, exact mode); the step-count
    overhead (2 extra steps/tile) grows with the 4x tile count, so wide
    tiles can still win on saturation-bound fog (measure per scene —
    BENCHLOG round 3).
    """
    if mid_splat_cap is not None and big_splat_cap is None:
        # the whole mid-fan channel block is gated on big_splat_cap; a
        # silent ignore here means level-1-clamped rendering that looks
        # configured but isn't (ADVICE round 3)
        raise ValueError("mid_splat_cap requires big_splat_cap")
    if mid_lo_splat_cap is not None and mid_splat_cap is None:
        raise ValueError("mid_lo_splat_cap requires mid_splat_cap")
    if lod_tail_decim is not None and max_splats_per_tile is None:
        raise ValueError("lod_tail_decim requires max_splats_per_tile")
    tail_d = _TAIL_D if lod_tail_d is None else lod_tail_d
    colors = cloud.colors
    if cam_pos is not None and getattr(cloud, "sh_rest", None) is not None:
        from ..models.gaussians import eval_sh_colors
        with jax.named_scope("gs.sh_colors"):
            colors = eval_sh_colors(cloud, cam_pos)
    max_radius = (float(level2_max_radius(tile_w))
                  if big_splat_cap is not None else None)
    with jax.named_scope("gs.project"):
        ps = _project_fast(cloud.means, cloud.scales, cloud.quats,
                           cloud.opacities, colors, view, proj,
                           width, height, ky=ky, max_radius=max_radius,
                           interpret=interpret)
    with jax.named_scope("gs.records"):
        records = _make_records(ps)            # original splat order

    ntx = _pad_to(width, tile_w) // tile_w
    nty = _pad_to(height, TILE_H) // TILE_H
    n = cloud.num_splats
    ntiles = ntx * nty
    if corner_cap is not None and ky == 2 and KX == 2:
        # K-reduction: 2-slot level-1 fan + 2x2 corner channel
        exact_cap = n * 2 + corner_cap * KX * ky + ntiles * CHUNK
    else:
        exact_cap = n * KX * ky + ntiles * CHUNK
    if big_splat_cap is not None:
        exact_cap += big_splat_cap * _kx2(tile_w) * KY2
        if mid_splat_cap is not None:
            exact_cap += mid_splat_cap * _kxm(tile_w) * KY_M
            if mid_lo_splat_cap is not None:
                exact_cap += mid_lo_splat_cap * _kxml(tile_w) * KY_ML
    if pairs_cap_factor is None:
        cap_pairs = exact_cap
    else:
        cap_pairs = min(exact_cap,
                        max(pairs_cap_factor * n, 4 * CHUNK)
                        + ntiles * CHUNK)
    # (max_splats_per_tile sizes its own compact pack layout inside
    # _bin_splats; cap_pairs only governs the exact/direct mode)
    cap_pairs = _pad_to(cap_pairs, CHUNK)
    nseg = exact_seg if max_splats_per_tile is None else max(lod_seg, 1)
    tail_in = None
    if max_splats_per_tile is not None and lod_tail:
        # per-splat total alpha integral: op * 2π / sqrt(det(conic))
        # (det(conic) = 1/det(cov2d)); culled splats zeroed
        detc = jnp.maximum(ps.conic[:, 0] * ps.conic[:, 2]
                           - ps.conic[:, 1] ** 2, 1e-12)
        a_full = (ps.opacity * jnp.isfinite(ps.depth)
                  * (2.0 * np.pi) * jax.lax.rsqrt(detc))
        tail_in = (a_full, colors)
    with jax.named_scope("gs.bin"):
        (pack_idx, steps, visited, overflow, overflow_big, tail_slab,
         lod_kc, bin_tail) = _bin_splats(
                ps.mean2d[:, 0], ps.mean2d[:, 1], ps.radius,
                jnp.isfinite(ps.depth), ps.depth, ntx, nty, cap_pairs,
                ky=ky, max_per_tile=max_splats_per_tile,
                big_cap=big_splat_cap, mid_cap=mid_splat_cap,
                mid_lo_cap=mid_lo_splat_cap,
                corner_cap=corner_cap,
                budget=lod_budget, tail=tail_in,
                tile_w=tile_w,
                records=(records if payload_sort
                         and max_splats_per_tile is None else None),
                nseg=nseg, ext=ps.ext, tail_decim=lod_tail_decim)
    with jax.named_scope("gs.pack"):
        # exact mode: records rode the sort as payload columns and
        # pack_idx already IS the packed array (see _bin_splats); the
        # LOD layout packs via one block-granular row gather.
        # ``payload_sort=False`` opts exact mode back into the gather
        # pack (escape hatch while the payload program's behavior inside
        # device loops is validated on real hardware).
        packed = (pack_idx if payload_sort
                  and max_splats_per_tile is None
                  else _pack_records(records, pack_idx))

    with jax.named_scope("gs.composite"):
        r, g, b, t, texec = _composite_call(packed, steps, nty, ntx,
                                            interpret, tile_w, nseg=nseg)
    tail_planes = None
    if bin_tail is not None:
        pack_tl, steps_tl, kept_tl = bin_tail
        with jax.named_scope("gs.tail_decim"):
            packed_tl = _pack_records(records, pack_tl)
            # head-UNVISITED tiles (kept 0, e.g. pool-starved) carry
            # uninitialized head planes; their true entry T is 1
            vis_h = jnp.concatenate(
                [visited, jnp.zeros((1,), bool)])[:, None, None]
            td = _decimate_t(jnp.where(vis_h, t, 1.0), tile_w, tail_d)
            rt, gt, bt, tt = _composite_tail_call(
                packed_tl, steps_tl, td, nty, ntx, interpret, tile_w,
                decim=tail_d, nseg=_TAIL_SEG)
            tail_planes = (rt, gt, bt, tt, td, kept_tl > 0)
    img = finalize_planes(r, g, b, t, visited, nty, ntx, background,
                          tail_slab=tail_slab, tile_w=tile_w,
                          tail_decim_planes=tail_planes, decim=tail_d)
    img = img[:height, :width]
    if return_stats:
        # per-tile pairs actually composited before saturation (temporal
        # LOD telemetry; unvisited tiles masked — their rows are
        # uninitialized kernel memory)
        tile_exec = jnp.where(visited, texec[:-1, 0, 0], 0)
        stats = {"overflow_pairs": overflow,
                 "overflow_big_splats": overflow_big,
                 "tile_exec": tile_exec}
        # per-tile kept/count: update_lod_budget uses them to jump
        # ran-dry (unsaturated, truncated) tiles straight to their
        # full list size instead of growing 1.5x per frame
        stats["tile_kept"], stats["tile_count"] = lod_kc
        if max_splats_per_tile is not None:
            # LOSSLESS CERTIFICATE: when every truncated tile saturated
            # strictly inside its kept list (exec < kept), every dropped
            # pair sits behind a transmittance < _T_EPS — the render
            # differs from the exact one only by sub-epsilon tail
            # contributions and f32 reassociation across the (aligned vs
            # direct) chunk grouping: measured <= 2.5e-5 max channel
            # error / 131.7 dB (test_lossless_certificate), i.e.
            # far below 8-bit quantization. A tile that walked its whole
            # truncated list unsaturated (dry) may differ visibly. The
            # gate is count > 0, NOT visited: a tile whose ENTIRE list
            # was dropped (kept == 0 < count) is unvisited but must
            # withdraw the certificate. overflow_big covers whole-splat
            # channel drops, which a saturation walk cannot excuse.
            kept_, count_ = lod_kc
            dry = (kept_ < count_) & (tile_exec >= kept_) & (count_ > 0)
            stats["lossless"] = (~jnp.any(dry)) & (overflow_big == 0)
        else:
            # exact/direct mode: lossless unless the positional pair cap
            # or a whole-splat channel budget overflowed
            stats["lossless"] = (overflow == 0) & (overflow_big == 0)
        return img, stats
    return img


def num_tiles(width: int, height: int,
              tile_w: int = TILE_W) -> tuple[int, int]:
    """(ntx, nty) tile-grid shape for a framebuffer size."""
    return ((width + tile_w - 1) // tile_w,
            (height + TILE_H - 1) // TILE_H)


def update_lod_budget(tile_exec, max_splats_per_tile: int,
                      ntx: int, nty: int,
                      tile_kept=None, tile_count=None,
                      dry_floor: str = "jump"):
    """Next-frame per-tile LOD budget from this frame's executed depth
    (``tile_exec`` stat of :func:`render_gaussians`): 3x3-max-pooled over
    the tile grid (camera motion shifts content by tiles between frames),
    grown 1.5x + one chunk of headroom so under-budgeted tiles converge
    up geometrically, clamped to [CHUNK, LOD_DESIRE_CAP *
    max_splats_per_tile] (the per-tile desire ceiling of the pool
    allocator).

    ``tile_kept``/``tile_count`` (optional, the matching stats of the
    same frame) separate saturation from starvation: a tile that walked
    its whole truncated list without saturating (exec == kept < count)
    RAN DRY — geometric growth alone needs ~7 frames to recover a 10x
    truncation (shell silhouette tiles, tools/exp_shell.py). Dry tiles
    get TWO treatments:

    * a FLOOR-channel jump to min(count, _DRY_FLOOR_CAP·mpt): in
      dry-heavy scenes (inria: ~1750 of 2040 tiles dry) the pure
      exec-driven budget is a rich-get-richer feedback — everyone grows
      1.5x, the proportional pool scale-down cancels it, and the
      allocation stays frozen at the warm-up distribution while the
      truly starved tiles never recover (measured: temporal 33.4 dB vs
      STATIC 42.5 dB at inria mpt=768 — tools/exp_cert.py 2026-08-19).
      The jump is capped at a small multiple of mpt so the
      oversubscribed regime (fog grazing views, where EVERY tile is dry
      with a huge count) degrades to the balanced static allocation
      instead of ∝count (which cost 37→26 dB when tried raw — BENCHLOG
      round 3);
    * its full list size in a second DRY-NEED channel (output shape
      (ntiles, 2)) that _bin_splats funds from pool SURPLUS only.

    ``dry_floor`` selects the dry-tile FLOOR-channel treatment:

    * ``"jump"`` (the round-3 design): min(count, _DRY_FLOOR_CAP·mpt) —
      recovers a starved tile in one frame, but in dry-HEAVY scenes
      (inria: ~1750 of 2040 tiles dry) the exec-derived floors of the
      rest freeze the warm-up distribution (rich-get-richer: everyone
      grows 1.5x, the proportional pool scale-down cancels it) — static
      budgets beat it by 3-5 dB at equal FPS (tools/exp_cert.py
      2026-08-19).
    * ``"static"`` (revisit-robust): dry tiles' floor REVERTS to the
      uniform static baseline ``max_splats_per_tile`` every frame — for
      a dry tile exec is allocation-bounded, not a need signal, so no
      feedback loop can form through it; differentiation comes from the
      surplus-funded need channel plus the depth-cut desire machinery
      that still runs on top of the budget in _bin_splats. Saturated
      tiles keep the exec-driven shrink (their exec is set by
      transmittance physics, not by allocation), so an all-dry frame
      degrades exactly to the static allocation instead of a frozen
      one."""

    def pool3(a):
        ap = jnp.pad(a.reshape(nty, ntx), 1, mode="edge")
        return jnp.max(jnp.stack(
            [ap[i:i + nty, j:j + ntx] for i in range(3)
             for j in range(3)]), 0).reshape(-1)

    cap = LOD_DESIRE_CAP * max_splats_per_tile
    b = (pool3(tile_exec).astype(jnp.float32) * 1.5).astype(jnp.int32) \
        + CHUNK
    b = jnp.clip(b, CHUNK, cap)
    if tile_kept is None or tile_count is None:
        return b
    e = tile_exec.astype(jnp.int32)
    dry = (tile_kept > 0) & (e >= tile_kept) & (tile_kept < tile_count)
    if dry_floor == "static":
        b = jnp.where(dry, max_splats_per_tile, b)
    else:
        jump = jnp.minimum(tile_count,
                           _DRY_FLOOR_CAP * max_splats_per_tile)
        b = jnp.maximum(b, jnp.where(dry, jump, 0))
    # need is NOT 3x3-pooled: pooling inflated sum(extra) ~9x and spread
    # the surplus so thin the genuinely starved tiles gained little
    # (floor channel pooling already covers camera motion)
    need = jnp.clip(jnp.where(dry, tile_count, 0), 0, cap)
    return jnp.stack([b, need], -1)
