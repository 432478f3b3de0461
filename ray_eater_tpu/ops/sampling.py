"""Texture sampling — the combined-image-sampler analog.

Implements Vulkan-convention normalized-coordinate sampling (what
``texture(tex, uv)`` in shader.frag:19 does) as pure jnp gathers so XLA can
fuse sampling into the fragment-shading program. Address modes and filters
match the reference sampler state (image.zig:85-129: linear filter,
mirrored_repeat used by TexImage, texture.zig:25-27).

TPU note: gathers run on the scalar/vector path, not the MXU — this is the
known-slow op of the pipeline (SURVEY.md §7 hard part 3). The deferred
design keeps it to exactly one sample per *visible* pixel per textured pass.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.resources import _WIN, _WIN_STRIDE, AddressMode, Filter, Texture


def _wrap(i: jnp.ndarray, n: int, mode: AddressMode) -> jnp.ndarray:
    """Apply an address mode to integer texel indices (may be out of range
    on either side)."""
    if mode is AddressMode.REPEAT:
        return jnp.mod(i, n)
    if mode is AddressMode.MIRRORED_REPEAT:
        m = jnp.mod(i, 2 * n)
        return jnp.where(m >= n, 2 * n - 1 - m, m)
    return jnp.clip(i, 0, n - 1)  # CLAMP_TO_EDGE


def sample(tex: Texture, uv: jnp.ndarray,
           valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample ``tex`` at normalized ``uv`` (..., 2) → (..., 4) linear RGBA.

    Vulkan texel addressing: ``t = uv * size - 0.5`` with the filter applied
    in unnormalized texel space.

    ``valid`` (optional, same shape as ``uv[..., 0]``, bool): coverage mask
    of the deferred G-buffer — pixels outside it carry another triangle's
    (or no triangle's) uv. Output at invalid pixels is unspecified (the
    caller masks it); the SUBTILE window sampler uses the mask to exclude
    those pixels from its per-subtile footprint, so a silhouette edge
    crossing a subtile no longer forces the whole subtile to a coarse mip
    level (the C-vs-D 39.9 dB LOD-quantization delta of
    tools/exp_raster4.py was dominated by exactly these subtiles).
    """
    data = tex.data
    h, w = data.shape[0], data.shape[1]
    s = tex.sampler
    u = uv[..., 0] * w - 0.5
    v = uv[..., 1] * h - 0.5

    if s.filter is Filter.NEAREST:
        xi = _wrap(jnp.floor(u + 0.5).astype(jnp.int32), w, s.address_mode)
        yi = _wrap(jnp.floor(v + 0.5).astype(jnp.int32), h, s.address_mode)
        return data[yi, xi]

    if (s.filter is Filter.LINEAR and s.mipmap
            and getattr(tex, "mip_table", None) is not None
            and uv.ndim >= 3):
        if (getattr(tex, "win_table", None) is not None and uv.ndim == 3
                and min(uv.shape[0], uv.shape[1]) >= _SUB
                and s.subtile
                and os.environ.get("RAYEATER_SUBTILE", "1") != "0"):
            return _sample_subtile(tex, uv, valid=valid)
        return _sample_mip(tex, uv)

    if getattr(tex, "packed", None) is not None:
        # quad-texel fast path: ONE 4-int32 row gather fetches the whole
        # 2x2 RGBA8 neighborhood (TPU gathers are ELEMENT-count bound, so
        # 4 channels per element is a 4x over a float table); u8 decode +
        # sRGB EOTF run as dense VPU math after the gather
        xi, fx = _packed_coords(uv[..., 0], w, s.address_mode)
        yi, fy = _packed_coords(uv[..., 1], h, s.address_mode)
        fx, fy = fx[..., None], fy[..., None]
        # FLAT-index row gather: one axis-0 take on the (H*W, 4) view is
        # 1.55x faster than image-shaped 2D indexing on TPU (15.3 -> 9.8
        # ms at 2M samples, BENCHLOG round 2 gather probes)
        flat = jnp.take(tex.packed.reshape(h * w, 4),
                        (yi * w + xi).reshape(-1), axis=0)
        quad = flat.reshape(*yi.shape, 4)               # (..., 4) int32
        t00, t10, t01, t11 = (
            _decode_rgba8(quad[..., k], tex.packed_srgb) for k in range(4))
    else:
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        fx = (u - x0.astype(jnp.float32))[..., None]
        fy = (v - y0.astype(jnp.float32))[..., None]
        x0w = _wrap(x0, w, s.address_mode)
        y0w = _wrap(y0, h, s.address_mode)
        x1w = _wrap(x0 + 1, w, s.address_mode)
        y1w = _wrap(y0 + 1, h, s.address_mode)
        t00 = data[y0w, x0w]
        t10 = data[y0w, x1w]
        t01 = data[y1w, x0w]
        t11 = data[y1w, x1w]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


def _decode_rgba8(q: jnp.ndarray, srgb: bool) -> jnp.ndarray:
    """(...,) int32 little-endian RGBA8 → (..., 4) f32; RGB through the
    exact IEC 61966-2-1 decode when ``srgb`` (matches io.image
    srgb_to_linear bit-for-bit, so the packed path equals sampling the
    float ``data`` plane)."""
    ch = [((jax.lax.shift_right_logical(q, 8 * k) & 255)
           .astype(jnp.float32) * (1.0 / 255.0)) for k in range(4)]
    if srgb:
        ch[:3] = [jnp.where(c <= 0.04045, c * (1.0 / 12.92),
                            jnp.power((c + 0.055) * (1.0 / 1.055), 2.4))
                  for c in ch[:3]]
    return jnp.stack(ch, -1)


def _packed_coords(u_norm: jnp.ndarray, n: int, mode: AddressMode):
    """Base index + filter fraction for the quad-texel table: the address
    mode is applied in *continuous* coordinate space so the base index is
    always in range and the baked neighbors stay valid."""
    if mode is AddressMode.REPEAT:
        t = u_norm * n - 0.5
        i0 = jnp.floor(t).astype(jnp.int32)
        return jnp.mod(i0, n), t - i0.astype(jnp.float32)
    if mode is AddressMode.MIRRORED_REPEAT:
        m = jnp.mod(u_norm, 2.0)
        u_norm = jnp.where(m <= 1.0, m, 2.0 - m)
    else:  # CLAMP_TO_EDGE
        u_norm = jnp.clip(u_norm, 0.0, 1.0)
    t = jnp.clip(u_norm * n - 0.5, 0.0, n - 1.0)
    i0 = jnp.floor(t).astype(jnp.int32)
    return i0, t - i0.astype(jnp.float32)


def _packed_coords_n(u_norm: jnp.ndarray, n: jnp.ndarray,
                     mode: AddressMode):
    """:func:`_packed_coords` with a PER-PIXEL texture size ``n`` (int32
    array) — the mip path's level dimensions vary per pixel."""
    nf = n.astype(jnp.float32)
    if mode is AddressMode.REPEAT:
        t = u_norm * nf - 0.5
        i0 = jnp.floor(t).astype(jnp.int32)
        return jnp.mod(i0, n), t - i0.astype(jnp.float32)
    if mode is AddressMode.MIRRORED_REPEAT:
        m = jnp.mod(u_norm, 2.0)
        u_norm = jnp.where(m <= 1.0, m, 2.0 - m)
    else:  # CLAMP_TO_EDGE
        u_norm = jnp.clip(u_norm, 0.0, 1.0)
    t = jnp.clip(u_norm * nf - 0.5, 0.0, nf - 1.0)
    i0 = jnp.floor(t).astype(jnp.int32)
    return i0, t - i0.astype(jnp.float32)


def _mip_tap(tex, u, v, level: jnp.ndarray):
    """One bilinear tap at a PER-PIXEL integer mip level: one flat-index
    row gather into the concatenated pyramid table."""
    s = tex.sampler
    h0, w0 = tex.mip_dims[0][0], tex.mip_dims[0][1]
    hl = jnp.maximum(jnp.right_shift(jnp.int32(h0), level), 1)
    wl = jnp.maximum(jnp.right_shift(jnp.int32(w0), level), 1)
    # level base offsets: L is tiny, so a select-sum beats a (P,) gather
    off = jnp.zeros_like(level)
    for li, (_, _, o) in enumerate(tex.mip_dims):
        off = jnp.where(level == li, jnp.int32(o), off)
    xi, fx = _packed_coords_n(u, wl, s.address_mode)
    yi, fy = _packed_coords_n(v, hl, s.address_mode)
    flat = jnp.take(tex.mip_table.reshape(-1, 4),
                    (off + yi * wl + xi).reshape(-1), axis=0)
    quad = flat.reshape(*yi.shape, 4)
    t00, t10, t01, t11 = (
        _decode_rgba8(quad[..., k], tex.packed_srgb) for k in range(4))
    fx, fy = fx[..., None], fy[..., None]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy


_SUB = 16        # subtile pixel extent (16x16 px)
_NSUB = 16       # subtiles per kernel step (= one (32, 128) raster tile)
_SPIX = _SUB * _SUB
_C = 4


def _subtile_kernel(w0i_ref, w1i_ref, ty0_ref, fy0_ref, tx0_ref, fx0_ref,
                    ty1_ref, fy1_ref, tx1_ref, fx1_ref, fr_ref, *rest):
    """Gather-free trilinear fetch for one step of _NSUB subtiles: per
    subtile and mip tap, the 2-tap bilinear weights are built DENSE from
    the integer/fraction coordinate planes and ride two contractions
    against the subtile's (4*32, 32) texel window — filter + fetch in one
    MXU/VPU pass, no per-pixel gather (tools/exp_shade.py probe 5 /
    exp_shade3.py probe 6: 3.0 ms at 510 steps vs 9.8 ms for the packed
    quad gather at 2M px)."""
    win0 = rest[:_NSUB]
    win1 = rest[_NSUB:2 * _NSUB]
    o_ref = rest[2 * _NSUB]
    rows = jax.lax.broadcasted_iota(jnp.int32, (_WIN, _SPIX), 0)

    def tap(win_ref, tys, fys, txs, fxs):
        wy = (jnp.where(rows == tys, 1.0 - fys, 0.0)
              + jnp.where(rows == tys + 1, fys, 0.0))       # (WIN, SPIX)
        wx = (jnp.where(rows == txs, 1.0 - fxs, 0.0)
              + jnp.where(rows == txs + 1, fxs, 0.0))
        # f32 windows run the contraction at HIGHEST (3-pass, exact at
        # magnification); bf16 windows (RAYEATER_WIN_BF16) use one
        # native MXU pass with bf16 weights — see
        # resources._build_win_table for the accuracy/speed trade
        bf16 = win_ref.dtype == jnp.bfloat16
        b = jax.lax.dot_general(
            win_ref[0], wx.astype(jnp.bfloat16) if bf16 else wx,
            (((1,), (0,)), ((), ())),
            precision=(None if bf16 else jax.lax.Precision.HIGHEST),
            preferred_element_type=jnp.float32)             # (C*WIN, SPIX)
        return [jnp.sum(b[c * _WIN:(c + 1) * _WIN] * wy, axis=0)
                for c in range(_C)]                         # C x (SPIX,)

    for s in range(_NSUB):
        a = tap(win0[s], ty0_ref[s:s + 1, :], fy0_ref[s:s + 1, :],
                tx0_ref[s:s + 1, :], fx0_ref[s:s + 1, :])
        b = tap(win1[s], ty1_ref[s:s + 1, :], fy1_ref[s:s + 1, :],
                tx1_ref[s:s + 1, :], fx1_ref[s:s + 1, :])
        fr = fr_ref[s, :]
        for c in range(_C):
            o_ref[0, c, s * _SPIX:(s + 1) * _SPIX] = (
                a[c] * (1.0 - fr) + b[c] * fr)


def _tcoord(c, n, repeat: bool):
    """Continuous texel coordinate at level size ``n`` (Vulkan -0.5
    convention). REPEAT keeps the coordinate unwrapped (window content
    wraps cyclically instead); CLAMP/MIRRORED pre-wrapped ``c`` is in
    [0, 1] so the coordinate clips into [0, n-1]."""
    t = c * n - 0.5
    if repeat:
        return t
    return jnp.clip(t, 0.0, n - 1.0)


def _sample_subtile(tex, uv: jnp.ndarray,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """SUBTILE window sampler: trilinear mipmapped sampling with ZERO
    per-pixel gathers.

    The screen is cut into 16x16-px subtiles. Each subtile picks one mip
    level — the finest that (a) its per-pixel derivative LOD allows and
    (b) makes its texel footprint fit a 32x32 window from the texture's
    overlap-window table (stride 16: a span <= ~14 texels always fits;
    the bilinear +1 neighbor is in-window by construction) — and two
    window ids (tap level, tap level + 1). A Pallas kernel then fetches +
    filters both taps as dense weight contractions against the windows
    and lerps per pixel (`_subtile_kernel`).

    vs the gather path (:func:`_sample_mip`): identical filtering math on
    identical u8-quantized mip texels, but the LOD is footprint-capped
    per SUBTILE rather than free per pixel — subtiles whose uv span is
    wild (silhouette edges where background pixels carry degenerate uv)
    fall to a coarser level for their real pixels too. The bench PSNR
    gate + test_subtile_sampler_* quantify the delta; RAYEATER_SUBTILE=0
    restores the gather path."""
    s = tex.sampler
    nlev = len(tex.win_dims)
    h0, w0 = tex.mip_dims[0][0], tex.mip_dims[0][1]
    repeat = s.address_mode is AddressMode.REPEAT
    u, v = uv[..., 0], uv[..., 1]
    H, W = u.shape

    # ---- per-pixel LOD (same derivative + aniso math as _sample_mip) --
    def ddiff(a, axis):
        d = jnp.diff(a, axis=axis)
        edge = jax.lax.slice_in_dim(d, d.shape[axis] - 1, d.shape[axis],
                                    axis=axis)
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

    # ---- continuous address pre-wrap ---------------------------------
    if s.address_mode is AddressMode.MIRRORED_REPEAT:
        mu, mv = jnp.mod(u, 2.0), jnp.mod(v, 2.0)
        cu = jnp.where(mu <= 1.0, mu, 2.0 - mu)
        cv = jnp.where(mv <= 1.0, mv, 2.0 - mv)
    elif repeat:
        cu, cv = u, v
    else:
        cu, cv = jnp.clip(u, 0.0, 1.0), jnp.clip(v, 0.0, 1.0)

    # ---- pad to subtile multiples (edge-replicate) and subtile-shape --
    Hp, Wp = -(-H // _SUB) * _SUB, -(-W // _SUB) * _SUB
    if (Hp, Wp) != (H, W):
        pad = ((0, Hp - H), (0, Wp - W))
        cu, cv, lod = (jnp.pad(a, pad, mode="edge") for a in (cu, cv, lod))
        if valid is not None:
            valid = jnp.pad(valid, pad, mode="edge")
    ns = (Hp // _SUB) * (Wp // _SUB)

    def st(a):
        return a.reshape(Hp // _SUB, _SUB, Wp // _SUB, _SUB).transpose(
            0, 2, 1, 3).reshape(ns, _SPIX)

    cus, cvs, lods = st(cu), st(cv), st(lod)
    if valid is not None:
        # coverage-masked footprint: replace uncovered pixels' coords with
        # the subtile's covered-mean (so footprint min/max, the window
        # origin, AND the fit test see only real pixels; uncovered output
        # is garbage-but-masked by the caller either way) and their lod
        # with the covered max (keeps frac in range). All-uncovered
        # subtiles fall back to coords 0 / lod 0 — fully masked anyway.
        vs = st(valid)
        cnt = jnp.maximum(jnp.sum(vs, axis=1, keepdims=True), 1)
        mu = jnp.sum(jnp.where(vs, cus, 0.0), axis=1, keepdims=True) / cnt
        mv = jnp.sum(jnp.where(vs, cvs, 0.0), axis=1, keepdims=True) / cnt
        ml = jnp.max(jnp.where(vs, lods, 0.0), axis=1, keepdims=True)
        cus = jnp.where(vs, cus, mu)
        cvs = jnp.where(vs, cvs, mv)
        lods = jnp.where(vs, lods, ml)

    # ---- per-subtile level: derivative LOD floor + footprint fit ------
    # the EXACT fit test per level: the window origin snaps down to the
    # 16 grid, so the subtile fits iff lastfloor+1 (bilinear neighbor)
    # stays within the 32 rows starting at that origin — a span-only
    # bound would waste up to one whole level on alignment
    cu_min, cu_max = jnp.min(cus, axis=1), jnp.max(cus, axis=1)
    cv_min, cv_max = jnp.min(cvs, axis=1), jnp.max(cvs, axis=1)
    lmin = jnp.floor(jnp.min(lods, axis=1)).astype(jnp.int32)
    lsub = jnp.full(cu_min.shape, nlev - 1, jnp.int32)
    for li in range(nlev - 1, -1, -1):
        hh, ww_ = tex.mip_dims[li][0], tex.mip_dims[li][1]

        def axfit(cmin, cmax, n):
            lo = jnp.floor(_tcoord(cmin, float(n), repeat))
            hi = jnp.floor(_tcoord(cmax, float(n), repeat))
            org = jnp.floor(lo / _WIN_STRIDE) * _WIN_STRIDE
            return hi + 1 - org <= _WIN - 1

        fit = (axfit(cu_min, cu_max, ww_) & axfit(cv_min, cv_max, hh)
               & (lmin <= li))
        lsub = jnp.where(fit, li, lsub)
    l1 = jnp.minimum(lsub + 1, nlev - 1)
    frac = jnp.clip(lods - lsub[:, None].astype(jnp.float32), 0.0, 1.0)

    def tap_planes(lvl):
        """Window id + local integer/fraction coordinate planes for one
        per-subtile mip level (ns,) int32."""
        wl = jnp.zeros_like(lvl)
        hl = jnp.zeros_like(lvl)
        off = jnp.zeros_like(lvl)
        nwy = jnp.zeros_like(lvl)
        nwx = jnp.zeros_like(lvl)
        for li, (ny, nx, o) in enumerate(tex.win_dims):
            sel = lvl == li
            hh, ww_ = tex.mip_dims[li][0], tex.mip_dims[li][1]
            wl = jnp.where(sel, ww_, wl)
            hl = jnp.where(sel, hh, hl)
            off = jnp.where(sel, o, off)
            nwy = jnp.where(sel, ny, nwy)
            nwx = jnp.where(sel, nx, nwx)
        tu = _tcoord(cus, wl[:, None].astype(jnp.float32), repeat)
        tv = _tcoord(cvs, hl[:, None].astype(jnp.float32), repeat)
        ty = jnp.floor(tv)
        tx = jnp.floor(tu)
        fy = (tv - ty).astype(jnp.float32)
        fx = (tu - tx).astype(jnp.float32)
        ty, tx = ty.astype(jnp.int32), tx.astype(jnp.int32)
        oy = jnp.floor_divide(jnp.min(ty, axis=1), _WIN_STRIDE)   # (ns,)
        ox = jnp.floor_divide(jnp.min(tx, axis=1), _WIN_STRIDE)
        widx = (off + jnp.mod(oy, nwy) * nwx + jnp.mod(ox, nwx)
                ).astype(jnp.int32)
        ty_l = jnp.clip(ty - oy[:, None] * _WIN_STRIDE, 0, _WIN - 2)
        tx_l = jnp.clip(tx - ox[:, None] * _WIN_STRIDE, 0, _WIN - 2)
        return widx, ty_l, fy, tx_l, fx

    w0i, ty0, fy0, tx0, fx0 = tap_planes(lsub)
    w1i, ty1, fy1, tx1, fx1 = tap_planes(l1)

    # ---- kernel ------------------------------------------------------
    nsp = -(-ns // _NSUB) * _NSUB      # steps take _NSUB subtiles each
    if nsp != ns:
        padn = ((0, nsp - ns), (0, 0))
        w0i = jnp.pad(w0i, ((0, nsp - ns),))
        w1i = jnp.pad(w1i, ((0, nsp - ns),))
        ty0, fy0, tx0, fx0, ty1, fy1, tx1, fx1, frac = (
            jnp.pad(a, padn) for a in (ty0, fy0, tx0, fx0, ty1, fy1,
                                       tx1, fx1, frac))
    nts = nsp // _NSUB
    interpret = jax.default_backend() != "tpu"
    px = pl.BlockSpec((_NSUB, _SPIX), lambda i, a, b: (i, 0),
                      memory_space=pltpu.VMEM)
    win0_specs = [
        pl.BlockSpec((1, _C * _WIN, _WIN),
                     (lambda s_: lambda i, a, b: (a[i, s_], 0, 0))(k),
                     memory_space=pltpu.VMEM)
        for k in range(_NSUB)]
    win1_specs = [
        pl.BlockSpec((1, _C * _WIN, _WIN),
                     (lambda s_: lambda i, a, b: (b[i, s_], 0, 0))(k),
                     memory_space=pltpu.VMEM)
        for k in range(_NSUB)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nts,),
        in_specs=[px] * 9 + win0_specs + win1_specs,
        out_specs=pl.BlockSpec((1, _C, _NSUB * _SPIX),
                               lambda i, a, b: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    wt = tex.win_table
    out = pl.pallas_call(
        _subtile_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nts, _C, _NSUB * _SPIX),
                                       jnp.float32),
        interpret=interpret,
    )(w0i.reshape(nts, _NSUB), w1i.reshape(nts, _NSUB),
      ty0, fy0, tx0, fx0, ty1, fy1, tx1, fx1, frac,
      *([wt] * _NSUB), *([wt] * _NSUB))

    # ---- un-subtile (nts, C, NSUB*SPIX) -> (H, W, 4) ------------------
    flat = out.reshape(nts, _C, _NSUB, _SPIX).transpose(
        0, 2, 1, 3).reshape(nsp, _C, _SPIX)[:ns]

    # ---- BINDING-subtile gather fallback ------------------------------
    # A subtile is BINDING when its window-fitted tap range [lsub, l1]
    # does not cover its per-pixel LOD range: pixels wanting finer than
    # lsub (the 32-texel footprint-fit cap bound — anisotropic/minified
    # regions, the exp_raster4 C-vs-D 39.9 dB term) render over-blurred,
    # pixels wanting coarser than l1 render aliased (the frac clip).
    # Those subtiles re-sample through the per-pixel gather path under a
    # static budget of ceil(subtile_fallback * ns) subtiles, WORST
    # offenders first (severity-sorted), and replace their kernel rows
    # via one row gather + select — no scatter. Budget overflow degrades
    # to the plain subtile answer (never worse than fallback-off).
    fb_frac = float(os.environ.get("RAYEATER_SUBTILE_FB",
                                   s.subtile_fallback))
    if fb_frac > 0.0:
        nb = min(ns, max(8, -(-int(ns * fb_frac) // 8) * 8))
        lod_lo = jnp.min(lods, axis=1)
        lod_hi = jnp.max(lods, axis=1)
        sev = (jnp.maximum(lsub.astype(jnp.float32) - lod_lo, 0.0)
               + jnp.maximum(lod_hi - l1.astype(jnp.float32), 0.0))
        bind = sev > 0.01
        sel = jnp.argsort(-sev)[:nb].astype(jnp.int32)
        cus_s = jnp.take(cus, sel, axis=0)          # (nb, SPIX)
        cvs_s = jnp.take(cvs, sel, axis=0)
        lod_s = jnp.take(lods, sel, axis=0)
        l0s = jnp.floor(lod_s).astype(jnp.int32)
        frs = (lod_s - l0s.astype(jnp.float32))[..., None]
        a = _mip_tap(tex, cus_s, cvs_s, l0s)
        b = _mip_tap(tex, cus_s, cvs_s, jnp.minimum(l0s + 1, nlev - 1))
        fb = (a * (1.0 - frs) + b * frs).transpose(0, 2, 1)  # (nb,C,SPIX)
        slot = jnp.zeros((ns,), jnp.int32).at[sel].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop")
        use = jnp.zeros((ns,), bool).at[sel].set(
            jnp.take(bind, sel), mode="drop")
        flat = jnp.where(use[:, None, None],
                         jnp.take(fb, slot, axis=0), flat)
    img = flat.reshape(Hp // _SUB, Wp // _SUB, _C, _SUB, _SUB).transpose(
        0, 3, 1, 4, 2).reshape(Hp, Wp, _C)
    return img[:H, :W]


def _sample_mip(tex, uv: jnp.ndarray) -> jnp.ndarray:
    """Trilinear mipmapped sampling with per-pixel LOD from screen-space
    uv derivatives (edge-replicated finite differences — the dense-array
    analog of the GPU's 2x2-quad derivatives, same boundary caveats) and
    the standard anisotropic LOD-sharpening approximation
    (``Sampler.max_anisotropy``). Two taps (adjacent levels) + lerp."""
    s = tex.sampler
    h0, w0 = tex.mip_dims[0][0], tex.mip_dims[0][1]
    nlev = len(tex.mip_dims)
    u, v = uv[..., 0], uv[..., 1]

    def ddiff(a, axis):
        d = jnp.diff(a, axis=axis)
        edge = jax.lax.slice_in_dim(d, d.shape[axis] - 1, d.shape[axis],
                                    axis=axis)
        return jnp.concatenate([d, edge], axis=axis)

    dudx, dvdx = ddiff(u, -1) * w0, ddiff(v, -1) * h0
    dudy, dvdy = ddiff(u, -2) * w0, ddiff(v, -2) * h0
    ddx = dudx * dudx + dvdx * dvdx
    ddy = dudy * dudy + dvdy * dvdy
    r_max = jnp.sqrt(jnp.maximum(jnp.maximum(ddx, ddy), 1e-20))
    r_min = jnp.sqrt(jnp.maximum(jnp.minimum(ddx, ddy), 1e-20))
    aniso = jnp.clip(r_max / r_min, 1.0, float(s.max_anisotropy))
    lod = jnp.log2(jnp.maximum(r_max / aniso, 1.0))
    lod = jnp.clip(lod, 0.0, float(nlev - 1))
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - l0.astype(jnp.float32))[..., None]
    a = _mip_tap(tex, u, v, l0)
    b = _mip_tap(tex, u, v, jnp.minimum(l0 + 1, nlev - 1))
    return a * (1.0 - frac) + b * frac
