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

import jax
import jax.numpy as jnp

from ..core.resources import AddressMode, Filter, Texture


def _wrap(i: jnp.ndarray, n: int, mode: AddressMode) -> jnp.ndarray:
    """Apply an address mode to integer texel indices (may be out of range
    on either side)."""
    if mode is AddressMode.REPEAT:
        return jnp.mod(i, n)
    if mode is AddressMode.MIRRORED_REPEAT:
        m = jnp.mod(i, 2 * n)
        return jnp.where(m >= n, 2 * n - 1 - m, m)
    return jnp.clip(i, 0, n - 1)  # CLAMP_TO_EDGE


def sample(tex: Texture, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample ``tex`` at normalized ``uv`` (..., 2) → (..., 4) linear RGBA.

    Vulkan texel addressing: ``t = uv * size - 0.5`` with the filter applied
    in unnormalized texel space.
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
