"""GPU resources as arrays/pytrees.

TPU-native replacement for the reference's buffer/image zoo (buffer.zig,
vertex_buffer.zig, index_buffer.zig, uniform.zig, storage_buffer.zig,
image.zig, texture.zig, depth.zig, frame_buffer.zig): every resource is an
HBM-resident jax array (or a small pytree of them). ``setData`` becomes a
functional update / ``jax.device_put`` (the staging-DMA path of
buffer.zig:140-161 collapses into one host→HBM DMA), and layout transitions
/ barriers (image.zig:203-293) vanish into XLA data dependencies.
"""

from __future__ import annotations

import dataclasses
import enum
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import pad_to as _pad


def pytree_dataclass(cls):
    """Register a dataclass as a jax pytree (array fields = children)."""
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    data = [n for n in fields if n not in getattr(cls, "_static_fields", ())]
    meta = [n for n in fields if n in getattr(cls, "_static_fields", ())]
    return jax.tree_util.register_dataclass(cls, data_fields=data,
                                            meta_fields=meta)


# ---------------------------------------------------------------------------
# Framebuffer (frame_buffer.zig + depth.zig + renderpass clear semantics)
# ---------------------------------------------------------------------------

@pytree_dataclass
class Framebuffer:
    """HBM-resident render target: color ``(H, W, 4)`` f32 linear-light and
    depth ``(H, W)`` f32 (frame_buffer.zig:36-51 + depth.zig:17-37).

    The width is padded to a multiple of 128 lanes at creation so Pallas
    kernels always see aligned tiles; ``width``/``height`` record the
    logical extent (crop on present).
    """

    color: jnp.ndarray   # (H, Wpad, 4) float32
    depth: jnp.ndarray   # (H, Wpad)    float32
    width: int
    height: int

    _static_fields = ("width", "height")

    @property
    def padded_width(self) -> int:
        return self.color.shape[1]

    @property
    def padded_height(self) -> int:
        return self.color.shape[0]


def create_framebuffer(width: int, height: int,
                       clear_color=(0.0, 0.0, 0.0, 1.0),
                       clear_depth: float = 1.0,
                       row_align: int = 8,
                       lane_align: int = 128) -> Framebuffer:
    """Allocate + clear a framebuffer.

    Clear values are array initialization — the reference hardcodes black /
    depth=1.0 at vkCmdBeginRenderPass (renderpass.zig:128-132); here they are
    explicit arguments with the same defaults.
    """
    wp, hp = _pad(width, lane_align), _pad(height, row_align)
    color = jnp.broadcast_to(jnp.asarray(clear_color, jnp.float32),
                             (hp, wp, 4)).copy()
    depth = jnp.full((hp, wp), clear_depth, jnp.float32)
    return Framebuffer(color=color, depth=depth, width=width, height=height)


def clear(fb: Framebuffer, clear_color=(0.0, 0.0, 0.0, 1.0),
          clear_depth: float = 1.0) -> Framebuffer:
    """Functional clear (renderpass.zig:126-141 begin-pass clear analog)."""
    color = jnp.broadcast_to(jnp.asarray(clear_color, jnp.float32),
                             fb.color.shape).astype(jnp.float32)
    depth = jnp.full_like(fb.depth, clear_depth)
    return Framebuffer(color=color, depth=depth,
                       width=fb.width, height=fb.height)


# ---------------------------------------------------------------------------
# Textures + samplers (image.zig:85-129, texture.zig)
# ---------------------------------------------------------------------------

class Filter(enum.Enum):
    NEAREST = "nearest"
    LINEAR = "linear"


class AddressMode(enum.Enum):
    """Wrap modes supported by the reference sampler (image.zig:96-101)."""
    REPEAT = "repeat"
    MIRRORED_REPEAT = "mirrored_repeat"
    CLAMP_TO_EDGE = "clamp_to_edge"


@dataclasses.dataclass(frozen=True)
class Sampler:
    """Static sampler state (image.zig:85-129).

    ``mipmap=True`` builds a full pyramid at upload and samples with
    per-pixel trilinear LOD from screen-space uv derivatives — this
    EXCEEDS the reference, whose images are single-mip (image.zig:360-366)
    even though its sampler requests anisotropic filtering.
    ``max_anisotropy`` then applies the standard LOD-sharpening
    approximation (the minification axis may be up to this factor finer
    than isotropic LOD would allow, like the reference's
    maxAnisotropy=props.limits.maxSamplerAnisotropy, image.zig:99-101)."""
    filter: Filter = Filter.LINEAR
    address_mode: AddressMode = AddressMode.MIRRORED_REPEAT
    mipmap: bool = False
    max_anisotropy: float = 1.0
    #: use the zero-gather subtile window sampler when the texture has a
    #: window table (ops.sampling._sample_subtile); False forces the
    #: per-pixel gather mip path. RAYEATER_SUBTILE=0 is a global
    #: override for A/Bs.
    subtile: bool = True
    #: per-frame budget for the BINDING-subtile gather fallback, as a
    #: fraction of the frame's subtiles (0 disables): subtiles whose
    #: per-pixel LOD range escapes the footprint-fitted window level
    #: (anisotropic/minified regions — the exp_raster4 C-vs-D 39.9 dB
    #: term) re-sample through the per-pixel gather path, worst
    #: offenders first. 1/8 covers the 10k-tri scene's binding set with
    #: ~3x headroom (tests/test_sampling.py).
    subtile_fallback: float = 0.125


@pytree_dataclass
class Texture:
    """2D texture: ``(H, W, 4)`` float32 *linear-light* texels.

    The reference stores textures as r8g8b8a8_srgb and the hardware converts
    sRGB→linear at sample time (image.zig:449-455); we decode once at upload
    (see io.image.decode_srgb) and keep linear floats in HBM — same sampled
    values, no per-sample transcendentals.

    ``packed``: optional ``(H, W, 4)`` int32 quad-texel table — entry c
    holds texel c of the 2x2 neighborhood [t00, t10, t01, t11] as RGBA8
    packed little-endian (address-mode neighbors pre-applied), so LINEAR
    sampling costs ONE 4-element row gather per pixel. TPU gathers are
    ELEMENT-count bound (~2.2G elem/s regardless of dtype width), so
    packing 4 u8 channels per element is a 4x sampling speedup over a
    float table and 16x fewer gathered elements than 4 separate RGBA
    fetches; sRGB decode (``packed_srgb``) runs as dense VPU math after
    the gather — exactly what the reference's hardware does when sampling
    an r8g8b8a8_srgb image (image.zig:449-455). Built by default at
    upload (``pack=False`` to skip; 8-bit storage == source precision).
    """
    data: jnp.ndarray  # (H, W, 4) float32 linear
    sampler: Sampler = dataclasses.field(default=Sampler())
    packed: jnp.ndarray | None = None   # (H, W, 4) int32 RGBA8 quad table
    packed_srgb: bool = False  # decode sRGB->linear after the gather
    #: flat quad-texel pyramid: level l's (h_l * w_l, 4) table rows start
    #: at mip_dims[l][2]; built when the sampler requests mipmaps. One
    #: flat table keeps LOD sampling a SINGLE row gather per tap even
    #: with a per-pixel level.
    mip_table: jnp.ndarray | None = None    # (sum h_l*w_l, 4) int32
    mip_dims: tuple = ()                    # ((h_l, w_l, offset), ...)
    #: overlap-window table for the gather-free SUBTILE sampler
    #: (sampling._sample_subtile): per mip level, 32x32-texel windows at
    #: stride 16 covering the level cyclically (REPEAT) or clamped;
    #: channel-blocked (4*32, 32) f32 linear-light — texels decoded from
    #: the SAME u8-quantized mip levels the gather path samples, so the
    #: two paths agree to filter precision. HBM cost ~5.3x the f32 base
    #: image (4x overlap duplication x 1.33 mip tail) — the deliberate
    #: bandwidth-for-gathers trade; RAYEATER_SUBTILE=0 opts out.
    win_table: jnp.ndarray | None = None    # (NWIN, 128, 32) bf16
    win_dims: tuple = ()                    # ((nwy_l, nwx_l, off_l), ...)

    _static_fields = ("sampler", "packed_srgb", "mip_dims", "win_dims")

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]


def _pack_quad_texels(u8: np.ndarray, mode: AddressMode) -> np.ndarray:
    """(H, W, 4) uint8 → (H, W, 4) int32: [t00, t10, t01, t11] with each
    texel's RGBA8 packed little-endian into one int32 and the +1 neighbor
    resolved under the sampler's address mode.

    Neighbor baking is only index-homomorphic for REPEAT; MIRRORED_REPEAT
    and CLAMP use clamp-neighbors — the sampler pre-wraps coordinates in
    continuous space so base indices always land in range (sampling.py
    ``_packed_coords``)."""
    h, w = u8.shape[:2]

    def nxt(n, size):
        i = np.arange(size) + n
        if mode is AddressMode.REPEAT:
            return np.mod(i, size)
        return np.clip(i, 0, size - 1)

    def rgba8(t):
        t = t.astype(np.int64)
        q = t[..., 0] | (t[..., 1] << 8) | (t[..., 2] << 16) | (t[..., 3] << 24)
        return q.astype(np.uint32).astype(np.int32)  # wrap, not overflow

    x1 = nxt(1, w)
    y1 = nxt(1, h)
    return np.stack([rgba8(u8), rgba8(u8[:, x1]), rgba8(u8[y1, :]),
                     rgba8(u8[y1][:, x1])], -1)


def texture_from_array(rgba_u8: np.ndarray, sampler: Sampler | None = None,
                       srgb: bool = True, pack: bool = True) -> Texture:
    """Upload an ``(H, W, 4)`` uint8 image as a texture (Image.fromFile
    analog, image.zig:436-463 — host decode + one DMA, no staging chain)."""
    from ..io.image import srgb_to_linear
    sampler = sampler or Sampler()
    f = rgba_u8.astype(np.float32) / 255.0
    if srgb:
        f[..., :3] = srgb_to_linear(f[..., :3])
    packed = None
    mip_table, mip_dims = None, ()
    win_table, win_dims = None, ()
    if pack and sampler.filter is Filter.LINEAR:
        packed = jnp.asarray(
            _pack_quad_texels(np.asarray(rgba_u8), sampler.address_mode))
        if sampler.mipmap:
            mip_table, mip_dims, lvl_u8s = _build_mip_pyramid(
                np.asarray(rgba_u8), f, srgb, sampler.address_mode)
            h0, w0 = rgba_u8.shape[:2]
            if sampler.address_mode is not AddressMode.REPEAT:
                # clamp-extended windows work at ANY level size: the
                # window grid is ceil(n/16) wide so the last window
                # covers the clamped edge, and the window-index mod in
                # sampling.tap_planes is an identity for in-range coords
                ok = True
            else:
                # REPEAT windows wrap cyclically — every level must tile
                # the wrap period exactly (n % 16 == 0) or divide the
                # 16-texel stride (sub-16 pow2 tails). Pow2 dims satisfy
                # this at every level.
                def _rep_ok(n):
                    while n > 1:
                        if n % 16 and 16 % n:
                            return False
                        n = max(n // 2, 1)
                    return True
                ok = _rep_ok(h0) and _rep_ok(w0)
            if ok:
                win_table, win_dims = _build_win_table(
                    lvl_u8s, srgb, sampler.address_mode)
    return Texture(data=jnp.asarray(f), sampler=sampler, packed=packed,
                   packed_srgb=bool(srgb), mip_table=mip_table,
                   mip_dims=mip_dims, win_table=win_table,
                   win_dims=win_dims)


def _build_mip_pyramid(u8: np.ndarray, linear: np.ndarray, srgb: bool,
                       mode: AddressMode):
    """Box-filtered mip pyramid, filtered in LINEAR light (what hardware
    mip generation does), re-encoded to RGBA8 (sRGB when the base is) and
    quad-packed per level into one flat (sum h_l*w_l, 4) int32 table."""
    from ..io.image import linear_to_srgb
    levels, dims, u8s, off = [], [], [], 0
    lvl_lin = linear
    lvl_u8 = u8
    while True:
        h, w = lvl_u8.shape[:2]
        q = _pack_quad_texels(lvl_u8, mode).reshape(h * w, 4)
        levels.append(q)
        dims.append((h, w, off))
        u8s.append(lvl_u8)
        off += h * w
        if h == 1 and w == 1:
            break
        h2, w2 = max(h // 2, 1), max(w // 2, 1)
        # 2x2 box in linear space (odd tails fold into the last cell)
        acc = np.zeros((h2, w2, 4), np.float64)
        cnt = np.zeros((h2, w2, 1), np.float64)
        for dy in range(2):
            for dx in range(2):
                sub = lvl_lin[dy::2, dx::2][:h2, :w2]
                acc[:sub.shape[0], :sub.shape[1]] += sub
                cnt[:sub.shape[0], :sub.shape[1]] += 1
        lvl_lin = (acc / cnt).astype(np.float32)
        enc = lvl_lin.copy()
        if srgb:
            enc[..., :3] = np.asarray(linear_to_srgb(enc[..., :3]))
        lvl_u8 = np.clip(np.round(enc * 255.0), 0, 255).astype(np.uint8)
    return jnp.asarray(np.concatenate(levels)), tuple(dims), u8s


#: subtile-sampler window geometry: 32x32-texel windows at stride 16 — a
#: subtile whose level-l texel span is <= ~14 always fits one window
#: (origin snaps down to a 16 grid, so the span can start up to 15 texels
#: in; +1 bilinear neighbor uses row/col 31)
_WIN = 32
_WIN_STRIDE = 16


def _build_win_table(lvl_u8s, srgb: bool, mode: AddressMode):
    """Overlap-window table for :func:`sampling._sample_subtile`: for each
    mip level, every (16-strided) 32x32 texel window as a channel-blocked
    (4*32, 32) f32 linear block. Texels come from the same u8-quantized
    levels as ``mip_table``, so the subtile sampler and the gather path
    agree to filter precision. REPEAT wraps window content cyclically;
    CLAMP/MIRRORED clamp (the sampler pre-wraps coordinates continuously,
    so clamped edge texels are exactly what bilinear needs there)."""
    from ..io.image import srgb_to_linear
    wins, dims, off = [], [], 0
    for lvl_u8 in lvl_u8s:
        h, w = lvl_u8.shape[:2]
        f = lvl_u8.astype(np.float32) / 255.0
        if srgb:
            f[..., :3] = np.asarray(srgb_to_linear(f[..., :3]))
        if mode is AddressMode.REPEAT:
            # wrap period nw*stride must equal n (or n divides the
            # stride): texture_from_array gates dims accordingly
            nwy = max(h // _WIN_STRIDE, 1)
            nwx = max(w // _WIN_STRIDE, 1)
        else:
            # clamp extension: ceil so the last window covers the edge
            nwy, nwx = -(-h // _WIN_STRIDE), -(-w // _WIN_STRIDE)
        iy = np.arange(nwy * _WIN_STRIDE + _WIN_STRIDE)
        ix = np.arange(nwx * _WIN_STRIDE + _WIN_STRIDE)
        if mode is AddressMode.REPEAT:
            iy, ix = iy % h, ix % w
        else:
            iy, ix = np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)
        ext = f[iy][:, ix]                              # (Hext, Wext, 4)
        sw = np.lib.stride_tricks.sliding_window_view(
            ext, (_WIN, _WIN), axis=(0, 1))[::_WIN_STRIDE, ::_WIN_STRIDE]
        # (nwy, nwx, 4, 32, 32) -> channel-blocked (nwy*nwx, 4*32, 32)
        wins.append(np.ascontiguousarray(sw).reshape(
            nwy * nwx, 4 * _WIN, _WIN))
        dims.append((nwy, nwx, off))
        off += nwy * nwx
    # optional bf16 windows (RAYEATER_WIN_BF16=1): halves the per-step
    # window DMA and runs the tap contraction as ONE native MXU pass
    # instead of 3 f32 passes, at ~2^-9 relative texel error (below the
    # u8 source quantization but above the f32 path's exact-at-
    # magnification guarantee — test_mip_sample_at_lod0_matches_base
    # pins the f32 default)
    dt = (jnp.bfloat16 if os.environ.get("RAYEATER_WIN_BF16", "0") != "0"
          else jnp.float32)
    return jnp.asarray(np.concatenate(wins), dtype=dt), tuple(dims)


def texture_from_file(path: str, sampler: Sampler | None = None,
                      pack: bool = True) -> Texture:
    """TexImage.fromFile analog (texture.zig:52-74)."""
    from ..io.image import load_image
    return texture_from_array(load_image(path), sampler, pack=pack)
