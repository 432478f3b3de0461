"""Host image codecs + sRGB transfer functions.

Replaces the reference's external ``rsh.loadImageFile`` PNG decode
(image.zig:437) and the swapchain's sRGB surface-format encode
(swapchain.zig:39-57 requests r8g8b8a8_srgb). Decoding happens on host;
a native C++ fast path is used when the extension is built (io.native).
"""

from __future__ import annotations

import numpy as np

from ..utils.logging import scoped

_log = scoped("io")


def srgb_to_linear(c: np.ndarray) -> np.ndarray:
    """IEC 61966-2-1 decode (what the hardware does when sampling an
    _srgb-format image, image.zig:449)."""
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    """IEC 61966-2-1 encode (writing to an _srgb swapchain image). Works on
    numpy or jax arrays (used by the present path on device)."""
    import jax.numpy as jnp
    xp = jnp if not isinstance(c, np.ndarray) else np
    c = xp.clip(c, 0.0, 1.0)
    return xp.where(c <= 0.0031308, c * 12.92,
                    1.055 * xp.power(c, 1.0 / 2.4) - 0.055)


def to_srgb_u8(img) -> np.ndarray:
    """Linear-light float image → sRGB-encoded uint8 (host array).
    The shared present-encode for samples that bypass the Swapchain."""
    import jax.numpy as jnp
    return np.asarray(jnp.round(linear_to_srgb(img) * 255.0
                                ).astype(jnp.uint8))


def load_image(path: str) -> np.ndarray:
    """Decode an image file to ``(H, W, 4)`` uint8 RGBA (native C++ PNG
    decoder when built; PIL otherwise)."""
    if path.lower().endswith(".png"):
        try:
            from ..native import loader as native
            if native.available():
                with open(path, "rb") as f:
                    arr = native.png_decode(f.read())
                return _to_rgba(arr)
        except Exception as e:
            _log.debug("native decode fell back (%s)", e)
    from PIL import Image
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGBA"), np.uint8)
    _log.debug("loaded %s: %s", path, arr.shape)
    return arr


def _to_rgba(arr: np.ndarray) -> np.ndarray:
    if arr.shape[-1] == 4:
        return arr
    if arr.shape[-1] == 3:
        a = np.full((*arr.shape[:2], 1), 255, np.uint8)
        return np.concatenate([arr, a], -1)
    if arr.shape[-1] == 1:
        return np.concatenate([arr] * 3 + [np.full_like(arr, 255)], -1)
    rgb = np.repeat(arr[..., :1], 3, -1)    # gray+alpha
    return np.concatenate([rgb, arr[..., 1:2]], -1)


def save_png(path: str, rgba_u8: np.ndarray) -> None:
    """Encode ``(H, W, 3|4)`` uint8 to a PNG file (the 'present to disk'
    egress replacing swapchain present, queue.zig:77-91). Uses the native
    C++ encoder when built — fast enough for a 60 FPS present stream."""
    rgba_u8 = np.ascontiguousarray(rgba_u8)
    try:
        from ..native import loader as native
        if native.available():
            with open(path, "wb") as f:
                f.write(native.png_encode(rgba_u8))
            return
    except Exception as e:
        _log.debug("native encode fell back (%s)", e)
    from PIL import Image
    Image.fromarray(rgba_u8).save(path)
