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


def load_image(path: str) -> np.ndarray:
    """Decode an image file to ``(H, W, 4)`` uint8 RGBA."""
    from PIL import Image
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGBA"), np.uint8)
    _log.debug("loaded %s: %s", path, arr.shape)
    return arr


def save_png(path: str, rgba_u8: np.ndarray) -> None:
    """Encode ``(H, W, 3|4)`` uint8 to a PNG file (the 'present to disk'
    egress replacing swapchain present, queue.zig:77-91)."""
    from PIL import Image
    Image.fromarray(np.ascontiguousarray(rgba_u8)).save(path)
