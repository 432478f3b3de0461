"""Device-resident multi-frame rendering: N frames in ONE dispatch.

The reference's frame loop issues one submit + present per frame
(basic_planes.zig:316-350); the TPU analog of that loop pays a host→device
dispatch round trip per frame (~60-140 ms through a tunnel, ~1 ms locally)
which dwarfs small frame programs. ``render_animation`` moves the loop
into the compiled program: ``lax.scan`` over the camera-time axis with the
swapchain's sRGB/u8 encode fused in, so an entire flythrough costs one
dispatch and one device→host DMA of the packed u8 frames.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .resources import Framebuffer
from .swapchain import encode_present


def render_animation(frame_fn: Callable, n_frames: int,
                     t0: float = 0.0, dt: float = 1.0 / 60.0,
                     srgb: bool = True,
                     keep: str = "all",
                     carry=None):
    """Render ``n_frames`` frames of ``frame_fn(t)`` in one jitted scan.

    ``frame_fn`` is a jax-traceable function of a scalar time returning a
    Framebuffer or an (H, W, 3|4) f32 image. Returns u8 RGBA frames:
    ``keep="all"`` → (n, H, W, 4) (one big device→host DMA);
    ``keep="last"`` → (H, W, 4) (constant memory — FPS benchmarking).

    With ``carry`` (any pytree), ``frame_fn(t, carry) -> (frame,
    new_carry)`` threads per-frame state through the scan — e.g. the
    temporal adaptive-LOD budget loop (frame N's telemetry drives frame
    N+1's per-tile budgets, bench.py shape).

    The whole animation is ONE XLA program: per-frame uniforms/cameras must
    be computed inside ``frame_fn`` from ``t`` (any eager op per frame
    would defeat the point).
    """
    run = _compiled_animation(frame_fn, srgb, keep, carry is not None)
    ts = t0 + np.arange(n_frames, dtype=np.float32) * np.float32(dt)
    if carry is not None:
        return run(jnp.asarray(ts), carry)
    return run(jnp.asarray(ts))


_cache: dict = {}


def _compiled_animation(frame_fn, srgb: bool, keep: str,
                        has_carry: bool = False):
    """One jitted scan program per (frame_fn, srgb, keep) — repeated
    render_animation calls with the same frame function and frame count
    reuse the compiled executable instead of retracing."""
    if keep not in ("all", "last"):
        raise ValueError(f"keep must be 'all' or 'last', got {keep!r}")
    key = (id(frame_fn), srgb, keep, has_carry)
    if key in _cache:
        return _cache[key]

    def to_u8(out):
        if isinstance(out, Framebuffer):
            # crop the lane-padded framebuffer to its logical extent —
            # returning the padded width leaks a black band into saved
            # frames (caught on 900-wide targets, which pad to 1024)
            return encode_present(out.color, out.width, out.height, srgb)
        h, w = out.shape[0], out.shape[1]
        return encode_present(out, w, h, srgb)

    if has_carry:
        @jax.jit
        def run(ts, c0):
            def step(carry, t):
                last, c = carry
                frame, c2 = frame_fn(t, c)
                img = to_u8(frame)
                if keep == "all":
                    return (last, c2), img
                return (img, c2), ()

            init_img = (jnp.zeros((), jnp.int32) if keep == "all"
                        else to_u8(frame_fn(ts[0], c0)[0]) * 0)
            (last, _), stacked = jax.lax.scan(step, (init_img, c0), ts)
            return stacked if keep == "all" else last
    else:
        @jax.jit
        def run(ts):
            def step(carry, t):
                img = to_u8(frame_fn(t))
                if keep == "all":
                    return carry, img
                return img, ()

            init = (jnp.zeros((), jnp.int32) if keep == "all"
                    else to_u8(frame_fn(ts[0])) * 0)
            last, stacked = jax.lax.scan(step, init, ts)
            return stacked if keep == "all" else last

    _cache[key] = run
    return run
