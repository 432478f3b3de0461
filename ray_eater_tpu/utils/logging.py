"""Scoped loggers mirroring the reference's ``std.log.scoped`` convention.

The reference declares a scoped logger per component (SURVEY.md §5.5;
e.g. base.zig:20 ``.validation``, swapchain.zig:14 ``.swapchain``). We keep
the same scope names under a single ``rayeater`` root logger so log output
is filterable per subsystem.
"""

from __future__ import annotations

import logging
import os

_ROOT = "rayeater"

#: Scope names carried over from the reference (SURVEY.md §5.5).
SCOPES = (
    "validation", "instance", "device", "surface", "swapchain", "queue",
    "command_buffer", "renderpass", "graphics_pipeline", "buffer",
    "descriptor", "image", "shader", "depth_buffer", "graph", "present",
    "raster", "splat", "gs", "bench", "parallel", "io", "native",
)


def scoped(name: str) -> logging.Logger:
    """Return the logger for a component scope (``rayeater.<name>``)."""
    return logging.getLogger(f"{_ROOT}.{name}")


def configure(level: int | str | None = None) -> None:
    """Set up the root rayeater logger once; level from $RAYEATER_LOG."""
    root = logging.getLogger(_ROOT)
    if root.handlers:
        return
    if level is None:
        level = os.environ.get("RAYEATER_LOG", "WARNING").upper()
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter("%(levelname).1s %(name)s: %(message)s"))
    root.addHandler(handler)
    try:
        root.setLevel(level)
    except ValueError:   # bad $RAYEATER_LOG must not break imports
        root.setLevel(logging.WARNING)
        root.warning("unknown RAYEATER_LOG level %r; using WARNING", level)


configure()
