"""Validation mode — the Vulkan-validation-layer analog (SURVEY.md §5.2).

The reference mandates VK_LAYER_KHRONOS_validation at instance creation
(context.zig:145-147) and fails init without it. The TPU equivalent is
split: *static* checks always run at graph bake time
(graph/render_graph.py — DAG acyclicity, undefined reads, hazard ordering),
and this module provides *opt-in runtime* checks — wrap passes with
:func:`checked_pass`, call :func:`check_finite`/:func:`check_framebuffer`
at frame boundaries, or flip :func:`enable_nan_debugging` globally. Runtime
checks force a device sync per call, so they are tools for debug sessions,
not defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .logging import scoped

_log = scoped("validation")


class ValidationError(RuntimeError):
    pass


def enable_nan_debugging() -> None:
    """Global jax NaN debugging (every jitted op checks; slow — debug only).
    The moral analog of enabling all validation-layer severities
    (base.zig:84-99)."""
    jax.config.update("jax_debug_nans", True)
    _log.info("jax_debug_nans enabled")


def check_finite(name: str, *arrays) -> None:
    """Host-side fence + finiteness check on pass outputs."""
    for i, a in enumerate(arrays):
        leaves = jax.tree_util.tree_leaves(a)
        for leaf in leaves:
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                if not bool(jnp.isfinite(leaf).all()):
                    raise ValidationError(
                        f"pass {name!r} output #{i} contains NaN/Inf")


def check_framebuffer(fb, width: int | None = None,
                      height: int | None = None) -> None:
    """Shape/dtype assertions for a framebuffer resource."""
    if fb.color.ndim != 3 or fb.color.shape[-1] != 4:
        raise ValidationError(f"framebuffer color must be (H, W, 4), got "
                              f"{fb.color.shape}")
    if fb.depth.shape != fb.color.shape[:2]:
        raise ValidationError(
            f"depth {fb.depth.shape} mismatches color {fb.color.shape[:2]}")
    if fb.color.dtype != jnp.float32 or fb.depth.dtype != jnp.float32:
        raise ValidationError("framebuffer must be float32")
    if width is not None and fb.width != width:
        raise ValidationError(f"fb width {fb.width} != expected {width}")
    if height is not None and fb.height != height:
        raise ValidationError(f"fb height {fb.height} != expected {height}")


def checked_pass(name: str, fn):
    """Wrap a render-graph pass with output finiteness validation (runtime
    mode; costs a device sync per pass — bake-time validation is free and
    always on)."""
    def wrapper(inputs):
        outs = fn(inputs)
        check_finite(name, outs)
        return outs
    return wrapper
