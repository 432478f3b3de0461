"""Differentiable 3DGS rendering + training step.

The production composite kernel (ops/gs.py) is a Pallas forward path; this
module provides the *differentiable* splatting path used to fit Gaussian
scenes to images — pure jnp end to end so JAX autodiff flows through EWA
projection, depth-ordered transmittance, and compositing. Scaling strategy:

* pixels are processed in row chunks under ``lax.map`` so the (pixels x
  splats) alpha matrix never fully materializes;
* the training step is **data-parallel over pixel row-bands**: each device
  renders its band against the full (replicated) splat set and gradients
  are ``psum``-ed over the mesh — the classic DP recipe, expressed with
  shard_map + ICI collectives;
* parameters live in activation space (log-scale, opacity logit, raw quat)
  like the original 3DGS optimizer, so optimization is unconstrained.

Two differentiable renderers are provided:

* :func:`render_diff` — pure jnp, autodiff end to end. Materializes
  (row_chunk x W x N) alpha tensors: small/medium clouds only, but a
  fully independent derivation used to validate the kernel path.
* :func:`render_diff_pallas` — the production Pallas pipeline with a
  custom-VJP reverse-sweep kernel (ops/gs.py composite_diff). Compact
  per-tile LOD bounds the backward checkpoint memory, so this path trains
  1M-splat scenes at full resolution. Gradients validated against jnp
  autodiff of the same composite to ~2e-7 relative (tests/test_gs_training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.resources import pytree_dataclass
from ..ops.gs import project_gaussians
from .gaussians import GaussianCloud


@pytree_dataclass
class GaussianParams:
    """Trainable activation-space parameters."""
    means: jnp.ndarray       # (N, 3)
    log_scales: jnp.ndarray  # (N, 3)
    quats: jnp.ndarray       # (N, 4) unnormalized
    opacity_logits: jnp.ndarray  # (N,)
    colors: jnp.ndarray      # (N, 3) raw (sigmoid-activated)


def params_from_cloud(cloud: GaussianCloud) -> GaussianParams:
    eps = 1e-6
    op = jnp.clip(cloud.opacities, eps, 1 - eps)
    col = jnp.clip(cloud.colors, eps, 1 - eps)
    return GaussianParams(
        means=cloud.means,
        log_scales=jnp.log(jnp.maximum(cloud.scales, 1e-12)),
        quats=cloud.quats,
        opacity_logits=jnp.log(op / (1 - op)),
        colors=jnp.log(col / (1 - col)),
    )


def cloud_from_params(p: GaussianParams) -> GaussianCloud:
    return GaussianCloud(
        means=p.means,
        scales=jnp.exp(p.log_scales),
        quats=p.quats / jnp.linalg.norm(p.quats, axis=-1,
                                        keepdims=True).clip(1e-12),
        opacities=jax.nn.sigmoid(p.opacity_logits),
        colors=jax.nn.sigmoid(p.colors),
    )


def render_diff(params: GaussianParams, view, proj, width: int, height: int,
                background=(0.0, 0.0, 0.0), row_chunk: int = 16,
                y_offset: float = 0.0,
                full_height: int | None = None,
                mean2d_offset=None) -> jnp.ndarray:
    """Differentiable render → (height, width, 3).

    ``y_offset`` shifts the pixel grid and ``full_height`` gives the whole
    image's height (used by the sharded trainer: device d renders rows
    [y_offset, y_offset + height) of a full_height image). Splats are
    depth-ordered with a straight-through sort (ordering indices are
    non-differentiable; values flow through a gather, which has a
    well-defined VJP).

    ``mean2d_offset`` (N, 2), usually zeros: added to the projected
    screen-space means so its gradient is the per-splat view-space
    positional gradient (densification statistic, models/gs_densify.py).
    """
    cloud = cloud_from_params(params)
    ps = project_gaussians(cloud.means, cloud.scales, cloud.quats,
                           cloud.opacities, cloud.colors, view, proj,
                           width, full_height or height)
    if mean2d_offset is not None:
        ps = ps._replace(mean2d=ps.mean2d + mean2d_offset)
    order = jax.lax.stop_gradient(jnp.argsort(ps.depth))
    g = lambda a: jnp.take(a, order, axis=0)
    mx, my = g(ps.mean2d[:, 0]), g(ps.mean2d[:, 1])
    ca, cb, cc = (g(ps.conic[:, 0]), g(ps.conic[:, 1]), g(ps.conic[:, 2]))
    live = jnp.isfinite(g(ps.depth)).astype(jnp.float32)
    op = g(ps.opacity) * live
    col = g(ps.color)                                    # (N, 3)
    bg = jnp.asarray(background, jnp.float32)

    xs = jnp.arange(width, dtype=jnp.float32) + 0.5      # (W,)

    def render_rows(y0):
        ys = y0 + jnp.arange(row_chunk, dtype=jnp.float32) + 0.5 + y_offset
        dx = xs[None, :, None] - mx[None, None, :]       # (1, W, N)
        dy = ys[:, None, None] - my[None, None, :]       # (R, 1, N)
        power = (-0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy)
        alpha = jnp.minimum(op * jnp.exp(power), 0.99)   # (R, W, N)
        # match the production compositor's 1/255 alpha floor (ops/gs.py
        # _ALPHA_MIN) with a straight-through mask so a trained scene
        # renders identically through render_gaussians; gradients still
        # flow for contributions above the floor. Remaining known delta vs
        # the Pallas path: tile-footprint truncation (radius clamp) is
        # shared via project_gaussians, so only sub-floor tails differ.
        keep = jax.lax.stop_gradient(
            (alpha >= 1.0 / 255.0).astype(alpha.dtype))
        alpha = alpha * keep
        logT = jnp.cumsum(jnp.log1p(-alpha), axis=-1)
        t_prev = jnp.exp(logT - jnp.log1p(-alpha))       # exclusive prefix
        w = alpha * t_prev                               # (R, W, N)
        rgb = jnp.einsum("rwn,nc->rwc", w, col)
        t_final = jnp.exp(logT[..., -1:])
        return rgb + t_final * bg

    nrows = (height + row_chunk - 1) // row_chunk
    y0s = jnp.arange(nrows, dtype=jnp.float32) * row_chunk
    img = jax.lax.map(render_rows, y0s)                  # (nrows, R, W, 3)
    return img.reshape(nrows * row_chunk, width, 3)[:height]


def render_diff_pallas(params: GaussianParams, view, proj, width: int,
                       height: int, background=(0.0, 0.0, 0.0),
                       max_splats_per_tile: int = 256,
                       interpret: bool = False,
                       mean2d_offset=None) -> jnp.ndarray:
    """Differentiable render through the production Pallas pipeline
    (custom-VJP composite backward) — the 1M-splat-scale training path.
    Cites ops/gs.py render_gaussians_diff for the kernel details."""
    from ..ops.gs import render_gaussians_diff
    cloud = cloud_from_params(params)
    return render_gaussians_diff(
        cloud.means, cloud.scales, cloud.quats, cloud.opacities,
        cloud.colors, view, proj, width, height, background=background,
        max_splats_per_tile=max_splats_per_tile, interpret=interpret,
        mean2d_offset=mean2d_offset)


def make_train_step_pallas(optimizer, view, proj,
                           background=(0.0, 0.0, 0.0),
                           max_splats_per_tile: int = 256,
                           interpret: bool = False):
    """Single-device training step through the Pallas kernels — scales to
    1M splats (the jnp path's (pixels x splats) tensors do not)."""

    def loss_fn(params, target):
        img = render_diff_pallas(params, view, proj, target.shape[1],
                                 target.shape[0], background,
                                 max_splats_per_tile, interpret)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(params, opt_state, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def l2_loss(params, view, proj, target, background=(0.0, 0.0, 0.0),
            y_offset: float = 0.0, full_height: int | None = None):
    h, w = target.shape[0], target.shape[1]
    img = render_diff(params, view, proj, w, h, background,
                      y_offset=y_offset, full_height=full_height)
    return jnp.mean((img - target) ** 2)


def make_train_step(optimizer, view, proj, background=(0.0, 0.0, 0.0)):
    """Single-device training step: (params, opt_state, target) → updated."""

    @jax.jit
    def step(params, opt_state, target):
        loss, grads = jax.value_and_grad(l2_loss)(params, view, proj,
                                                  target, background)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def make_train_step_dp(optimizer, view, proj, mesh,
                       background=(0.0, 0.0, 0.0)):
    """Data-parallel training step over a device mesh: the target image is
    sharded into row bands (one per device), each device renders + grades
    its band against replicated params, and gradients are psum-ed over the
    mesh — the renderer's "dp" recipe."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    d = mesh.shape[axis]

    def local_grad(params, target_band):
        band_h = target_band.shape[0]
        y0 = (jax.lax.axis_index(axis) * band_h).astype(jnp.float32)
        loss, grads = jax.value_and_grad(l2_loss)(
            params, view, proj, target_band, background, y_offset=y0,
            full_height=band_h * d)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.lax.pmean(grads, axis)
        return loss, grads

    sharded_grad = jax.shard_map(
        local_grad, mesh=mesh,
        in_specs=(P(), P(axis, None, None)),
        out_specs=(P(), P()),
        check_vma=False)

    @jax.jit
    def step(params, opt_state, target):
        h = target.shape[0]
        if h % d:
            raise ValueError(f"target height {h} not divisible by mesh {d}")
        loss, grads = sharded_grad(params, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step
