"""Training losses (NHWC), rebuilt from the reference loss stack
(`/root/reference/utils.py:63-151`).

Semantics preserved exactly (and verified against the reference in
tests/test_losses.py):
  * sparse-GT masking zeroes the *prediction* wherever gt == 0, then takes
    plain MSE over all pixels (so the loss scale depends on GT sparsity);
  * gradient loss Sobel-filters the (gt - pred) difference and averages the
    absolute responses of both directions;
  * combined loss = 0.8 * sqrt(MSE) + 0.2 * gradient;
  * the multi-resolution loss bilinearly resizes every scale to the full
    resolution (align_corners=False) and averages.

Deliberate fix (SURVEY.md §7): the reference's multi-resolution loss trains
on batch element 0 only (`utils.py:69`). ``batch_reduce='first'`` reproduces
that; the default ``'mean'`` uses the whole batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops import resize_bilinear, sobel_xy


def masked_mse(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """MSE with prediction zeroed where gt == 0 (reference utils.py:138-140,
    149)."""
    pred = jnp.where(gt == 0, 0.0, pred)
    return jnp.mean((pred - gt) ** 2)


def gradient_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean |Sobel| of the (gt - pred) difference, x + y directions
    (reference utils.py:125-136)."""
    diff = gt - pred
    gx, gy = sobel_xy(diff)
    return jnp.mean(jnp.abs(gx)) + jnp.mean(jnp.abs(gy))


def depth_loss(
    pred: jax.Array, gt: jax.Array, *, use_gradient_loss: bool = True
) -> jax.Array:
    """Reference ``calculate_loss`` (utils.py:138-151)."""
    masked = jnp.where(gt == 0, 0.0, pred)
    mse = jnp.mean((masked - gt) ** 2)
    if not use_gradient_loss:
        return mse
    return 0.8 * jnp.sqrt(mse) + 0.2 * gradient_loss(masked, gt)


def multi_resolution_loss(
    scales: list[jax.Array],
    gt: jax.Array,
    *,
    use_gradient_loss: bool = True,
    batch_reduce: str = "mean",
) -> jax.Array:
    """Reference ``calculate_loss_multi_resolution`` (utils.py:63-71): resize
    each scale's prediction to gt's resolution, average the per-scale losses.

    ``batch_reduce='first'`` restricts the loss to batch element 0 (exact
    reference behaviour); ``'mean'`` uses the full batch.
    """
    h, w = gt.shape[1:3]
    total = 0.0
    for pred in scales:
        up = resize_bilinear(pred, (h, w), align_corners=False)
        if batch_reduce == "first":
            total = total + depth_loss(
                up[0:1], gt[0:1], use_gradient_loss=use_gradient_loss
            )
        else:
            total = total + depth_loss(up, gt, use_gradient_loss=use_gradient_loss)
    return total / len(scales)
