"""Depth-completion evaluation metrics (valid-pixel masked, NHWC).

The reference ships no metrics beyond its training loss (SURVEY.md §6); this
is the standard KITTI/NYU depth-completion metric set the community reports,
added so the framework can be evaluated against published numbers.
All metrics ignore pixels where gt == 0 (invalid).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _valid(gt: jax.Array) -> jax.Array:
    return (gt > 0).astype(gt.dtype)


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def rmse(pred: jax.Array, gt: jax.Array) -> jax.Array:
    m = _valid(gt)
    return jnp.sqrt(_masked_mean((pred - gt) ** 2, m))


def mae(pred: jax.Array, gt: jax.Array) -> jax.Array:
    m = _valid(gt)
    return _masked_mean(jnp.abs(pred - gt), m)


def irmse(pred: jax.Array, gt: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Inverse-depth RMSE (1/km on KITTI when depths are in meters)."""
    m = _valid(gt)
    inv_p = 1.0 / jnp.maximum(pred, eps)
    inv_g = jnp.where(gt > 0, 1.0 / jnp.maximum(gt, eps), 0.0)
    return jnp.sqrt(_masked_mean((inv_p - inv_g) ** 2, m))


def imae(pred: jax.Array, gt: jax.Array, eps: float = 1e-8) -> jax.Array:
    m = _valid(gt)
    inv_p = 1.0 / jnp.maximum(pred, eps)
    inv_g = jnp.where(gt > 0, 1.0 / jnp.maximum(gt, eps), 0.0)
    return _masked_mean(jnp.abs(inv_p - inv_g), m)


def delta_threshold(pred: jax.Array, gt: jax.Array, thresh: float = 1.25) -> jax.Array:
    """Fraction of valid pixels with max(pred/gt, gt/pred) < thresh."""
    m = _valid(gt)
    safe_pred = jnp.maximum(pred, 1e-8)
    safe_gt = jnp.where(gt > 0, gt, 1.0)
    ratio = jnp.maximum(safe_pred / safe_gt, safe_gt / safe_pred)
    return _masked_mean((ratio < thresh).astype(gt.dtype), m)


def rel_rmse(pred: jax.Array, ref: jax.Array) -> jax.Array:
    """Relative RMSE vs a reference output (the BASELINE parity metric)."""
    return jnp.sqrt(jnp.mean((pred - ref) ** 2)) / (
        jnp.sqrt(jnp.mean(ref**2)) + 1e-12
    )


def compute_all(pred: jax.Array, gt: jax.Array) -> dict[str, jax.Array]:
    return {
        "rmse": rmse(pred, gt),
        "mae": mae(pred, gt),
        "irmse": irmse(pred, gt),
        "imae": imae(pred, gt),
        "delta1": delta_threshold(pred, gt, 1.25),
        "delta2": delta_threshold(pred, gt, 1.25**2),
        "delta3": delta_threshold(pred, gt, 1.25**3),
    }
