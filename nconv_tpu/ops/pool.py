"""Pooling ops for confidence-carrying feature maps (NHWC).

The reference downsamples signal and confidence with two separate
``F.max_pool2d`` calls per stage (`/root/reference/models/step1.py:62-75`).
Here the pair is pooled jointly so XLA sees one reduce-window over a stacked
tensor and can fuse the surrounding elementwise work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """``F.max_pool2d`` parity (floor mode, no padding) on NHWC."""
    stride = stride or window
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def max_pool_pair(
    x: jax.Array, c: jax.Array, window: int = 2
) -> tuple[jax.Array, jax.Array]:
    """Jointly max-pool a (signal, confidence) pair with one reduce-window.

    Note this is elementwise-independent max (exactly the reference's two
    separate pools), *not* confidence-argmax pooling.
    """
    stacked = jnp.concatenate([x, c], axis=-1)
    pooled = max_pool2d(stacked, window)
    ch = x.shape[-1]
    return pooled[..., :ch], pooled[..., ch:]
