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


def max_pool2d(
    x: jax.Array, window: int = 2, stride: int | None = None,
    layout: str = "nhwc",
) -> jax.Array:
    """``F.max_pool2d`` parity (floor mode, no padding); NHWC or BHCW.

    BHCW 2x2/s2 uses split-maxes instead of ``reduce_window`` — rows split
    on the (cheap, non-minor) H axis, lanes on W — measured 252 vs 415 us
    at the step-1 full-res shape [2,352,8,1280] f32 on v5e."""
    stride = stride or window
    if layout == "bhcw" and window == 2 and stride == 2:
        h2, w2 = (x.shape[1] // 2) * 2, (x.shape[3] // 2) * 2
        x = x[:, :h2, :, :w2]
        y = jnp.maximum(x[:, 0::2], x[:, 1::2])
        return jnp.maximum(y[..., 0::2], y[..., 1::2])
    if layout == "bhcw":
        dims, strides = (1, window, 1, window), (1, stride, 1, stride)
    else:
        dims, strides = (1, window, window, 1), (1, stride, stride, 1)
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=dims,
        window_strides=strides,
        padding="VALID",
    )


def max_pool_pair(
    x: jax.Array, c: jax.Array, window: int = 2, layout: str = "nhwc"
) -> tuple[jax.Array, jax.Array]:
    """Jointly max-pool a (signal, confidence) pair with one reduce-window.

    Note this is elementwise-independent max (exactly the reference's two
    separate pools), *not* confidence-argmax pooling.
    """
    if layout == "bhcw":
        # split-max path: pooling separately skips the stacking concat's
        # full read+write of both operands
        return max_pool2d(x, window, layout=layout), max_pool2d(
            c, window, layout=layout
        )
    ch_axis = -1
    stacked = jnp.concatenate([x, c], axis=ch_axis)
    pooled = max_pool2d(stacked, window, layout=layout)
    ch = x.shape[ch_axis]
    return pooled[..., :ch], pooled[..., ch:]
