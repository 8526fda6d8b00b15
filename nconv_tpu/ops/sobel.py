"""Sobel gradient ops (NHWC), used by the gradient loss and VOID edge
inpainting (`/root/reference/utils.py:95-122`,
`/root/reference/dataset/voidloader.py:77-97`).

Note the two reference call sites use *opposite sign conventions* for the x
kernel (utils.py has +1..-1 columns, voidloader.py has -1..+1); both are kept
since only the loss's absolute value is sign-invariant, not the edge maps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .convops import conv2d

# /root/reference/utils.py:99-103 (loss convention)
SOBEL_X_LOSS = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
SOBEL_Y_LOSS = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)

# /root/reference/dataset/voidloader.py:77-82 (edge-detection convention)
SOBEL_X_EDGE = -SOBEL_X_LOSS
SOBEL_Y_EDGE = -SOBEL_Y_LOSS


def _sobel(x: jax.Array, k2d: np.ndarray) -> jax.Array:
    ch = x.shape[-1]
    k = jnp.tile(jnp.asarray(k2d, x.dtype)[:, :, None, None], (1, 1, 1, ch))
    # depthwise: the same 3x3 filter per channel
    return conv2d(x, k, padding=1, groups=ch)


def _tap3_h(x: jax.Array, a: float, b: float, c: float) -> jax.Array:
    """a*x[i-1] + b*x[i] + c*x[i+1] along H of a (B, H, W) plane, zero pad."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    return a * xp[:, :-2] + b * xp[:, 1:-1] + c * xp[:, 2:]


def _tap3_w(x: jax.Array, a: float, b: float, c: float) -> jax.Array:
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
    return a * xp[:, :, :-2] + b * xp[:, :, 1:-1] + c * xp[:, :, 2:]


def _sobel_xy_bhw(x: jax.Array, sign: float) -> tuple[jax.Array, jax.Array]:
    """Separable Sobel on a (B, H, W) plane: KX = [1,2,1]^T (x) [1,0,-1] and
    KY = [1,0,-1]^T (x) [1,2,1] (correlation, matching conv2d/torch). The
    1-channel NHWC conv binds C=1 to the lane dim (~128x waste); here W sits
    in lanes and each direction is two 3-tap shift-adds."""
    gx = _tap3_h(_tap3_w(x, sign, 0.0, -sign), 1.0, 2.0, 1.0)
    gy = _tap3_w(_tap3_h(x, sign, 0.0, -sign), 1.0, 2.0, 1.0)
    return gx, gy


def sobel_xy(x: jax.Array, *, convention: str = "loss") -> tuple[jax.Array, jax.Array]:
    """Return (grad_x, grad_y) with zero padding, same spatial size."""
    if x.ndim == 4 and x.shape[-1] == 1:
        # free (B,H,W,1)->(B,H,W) squeeze; every depth tensor takes this path
        gx, gy = _sobel_xy_bhw(x[..., 0], 1.0 if convention == "loss" else -1.0)
        return gx[..., None], gy[..., None]
    if convention == "loss":
        kx, ky = SOBEL_X_LOSS, SOBEL_Y_LOSS
    else:
        kx, ky = SOBEL_X_EDGE, SOBEL_Y_EDGE
    return _sobel(x, kx), _sobel(x, ky)


def edge_magnitude(x: jax.Array) -> jax.Array:
    gx, gy = sobel_xy(x, convention="edge")
    return jnp.sqrt(gx * gx + gy * gy)
