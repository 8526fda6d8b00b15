"""Torch-parity image resizing for NHWC tensors.

The reference mixes three distinct torch interpolation conventions:
  * nearest to an explicit size (`/root/reference/models/step1.py:78-89`),
  * bilinear ``align_corners=True`` with a fractional scale factor
    (`/root/reference/models/step2.py:252,271`),
  * bilinear ``align_corners=False`` to a fixed size
    (`/root/reference/utils.py:67`).
``jax.image.resize`` matches none of these exactly, so each is hand-rolled
here as separable gathers/matmuls — all static-shape, fully fusible by XLA.
Parity is verified against torch in tests/test_ops_parity.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nearest_indices(out_size: int, in_size: int) -> np.ndarray:
    # torch nearest: src = floor(dst * in / out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def resize_nearest(
    x: jax.Array, size: tuple[int, int], layout: str = "nhwc"
) -> jax.Array:
    """Nearest-neighbour resize to ``size=(H, W)``; torch 'nearest'
    convention. NHWC or BHCW.

    Exact 2x upsamples (the UNet decoder's only case) go through
    ``jnp.repeat`` — measured ~20-30% faster than the index gather on v5e,
    which relayouts the minor axis W-major and back. Other ratios stay
    gather-based (a general broadcast+reshape variant measured slower).
    """
    h_out, w_out = size
    w_axis = 3 if layout == "bhcw" else 2
    h_in, w_in = x.shape[1], x.shape[w_axis]
    if (h_out, w_out) == (h_in, w_in):
        return x
    if (h_out, w_out) == (2 * h_in, 2 * w_in):
        # torch nearest at exact 2x is pure duplication: floor(i * in/out)
        # == i // 2 for every i
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=w_axis)
    hi = _nearest_indices(h_out, h_in)
    wi = _nearest_indices(w_out, w_in)
    x = x[:, hi]
    return x[:, :, :, wi] if layout == "bhcw" else x[:, :, wi, :]


def _linear_weights_align_true(out_size: int, in_size: int):
    # torch bilinear align_corners=True: src = i * (in-1)/(out-1).
    # The ratio and product are computed in float32, as torch's CPU/CUDA
    # kernels do — doing this in float64 shifts weights by ~1e-4.
    if out_size == 1:
        src = np.zeros((1,), np.float32)
    else:
        ratio = np.float32(in_size - 1) / np.float32(out_size - 1)
        src = (np.arange(out_size, dtype=np.float32) * ratio).astype(np.float32)
    lo = np.floor(src).astype(np.int32)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def _linear_weights_align_false(out_size: int, in_size: int):
    # torch bilinear align_corners=False: src = (i + 0.5) * in/out - 0.5,
    # clamped; float32 arithmetic to match torch's kernels.
    ratio = np.float32(in_size) / np.float32(out_size)
    src = (np.arange(out_size, dtype=np.float32) + np.float32(0.5)) * ratio - np.float32(0.5)
    src = np.clip(src, 0.0, in_size - 1).astype(np.float32)
    lo = np.floor(src).astype(np.int32)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def _resize_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) interpolation matrix with the torch corner convention —
    two taps per row ((1-frac) at lo, frac at hi; they coalesce to exactly
    1.0 on clamped border rows)."""
    weights = (
        _linear_weights_align_true if align_corners else _linear_weights_align_false
    )
    lo, hi, frac = weights(out_size, in_size)
    rows = np.arange(out_size)
    mat = np.zeros((out_size, in_size), np.float32)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat


def _resize_bilinear_matmul(
    x: jax.Array, size: tuple[int, int], *, align_corners: bool
) -> jax.Array:
    """Bilinear resize of a (B, H, W) plane as two constant-matrix matmuls.

    The gather form (`jnp.take` + lerp) differentiates into a full-size
    scatter-add, which TPUs serialize per index — the dominant cost of the
    multi-resolution training loss. As matmuls both directions ride the MXU
    and the VJP is just the transposed matmuls. HIGHEST precision keeps f32
    accuracy (two-tap rows; same two products as the lerp)."""
    h_out, w_out = size
    _, h_in, w_in = x.shape
    hp = jax.lax.Precision.HIGHEST
    if h_out != h_in:
        mh = jnp.asarray(_resize_matrix(h_out, h_in, align_corners), x.dtype)
        x = jnp.einsum("Oh,bhw->bOw", mh, x, precision=hp)
    if w_out != w_in:
        mw = jnp.asarray(_resize_matrix(w_out, w_in, align_corners), x.dtype)
        x = jnp.einsum("Pw,bhw->bhP", mw, x, precision=hp)
    return x


def _resize_linear_1d(x: jax.Array, axis: int, lo, hi, frac) -> jax.Array:
    frac = jnp.asarray(frac, x.dtype)
    shape = [1, 1, 1, 1]
    shape[axis] = -1
    a = jnp.take(x, jnp.asarray(lo), axis=axis)
    b = jnp.take(x, jnp.asarray(hi), axis=axis)
    w = frac.reshape(shape)
    return a * (1 - w) + b * w


def resize_bilinear(
    x: jax.Array, size: tuple[int, int], *, align_corners: bool
) -> jax.Array:
    """Bilinear resize to ``size=(H, W)`` with torch corner conventions."""
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_out, w_out) == (h_in, w_in):
        return x
    if x.shape[-1] == 1:
        # 1-channel (every depth tensor): the (B,H,W,1)->(B,H,W) squeeze is
        # free, W lands in the lane dim, and the matmul form avoids the
        # gather whose VJP is a serialized scatter-add
        return _resize_bilinear_matmul(
            x[..., 0], size, align_corners=align_corners
        )[..., None]
    weights = (
        _linear_weights_align_true if align_corners else _linear_weights_align_false
    )
    hlo, hhi, hfrac = weights(h_out, h_in)
    wlo, whi, wfrac = weights(w_out, w_in)
    x = _resize_linear_1d(x, 1, hlo, hhi, hfrac)
    x = _resize_linear_1d(x, 2, wlo, whi, wfrac)
    return x


def torch_scaled_size(in_size: int, scale: float) -> int:
    """Output size torch computes for ``F.interpolate(scale_factor=scale)``."""
    return int(np.floor(in_size * scale))


def downscale_bilinear(x: jax.Array, factor: int, *, align_corners: bool = True):
    """``F.interpolate(x, scale_factor=1/factor, mode='bilinear')`` parity.

    Used by the fusion pyramid to pull the step-1 dense depth down to each
    decoder scale (`/root/reference/models/step2.py:252,271`).
    """
    _, h, w, _ = x.shape
    size = (torch_scaled_size(h, 1.0 / factor), torch_scaled_size(w, 1.0 / factor))
    return resize_bilinear(x, size, align_corners=align_corners)
