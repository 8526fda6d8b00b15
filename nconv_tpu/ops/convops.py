"""NHWC convolution primitives with PyTorch-compatible semantics.

These are the layout-level building blocks of the framework: everything is
NHWC (TPU-native; channels land in the 128-wide lane dimension), while the
reference stack is NCHW PyTorch (`/root/reference/models/step1.py:119-122`,
`/root/reference/models/step2.py:140,205`). Parity with torch semantics
(explicit zero padding, transpose-conv output geometry) is covered by
tests/test_ops_parity.py against torch CPU golden values.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels — the native TPU convolution layout.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    dilation: int | Sequence[int] = 1,
    groups: int = 1,
    preferred_dtype=None,
) -> jax.Array:
    """2-D convolution, NHWC in / NHWC out, kernel HWIO.

    Matches ``torch.nn.functional.conv2d`` semantics (cross-correlation,
    explicit symmetric zero padding) used throughout the reference
    (`/root/reference/models/step1.py:119`).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=DIMSPEC,
        feature_group_count=groups,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 2,
    padding: int | Sequence[int] = 1,
) -> jax.Array:
    """Transposed 2-D convolution matching ``torch.nn.ConvTranspose2d``.

    The reference decoder uses 4x4/stride-2/pad-1 transpose convs
    (`/root/reference/models/step2.py:205`). Implemented as the equivalent
    forward convolution: input dilated by ``stride``, kernel spatially
    flipped, padding ``k - 1 - p`` — this is what XLA lowers a gradient-conv
    to, and it keeps the op on the MXU.

    ``kernel`` is HWIO with I = input channels of this op (i.e. already
    transposed relative to torch's (in, out, kh, kw) storage; see
    ``torch_convtranspose_kernel_to_hwio``).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1, :, :]
    out = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=DIMSPEC,
    )
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Torch checkpoint layout adapters (used by the converter and parity tests).
# ---------------------------------------------------------------------------

def torch_conv_kernel_to_hwio(w) -> jnp.ndarray:
    """(out, in, kh, kw) torch conv weight -> HWIO."""
    w = jnp.asarray(w)
    return jnp.transpose(w, (2, 3, 1, 0))


def torch_convtranspose_kernel_to_hwio(w) -> jnp.ndarray:
    """(in, out, kh, kw) torch transpose-conv weight -> HWIO with I=in."""
    w = jnp.asarray(w)
    return jnp.transpose(w, (2, 3, 0, 1))
