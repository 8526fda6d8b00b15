"""Normalized convolution — the core op of the framework.

Math (Eldesokey et al., arXiv:1811.01791; reference impl
`/root/reference/models/step1.py:116-149`):

    w      = pos(kernel)                       # non-negative kernel
    denom  = conv(conf, w)
    nomin  = conv(data * conf, w)
    out    = nomin / (denom + eps) + bias
    c_out  = denom / sum_{kh,kw,cin} w         # per output channel

TPU-first design decisions vs the reference:
  * The two convolutions share one kernel, so they are evaluated as a single
    convolution over a batch-stacked ``[data*conf ; conf]`` tensor — one MXU
    dispatch instead of two, with the divide/bias/confidence epilogue left to
    XLA elementwise fusion. (A fused Pallas kernel path lives in
    ``nconv_tpu.ops.pallas_nconv`` and is selected per-shape by benchmarks.)
  * Non-negativity is a *pure reparameterization*: ``pos_fn`` is applied to
    the stored kernel inside the op. The reference instead mutates
    ``weight.data`` in-place via a forward-pre-hook during training only
    (`/root/reference/models/step1.py:190-195`) — an impure trick whose
    invariant (non-negative effective kernels) this transform preserves.
    ``pos_fn='identity'`` reproduces reference *inference* exactly, since
    reference checkpoints store already-positive weights.
  * Everything is NHWC / static-shape / jit-traceable.

``eps = 1e-7`` matches `/root/reference/models/step1.py:103`.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .convops import conv2d

EPS_DEFAULT = 1e-7


# ---------------------------------------------------------------------------
# Non-negativity transforms (reference: EnforcePos,
# /root/reference/models/step1.py:197-212). softplus uses beta=10 as there.
# ---------------------------------------------------------------------------

def _softplus10(w):
    # torch F.softplus(w, beta=10) = log(1 + exp(10 w)) / 10, with the linear
    # region for 10 w > threshold(=20) — jax's softplus is already stable.
    return jax.nn.softplus(10.0 * w) / 10.0


def _softmax_per_pair(w):
    # reference EnforcePos softmaxes over the kh*kw taps of each
    # (cout, cin) pair (p.view(cout, cin, -1) + softmax(-1),
    # /root/reference/models/step1.py:199-203); HWIO equivalent: softmax
    # over the flattened spatial axis only
    kh, kw, cin, cout = w.shape
    flat = w.reshape(kh * kw, cin, cout)
    return jax.nn.softmax(flat, axis=0).reshape(w.shape)


POS_FNS: dict[str, Callable] = {
    "softplus": _softplus10,
    "exp": jnp.exp,
    "sigmoid": jax.nn.sigmoid,
    "softmax": _softmax_per_pair,
    "identity": lambda w: w,
}


def softplus10_inverse(y: np.ndarray) -> np.ndarray:
    """Stable inverse of softplus(beta=10); used by the checkpoint converter
    so positive reference weights can be stored as raw parameters."""
    z = 10.0 * np.asarray(y, np.float64)
    # log(expm1(z)) = z + log1p(-exp(-z)), stable for large z
    small = z < 20.0
    out = np.where(
        small,
        np.log(np.expm1(np.clip(z, 1e-30, 20.0))),
        z + np.log1p(-np.exp(-np.clip(z, 20.0, None))),
    )
    return (out / 10.0).astype(np.asarray(y).dtype)


# ---------------------------------------------------------------------------
# The op
# ---------------------------------------------------------------------------

def nconv2d(
    data: jax.Array,
    conf: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    pos_fn: str = "softplus",
    eps: float = EPS_DEFAULT,
) -> tuple[jax.Array, jax.Array]:
    """Normalized convolution with confidence propagation (NHWC, HWIO kernel).

    Returns ``(out, conf_out)``. The two shared-kernel convolutions run as a
    single conv over ``concat([data*conf, conf], batch)``.
    """
    w = POS_FNS[pos_fn](kernel)
    n = data.shape[0]
    stacked = jnp.concatenate([data * conf, conf], axis=0)
    both = conv2d(stacked, w, stride=stride, padding=padding)
    nomin, denom = both[:n], both[n:]
    out = nomin / (denom + eps)
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    ksum = jnp.sum(w, axis=(0, 1, 2)).reshape((1, 1, 1, -1))
    conf_out = denom / ksum
    return out, conf_out


# ---------------------------------------------------------------------------
# Initializers (reference: /root/reference/models/step1.py:152-172)
# ---------------------------------------------------------------------------

def poisson_kernel_pmf(ksize: int) -> np.ndarray:
    """Separable Poisson-pmf kernel w[i,j] = pmf(i; mu) * pmf(j; mu), mu=k/2.

    The reference builds this with scipy ``convolve2d(y, y.T, 'full')`` of a
    column/row pmf pair, which equals the outer product.
    """
    from scipy.stats import poisson  # host-side init only

    mu = ksize / 2
    pmf = poisson(mu).pmf(np.arange(ksize))
    return np.outer(pmf, pmf)


def poisson_init(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32):
    """Poisson-pmf base + U[0,1) noise, HWIO shape (kh, kw, cin, cout)."""
    kh, kw, cin, cout = shape
    base = jnp.asarray(poisson_kernel_pmf(kh), dtype)[:, :, None, None]
    noise = jax.random.uniform(key, shape, dtype)
    return jnp.broadcast_to(base, shape) + noise


def kaiming_uniform_init(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32):
    """torch ``kaiming_uniform_`` defaults (a=0 -> gain sqrt(2)), fan_in mode."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = np.sqrt(2.0) * np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform_init(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32):
    kh, kw, cin, cout = shape
    fan_in, fan_out = kh * kw * cin, kh * kw * cout
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


INIT_FNS = {
    "p": poisson_init,
    "k": kaiming_uniform_init,
    "x": xavier_uniform_init,
}

# Reference inits bias to the constant 0.01 (/root/reference/models/step1.py:172).
bias_init = partial(jax.nn.initializers.constant, 0.01)
