"""Differentiable phase-aware stride-2 Pallas ops.

The plain-BHCW *training* graph previously materialized every stride-2
re-layout in XLA: space-to-depth lane deinterleaves feeding the stride-2
encoders, and depth-to-space lane interleaves after the phase-stacked
transpose convs — plus their VJPs (the reverse interleaves), ~1 ms/step of
pure HBM movement at 480x640 (docs/ARCHITECTURE.md round-4 profile). The
*inference* graph had already erased these with in-kernel MXU selection
matmuls (``lane_stride2`` / ``d2s_channels`` in :mod:`.pallas_conv`), but
those aligned kernels carry no VJP.

This module wraps the same kernel machinery in ``jax.custom_vjp`` ops whose
BACKWARD is also phase-aware:

* :func:`conv2d_s2_res_pallas_bhcw` — the stride-2 residual-encoder pair
  (3x3 conv + 1x1 shortcut stacked on output channels) consuming the FREE
  row-pair reshape of the full-width input with in-kernel lane decimation;
  d_x runs the transpose conv as a ``d2s_channels`` kernel (the full-res
  input cotangent emerges interleaved from the MXU), d_w runs the
  filter-grad kernel over the row-pair view against the lane-dilated
  cotangent.
* :func:`convtranspose2d_s2_pallas_bhcw` — the 4x4/s2/p1 decoder transpose
  conv emitting full-res output via the ``d2s_channels`` epilogue; d_x is a
  stride-2 conv of the cotangent consuming ITS free row-pair reshape
  (kw=4 ``lane_stride2``), d_w a kw=4 filter-grad against the lane-dilated
  saved input.

The only lane interleave left in the whole train step is the zero-dilation
of the SMALLER operand inside each d_w (``lane_dilate2``), which XLA lowers
as one compact reshape-store.

Reference hot loops these serve: `/root/reference/train_step2.py:62-64`,
`models/step2.py:134-154` (stride-2 encoders), `:197-214` (decoder).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .convops import (
    conv_kernel_s2_rowpair,
    conv_s2_dx_kernel_phases,
    convtranspose_kernel_phases,
    convtranspose_s2_dx_kernel_rowpair,
    lane_dilate2,
    shortcut_kernel_s2_rowpair,
)
from .pallas_conv import (
    _conv_core,
    _round_up,
    conv_filtergrad_pallas_bhcw,
)


def _pad_lanes_channels(x, cp: int | None = None):
    """Zero-pad (B, H, C, W) to the kernel granule: channels to a multiple
    of 8 (or to ``cp``), lanes to a multiple of 128."""
    b, h, c, w = x.shape
    cp = _round_up(c, 8) if cp is None else cp
    wp = _round_up(w, 128)
    if cp != c or wp != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c), (0, wp - w)))
    return x


def _zero_pad_kernel_cin(k, cp: int):
    if k.shape[2] != cp:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, cp - k.shape[2]), (0, 0)))
    return k


# ---------------------------------------------------------------------------
# stride-2 residual encoder pair: out = [conv3x3_s2(x) + b ‖ conv1x1_s2(x)]
# ---------------------------------------------------------------------------

def _s2_res_fwd_impl(x, k_main, k_short, bias):
    b, h, c, w = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    h2, w2 = h // 2, w // 2
    f = k_main.shape[-1]
    cp = _round_up(c, 8)
    # row-pair form: even/odd row pairs stack as channel blocks via a FREE
    # reshape of the (channel-granule-padded) input
    xp = _pad_lanes_channels(x, cp)
    x_rp = xp.reshape(b, h2, 2 * cp, xp.shape[-1])
    km = _zero_pad_kernel_cin(k_main, cp)
    ks = _zero_pad_kernel_cin(k_short, cp)
    kcat = jnp.concatenate(
        [conv_kernel_s2_rowpair(km), shortcut_kernel_s2_rowpair(ks)], -1
    )
    bcat = jnp.concatenate([bias, jnp.zeros((f,), bias.dtype)]) if (
        bias is not None and bias.ndim > 0
    ) else None
    out = _conv_core(
        [x_rp], kcat, bcat,
        pad_top=1, pad_left=1, h_in=h2, w_in=w, h_out=h2, w_out=w2,
        wp_out=w2, relu=False, tile_h=None, residual_channels=None,
        aligned_out=False, lane_stride2=True, exact_sel=True,
    )
    return out[:, :h2]


@functools.partial(jax.custom_vjp)
def _s2_res_core(x, k_main, k_short, bias):
    return _s2_res_fwd_impl(x, k_main, k_short, bias)


def _s2_res_fwd(x, k_main, k_short, bias):
    out = _s2_res_core(x, k_main, k_short, bias)
    return out, (x, k_main, k_short, bias)


def _s2_res_bwd(res, g):
    x, k_main, k_short, bias = res
    b, h, c, w = x.shape
    h2, w2 = h // 2, w // 2
    f = k_main.shape[-1]
    dt = k_main.dtype
    g = g.astype(dt)

    # ---- d_x: transpose conv of the [main ‖ short] pair as ONE d2s-phase
    # kernel — the interleaved full-res d_x comes straight off the MXU
    k3 = jnp.concatenate(
        [k_main, jnp.zeros_like(k_main).at[1, 1].set(k_short[0, 0])], -1
    )  # (3, 3, c, 2f)
    kdx = conv_s2_dx_kernel_phases(k3)  # (3, 3, 2f, 4c)
    gp = _pad_lanes_channels(g)  # (B, h2, 2f(pad), wp)
    dx = _conv_core(
        [gp], _zero_pad_kernel_cin(kdx, gp.shape[2]), None,
        pad_top=1, pad_left=1, h_in=h2, w_in=w2, h_out=h2, w_out=w2,
        wp_out=w2, relu=False, tile_h=None, residual_channels=None,
        aligned_out=False, d2s_channels=c, exact_sel=True,
    )  # (B, >=2*h2, c, round_up(2*w2, 128))
    d_x = dx[:, :h, :, :w].astype(x.dtype)

    # ---- d_w: filter-grad over the row-pair view of x against the
    # lane-dilated cotangent (the stride-2 contraction becomes stride-1)
    cp = _round_up(c, 8)
    xp = _pad_lanes_channels(x.astype(dt), cp)
    x_rp = xp.reshape(b, h2, 2 * cp, xp.shape[-1])
    g_dil = lane_dilate2(g)  # (B, h2, 2f, w)
    dk_rp = conv_filtergrad_pallas_bhcw(
        x_rp, g_dil, kh=2, kw=3, padding=1, pad_top=1
    )  # (2, 3, 2*cp, 2f) f32
    # row-pair taps back to the 3x3 grid: dy0 <- (ky0, odd), dy1 <-
    # (ky1, even), dy2 <- (ky1, odd); channel tail beyond c is granule pad
    dk3 = jnp.stack(
        [dk_rp[0, :, cp : cp + c], dk_rp[1, :, :c], dk_rp[1, :, cp : cp + c]],
        axis=0,
    )  # (3, 3, c, 2f)
    d_k_main = dk3[..., :f].astype(k_main.dtype)
    d_k_short = dk3[1:2, 1:2, :, f:].astype(k_short.dtype)
    has_bias = bias is not None and bias.ndim > 0
    d_b = (
        jnp.sum(g[:, :, :f], axis=(0, 1, 3)).astype(bias.dtype)
        if has_bias
        else jnp.zeros_like(bias)
    )
    return d_x, d_k_main, d_k_short, d_b


_s2_res_core.defvjp(_s2_res_fwd, _s2_res_bwd)


def conv2d_s2_res_pallas_bhcw(x, k_main, k_short, bias=None):
    """Differentiable stride-2 encoder pair on (B, H, C, W): returns
    (B, H/2, 2F, W/2) with channels [conv3x3_s2(x)+bias ‖ conv1x1_s2(x)]
    (BN+ReLU apply to the main half outside). The forward consumes the
    free row-pair reshape with in-kernel lane decimation; no XLA
    space-to-depth runs in either direction."""
    if bias is None:
        bias = jnp.zeros((), k_main.dtype)  # scalar sentinel == no bias
    return _s2_res_core(x, k_main, k_short, bias)


# ---------------------------------------------------------------------------
# 4x4 / stride-2 / pad-1 transpose conv with in-kernel depth-to-space
# ---------------------------------------------------------------------------

def _ct_fwd_impl(parts, kernel, bias):
    b, h, _, w = parts[0].shape
    f = kernel.shape[-1]
    kph = convtranspose_kernel_phases(kernel)  # (3, 3, cin, 4f)
    spec = []
    phys = []
    for p in parts:
        assert p.shape[0] == b and p.shape[1] == h and p.shape[3] == w
        c = p.shape[2]
        cp = _round_up(c, 8)
        phys.append(_pad_lanes_channels(p, cp))
        spec.append((c, cp))
    if any(c != cp for c, cp in spec):
        from .convops import expand_kernel_channels

        kph = expand_kernel_channels(kph, spec)
    bias4 = None
    if bias is not None and bias.ndim > 0:
        bias4 = jnp.tile(bias, 4)
    out = _conv_core(
        phys, kph, bias4,
        pad_top=1, pad_left=1, h_in=h, w_in=w, h_out=h, w_out=w,
        wp_out=w, relu=False, tile_h=None, residual_channels=None,
        aligned_out=False, d2s_channels=f, exact_sel=True,
    )  # (B, >=2h, f, round_up(2w, 128))
    return out[:, : 2 * h, :, : 2 * w]


@functools.partial(jax.custom_vjp)
def _ct_core(parts, kernel, bias):
    return _ct_fwd_impl(parts, kernel, bias)


def _ct_fwd(parts, kernel, bias):
    out = _ct_core(parts, kernel, bias)
    return out, (parts, kernel, bias)


def _ct_bwd(res, g):
    parts, kernel, bias = res
    b, h, _, w = parts[0].shape
    cin = kernel.shape[2]
    f = kernel.shape[-1]
    dt = kernel.dtype
    g = g.astype(dt)  # (B, 2h, f, 2w)

    # ---- d_x: stride-2 conv of g via ITS free row-pair reshape + kw=4
    # full-width taps with in-kernel lane decimation
    fp = _round_up(f, 8)
    gp = _pad_lanes_channels(g, fp)
    g_rp = gp.reshape(b, h, 2 * fp, gp.shape[-1])
    kdx = convtranspose_s2_dx_kernel_rowpair(kernel)  # (3, 4, 2f, cin)
    if fp != f:
        # row-pair blocks are [even fp | odd fp]: re-bind taps positionally
        kdx = jnp.concatenate(
            [
                jnp.pad(kdx[:, :, :f], ((0, 0), (0, 0), (0, fp - f), (0, 0))),
                jnp.pad(kdx[:, :, f:], ((0, 0), (0, 0), (0, fp - f), (0, 0))),
            ],
            axis=2,
        )
    dxs = _conv_core(
        [g_rp], kdx, None,
        pad_top=1, pad_left=1, h_in=h, w_in=2 * w, h_out=h, w_out=w,
        wp_out=w, relu=False, tile_h=None, residual_channels=None,
        aligned_out=False, lane_stride2=True, exact_sel=True,
    )[:, :h]  # (B, h, cin, w)
    d_parts = []
    off = 0
    for p in parts:
        c = p.shape[2]
        d_parts.append(dxs[:, :, off : off + c, :].astype(p.dtype))
        off += c

    # ---- d_w: kw=4 filter-grad of the row-pair cotangent against each
    # lane-dilated part (per-part input-channel blocks of the kernel)
    dk_blocks = []
    for p in parts:
        x_dil = lane_dilate2(p.astype(dt))  # (B, h, c, 2w)
        dk_raw = conv_filtergrad_pallas_bhcw(
            g_rp, x_dil, kh=3, kw=4, padding=1, pad_top=1
        )  # (3, 4, 2*fp, c) f32
        # rows back to the 4-tap grid: ky0 <- (0, odd), ky1 <- (1, even),
        # ky2 <- (1, odd), ky3 <- (2, even); then (.., co, ci) -> (.., ci, co)
        dk4 = jnp.stack(
            [
                dk_raw[0, :, fp : fp + f],
                dk_raw[1, :, :f],
                dk_raw[1, :, fp : fp + f],
                dk_raw[2, :, :f],
            ],
            axis=0,
        )  # (4, 4, f, c)
        dk_blocks.append(jnp.transpose(dk4, (0, 1, 3, 2)))
    d_k = jnp.concatenate(dk_blocks, axis=2).astype(kernel.dtype)
    has_bias = bias is not None and bias.ndim > 0
    d_b = (
        jnp.sum(g, axis=(0, 1, 3)).astype(bias.dtype)
        if has_bias
        else jnp.zeros_like(bias)
    )
    return tuple(d_parts), d_k, d_b


_ct_core.defvjp(_ct_fwd, _ct_bwd)


def convtranspose2d_s2_pallas_bhcw(x, kernel, bias=None):
    """Differentiable 4x4/stride-2/pad-1 transpose conv on (B, H, C, W)
    operands (a list input is a logical channel concat — no HBM concat):
    returns (B, 2H, F, 2W). The kernel performs the depth-to-space itself
    (``d2s_channels``); no XLA lane interleave runs in either direction
    except the compact zero-dilation inside d_w."""
    parts = tuple(x) if isinstance(x, (list, tuple)) else (x,)
    if bias is None:
        bias = jnp.zeros((), kernel.dtype)
    return _ct_core(parts, kernel, bias)
