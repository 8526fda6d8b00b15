"""Fused Pallas TPU kernel for normalized convolution (small channel counts).

Why this exists (profiled on v5e): XLA lowers the 8-channel NConv stack's
convolutions with channels padded into the 128-wide lane dimension — every
tensor is stored/streamed at 16x its real size, making each full-res 5x5
conv ~1.1 ms of pure HBM traffic regardless of dtype or NCHW/NHWC, plus
~10 ms/frame of layout copies between convs. This kernel instead works on
channels-first planes — W in lanes, H in sublanes, zero channel padding —
and fuses the whole NConv op:

    read (data*conf, conf) once from HBM
    both shared-kernel convolutions (25-tap scalar-x-plane FMA, VPU)
    out  = nomin / (denom + eps) + bias
    cout = denom / sum(w)
    write (out, cout) once

Layout contract: NCHW in/out, kernels OIHW already non-negative (apply
``pos_fn`` outside — it's a few hundred weights). Stride 1 only (all model
nconvs are stride 1; downsampling is pooling).

H-tiles need a (kh-1)-row halo, which BlockSpec index maps cannot express;
the input is therefore restacked as (B, n_tiles, C, th+kh-1, W) with
duplicated halo rows before the call — a ~5% read overhead against a 16x
layout-padding saving.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nconv import EPS_DEFAULT


def _stack_halo_tiles(x: jax.Array, th: int, kh: int, n_tiles: int) -> jax.Array:
    """(B, C, H, W) -> (B, n_tiles, C, th + kh - 1, W), tile i starting at
    row i*th (static slices; requires H >= n_tiles*th + kh - 1)."""
    tiles = [
        lax.slice_in_dim(x, i * th, i * th + th + kh - 1, axis=2)
        for i in range(n_tiles)
    ]
    return jnp.stack(tiles, axis=1)


def _nconv_kernel(dc_ref, c_ref, w_ref, bias_ref, wsum_ref, out_ref, cout_ref,
                  *, kh: int, kw: int, cin: int, cout: int, th: int,
                  w_out: int, eps: float):
    # load input planes once; taps below are static sublane/lane slices of
    # these register-resident values. Weights enter as scalar splats — a
    # vector-over-both-tiled-dims broadcast is not implemented in Mosaic.
    dc_planes = [dc_ref[0, 0, ci] for ci in range(cin)]
    c_planes = [c_ref[0, 0, ci] for ci in range(cin)]
    for co in range(cout):
        nomin = jnp.zeros((th, w_out), jnp.float32)
        denom = jnp.zeros((th, w_out), jnp.float32)
        for ci in range(cin):
            dcp, cp = dc_planes[ci], c_planes[ci]
            for dy in range(kh):
                for dx in range(kw):
                    wv = w_ref[co, ci, dy, dx]
                    nomin += wv * dcp[dy : dy + th, dx : dx + w_out]
                    denom += wv * cp[dy : dy + th, dx : dx + w_out]
        out_ref[0, co] = (nomin / (denom + eps) + bias_ref[co]).astype(out_ref.dtype)
        cout_ref[0, co] = (denom / wsum_ref[co]).astype(cout_ref.dtype)


def nconv2d_pallas_nchw(
    dc: jax.Array,
    c: jax.Array,
    kernel_pos: jax.Array,
    bias: jax.Array,
    *,
    padding: int,
    eps: float = EPS_DEFAULT,
    tile_h: int = 88,
) -> tuple[jax.Array, jax.Array]:
    """Fused NConv on NCHW planes.

    dc = data * conf, c = conf: both (B, Cin, H, W) — not spatially padded.
    kernel_pos: (Cout, Cin, kh, kw), non-negative. Returns (out, cout),
    both (B, Cout, H_out, W_out) with H_out = H + 2p - (kh-1).
    """
    b, cin, h, w = dc.shape
    co, ci_k, kh, kw = kernel_pos.shape
    assert ci_k == cin, (ci_k, cin)
    p = padding
    h_out = h + 2 * p - (kh - 1)
    w_out = w + 2 * p - (kw - 1)

    th = min(tile_h, h_out)
    n_tiles = -(-h_out // th)

    # spatial pre-pad (conv zero padding) + extra bottom rows so every tile
    # slice is in bounds
    extra_h = n_tiles * th + (kh - 1) - (h + 2 * p)
    dc_p = jnp.pad(dc, ((0, 0), (0, 0), (p, p + max(extra_h, 0)), (p, p)))
    c_p = jnp.pad(c, ((0, 0), (0, 0), (p, p + max(extra_h, 0)), (p, p)))

    dc_t = _stack_halo_tiles(dc_p, th, kh, n_tiles)
    c_t = _stack_halo_tiles(c_p, th, kh, n_tiles)

    wsum = jnp.sum(kernel_pos, axis=(1, 2, 3))

    kernel = functools.partial(
        _nconv_kernel,
        kh=kh, kw=kw, cin=cin, cout=co, th=th, w_out=w_out, eps=eps,
    )

    block_in = pl.BlockSpec(
        (1, 1, cin, th + kh - 1, w_out + kw - 1),
        lambda bi, hi: (bi, hi, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    block_out = pl.BlockSpec(
        (1, co, th, w_out),
        lambda bi, hi: (bi, 0, hi, 0),
        memory_space=pltpu.VMEM,
    )
    out, cout = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            block_in,
            block_in,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[block_out, block_out],
        out_shape=[
            jax.ShapeDtypeStruct((b, co, n_tiles * th, w_out), dc.dtype),
            jax.ShapeDtypeStruct((b, co, n_tiles * th, w_out), dc.dtype),
        ],
    )(dc_t, c_t, kernel_pos, bias, wsum)

    if n_tiles * th != h_out:
        out = out[:, :, :h_out, :]
        cout = cout[:, :, :h_out, :]
    return out, cout


def nconv2d_pallas(
    data: jax.Array,
    conf: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 0,
    pos_fn: str = "softplus",
    eps: float = EPS_DEFAULT,
) -> tuple[jax.Array, jax.Array]:
    """NHWC drop-in for :func:`nconv_tpu.ops.nconv2d` backed by the fused
    NCHW Pallas kernel (stride 1)."""
    from .nconv import POS_FNS

    w_pos = POS_FNS[pos_fn](kernel)  # HWIO
    w_oihw = jnp.transpose(w_pos, (3, 2, 0, 1))
    dc = jnp.transpose(data * conf, (0, 3, 1, 2))
    c = jnp.transpose(conf, (0, 3, 1, 2))
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), data.dtype)
    out, cout = nconv2d_pallas_nchw(dc, c, w_oihw, bias, padding=padding, eps=eps)
    return jnp.transpose(out, (0, 2, 3, 1)), jnp.transpose(cout, (0, 2, 3, 1))
