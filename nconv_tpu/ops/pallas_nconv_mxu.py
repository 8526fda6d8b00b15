"""MXU-based fused Pallas kernel for normalized convolution.

Layout insight: store activations as **(B, H, C, W)** — channels in the
sublane dimension, width in lanes. Then for every output row h, the im2col
matrix for a kh-tall convolution window is just the contiguous row block
``X[h : h + kh]`` *reshaped* from (kh, C, W) to (kh*C, W) — a tile-stacking
view (free when C is a multiple of the 8-sublane granule; channels are
padded up accordingly). The convolution at row h becomes kw small MXU
matmuls

    out_row(2Co, W) += W2[dx] (2Co, kh*2Cin) @ A[:, dx : dx + W]

accumulated over the horizontal taps dx, where the 2x factors come from
computing the shared-kernel numerator (data*conf) and denominator (conf)
convolutions together: the input stacks [dc ; c] along C and W2 is block
diagonal, so one pass yields both. The fused epilogue (divide, bias,
confidence normalization) runs on the row before it is stored.

Compared to XLA's lowering of these 8-channel convolutions (channels padded
into the 128-lane dimension: 16x inflated HBM tensors, ~1.1 ms per full-res
5x5 layer plus layout copies), this keeps HBM traffic at the logical size
and the program tiny (a fori_loop over rows — it also compiles fast through
the remote Mosaic path, unlike unrolled tap kernels).

H-tiles need a (kh-1)-row halo, which BlockSpec index maps cannot express;
the padded input therefore stays in HBM and each grid step DMAs its halo
slice into VMEM scratch (lane dim 128-aligned for the DMA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nconv import EPS_DEFAULT, POS_FNS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(d_hbm, c_hbm, w2_ref, bias_ref, wsum_ref, out_ref, cout_ref, xs,
            sem_d, sem_c, *, kh: int, kw: int, cin_pad: int, cout: int,
            th: int, w_out: int, eps: float, n_tiles: int, n_total: int):
    """Grid step = one (batch, H-tile) block on a flattened grid.

    d_hbm/c_hbm: (B, Hp, cin_pad, wp) padded data / confidence in HBM —
             each step DMAs its (th + kh - 1)-row halo slice into the two
             halves of a VMEM scratch slot (slot, rows, 2, cin_pad, wp),
             then forms data*conf in place with one VMEM pass. Keeping the
             operands separate in HBM kills the XLA-side dc-multiply pass
             AND the [dc ; c] concat copy the fused input needed.
             DMAs are double-buffered across grid steps: step i prefetches
             step i+1's slices into the other slot before waiting.
    w2_ref:  (kw, 2*cout, kh*2*cin_pad)  block-diagonal tap matrices
    bias_ref/wsum_ref: (cout, 1)
    out_ref/cout_ref:  (1, th, cout, w_out)
    """
    idx = pl.program_id(0)

    def dmas_for(step, slot):
        src = lambda ref: ref.at[
            step // n_tiles, pl.ds((step % n_tiles) * th, th + kh - 1)
        ]
        return (
            pltpu.make_async_copy(src(d_hbm), xs.at[slot, :, 0], sem_d.at[slot]),
            pltpu.make_async_copy(src(c_hbm), xs.at[slot, :, 1], sem_c.at[slot]),
        )

    @pl.when(idx == 0)
    def _warmup():
        for dma in dmas_for(0, 0):
            dma.start()

    @pl.when(idx + 1 < n_total)
    def _prefetch():
        for dma in dmas_for(idx + 1, (idx + 1) % 2):
            dma.start()

    slot = idx % 2
    for dma in dmas_for(idx, slot):
        dma.wait()
    # data half := data * conf, once per tile (VMEM-only traffic); the
    # (rows, 2, cin_pad, wp) layout reshapes to the (dy, half, ci) row order
    # the tap matrices expect.
    xs[slot, :, 0] = xs[slot, :, 0] * xs[slot, :, 1]

    f32 = jnp.float32
    cin2 = 2 * cin_pad
    k_rows = kh * cin2
    wp = xs.shape[-1]
    bias_col = bias_ref[:, :]
    wsum_col = wsum_ref[:, :]

    def row(h, _):
        a = xs[slot, pl.ds(h, kh)].reshape(k_rows, wp)
        acc = jnp.zeros((2 * cout, w_out), f32)
        for dx in range(kw):
            acc += lax.dot_general(
                w2_ref[dx],
                a[:, dx : dx + w_out],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        nomin = acc[:cout]
        denom = acc[cout:]
        out_ref[0, h] = (nomin / (denom + eps) + bias_col).astype(out_ref.dtype)
        cout_ref[0, h] = (denom / wsum_col).astype(cout_ref.dtype)
        return 0

    lax.fori_loop(0, th, row, 0)


def build_tap_matrices(w_pos: jax.Array, cin_pad: int) -> tuple[jax.Array, jax.Array]:
    """HWIO non-negative kernel -> (w2, wsum).

    A-row ordering is (dy, half, ci) with halves [dc ; c] each ``cin_pad``
    channels (zero-padded past the real cin). w2[dx]: (2*Cout, kh*2*cin_pad)
    with nomin rows contracting the dc half and denom rows the c half.
    """
    kh, kw, cin, cout = w_pos.shape
    w_t = jnp.transpose(w_pos, (1, 3, 0, 2))  # (kw, cout, kh, cin)
    if cin_pad != cin:
        w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, 0), (0, cin_pad - cin)))
    zeros = jnp.zeros_like(w_t)
    nomin = jnp.stack([w_t, zeros], axis=3)  # (kw, cout, kh, 2, cin_pad)
    denom = jnp.stack([zeros, w_t], axis=3)
    w2 = jnp.concatenate([nomin, denom], axis=1)  # (kw, 2cout, kh, 2, cin_pad)
    w2 = w2.reshape(kw, 2 * cout, kh * 2 * cin_pad)
    wsum = jnp.sum(w_pos, axis=(0, 1, 2))
    return w2, wsum


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _nconv_bhcw_core(data, conf, kernel, bias, padding, pos_fn, eps, tile_h):
    return _nconv_bhcw_impl(
        data, conf, kernel, bias, padding=padding, pos_fn=pos_fn, eps=eps,
        tile_h=tile_h,
    )


def _nconv_bhcw_reference(data, conf, kernel, bias, padding, pos_fn, eps):
    """Plain-XLA formulation of the same math for the custom VJP."""
    from .nconv import nconv2d

    b = None if (bias is None or bias.ndim == 0) else bias
    t = lambda a: jnp.transpose(a, (0, 1, 3, 2))
    out, cout = nconv2d(
        t(data), t(conf), kernel, b, padding=padding, pos_fn=pos_fn, eps=eps
    )
    return t(out), t(cout)


def _nconv_bhcw_fwd(data, conf, kernel, bias, padding, pos_fn, eps, tile_h):
    out = _nconv_bhcw_core(data, conf, kernel, bias, padding, pos_fn, eps, tile_h)
    return out, (data, conf, kernel, bias, out)


def _nconv_bhcw_bwd(padding, pos_fn, eps, tile_h, res, g):
    """Hand-rolled backward that never re-runs the forward convolution.

    The intermediates are reconstructed algebraically from the saved Pallas
    outputs — ``denom = conf_out * sum(w)`` and
    ``nomin = (out - bias) * (denom + eps)`` — and because both inner
    convolutions are linear, the data/conf cotangents come from ONE
    batch-stacked transposed conv and the kernel cotangent from ONE
    batch-stacked filter-grad conv (``jax.linear_transpose``), vs the
    forward + two transposed convs a reference-vjp backward costs.
    """
    from .convops import conv2d as conv2d_xla

    data, conf, kernel, bias, (out, cout_out) = res
    g_out, g_cout = g
    p = padding
    t = lambda a: jnp.transpose(a, (0, 1, 3, 2))  # BHCW <-> NHWC

    w, pos_vjp = jax.vjp(POS_FNS[pos_fn], kernel)
    ksum = jnp.sum(w, axis=(0, 1, 2))  # (cout,)
    has_bias = bias is not None and bias.ndim > 0
    b_col = bias if has_bias else jnp.zeros(w.shape[-1], w.dtype)

    d_n, c_n = t(data), t(conf)
    out_n, cout_n = t(out), t(cout_out)
    go_n, gc_n = t(g_out), t(g_cout)

    denom = cout_n * ksum
    nomin = (out_n - b_col) * (denom + eps)
    d_nomin = go_n / (denom + eps)
    d_denom = -go_n * nomin / (denom + eps) ** 2 + gc_n / ksum

    dc = d_n * c_n
    n = d_n.shape[0]
    # one transposed conv for both branches (batch-stacked cotangents)
    d_stacked = jax.linear_transpose(
        lambda s: conv2d_xla(s, w, padding=p),
        jnp.concatenate([dc, c_n], axis=0),
    )(jnp.concatenate([d_nomin, d_denom], axis=0))[0]
    d_dc, d_c_denom = d_stacked[:n], d_stacked[n:]
    # one filter-grad conv: contraction over the stacked batch sums the
    # dc·d_nomin and c·d_denom contributions
    d_w = jax.linear_transpose(
        lambda ww: conv2d_xla(jnp.concatenate([dc, c_n], axis=0), ww, padding=p),
        w,
    )(jnp.concatenate([d_nomin, d_denom], axis=0))[0]
    # cout = denom / ksum also differentiates through ksum = sum(w)
    d_ksum = -jnp.sum(gc_n * cout_n, axis=(0, 1, 2)) / ksum
    d_w = d_w + d_ksum.reshape(1, 1, 1, -1)

    d_data = t(d_dc * c_n).astype(data.dtype)
    d_conf = t(d_dc * d_n + d_c_denom).astype(conf.dtype)
    d_kernel = pos_vjp(d_w.astype(w.dtype))[0]
    d_bias = (
        jnp.sum(go_n, axis=(0, 1, 2)).astype(bias.dtype)
        if has_bias
        else jnp.zeros_like(bias)
    )
    return d_data, d_conf, d_kernel, d_bias


_nconv_bhcw_core.defvjp(_nconv_bhcw_fwd, _nconv_bhcw_bwd)


def nconv2d_pallas_mxu_bhcw(
    data: jax.Array,
    conf: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 0,
    pos_fn: str = "softplus",
    eps: float = EPS_DEFAULT,
    tile_h: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Normalized conv on (B, H, C, W)-layout operands (stride 1).

    The native entry point for chains: layers stay in BHCW end to end, so
    the NHWC<->BHCW transpose happens only at graph boundaries.

    Differentiable: the forward runs the fused Pallas kernel; gradients come
    from an exact XLA formulation via ``jax.custom_vjp``, so
    ``backend='pallas'`` models are trainable (the reference's training hot
    loop, `train_step1.py:61-65`).
    """
    if bias is None:
        bias = jnp.zeros((), kernel.dtype)  # scalar sentinel == no bias
    return _nconv_bhcw_core(data, conf, kernel, bias, padding, pos_fn, eps, tile_h)


def _nconv_bhcw_impl(
    data: jax.Array,
    conf: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 0,
    pos_fn: str = "softplus",
    eps: float = EPS_DEFAULT,
    tile_h: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    kh, kw, cin, cout = kernel.shape
    b, h, cin_in, w = data.shape
    assert cin_in == cin, (cin_in, cin)
    p = padding
    h_out = h + 2 * p - (kh - 1)
    w_out = w + 2 * p - (kw - 1)

    # channels padded so 2*cin_pad is a sublane-granule multiple (the row
    # reshape then stays a pure tile stacking)
    cin_pad = max(_round_up(cin, 4), 4)
    w_pos = POS_FNS[pos_fn](kernel)
    w2, wsum = build_tap_matrices(w_pos, cin_pad)
    if bias is None or bias.ndim == 0:  # None or scalar sentinel
        bias = jnp.zeros((cout,), data.dtype)

    cin2 = 2 * cin_pad

    if tile_h is None:
        from .pallas_conv import auto_tile_h

        itemsize = jnp.dtype(data.dtype).itemsize
        tile_h = auto_tile_h(
            cin2 * (w + 2 * p) * itemsize,
            2 * cout * w_out * itemsize,  # two outputs (depth + confidence)
            kh,
            h_out,
        )
    th = min(tile_h, h_out)
    n_tiles = -(-h_out // th)
    extra_h = n_tiles * th + (kh - 1) - (h + 2 * p)
    # lane (W) dim padded to a 128 multiple: DMA slices must be tile-aligned.
    # data and conf stay separate in HBM — the kernel DMAs both into one
    # scratch and forms data*conf there, so neither the dc elementwise pass
    # nor the [dc ; c] concat ever touches HBM.
    wp = _round_up(w + 2 * p, 128)
    zpad = (
        (0, 0), (p, p + max(extra_h, 0)), (0, cin_pad - cin), (p, wp - w - p)
    )
    d_p = jnp.pad(data, zpad)
    c_p = jnp.pad(conf, zpad)

    n_total = b * n_tiles
    kfun = functools.partial(
        _kernel, kh=kh, kw=kw, cin_pad=cin_pad, cout=cout, th=th,
        w_out=w_out, eps=eps, n_tiles=n_tiles, n_total=n_total,
    )
    block_out = pl.BlockSpec(
        (1, th, cout, w_out), lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out, cout_arr = pl.pallas_call(
        kfun,
        grid=(n_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded data, HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded conf, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[block_out, block_out],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tiles * th, cout, w_out), data.dtype),
            jax.ShapeDtypeStruct((b, n_tiles * th, cout, w_out), data.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, 2, cin_pad, wp), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(d_p, c_p, w2, bias.reshape(-1, 1), wsum.reshape(-1, 1))

    if n_tiles * th != h_out:
        out = out[:, :h_out]
        cout_arr = cout_arr[:, :h_out]
    return out, cout_arr


def nconv2d_pallas_mxu(
    data: jax.Array,
    conf: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 0,
    pos_fn: str = "softplus",
    eps: float = EPS_DEFAULT,
    tile_h: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """NHWC drop-in for :func:`nconv_tpu.ops.nconv2d` (stride 1), backed by
    the (B, H, C, W) MXU kernel. Chains should prefer the BHCW-native
    entry point to avoid per-layer transposes."""
    out, cout_arr = nconv2d_pallas_mxu_bhcw(
        jnp.transpose(data, (0, 1, 3, 2)),
        jnp.transpose(conf, (0, 1, 3, 2)),
        kernel,
        bias,
        padding=padding,
        pos_fn=pos_fn,
        eps=eps,
        tile_h=tile_h,
    )
    return (
        jnp.transpose(out, (0, 1, 3, 2)),
        jnp.transpose(cout_arr, (0, 1, 3, 2)),
    )
