"""Generic fused Pallas convolution (stride 1) in the (B, H, C, W) layout.

Same row-matmul structure as the normalized-conv kernel
(:mod:`nconv_tpu.ops.pallas_nconv_mxu`): for output row h, the im2col block
is the contiguous rows ``X[h:h+kh]`` reshaped (kh*C, W), and the conv is kw
MXU matmuls accumulated over horizontal taps, with bias + optional ReLU
fused into the row store. Used for the guided net's 3x3 conv stacks
(32-64 channels at full resolution), where XLA's conv lowering runs ~2 ms
per layer; this kernel measures ~2x faster with second-scale compiles.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def auto_tile_h(
    rin_bytes: int, rout_bytes: int, kh: int, h_out: int,
    budget: int = 10 << 20, max_th: int = 64, fixed_bytes: int = 0,
) -> int:
    """Largest H-tile (multiple of 8) whose double-buffered in+out blocks
    (plus ``fixed_bytes`` of weights/accumulators) fit a VMEM budget (the
    compiler's scoped limit is 16 MB)."""
    th = max_th
    while th > 8 and (
        fixed_bytes + 2 * ((th + kh - 1) * rin_bytes + th * rout_bytes) > budget
    ):
        th -= 8
    return max(8, min(th, _round_up(h_out, 8)))


def auto_row_group(kh: int, cin_p: int, cout: int, max_g: int = 8) -> int:
    """Rows per kernel iteration. Larger groups amortize loop/matmul-issue
    overhead but the block-Toeplitz K dim grows as (kh+g-1)*cin_p — for
    wide channels the extra executed MACs outweigh the padding win. Pick g
    minimizing executed-MXU-tiles per output row, tie-breaking larger."""
    def cost(g: int) -> float:
        k_tiles = -(-((kh + g - 1) * cin_p) // 128)
        m_tiles = -(-(g * cout) // 128)
        return k_tiles * m_tiles / g

    best = 1
    for g in (2, 4, 8):
        if g > max_g:
            break
        if cost(g) <= cost(best):
            best = g
    return best


def _kernel(x_hbm, w2_ref, bias_ref, out_ref, xs, sem, *, kh: int, kw: int,
            cin_p: int, cout: int, cout_store: int, th: int, w_out: int,
            relu: bool, use_bias: bool, g: int, residual: bool,
            n_tiles: int, n_total: int):
    # Halo load: BlockSpec index maps cannot express overlapping H-tiles, so
    # the padded input stays in HBM and each grid step DMAs its
    # (th + kh - 1)-row slice (halo included) into VMEM scratch.
    #
    # Double-buffered across grid steps (scratch and semaphores persist on
    # the sequential TPU grid): step i starts the DMA for step i+1 into the
    # other slot before waiting on its own, so the input transfer of the
    # next tile overlaps this tile's matmuls.
    idx = pl.program_id(0)

    def dma_for(step, slot):
        return pltpu.make_async_copy(
            x_hbm.at[step // n_tiles, pl.ds((step % n_tiles) * th, th + kh - 1)],
            xs.at[slot],
            sem.at[slot],
        )

    @pl.when(idx == 0)
    def _warmup():
        dma_for(0, 0).start()

    @pl.when(idx + 1 < n_total)
    def _prefetch():
        dma_for(idx + 1, (idx + 1) % 2).start()

    dma_for(idx, idx % 2).wait()
    slot = idx % 2

    f32 = jnp.float32
    k_rows = (kh + g - 1) * cin_p
    wp = xs.shape[-1]
    bias_col = bias_ref[:, :] if use_bias else None

    # G output rows per iteration: one block-Toeplitz matmul per tap
    # computes all of them, amortizing loop and matmul-issue overhead.
    def group(i, _):
        h0 = i * g
        a = xs[slot, pl.ds(h0, kh + g - 1)]
        if jnp.issubdtype(a.dtype, jnp.integer):
            # fused wire decode: integer camera input converts to float in
            # VMEM, so the u8 frame never round-trips HBM as floats.
            # (Mosaic lacks a direct u8->f32 cast; widen to i32 first.)
            a = a.astype(jnp.int32).astype(f32)
        a = a.reshape(k_rows, wp)
        acc = jnp.zeros((g * cout, w_out), f32)
        for dx in range(kw):
            acc += lax.dot_general(
                w2_ref[dx],
                a[:, dx : dx + w_out],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        if residual:
            # dual conv: channels [0:cout_store) are the main conv, the rest
            # a shortcut sharing the same input; fused residual epilogue
            # res = relu(main + bias) + shortcut (RGBEncoder's block form)
            rows = []
            for r in range(g):
                main = acc[r * cout : r * cout + cout_store]
                short = acc[r * cout + cout_store : (r + 1) * cout]
                if use_bias:
                    main = main + bias_col
                rows.append(jnp.maximum(main, 0.0) + short)
            res = jnp.concatenate(rows, 0) if g > 1 else rows[0]
        else:
            res = acc
            if use_bias:
                res = res + bias_col
            if relu:
                res = jnp.maximum(res, 0.0)
        out_ref[0, pl.ds(h0, g)] = res.reshape(g, cout_store, w_out).astype(
            out_ref.dtype
        )
        return 0

    lax.fori_loop(0, th // g, group, 0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def _conv2d_bhcw_core(x, kernel, bias, padding, relu, tile_h, residual_channels):
    return _conv2d_bhcw_impl(
        x, kernel, bias, padding=padding, relu=relu, tile_h=tile_h,
        residual_channels=residual_channels,
    )


def _conv2d_bhcw_reference(x, kernel, bias, padding, relu, residual_channels):
    """Same math in plain XLA (NHWC conv on transposed operands) — used as
    the differentiation reference for the custom VJP."""
    from .convops import conv2d as conv2d_xla

    b = None if (bias is None or bias.ndim == 0) else bias
    x_nhwc = jnp.transpose(x, (0, 1, 3, 2)).astype(kernel.dtype)
    if residual_channels is not None:
        n = residual_channels
        main = conv2d_xla(x_nhwc, kernel[..., :n], b, padding=padding)
        short = conv2d_xla(x_nhwc, kernel[..., n:], padding=padding)
        out = jax.nn.relu(main) + short
    else:
        out = conv2d_xla(x_nhwc, kernel, b, padding=padding)
        if relu:
            out = jax.nn.relu(out)
    return jnp.transpose(out, (0, 1, 3, 2))


def _conv2d_bhcw_fwd(x, kernel, bias, padding, relu, tile_h, residual_channels):
    out = _conv2d_bhcw_core(x, kernel, bias, padding, relu, tile_h, residual_channels)
    return out, (x, kernel, bias, out)


def _conv2d_bhcw_bwd(padding, relu, tile_h, residual_channels, res, g):
    """Hand-rolled backward: the conv is linear in each operand, so the
    input/kernel cotangents come from ``jax.linear_transpose`` without
    re-running the forward (the ReLU mask is read from the saved Pallas
    output). One transposed conv + one filter-grad conv total."""
    from .convops import conv2d as conv2d_xla

    x, kernel, bias, out = res
    if residual_channels is not None:
        # the fused residual form is inference-only; fall back to the
        # reference-vjp path if it is ever differentiated
        _, vjp = jax.vjp(
            lambda xx, kk, bb: _conv2d_bhcw_reference(
                xx, kk, bb, padding, relu, residual_channels
            ),
            x, kernel, bias,
        )
        return vjp(g)

    x_nhwc = jnp.transpose(x, (0, 1, 3, 2)).astype(kernel.dtype)
    g_nhwc = jnp.transpose(g, (0, 1, 3, 2))
    if relu:
        g_nhwc = g_nhwc * (jnp.transpose(out, (0, 1, 3, 2)) > 0)

    d_x = jax.linear_transpose(
        lambda t: conv2d_xla(t, kernel, padding=padding), x_nhwc
    )(g_nhwc)[0]
    d_k = jax.linear_transpose(
        lambda kk: conv2d_xla(x_nhwc, kk, padding=padding), kernel
    )(g_nhwc)[0]
    has_bias = bias is not None and bias.ndim > 0
    d_b = (
        jnp.sum(g_nhwc, axis=(0, 1, 2)).astype(bias.dtype)
        if has_bias
        else jnp.zeros_like(bias)
    )
    return jnp.transpose(d_x, (0, 1, 3, 2)).astype(x.dtype), d_k, d_b


_conv2d_bhcw_core.defvjp(_conv2d_bhcw_fwd, _conv2d_bhcw_bwd)


def conv2d_pallas_bhcw(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 1,
    relu: bool = False,
    tile_h: int | None = None,
    residual_channels: int | None = None,
) -> jax.Array:
    """Differentiable wrapper over the fused kernel: the forward runs the
    Pallas row-matmul kernel; gradients come from an exact XLA formulation
    of the same math (``jax.custom_vjp``), so ``backend='pallas'`` models
    are trainable."""
    if bias is None:
        bias = jnp.zeros((), kernel.dtype)  # sentinel: scalar == no bias
    return _conv2d_bhcw_core(
        x, kernel, bias, padding, relu, tile_h, residual_channels
    )


def _conv2d_bhcw_impl(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 1,
    relu: bool = False,
    tile_h: int | None = None,
    residual_channels: int | None = None,
) -> jax.Array:
    """Stride-1 conv on (B, H, C, W) operands; kernel HWIO. Fuses bias and
    optional ReLU. Integer inputs (uint8 camera frames) are decoded to float
    inside the kernel. Returns (B, H_out, Cout, W_out) in the kernel dtype.

    ``residual_channels=N``: the kernel's output channels are a stacked pair
    [main(N) ‖ shortcut(rest, typically N)] sharing this input; the kernel
    stores ``relu(main + bias) + shortcut`` over N channels in one pass —
    the RGBEncoder residual block fused into a single HBM read/write.
    """
    if bias is not None and bias.ndim == 0:
        bias = None  # scalar sentinel from the differentiable wrapper
    kh, kw, cin, cout = kernel.shape
    b, h, cin_in, w = x.shape
    assert cin_in == cin, (cin_in, cin)
    residual = residual_channels is not None
    cout_store = residual_channels if residual else cout
    if residual:
        assert cout == 2 * cout_store, (cout, cout_store)
    out_dtype = kernel.dtype if jnp.issubdtype(x.dtype, jnp.integer) else x.dtype
    p = padding
    h_out = h + 2 * p - (kh - 1)
    w_out = w + 2 * p - (kw - 1)

    cin_p = _round_up(cin, 8)
    g = auto_row_group(kh, cin_p, cout)
    if cin_p != cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))

    # block-Toeplitz tap matrices: row group r of the output uses the same
    # taps shifted r*cin_p columns into the (kh+g-1)-row input window
    w_t = jnp.transpose(kernel, (1, 3, 0, 2))  # (kw, cout, kh, cin_p)
    w2 = jnp.stack(
        [jnp.pad(w_t, ((0, 0), (0, 0), (r, g - 1 - r), (0, 0))) for r in range(g)],
        axis=1,
    ).reshape(kw, g * cout, (kh + g - 1) * cin_p)

    itemsize = jnp.dtype(x.dtype).itemsize
    wp_bytes = _round_up(w + 2 * p, 128) * itemsize
    fixed = (
        w2.size * 4  # tap matrices
        + 2 * (kh + g - 1) * cin_p * wp_bytes  # im2col view + acc headroom
        + 2 * g * cout * w_out * 4
    )
    if tile_h is None:
        tile_h = auto_tile_h(
            cin_p * wp_bytes, cout * w_out * itemsize, kh, h_out,
            fixed_bytes=fixed,
        )
    th = min(_round_up(tile_h, g), _round_up(h_out, g))
    n_tiles = -(-h_out // th)
    extra_h = n_tiles * th + (kh - 1) - (h + 2 * p)
    # lane (W) dim padded to a 128 multiple (DMA tile alignment); channel
    # pad folded into the same single pad op
    wp = _round_up(w + 2 * p, 128)
    x_p = jnp.pad(
        x,
        (
            (0, 0),
            (p, p + max(extra_h, 0)),
            (0, cin_p - cin),
            (p, wp - w - p),
        ),
    )

    use_bias = bias is not None
    if residual:
        # residual epilogue indexes bias per row group: plain (cout_store, 1)
        bias_arr = (
            bias if use_bias else jnp.zeros((cout_store,), out_dtype)
        ).reshape(-1, 1)
    else:
        bias_arr = (bias if use_bias else jnp.zeros((cout,), out_dtype))
        bias_arr = jnp.tile(bias_arr, g).reshape(-1, 1)  # (g*cout, 1)

    n_total = b * n_tiles
    kfun = functools.partial(
        _kernel, kh=kh, kw=kw, cin_p=cin_p, cout=cout, cout_store=cout_store,
        th=th, w_out=w_out, relu=relu, use_bias=use_bias, g=g,
        residual=residual, n_tiles=n_tiles, n_total=n_total,
    )
    out = pl.pallas_call(
        kfun,
        grid=(n_total,),  # flattened (batch, H-tile) for cross-step prefetch
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, cout_store, w_out),
            lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_tiles * th, cout_store, w_out), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, cin_p, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x_p, w2, bias_arr)

    if n_tiles * th != h_out:
        out = out[:, :h_out]
    return out


def conv2d_pallas(
    x_nhwc: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 1,
    relu: bool = False,
    tile_h: int | None = None,
) -> jax.Array:
    """NHWC wrapper over :func:`conv2d_pallas_bhcw`."""
    out = conv2d_pallas_bhcw(
        jnp.transpose(x_nhwc, (0, 1, 3, 2)), kernel, bias,
        padding=padding, relu=relu, tile_h=tile_h,
    )
    return jnp.transpose(out, (0, 1, 3, 2))
