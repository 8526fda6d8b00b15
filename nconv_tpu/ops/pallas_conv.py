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
            cin_p: int, cout: int, th: int, w_out: int, relu: bool,
            use_bias: bool, g: int):
    # Halo load: BlockSpec index maps cannot express overlapping H-tiles, so
    # the padded input stays in HBM and each grid step DMAs its
    # (th + kh - 1)-row slice (halo included) into VMEM scratch.
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(hi * th, th + kh - 1)], xs, sem
    )
    dma.start()
    dma.wait()

    f32 = jnp.float32
    k_rows = (kh + g - 1) * cin_p
    wp = xs.shape[-1]
    bias_col = bias_ref[:, :] if use_bias else None

    # G output rows per iteration: one block-Toeplitz matmul per tap
    # computes all of them, amortizing loop and matmul-issue overhead.
    def group(i, _):
        h0 = i * g
        a = xs[pl.ds(h0, kh + g - 1)]
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
        if use_bias:
            acc = acc + bias_col
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, pl.ds(h0, g)] = acc.reshape(g, cout, w_out).astype(out_ref.dtype)
        return 0

    lax.fori_loop(0, th // g, group, 0)


def conv2d_pallas_bhcw(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 1,
    relu: bool = False,
    tile_h: int | None = None,
) -> jax.Array:
    """Stride-1 conv on (B, H, C, W) operands; kernel HWIO. Fuses bias and
    optional ReLU. Integer inputs (uint8 camera frames) are decoded to float
    inside the kernel. Returns (B, H_out, Cout, W_out) in the kernel dtype."""
    kh, kw, cin, cout = kernel.shape
    b, h, cin_in, w = x.shape
    assert cin_in == cin, (cin_in, cin)
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
    bias_arr = (bias if use_bias else jnp.zeros((cout,), out_dtype))
    bias_arr = jnp.tile(bias_arr, g).reshape(-1, 1)  # (g*cout, 1)

    kfun = functools.partial(
        _kernel, kh=kh, kw=kw, cin_p=cin_p, cout=cout, th=th, w_out=w_out,
        relu=relu, use_bias=use_bias, g=g,
    )
    out = pl.pallas_call(
        kfun,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded input, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, cout, w_out), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * th, cout, w_out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + kh - 1, cin_p, wp), x.dtype),
            pltpu.SemaphoreType.DMA,
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
