"""Two-stage fused convolution chain: conv3x3(+bias,ReLU) -> conv3x3
(+bias,ReLU) in ONE kernel pass, with the intermediate activation kept in
VMEM scratch — its HBM write+read (57 MB per full-resolution fusion-stage
boundary at KITTI geometry) never happens.

Same aligned-form contract as ``conv2d_pallas_bhcw_aligned``
(ops/pallas_conv.py): operands (B, Hx, c, Wp) with data at rows [0,h) x
lanes [0,w), zeros elsewhere; the halo rows/lanes of BOTH stages are
synthesized (input halos from the zero margins, stage-2 halos by zeroing
the virtual intermediate rows that fall outside the image). Both kernels
may be W-phase-split transforms (ops/convops.py) — the chain is agnostic:
it just runs two 3x3 pad-1 convs.

Geometry: both convs are 3x3 pad 1, so the chain behaves like one 5x5
pad-2 conv for tiling purposes — a tile of ``th`` output rows consumes
``th + 4`` input rows and materializes ``th + 2`` intermediate rows in
scratch. The DMA is double-buffered across grid steps exactly like the
single-conv kernel.

Used by NewFusionBlock's fuse_conv2 -> fuse_conv3 chain (models/guided.py).
Inference-only (the training graph keeps separate differentiable convs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv import FRONT, _round_up, _tile_windows, auto_row_group


def _taps(kernel: jax.Array, g: int) -> jax.Array:
    """(3,3,cin,cout) -> per-tap block-Toeplitz (3, g*cout, (2+g)*cin)."""
    kh, kw, cin, cout = kernel.shape
    w_t = jnp.transpose(kernel, (1, 3, 0, 2))  # (kw, cout, kh, cin)
    return jnp.stack(
        [jnp.pad(w_t, ((0, 0), (0, 0), (r, g - 1 - r), (0, 0)))
         for r in range(g)],
        axis=1,
    ).reshape(kw, g * cout, (kh + g - 1) * cin)


def _stage(src, dst_write, w2, w2_rem, bias_col, n_rows, g, cin_p, cout,
           wp_s, wp_out, pad_left, lane_ok):
    """Run one conv stage: ``src(row0, nrows)`` yields the (nrows, cin_p,
    wp_s) input window for a row group; ``dst_write(h0, res)`` stores the
    (rows, cout, wp_out) result."""
    f32 = jnp.float32

    def run_group(h0, rows, mat):
        a = src(h0, 3 + rows - 1).reshape((3 + rows - 1) * cin_p, wp_s)
        acc = jnp.zeros((rows * cout, wp_out), f32)
        for dx in range(3):
            off = FRONT - pad_left + dx
            acc += lax.dot_general(
                mat[dx], a[:, off : off + wp_out],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        res = jnp.maximum(acc + bias_col[: rows * cout], 0.0)
        if lane_ok is not None:
            res = jnp.where(lane_ok, res, 0.0)
        dst_write(h0, res.reshape(rows, cout, wp_out))

    full = n_rows // g
    for i in range(full):
        run_group(i * g, g, w2)
    rem = n_rows - full * g
    if rem:
        run_group(full * g, rem, w2_rem)


def _chain_kernel(*refs, cin_p, c_mid, cout, th, w_out, wp_out, ga, gb,
                  n_tiles, n_total, h_in, h_out, part_cs, part_wps):
    n_parts = len(part_cs)
    x_hbms = refs[:n_parts]
    (w2a, w2a_r, w2b, w2b_r, b1_ref, b2_ref, out_ref, xs, mid, sem) = refs[
        n_parts:
    ]
    coffs = [sum(part_cs[:i]) for i in range(n_parts)]
    idx = pl.program_id(0)
    rows_full = th + 4
    # tiling identical to a 5x5 pad-2 conv: th output rows read th+4 rows
    wins = _tile_windows(n_tiles, th, 5, 2, h_in)
    classes = sorted({(o, s) for (o, s, _zt, _zb) in wins if s})

    def dma_apply(step, slot, action):
        t = step % n_tiles
        bi = step // n_tiles
        for off, size in classes:
            tiles = [k for k, wn in enumerate(wins) if wn[:2] == (off, size)]
            cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

            @pl.when(cond)
            def _go(off=off, size=size):
                src = pl.ds(jnp.maximum(t * th - 2, 0), size)
                for i in range(n_parts):
                    cp = pltpu.make_async_copy(
                        x_hbms[i].at[bi, src],
                        xs.at[slot, pl.ds(off, size),
                              pl.ds(coffs[i], part_cs[i]),
                              pl.ds(FRONT, part_wps[i])],
                        sem.at[slot, i],
                    )
                    cp.start() if action == "start" else cp.wait()

    @pl.when(idx == 0)
    def _zero_scratch():
        xs[0] = jnp.zeros_like(xs[0])
        xs[1] = jnp.zeros_like(xs[1])
        mid[...] = jnp.zeros_like(mid)

    @pl.when(idx == 0)
    def _warmup():
        dma_apply(0, 0, "start")

    @pl.when(idx + 1 < n_total)
    def _prefetch():
        dma_apply(idx + 1, (idx + 1) % 2, "start")

    slot = idx % 2
    t = idx % n_tiles
    dma_apply(idx, slot, "wait")

    for zt in sorted({wn[2] for wn in wins if wn[2]}):
        tiles = [k for k, wn in enumerate(wins) if wn[2] == zt]
        cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

        @pl.when(cond)
        def _zero_top(zt=zt):
            xs[slot, 0:zt] = jnp.zeros_like(xs[slot, 0:zt])

    for zb in sorted({wn[3] for wn in wins if wn[3]}):
        tiles = [k for k, wn in enumerate(wins) if wn[3] == zb]
        cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

        @pl.when(cond)
        def _zero_bottom(zb=zb):
            xs[slot, rows_full - zb :] = jnp.zeros_like(
                xs[slot, rows_full - zb :]
            )

    mask = lax.broadcasted_iota(jnp.int32, (1, wp_out), 1) < w_out

    # stage A: th+2 intermediate rows (one halo row each side for stage B);
    # intermediate row j is absolute output-A row t*th - 1 + j
    def a_src(h0, nrows):
        return xs[slot, pl.ds(h0, nrows)]

    def a_dst(h0, res):
        mid[pl.ds(h0, res.shape[0]), :, pl.ds(FRONT, wp_out)] = res.astype(
            mid.dtype
        )

    _stage(a_src, a_dst, w2a, w2a_r, b1_ref, th + 2, ga, cin_p, c_mid,
           xs.shape[-1], wp_out, 1, mask)

    # aligned invariant for stage B's halo: intermediate rows outside the
    # image (absolute A-rows -1 and >= h_out_a = h_in) must be ZERO — a
    # conv over zero input rows produced relu(bias) there instead
    @pl.when(t == 0)
    def _zero_mid_top():
        mid[0:1] = jnp.zeros_like(mid[0:1])

    # absolute A-row of mid[j] is t*th - 1 + j; zero rows >= h_in (stage A
    # ran over virtual zero input rows there, leaving relu(bias) != 0)
    for k in range(n_tiles):
        j0 = h_in + 1 - k * th
        if j0 < th + 2:
            @pl.when(t == k)
            def _zero_mid_tail(j0=max(j0, 0)):
                mid[j0:] = jnp.zeros_like(mid[j0:])

    # stage B: th output rows; output row r reads mid rows [r, r+3)
    def b_src(h0, nrows):
        return mid[pl.ds(h0, nrows)]

    def b_dst(h0, res):
        out_ref[0, pl.ds(h0, res.shape[0])] = res.astype(out_ref.dtype)

    _stage(b_src, b_dst, w2b, w2b_r, b2_ref, th, gb, c_mid, cout,
           mid.shape[-1], wp_out, 1, mask)

    overhang = n_tiles * th - h_out
    if overhang:
        @pl.when(t == n_tiles - 1)
        def _zero_tail_rows():
            cut = th - min(overhang, th)
            out_ref[0, cut:] = jnp.zeros_like(out_ref[0, cut:])


def conv2_chain_pallas_aligned(
    x,
    k1: jax.Array,
    b1: jax.Array,
    k2: jax.Array,
    b2: jax.Array,
    *,
    w: int,
    h: int | None = None,
    tile_h: int | None = None,
) -> tuple[jax.Array, int, int]:
    """Fused conv3x3(+b,relu) -> conv3x3(+b,relu), aligned form in/out.

    Both convs pad 1 (geometry-preserving). ``x`` may be a list of parts
    (logical channel concat). Kernels may be W-phase-split transforms —
    the chain only sees two 3x3 kernels."""
    parts = list(x) if isinstance(x, (list, tuple)) else [x]
    assert k1.shape[:2] == (3, 3) and k2.shape[:2] == (3, 3)
    c_mid = k1.shape[-1]
    cout = k2.shape[-1]
    assert k2.shape[2] == c_mid, (k1.shape, k2.shape)
    part_cs = tuple(p.shape[2] for p in parts)
    part_wps = tuple(p.shape[-1] for p in parts)
    cin_total = sum(part_cs)
    cin1 = k1.shape[2]
    assert cin1 <= cin_total, (cin1, part_cs)
    assert cin_total - parts[-1].shape[2] <= cin1, "padded part must be last"
    cin_p = _round_up(cin_total, 8)
    if cin_p != cin1:
        k1 = jnp.pad(k1, ((0, 0), (0, 0), (0, cin_p - cin1), (0, 0)))
    c_mid_p = _round_up(c_mid, 8)
    if c_mid_p != c_mid:
        # granule-pad the intermediate channels; stage B gets zero taps
        k1 = jnp.pad(k1, ((0, 0), (0, 0), (0, 0), (0, c_mid_p - c_mid)))
        k2 = jnp.pad(k2, ((0, 0), (0, 0), (0, c_mid_p - c_mid), (0, 0)))
        b1 = jnp.pad(b1, (0, c_mid_p - c_mid))
        c_mid = c_mid_p

    h_in = parts[0].shape[1] if h is None else h
    h_out = h_in  # two pad-1 3x3 convs preserve geometry
    w_out = w
    wp_out = _round_up(w_out, 128)
    b_ = parts[0].shape[0]
    x_dtype = parts[0].dtype
    itemsize = jnp.dtype(x_dtype).itemsize
    wp_in = max(part_wps)
    wp_s = wp_in + 2 * FRONT

    ga = auto_row_group(3, cin_p, c_mid)
    gb = auto_row_group(3, c_mid, cout)

    if tile_h is None:
        # VMEM budget: two xs slots + mid + out block + tap matrices
        budget = 14 * 1024 * 1024
        fixed = 4 * (
            3 * ga * c_mid * (2 + ga) * cin_p
            + 3 * gb * cout * (2 + gb) * c_mid
        ) * 2
        per_row = (
            2 * cin_p * wp_s * itemsize      # xs (both slots)
            + c_mid * wp_s * itemsize        # mid
            + cout * wp_out * itemsize       # out
        )
        tile_h = max(8, (budget - fixed) // per_row - 6)
    th = min(_round_up(tile_h, 2), _round_up(h_out, 2))
    for cand in range(th, max(th // 2, 7), -1):
        if h_out % cand == 0 and cand % 2 == 0:
            th = cand
            break
    n_tiles = -(-h_out // th)

    w2a, w2a_r = _taps(k1, ga), _taps(k1, (th + 2) % ga or ga)
    w2b, w2b_r = _taps(k2, gb), _taps(k2, th % gb or gb)
    bias1 = jnp.tile(b1.astype(jnp.float32), max(ga, (th + 2) % ga or ga))
    bias2 = jnp.tile(b2.astype(jnp.float32), max(gb, th % gb or gb))

    n_total = b_ * n_tiles
    kfun = functools.partial(
        _chain_kernel, cin_p=cin_p, c_mid=c_mid, cout=cout, th=th,
        w_out=w_out, wp_out=wp_out, ga=ga, gb=gb, n_tiles=n_tiles,
        n_total=n_total, h_in=h_in, h_out=h_out, part_cs=part_cs,
        part_wps=part_wps,
    )
    out = pl.pallas_call(
        kfun,
        grid=(n_total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(parts)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, th, cout, wp_out),
            lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b_, n_tiles * th, cout, wp_out), x_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, cin_p, wp_s), x_dtype),
            pltpu.VMEM((th + 2, c_mid, wp_s), x_dtype),
            pltpu.SemaphoreType.DMA((2, len(parts))),
        ],
    )(*parts, w2a, w2a_r, w2b, w2b_r,
      bias1.reshape(-1, 1), bias2.reshape(-1, 1))
    return out, h_out, w_out
