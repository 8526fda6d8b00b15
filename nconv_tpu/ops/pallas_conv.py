"""Generic fused Pallas convolution (stride 1) in the (B, H, C, W) layout.

Same row-matmul structure as the normalized-conv kernel
(:mod:`nconv_tpu.ops.pallas_nconv_mxu`): for output row h, the im2col block
is the contiguous rows ``X[h:h+kh]`` reshaped (kh*C, W), and the conv is kw
MXU matmuls accumulated over horizontal taps, with bias + optional ReLU
fused into the row store. Used for the guided net's 3x3 conv stacks
(32-64 channels at full resolution), where XLA's conv lowering runs ~2 ms
per layer; this kernel measures ~2x faster with second-scale compiles.

Aligned-form IO (round 2): the kernel synthesizes its own halos — the
top/bottom row halo by zeroing scratch rows around a clamped DMA window,
the left lane halo from a 128-lane zeroed FRONT margin in scratch (the
right halo comes from the input's own zero lanes) — so chained convs pass
"aligned form" tensors (data at rows [0,h) x lanes [0,w) of a 128-aligned
array, zeros elsewhere) with **no XLA pad between layers at all**. The
pre-round-2 profile showed ~1.6 ms/frame of XLA pads feeding these kernels
at KITTI 352x1216.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import vmem

# lane margin in scratch providing the synthetic left halo (and DMA lane
# alignment); taps read at FRONT - pad_left + dx >= FRONT - 2
FRONT = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def ws_schedule(kw: int, pad: int):
    """Exact W-phase-split dot schedule. Output parity q at half-col k is
    full col 2k+q; full tap dx reads source parity ph=(q-pad+dx)%2 at
    half-col k+d, d=(q-pad+dx-ph)//2. Returns ``(keys, sched)``: ``keys``
    the sorted (ph, d) pairs (one MXU dot each), ``sched`` mapping key ->
    the [(q, dx), ...] full taps it carries. kw=3/pad=1 yields 4 dots (2
    parity-merged at d=0, 2 single-parity at d=-1/+1) with per-parity K —
    vs the dense wsplit form's 3 dots at doubled K (2x executed MACs)."""
    sched: dict = {}
    for q in (0, 1):
        for dx in range(kw):
            s = q - pad + dx
            ph = s % 2
            sched.setdefault((ph, (s - ph) // 2), []).append((q, dx))
    return tuple(sorted(sched)), sched


def ws_effective_kernels(kernel: jax.Array, keys, sched) -> list[jax.Array]:
    """Per-(ph, d) effective kernels for the exact W-phase-split form:
    E[:, :, q*F:(q+1)*F] sums the full taps dx mapping to this key for
    output parity q; absent parities stay zero. Each is (kh, C, 2F)."""
    kh, _, cin, cout = kernel.shape
    mats = []
    for key in keys:
        e = jnp.zeros((kh, cin, 2 * cout), kernel.dtype)
        for q, dx in sched[key]:
            e = e.at[:, :, q * cout : (q + 1) * cout].add(kernel[:, dx])
        mats.append(e)
    return mats


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


def _tile_windows(n_tiles: int, th: int, kh: int, pad_top: int, h_in: int):
    """Static per-tile DMA windows over the *virtual* padded row space.

    Tile t covers virtual rows [t*th - pad_top, t*th - pad_top + th + kh - 1);
    the DMA copies the intersection with the real rows [0, h_in) and the
    kernel zeroes the scratch rows outside it. Returns a list of
    (src_start_expr_is_dynamic-safe) tuples: (dst_offset, size, zero_top,
    zero_bottom) — all static ints, one entry per tile.
    """
    rows_full = th + kh - 1
    wins = []
    for t in range(n_tiles):
        start_v = t * th - pad_top
        lo = max(0, start_v)
        hi = min(h_in, start_v + rows_full)
        size = max(0, hi - lo)
        off = lo - start_v
        wins.append((off, size, off, rows_full - off - size))
    return wins


def _kernel(*refs, kh: int, kw: int,
            cin_p: int, cout: int, cout_store: int, th: int,
            w_out: int, wp_out: int, relu: bool, use_bias: bool, g: int,
            residual: bool, n_tiles: int, n_total: int, pad_top: int,
            pad_left: int, h_in: int, h_out: int, part_cs: tuple,
            part_wps: tuple, aligned_out: bool, d2s_f: int | None = None,
            wp_full: int = 0, s2g: bool = False, wp_acc: int = 0,
            ws_offs: tuple | None = None, exact_sel: bool = False):
    """Grid step = one (batch, H-tile) block on a flattened grid.

    The input may be SEVERAL aligned-form HBM refs (a logical channel
    concat): each part is DMA'd into its channel slab of the shared scratch
    window, so channel concatenations never materialize in HBM at all (XLA
    lowers a concat as one pad + combine per operand — ~116 MB each for the
    full-resolution fusion stages).

    Halo load: BlockSpec index maps cannot express overlapping H-tiles, so
    the inputs stay in HBM and each grid step DMAs its (th + kh - 1)-row
    window (clamped to real rows) into VMEM scratch, double-buffered across
    grid steps: step i starts the DMAs for step i+1 into the other slot
    before waiting on its own, so the next tile's transfer overlaps this
    tile's matmuls.
    """
    n_parts = len(part_cs)
    x_hbms = refs[:n_parts]
    if d2s_f is not None or s2g:
        w2_ref, bias_ref, s2_ref, out_ref, xs, sem = refs[n_parts:]
    else:
        w2_ref, bias_ref, out_ref, xs, sem = refs[n_parts:]
    coffs = [sum(part_cs[:i]) for i in range(n_parts)]
    idx = pl.program_id(0)
    rows_full = th + kh - 1
    wins = _tile_windows(n_tiles, th, kh, pad_top, h_in)
    # distinct (dst_offset, size) classes -> one static DMA variant each;
    # start and wait must branch identically (the semaphore wait counts the
    # copy's bytes, which differ per class)
    classes = sorted({(o, s) for (o, s, _zt, _zb) in wins if s})

    def dma_apply(step, slot, action):
        t = step % n_tiles
        bi = step // n_tiles
        for off, size in classes:
            tiles = [k for k, wn in enumerate(wins) if wn[:2] == (off, size)]
            cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

            @pl.when(cond)
            def _go(off=off, size=size):
                src = pl.ds(jnp.maximum(t * th - pad_top, 0), size)
                for i in range(n_parts):
                    if ws_offs is not None:
                        # exact W-phase-split: each part is [even c | odd c];
                        # its parity halves DMA into separate parity planes
                        # of scratch (granule-aligned channel slices of the
                        # HBM source), so per-parity windows reshape free
                        for ph in range(2):
                            cp = pltpu.make_async_copy(
                                x_hbms[i].at[
                                    bi, src, pl.ds(ph * part_cs[i], part_cs[i])
                                ],
                                xs.at[slot, ph, pl.ds(off, size),
                                      pl.ds(coffs[i], part_cs[i]),
                                      pl.ds(FRONT, part_wps[i])],
                                sem.at[slot, 2 * i + ph],
                            )
                            cp.start() if action == "start" else cp.wait()
                        continue
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
        # one-time: everything outside the DMA'd data regions stays zero for
        # the whole (sequential) grid — lane margins (the synthetic left
        # halo + per-part right slack) and the channel-granule tail
        xs[0] = jnp.zeros_like(xs[0])
        xs[1] = jnp.zeros_like(xs[1])

    @pl.when(idx == 0)
    def _warmup():
        dma_apply(0, 0, "start")

    @pl.when(idx + 1 < n_total)
    def _prefetch():
        dma_apply(idx + 1, (idx + 1) % 2, "start")

    slot = idx % 2
    t = idx % n_tiles
    dma_apply(idx, slot, "wait")

    # zero the scratch rows the clamped DMA did not fill (virtual halo rows)
    # (in ws mode the row axis sits behind the parity plane axis)
    row_sl = (slice(None),) if ws_offs is not None else ()
    for zt in sorted({wn[2] for wn in wins if wn[2]}):
        tiles = [k for k, wn in enumerate(wins) if wn[2] == zt]
        cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

        @pl.when(cond)
        def _zero_top(zt=zt):
            ix = (slot, *row_sl, slice(0, zt))
            xs[ix] = jnp.zeros_like(xs[ix])

    for zb in sorted({wn[3] for wn in wins if wn[3]}):
        tiles = [k for k, wn in enumerate(wins) if wn[3] == zb]
        cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

        @pl.when(cond)
        def _zero_bottom(zb=zb):
            ix = (slot, *row_sl, slice(rows_full - zb, None))
            xs[ix] = jnp.zeros_like(xs[ix])

    f32 = jnp.float32
    k_rows = (kh + g - 1) * cin_p
    wp_s = xs.shape[-1]
    bias_col = bias_ref[:, :] if use_bias else None
    mask_lanes = wp_out > w_out
    if mask_lanes:
        lane_ok = lax.broadcasted_iota(jnp.int32, (1, wp_out), 1) < w_out

    wp_conv = wp_acc if s2g else wp_out

    def window(h0, ph=None):
        a = (
            xs[slot, pl.ds(h0, kh + g - 1)] if ph is None
            else xs[slot, ph, pl.ds(h0, kh + g - 1)]
        )
        if jnp.issubdtype(a.dtype, jnp.integer):
            # fused wire decode: integer camera input converts to float in
            # VMEM, so the u8 frame never round-trips HBM as floats.
            # (Mosaic lacks a direct u8->f32 cast; widen to i32 first.)
            a = a.astype(jnp.int32).astype(f32)
        return a.reshape(k_rows, wp_s)

    # Pack several row groups per dot where the tile allows: their tap
    # windows share lane offsets, so the rhs lane-concat is legal; N
    # multiplies and the tap matrices load once per pack (measured
    # -190 us full-graph at 2-way). The pack's extra temporaries (extra
    # windows + widened rhs/acc) blow the 16 MB scoped-VMEM limit on
    # wide-channel f32 kernels, so gate on the window size (the failing
    # class measured 1.84 MB).
    win_itm = (
        4 if jnp.issubdtype(xs.dtype, jnp.integer)  # windows decode to f32
        else jnp.dtype(xs.dtype).itemsize
    )
    win_bytes = (2 if ws_offs is not None else 1) * k_rows * wp_s * win_itm
    # 4-way packing measured marginally OVER the 16 MB limit on big-tile
    # narrow-channel kernels (16.17M at fuse3 depth_conv) — 2-way only
    # unless the scoped budget is raised (ops/vmem.py).
    pack_budget = 1_200_000 * vmem.scale()
    n_pack = 1
    if not s2g and d2s_f is None:
        if (th // g) % 4 == 0 and vmem.scale() >= 2 and (
            2 * win_bytes <= pack_budget
        ):
            n_pack = 4
        elif (th // g) % 2 == 0 and win_bytes <= pack_budget:
            n_pack = 2

    def sel_dot(a, s):
        """Selection matmul (0/1 constant rhs). The MXU's default f32 path
        is ONE bf16 pass, which would re-round the already-accumulated f32
        values (~1e-3 pointwise — the conv family's baseline is 'matches
        XLA default', which rounds only the conv INPUTS). ``exact_sel``
        (the differentiable training ops) splits the accumulator hi/lo
        into two bf16-exact passes — exact to ~1e-7 — at 2x the selection
        dot cost; the inference graphs keep the single fast pass (their
        parity bar is 1e-3 and the selection dots are on the headline
        path)."""
        if exact_sel and a.dtype == f32 and out_ref.dtype == f32:
            hi = a.astype(jnp.bfloat16).astype(f32)
            lo = a - hi
            return lax.dot_general(
                hi, s, (((1,), (0,)), ((), ())), preferred_element_type=f32
            ) + lax.dot_general(
                lo, s, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
        return lax.dot_general(
            a, s, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )

    def finish(h0, acc):
        if s2g:
            # lane-stride-2 decimation: the conv ran at FULL lane width on
            # the row-pair form; keep every second lane via one constant
            # 0/1 gather matmul (Sg[2k, k] = 1, k < w_out — zero columns
            # blank the pad lanes). For bf16 graphs acc rounds to bf16
            # here (one rounding earlier than the store). The XLA
            # space-to-depth (95 MB at enc2) never runs.
            acc = sel_dot(
                acc if (
                    exact_sel and acc.dtype == f32 and out_ref.dtype == f32
                ) else acc.astype(out_ref.dtype),
                s2_ref[:, :],
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
        if d2s_f is not None:
            # depth-to-space epilogue: output channels are (ry, rx, f)
            # transpose-conv phases — emit the FULL-width interleaved rows
            # directly via two constant 0/1 selection matmuls per row
            # parity (lane scatter = matmul with S[k, 2k+rx] = 1, k < w_out;
            # zero S rows blank the pad lanes, so the result is aligned-form
            # with no masking). Mosaic has no lane-stride stores; the MXU
            # does the interleave instead, and the XLA d2s copy (~74 MB at
            # the fuse2 boundary) never runs.
            resg = res.reshape(g, cout, wp_out)
            if not (
                exact_sel and resg.dtype == f32 and out_ref.dtype == f32
            ):
                resg = resg.astype(out_ref.dtype)
            halves = []
            for ry in range(2):
                ev = resg[:, ry * 2 * d2s_f : ry * 2 * d2s_f + d2s_f]
                od = resg[:, ry * 2 * d2s_f + d2s_f : (ry + 1) * 2 * d2s_f]
                full = sel_dot(
                    ev.reshape(g * d2s_f, wp_out), s2_ref[0]
                ) + sel_dot(od.reshape(g * d2s_f, wp_out), s2_ref[1])
                halves.append(
                    full.reshape(g, 1, d2s_f, wp_full).astype(out_ref.dtype)
                )
            rows2 = jnp.concatenate(halves, 1).reshape(2 * g, d2s_f, wp_full)
            out_ref[0, pl.ds(2 * h0, 2 * g)] = rows2
            return 0
        if mask_lanes:
            res = jnp.where(lane_ok, res, 0.0)  # aligned form: zero pad lanes
        out_ref[0, pl.ds(h0, g)] = res.reshape(g, cout_store, wp_out).astype(
            out_ref.dtype
        )
        return 0

    def group_n(i, _):
        h0 = i * n_pack * g
        acc = jnp.zeros((g * cout, n_pack * wp_conv), f32)
        if ws_offs is not None:
            # exact W-phase-split: one dot per (source parity, half-width
            # lane offset) — the tap matrices carry zero M-rows for the
            # output parity a (ph, d) pair does not feed (M pads to the
            # same tile either way), so every dot accumulates into the one
            # [even F | odd F] accumulator. Executed K is the PER-PARITY
            # channel count — the dense wsplit form's 2x tap FLOPs (zero
            # parity-blocks inside K) never execute.
            wsp = [
                [window(h0 + j * g, ph) for j in range(n_pack)]
                for ph in range(2)
            ]
            for di, (ph, d) in enumerate(ws_offs):
                off = FRONT + d
                rhs = (
                    wsp[ph][0][:, off : off + wp_conv] if n_pack == 1
                    else jnp.concatenate(
                        [a[:, off : off + wp_conv] for a in wsp[ph]], 1
                    )
                )
                acc += lax.dot_general(
                    w2_ref[di], rhs,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        else:
            ws = [window(h0 + j * g) for j in range(n_pack)]
            for dx in range(kw):
                off = FRONT - pad_left + dx
                rhs = (
                    ws[0][:, off : off + wp_conv] if n_pack == 1
                    else jnp.concatenate(
                        [a[:, off : off + wp_conv] for a in ws], 1
                    )
                )
                acc += lax.dot_general(
                    w2_ref[dx], rhs,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        for j in range(n_pack):
            finish(h0 + j * g, acc[:, j * wp_conv : (j + 1) * wp_conv])
        return 0

    lax.fori_loop(0, th // (n_pack * g), group_n, 0)

    # aligned form: output rows past h_out (tile overhang) must be zeros
    overhang = n_tiles * th - h_out
    if overhang and aligned_out:
        scale = 2 if d2s_f is not None else 1
        @pl.when(t == n_tiles - 1)
        def _zero_tail_rows():
            cut = scale * (th - min(overhang, th))
            out_ref[0, cut:] = jnp.zeros_like(out_ref[0, cut:])


def _conv_core(
    parts,
    kernel: jax.Array,
    bias,
    *,
    pad_top: int,
    pad_left: int,
    h_in: int,
    w_in: int,
    h_out: int,
    w_out: int,
    wp_out: int,
    relu: bool,
    tile_h: int | None,
    residual_channels: int | None,
    aligned_out: bool,
    d2s_channels: int | None = None,
    lane_stride2: bool = False,
    ws_cs: tuple | None = None,
    exact_sel: bool = False,
) -> jax.Array:
    """Shared core. ``parts`` is a list of (B, Hx_i, c_i, wp_i) aligned-form
    arrays forming a logical channel concat — each has data at rows
    [0, h_in) x lanes [0, w_in), zeros elsewhere. The scratch channel slab
    is granule-padded; ``kernel`` must already be zero-extended to the
    padded channel count. Returns (B, alloc >= h_out, cout_store, wp_out).

    ``ws_cs``: exact W-phase-split mode. Each part is a half-width
    [even c_i | odd c_i] channel-block tensor (2*c_i physical channels,
    c_i = ws_cs[i], granule-aligned) and ``kernel`` is the ORIGINAL
    full-width (kh, kw, sum(c_i), F) kernel with odd kw and symmetric
    pad (kw-1)//2 (pad_left must equal it; pad_top is free). Output is
    the half-width [even F | odd F] form. Unlike the dense
    ``conv_kernel_wsplit`` form (which executes 2x the logical tap FLOPs
    as zero parity-blocks inside K), the parity halves DMA into separate
    scratch planes and each (source parity, lane offset) pair runs one
    dot over the PER-PARITY channel count: out phase q at half-col k is
    full col 2k+q, and full tap dx reads parity (q-pad+dx)%2 at half-col
    k + (q-pad+dx)//2 — kw=3 yields 4 dots (2 parity-merged at d=0, 2
    single-parity at d=-1/+1) with K halved vs the dense form's 3.
    """
    kh, kw, cin, cout = kernel.shape
    ws_offs = None
    if ws_cs is not None:
        assert residual_channels is None and d2s_channels is None
        assert not lane_stride2
        assert kw % 2 == 1 and pad_left == (kw - 1) // 2, (kw, pad_left)
        assert cin == sum(ws_cs), (cin, ws_cs)
        assert all(c % 8 == 0 for c in ws_cs), ws_cs
        part_cs = tuple(ws_cs)  # per-parity slab widths
        for p, c in zip(parts, ws_cs):
            assert p.shape[2] == 2 * c, (p.shape, c)
        # schedule: group full taps by (source parity, half-width offset)
        ws_offs, sched = ws_schedule(kw, pad_left)
        cin_eff, cout_eff = cin, 2 * cout  # per-parity K; [ev F | od F] out
    else:
        part_cs = tuple(p.shape[2] for p in parts)
        assert cin == _round_up(sum(part_cs), 8), (cin, part_cs)
        cin_eff, cout_eff = cin, cout
    part_wps = tuple(p.shape[-1] for p in parts)
    b = parts[0].shape[0]
    for p in parts:
        assert p.shape[0] == b and p.shape[1] >= h_in, (p.shape, h_in)
        assert p.shape[-1] % 128 == 0 and p.shape[-1] >= w_in
        assert p.dtype == parts[0].dtype
    wp_in = max(part_wps)
    assert wp_out <= wp_in + FRONT - kw + 1 + pad_left, (wp_out, wp_in)
    residual = residual_channels is not None
    cout_store = residual_channels if residual else cout_eff
    if residual:
        assert cout == 2 * cout_store, (cout, cout_store)
    if d2s_channels is not None:
        assert not residual and cout == 4 * d2s_channels, (cout, d2s_channels)
        assert not lane_stride2
    wp_full = _round_up(2 * w_out, 128) if d2s_channels is not None else 0
    # lane-stride-2 form: the conv runs at full lane width (the data spans
    # [0, w_in) = [0, 2*w_out)), then a gather matmul keeps even lanes
    wp_acc = _round_up(w_in, 128) if lane_stride2 else 0
    x_dtype = parts[0].dtype
    out_dtype = kernel.dtype if jnp.issubdtype(x_dtype, jnp.integer) else x_dtype

    g = auto_row_group(kh, cin_eff, cout_eff)
    if ws_cs is not None:
        # one (g*2F, (kh+g-1)*C) block-Toeplitz tap matrix per (ph, d):
        # effective kernel E[:, :, q*F:(q+1)*F] = sum of the full taps dx
        # that map to this (ph, d) for output parity q; absent parities
        # stay zero M-rows (M pads to the same tile either way)
        mats = []
        for e in ws_effective_kernels(kernel, ws_offs, sched):
            e_t = jnp.transpose(e, (2, 0, 1))  # (2F, kh, C)
            mats.append(
                jnp.stack(
                    [
                        jnp.pad(e_t, ((0, 0), (r, g - 1 - r), (0, 0)))
                        for r in range(g)
                    ],
                    axis=0,
                ).reshape(g * cout_eff, (kh + g - 1) * cin)
            )
        w2 = jnp.stack(mats)  # (n_dots, g*2F, (kh+g-1)*C)
        cout = cout_eff
    else:
        # block-Toeplitz tap matrices: row group r of the output uses the
        # same taps shifted r*cin columns into the (kh+g-1)-row input window
        w_t = jnp.transpose(kernel, (1, 3, 0, 2))  # (kw, cout, kh, cin)
        w2 = jnp.stack(
            [
                jnp.pad(w_t, ((0, 0), (0, 0), (r, g - 1 - r), (0, 0)))
                for r in range(g)
            ],
            axis=1,
        ).reshape(kw, g * cout, (kh + g - 1) * cin)

    itemsize = jnp.dtype(x_dtype).itemsize
    wp_s = wp_in + 2 * FRONT
    out_itemsize = jnp.dtype(out_dtype).itemsize
    n_planes = 2 if ws_cs is not None else 1  # parity scratch planes
    fixed = (
        w2.size * 4
        + 2 * n_planes * (kh + g - 1) * cin * wp_s * itemsize
        + 2 * g * cout * wp_out * 4
    )
    if d2s_channels is not None:
        # scatter constants + the full-width interleave temporaries
        fixed += 2 * wp_out * wp_full * out_itemsize
        fixed += 2 * g * d2s_channels * wp_full * 4
    if lane_stride2:
        # gather constant + the full-lane-width accumulator
        fixed += wp_acc * wp_out * out_itemsize
        fixed += 2 * g * cout * wp_acc * 4
    rout = (
        2 * d2s_channels * wp_full if d2s_channels is not None
        else cout_store * wp_out
    ) * out_itemsize
    if tile_h is None:
        tile_h = auto_tile_h(
            n_planes * cin * wp_s * itemsize, rout, kh, h_out,
            fixed_bytes=fixed,
        )
    th = min(_round_up(tile_h, g), _round_up(h_out, g))
    if aligned_out:
        # exact tiling (no overhang rows to mask): largest multiple-of-g
        # divisor of h_out near the VMEM-fit tile; if h_out has no good
        # divisor (e.g. 354 = 2*3*59) keep the overhang and mask it
        for cand in range(th, max(th // 2, 7), -1):
            # even tiles so downstream space-to-depth gets an even row count
            if h_out % cand == 0 and cand % g == 0 and cand % 2 == 0:
                th = cand
                break
    n_tiles = -(-h_out // th)

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
        _kernel, kh=kh, kw=kw, cin_p=cin, cout=cout, cout_store=cout_store,
        th=th, w_out=w_out, wp_out=wp_out, relu=relu, use_bias=use_bias,
        g=g, residual=residual, n_tiles=n_tiles, n_total=n_total,
        pad_top=pad_top, pad_left=pad_left, h_in=h_in, h_out=h_out,
        part_cs=part_cs, part_wps=part_wps, aligned_out=aligned_out,
        d2s_f=d2s_channels, wp_full=wp_full, s2g=lane_stride2, wp_acc=wp_acc,
        ws_offs=ws_offs, exact_sel=exact_sel,
    )
    extra_ops = []
    if d2s_channels is not None:
        # lane-scatter constants: S[rx, k, 2k+rx] = 1 for k < w_out; zero
        # rows past w_out blank the conv's pad lanes, so the interleaved
        # output is aligned-form with no extra masking
        s2 = np.zeros((2, wp_out, wp_full), np.float32)
        ks = np.arange(w_out)
        s2[0, ks, 2 * ks] = 1.0
        s2[1, ks, 2 * ks + 1] = 1.0
        extra_ops.append(jnp.asarray(s2, out_dtype))
    if lane_stride2:
        # lane-gather constant: Sg[2k, k] = 1 for k < w_out
        sg = np.zeros((wp_acc, wp_out), np.float32)
        ks = np.arange(w_out)
        sg[2 * ks, ks] = 1.0
        extra_ops.append(jnp.asarray(sg, out_dtype))
    rows_store = 2 * th if d2s_channels is not None else th
    c_store = d2s_channels if d2s_channels is not None else cout_store
    wp_store = wp_full if d2s_channels is not None else wp_out
    # geometry-derived kernel name so device traces self-identify: which
    # conv (shape/group/epilogue) each custom-call instance is
    tag = f"conv{kh}x{kw}_{cin}x{cout}_w{w_out}_g{g}"
    if residual:
        tag += "_res"
    if d2s_channels is not None:
        tag += "_d2s"
    if lane_stride2:
        tag += "_s2"
    if ws_cs is not None:
        tag += "_wsx"
    return pl.pallas_call(
        kfun,
        name=tag,
        grid=(n_total,),  # flattened (batch, H-tile) for cross-step prefetch
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(parts)  # HBM
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(extra_ops)),
        out_specs=pl.BlockSpec(
            (1, rows_store, c_store, wp_store),
            lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_tiles * rows_store, c_store, wp_store), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, 2, th + kh - 1, cin, wp_s) if ws_cs is not None
                else (2, th + kh - 1, cin, wp_s),
                x_dtype,
            ),
            pltpu.SemaphoreType.DMA((2, n_planes * len(parts))),
        ],
        compiler_params=vmem.compiler_params(),
    )(*parts, w2, bias_arr, *extra_ops)


def conv2d_pallas_bhcw_aligned(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    w: int,
    h: int | None = None,
    padding: int = 1,
    pad_top: int | None = None,
    pad_left: int | None = None,
    pad_bottom: int | None = None,
    pad_right: int | None = None,
    relu: bool = False,
    tile_h: int | None = None,
    residual_channels: int | None = None,
    d2s_channels: int | None = None,
    lane_stride2: bool = False,
    wsplit_cs: tuple | list | None = None,
) -> tuple[jax.Array, int, int]:
    """Aligned-form conv: ``x`` (B, Hx, cin, Wp) with data at rows [0, h) x
    lanes [0, w), zeros elsewhere. Returns ``(out, h_out, w_out)`` where
    ``out`` is aligned-form (B, alloc >= h_out, cout, round_up(w_out, 128)).

    ``wsplit_cs=[c_i, ...]``: exact W-phase-split mode — each part is a
    HALF-width [even c_i | odd c_i] channel-block tensor, ``kernel`` the
    original FULL-width (kh, kw, sum(c_i), F) kernel (odd kw, symmetric
    lane pad (kw-1)//2), ``w`` the HALF width, ``bias`` the original (F,).
    Output is the half-width [even F | odd F] form (w_out = w). Requires
    every c_i to be a multiple of the 8-channel granule; see _conv_core.

    ``d2s_channels=F``: the kernel's output channels are 4F transpose-conv
    phases in (ry, rx, f) order, and the kernel performs the depth-to-space
    itself — the returned array is (B, alloc >= 2*h_out, F,
    round_up(2*w_out, 128)) full-resolution aligned form (lane interleave
    via constant selection matmuls on the MXU; the returned ``(h_out,
    w_out)`` stay the CONV geometry — the caller doubles them).

    No XLA pad is issued anywhere: halos are synthesized in the kernel
    (zeroed scratch rows / a zeroed lane margin). Inference-only fast path —
    not differentiable (training uses :func:`conv2d_pallas_bhcw`).
    """
    parts = list(x) if isinstance(x, (list, tuple)) else [x]
    kh, kw, cin, _ = kernel.shape
    if wsplit_cs is not None:
        pt_ = padding if pad_top is None else pad_top
        pb_ = pt_ if pad_bottom is None else pad_bottom
        h_in_ = parts[0].shape[1] if h is None else h
        h_out_ = h_in_ + pt_ + pb_ - (kh - 1)
        out = _conv_core(
            parts, kernel,
            None if bias is None else jnp.tile(bias, 2),
            pad_top=pt_, pad_left=(kw - 1) // 2, h_in=h_in_, w_in=w,
            h_out=h_out_, w_out=w, wp_out=_round_up(w, 128), relu=relu,
            tile_h=tile_h, residual_channels=None, aligned_out=True,
            ws_cs=tuple(wsplit_cs),
        )
        return out, h_out_, w
    cin_total = sum(p.shape[2] for p in parts)
    # the kernel's channels correspond to the logical concat of the parts;
    # parts must be channel-exact (any granule tail is synthesized as zero
    # scratch slabs in the kernel, with zero kernel taps to match)
    assert cin <= cin_total, (cin, [p.shape for p in parts])
    # pad channels may only TRAIL: kernel channel i binds to the i-th channel
    # of the logical part concat, so a granule-padded part anywhere but last
    # would silently shift every later part's binding
    assert cin_total - parts[-1].shape[2] <= cin, (
        "granule-padded part must be last",
        cin,
        [p.shape for p in parts],
    )
    cin_alloc = _round_up(cin_total, 8)
    if cin_alloc != cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_alloc - cin), (0, 0)))
    pt = padding if pad_top is None else pad_top
    pb = pt if pad_bottom is None else pad_bottom
    pl_ = padding if pad_left is None else pad_left
    pr = pl_ if pad_right is None else pad_right
    h_in = parts[0].shape[1] if h is None else h
    h_out = h_in + pt + pb - (kh - 1)
    if lane_stride2:
        # stride-2-in-W form over the row-pair view (conv_kernel_s2_rowpair,
        # convtranspose_s2_dx_kernel_rowpair): the pad-1 lane taps run at
        # FULL width, a gather matmul keeps even lanes — out[wo] =
        # full_conv[2*wo], wo < w/2 (kw=3 fwd encoders; kw=4 decoder d_x)
        assert kw in (3, 4) and pl_ == 1 and w % 2 == 0, (kw, pl_, w)
        w_out = w // 2
    else:
        w_out = w + pl_ + pr - (kw - 1)
    out = _conv_core(
        parts, kernel, bias,
        pad_top=pt, pad_left=pl_, h_in=h_in, w_in=w, h_out=h_out, w_out=w_out,
        wp_out=_round_up(w_out, 128), relu=relu, tile_h=tile_h,
        residual_channels=residual_channels, aligned_out=True,
        d2s_channels=d2s_channels, lane_stride2=lane_stride2,
    )
    return out, h_out, w_out


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


def transpose_conv_bhcw(cot, w, p):
    """Input-gradient of a stride-1 conv, in (B,H,C,W) on the Pallas
    kernel: conv of the cotangent with the spatially-flipped,
    channel-transposed kernel at padding k-1-p (a negative effective pad —
    the 1x1/pad-2 quirk layer — becomes a crop first)."""
    kh, kw = w.shape[0], w.shape[1]
    w_t = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(cot.dtype)
    ph, pw = kh - 1 - p, kw - 1 - p
    if ph < 0:
        cot = cot[:, -ph : cot.shape[1] + ph, :, -pw : cot.shape[3] + pw]
        ph = pw = 0
    return conv2d_pallas_bhcw(cot, w_t, padding=ph)


def _conv2d_bhcw_bwd(padding, relu, tile_h, residual_channels, res, g):
    """Hand-rolled backward that never re-runs the forward and never
    leaves the (B,H,C,W) layout: the input cotangent is a transposed conv
    **run on the Pallas kernel itself** (XLA's NHWC lowering pads the
    small-channel tensors into the 128-lane dim), the ReLU mask is read
    from the saved Pallas output elementwise in BHCW, and only the
    filter-grad conv (a different contraction shape) stays XLA."""
    from .convops import conv2d as conv2d_xla

    x, kernel, bias, out = res
    if residual_channels is not None:
        # fused residual form: out = relu(main + bias) + short, both convs
        # sharing x. The ReLU mask is recovered by recomputing ONLY the
        # (center-tap 1x1 embedded) shortcut conv — never the main conv —
        # since relu(main + bias) = out - short. The cotangent pair
        # [g·mask ‖ g] then flows through ONE transposed conv / ONE
        # filter-grad (the channel concat matches the stacked kernel).
        # Precision caveat: in bf16 `out` rounds relu(main+b)+short as a
        # SUM while `short` here is rounded separately, so the recovered
        # mask can flip where |main+b| is below short's bf16 ulp — gradient
        # noise at the ReLU boundary of the same order as the bf16 rounding
        # noise already present (mixed-precision training keeps loss parity
        # with f32 to ~3 decimals; exact masks would need the forward to
        # store them).
        n = residual_channels
        short = _conv2d_bhcw_impl(
            x.astype(kernel.dtype), kernel[..., n:], None,
            padding=padding, relu=False, tile_h=tile_h,
        )
        mask = (out - short) > 0
        g2 = jnp.concatenate([g * mask, g], axis=2)
        d_x = transpose_conv_bhcw(g2, kernel, padding)
        d_k = conv_filtergrad_pallas_bhcw(
            x.astype(kernel.dtype), g2.astype(kernel.dtype),
            kh=kernel.shape[0], kw=kernel.shape[1], padding=padding,
        ).astype(kernel.dtype)
        has_bias = bias is not None and bias.ndim > 0
        d_b = (
            jnp.sum(g * mask, axis=(0, 1, 3)).astype(bias.dtype)
            if has_bias
            else jnp.zeros_like(bias)
        )
        return d_x.astype(x.dtype), d_k, d_b

    if relu:
        g = g * (out > 0)
    d_x = transpose_conv_bhcw(g, kernel, padding)
    d_k = conv_filtergrad_pallas_bhcw(
        x.astype(kernel.dtype), g.astype(kernel.dtype),
        kh=kernel.shape[0], kw=kernel.shape[1], padding=padding,
    ).astype(kernel.dtype)
    has_bias = bias is not None and bias.ndim > 0
    d_b = (
        jnp.sum(g, axis=(0, 1, 3)).astype(bias.dtype)
        if has_bias
        else jnp.zeros_like(bias)
    )
    return d_x.astype(x.dtype), d_k, d_b


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
    """Stride-1 conv on logical (B, H, C, W) operands; kernel HWIO. Fuses
    bias and optional ReLU. Integer inputs (uint8 camera frames) are decoded
    to float inside the kernel. Returns (B, H_out, Cout, W_out).

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
    p = padding
    h_out = h + 2 * p - (kh - 1)
    w_out = w + 2 * p - (kw - 1)

    cin_p = _round_up(cin, 8)
    if cin_p != cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
    # one XLA pad to aligned form (right-side lanes + channel granule: a
    # sub-tile channel DMA slab is rejected by Mosaic; the kernel
    # synthesizes the conv halos itself)
    wp = _round_up(w, 128)
    if cin_p != cin or wp != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cin_p - cin), (0, wp - w)))

    out = _conv_core(
        [x], kernel, bias,
        pad_top=p, pad_left=p, h_in=h, w_in=w, h_out=h_out, w_out=w_out,
        wp_out=w_out, relu=relu, tile_h=tile_h,
        residual_channels=residual_channels, aligned_out=False,
    )
    if out.shape[1] != h_out:
        out = out[:, :h_out]
    return out


def _conv2d_bhcw_cat_impl(parts, kernel, bias, *, padding, relu):
    """Multi-input forward: a logical channel concat fed to the kernel as
    separate HBM operands (per-part DMA slabs) — the concatenated tensor is
    never materialized. Sub-granule parts (the 1-channel depth in UpCat's
    [depth ‖ fusion]) are padded to the 8-channel DMA granule and the kernel
    re-expressed over the physical layout with zero taps on pad channels
    (:func:`ops.convops.expand_kernel_channels`)."""
    from .convops import expand_kernel_channels

    if bias is not None and bias.ndim == 0:
        bias = None  # scalar sentinel from the differentiable wrapper
    kh, kw, cin, cout = kernel.shape
    b, h, _, w = parts[0].shape
    assert cin == sum(p.shape[2] for p in parts), (
        cin, [p.shape for p in parts]
    )
    p = padding
    h_out = h + 2 * p - (kh - 1)
    w_out = w + 2 * p - (kw - 1)

    wp = _round_up(w, 128)
    spec = []
    phys = []
    for x in parts:
        assert x.shape[0] == b and x.shape[1] == h and x.shape[3] == w, (
            x.shape, parts[0].shape
        )
        c = x.shape[2]
        cp = _round_up(c, 8)
        if cp != c or wp != w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c), (0, wp - w)))
        spec.append((c, cp))
        phys.append(x)
    if any(c != cp for c, cp in spec):
        kernel = expand_kernel_channels(kernel, spec)

    out = _conv_core(
        phys, kernel, bias,
        pad_top=p, pad_left=p, h_in=h, w_in=w, h_out=h_out, w_out=w_out,
        wp_out=w_out, relu=relu, tile_h=None,
        residual_channels=None, aligned_out=False,
    )
    if out.shape[1] != h_out:
        out = out[:, :h_out]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv2d_bhcw_cat_core(parts, kernel, bias, padding, relu):
    return _conv2d_bhcw_cat_impl(parts, kernel, bias, padding=padding, relu=relu)


def _conv2d_bhcw_cat_fwd(parts, kernel, bias, padding, relu):
    out = _conv2d_bhcw_cat_core(parts, kernel, bias, padding, relu)
    return out, (parts, kernel, bias, out)


def _conv2d_bhcw_cat_bwd(padding, relu, res, g):
    """Backward of the multi-part conv: ONE transposed conv over the full
    logical kernel gives the concatenated input cotangent (per-part slices
    are channel-offset views); the weight cotangent decomposes exactly by
    input-channel block, one filter-grad kernel call per part."""
    parts, kernel, bias, out = res
    if relu:
        g = g * (out > 0)
    d_x = transpose_conv_bhcw(g, kernel, padding)
    d_parts = []
    off = 0
    for x in parts:
        c = x.shape[2]
        d_parts.append(d_x[:, :, off : off + c, :].astype(x.dtype))
        off += c
    d_k = jnp.concatenate(
        [
            conv_filtergrad_pallas_bhcw(
                x.astype(kernel.dtype), g.astype(kernel.dtype),
                kh=kernel.shape[0], kw=kernel.shape[1], padding=padding,
            )
            for x in parts
        ],
        axis=2,
    ).astype(kernel.dtype)
    has_bias = bias is not None and bias.ndim > 0
    d_b = (
        jnp.sum(g, axis=(0, 1, 3)).astype(bias.dtype)
        if has_bias
        else jnp.zeros_like(bias)
    )
    return tuple(d_parts), d_k, d_b


_conv2d_bhcw_cat_core.defvjp(_conv2d_bhcw_cat_fwd, _conv2d_bhcw_cat_bwd)


def conv2d_pallas_bhcw_cat(
    parts,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 1,
    relu: bool = False,
) -> jax.Array:
    """Differentiable stride-1 conv over a LOGICAL channel concat of plain
    (B, H, C_i, W) operands — the training-graph twin of the aligned
    multi-input kernels: ``conv(cat(parts, axis=2))`` without the HBM concat
    (reference concat sites: `models/step2.py:169-174,229`). Forward runs the
    fused row-matmul kernel with per-part DMA; gradients are hand-rolled
    (one Pallas transposed conv for all parts + per-part filter-grad)."""
    if bias is None:
        bias = jnp.zeros((), kernel.dtype)  # sentinel: scalar == no bias
    return _conv2d_bhcw_cat_core(tuple(parts), kernel, bias, padding, relu)


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


# ---------------------------------------------------------------------------
# Filter gradient (weight cotangent) kernel.
#
# The training profile showed XLA's filter-grad convs were 32 of the 35 ms
# unguided backward: at 8-16 channels XLA pads the NHWC operands 16x into
# the lane dim. This kernel computes d_w in the native (B, H, C, W) layout:
# for each horizontal tap dx, ONE block-Toeplitz matmul per (batch, row
# tile) multiplies the x window's im2col block (a free reshape, same as the
# forward) against the row-stacked cotangent transposed —
#
#     C = A_dx ((th+kh-1)*cin, W) @ G^T (W, th*cout)
#
# — and the (row, row+dy) band of C is what feeds d_w[dy, dx]. Stacking th
# rows into N fills the MXU's output dim (th*cout ~ 128) at the cost of a
# (th+kh-1)/kh over-compute band — a large win over per-row matmuls with
# N = cout (~8).
# ---------------------------------------------------------------------------


def _filtergrad_kernel(x_hbm, g_ref, out_ref, xs, sem, *, kh: int, kw: int,
                       cin_p: int, cout: int, th: int, pad_left: int,
                       pad_top: int, h_in: int, wp_g: int, wp_in: int,
                       n_tiles: int, n_total: int):
    idx = pl.program_id(0)
    rows_full = th + kh - 1
    wins = _tile_windows(n_tiles, th, kh, pad_top, h_in)
    classes = sorted({(o, s) for (o, s, _zt, _zb) in wins if s})

    def dma_apply(step, slot, action):
        t = step % n_tiles
        bi = step // n_tiles
        for off, size in classes:
            tiles = [k for k, wn in enumerate(wins) if wn[:2] == (off, size)]
            cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

            @pl.when(cond)
            def _go(off=off, size=size):
                cp = pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(jnp.maximum(t * th - pad_top, 0), size)],
                    xs.at[slot, pl.ds(off, size), :, pl.ds(FRONT, wp_in)],
                    sem.at[slot],
                )
                cp.start() if action == "start" else cp.wait()

    @pl.when(idx == 0)
    def _zero():
        xs[0] = jnp.zeros_like(xs[0])
        xs[1] = jnp.zeros_like(xs[1])
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

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

    f32 = jnp.float32
    a = xs[slot].reshape(rows_full * cin_p, xs.shape[-1])
    g2 = g_ref[0].reshape(th * cout, wp_g)
    # Band gather (g row j pairs x rows j..j+kh-1). Two forms:
    #  * sliced: th (cin_p, cout) sub-block slice-adds per tap — cheap
    #    when tiles are small or the cout lane blocks are 128-aligned;
    #  * masked fold (th >= 8 with misaligned lane blocks): the per-block
    #    col offsets j*cout are lane rotations (expensive for small
    #    cout); instead split the SUBLANE-major dim (free), zero
    #    everything off the j-block diagonal with one broadcast mask,
    #    and fold the lane blocks with a tiny selection matmul —
    #    hi/lo-split into two bf16-exact passes so the f32 band sums
    #    stay exact. Measured: 32x32 w640 890 -> 344 us/instance; the
    #    th=4 64x64 shape regressed under the masked form (120 -> 168),
    #    hence the gate.
    masked_gather = th >= 8 and (cout % 128) != 0
    if masked_gather:
        ji = lax.broadcasted_iota(jnp.int32, (th, 1, th * cout), 0)
        qi = lax.broadcasted_iota(jnp.int32, (th, 1, th * cout), 2)
        diag = (qi // cout == ji).astype(f32)
        rq = lax.broadcasted_iota(jnp.int32, (th * cout, cout), 0)
        rc = lax.broadcasted_iota(jnp.int32, (th * cout, cout), 1)
        fold = (rq % cout == rc).astype(f32)

        def fold_blocks(s):
            hi = s.astype(jnp.bfloat16).astype(f32)
            lo = s - hi
            dims = (((1,), (0,)), ((), ()))
            return lax.dot_general(
                hi, fold, dims, preferred_element_type=f32
            ) + lax.dot_general(lo, fold, dims, preferred_element_type=f32)

    cols = []
    for dx in range(kw):
        off = FRONT - pad_left + dx
        c = lax.dot_general(
            a[:, off : off + wp_g], g2, (((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # ((th+kh-1)*cin_p, th*cout)
        if masked_gather:
            c3 = c.reshape(rows_full, cin_p, th * cout)
            rows = [
                fold_blocks(jnp.sum(c3[dy : dy + th] * diag, axis=0))
                for dy in range(kh)
            ]
        else:
            rows = []
            for dy in range(kh):
                blocks = [
                    c[(j + dy) * cin_p : (j + dy + 1) * cin_p,
                      j * cout : (j + 1) * cout]
                    for j in range(th)
                ]
                s = blocks[0]
                for bblk in blocks[1:]:
                    s = s + bblk
                rows.append(s)
        cols.append(jnp.concatenate(rows, 0) if kh > 1 else rows[0])
    out_ref[...] += jnp.concatenate(cols, 1) if kw > 1 else cols[0]


def conv_filtergrad_pallas_bhcw(
    x: jax.Array,
    g: jax.Array,
    *,
    kh: int,
    kw: int,
    padding: int,
    pad_top: int | None = None,
    th: int | None = None,
) -> jax.Array:
    """Weight cotangent of a stride-1 BHCW conv: ``x`` (B, H, Cin, W) is the
    saved forward input, ``g`` (B, H_out, Cout, W_out) the output cotangent
    (ReLU mask already applied). Returns (kh, kw, Cin, Cout) float32.

    ``pad_top`` (default ``padding``) allows an asymmetric row window —
    the implied pad_bottom is ``h_out - h - pad_top + kh - 1`` (the
    stride-2 rowpair filter-grads use pad_top=1, pad_bottom=0). ``th``
    (tile height) overrides the heuristic — exposed for perf sweeps."""
    b, h, cin, w = x.shape
    _, h_out, cout, w_out = g.shape
    pad_top = padding if pad_top is None else pad_top
    pad_bottom = h_out - h - pad_top + kh - 1
    # any non-negative bottom pad works: the tile windows clamp to real
    # rows and zero the rest (the 1x1/pad-2 quirk layer has pad_bottom=2)
    assert pad_bottom >= 0, (h, h_out, kh, pad_top, pad_bottom)
    cin_p = _round_up(cin, 8)
    wp = _round_up(w, 128)
    x_p = (
        jnp.pad(x, ((0, 0), (0, 0), (0, cin_p - cin), (0, wp - w)))
        if (cin_p != cin or wp != w) else x
    )
    if th is None:
        # Measured optimum (TPU v5e sweep, scripts/profile_train_bwd.py
        # shapes): dot-N util wants th*cout ~ 256 (512 when the M side is
        # thin, cin_p <= 8) before band over-compute ((th+kh-1)/th rows
        # wasted) takes over. The old th*cout~128 target lost up to 2.4x
        # on small-cin shapes (3x64 w640: 191 -> 79 us).
        target = 512 if cin_p <= 8 else 256
        th = min(max(target // cout, 2), h_out, 16)
    th = min(th, h_out)
    # scoped-VMEM estimate: the double-buffered x window + its f32 reshape /
    # per-tap slice temporaries dominate. The kh=3/kw=4 stride-2
    # filter-grads exceed Mosaic's 16 MB default at the heuristic th on
    # wide-channel shapes; those get the raised limit (and a th clamp under
    # the raised budget). The TUNED stride-1 filter-grads keep Mosaic's
    # default compilation — passing a raised limit to them measurably
    # changes scheduling (32x32 w640 regressed 2x when it was applied
    # unconditionally).
    def scoped_est(th_):
        wp_est = _round_up(w, 128) + 2 * FRONT
        return (2 + 2 + kw) * (th_ + kh - 1) * cin_p * wp_est * 4

    budget = 14_000_000 * vmem.scale()
    while th > 2 and scoped_est(th) > budget:
        th -= 1
    fg_compiler_params = (
        vmem.compiler_params() if scoped_est(th) > 12_000_000 else None
    )
    n_tiles = -(-h_out // th)
    wp_g = _round_up(w_out, 128)
    g_p = jnp.pad(
        g, ((0, 0), (0, n_tiles * th - h_out), (0, 0), (0, wp_g - w_out))
    ).astype(x_p.dtype)

    n_total = b * n_tiles
    kfun = functools.partial(
        _filtergrad_kernel, kh=kh, kw=kw, cin_p=cin_p, cout=cout, th=th,
        pad_left=padding, pad_top=pad_top, h_in=h, wp_g=wp_g, wp_in=wp,
        n_tiles=n_tiles, n_total=n_total,
    )
    out = pl.pallas_call(
        kfun,
        name=f"filtergrad{kh}x{kw}_{cin}x{cout}_w{w_out}"
        + ("_mg" if th >= 8 and cout % 128 else ""),
        grid=(n_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x, HBM (halo windows)
            pl.BlockSpec(
                (1, th, cout, wp_g),
                lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (kh * cin_p, kw * cout), lambda idx: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((kh * cin_p, kw * cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, cin_p, wp + 2 * FRONT), x_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=fg_compiler_params,
    )(x_p, g_p)
    out = out.reshape(kh, cin_p, kw, cout)
    return jnp.transpose(out, (0, 2, 1, 3))[:, :, :cin]
