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
the input stays in HBM and each grid step DMAs its clamped halo window into
VMEM scratch. Like :mod:`pallas_conv`, the kernel synthesizes the halos
itself (zeroed scratch rows, a zeroed FRONT lane margin), so aligned-form
chains pass (B, H, C, Wp) tensors with no XLA pads between layers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nconv import EPS_DEFAULT, POS_FNS
from .pallas_conv import (
    FRONT,
    _round_up,
    _tile_windows,
    auto_tile_h,
    transpose_conv_bhcw,
)


def _kernel(*refs, kh: int, kw: int, cin_pad: int, cout: int,
            th: int, w_out: int, wp_out: int, eps: float, n_tiles: int,
            n_total: int, pad_top: int, pad_left: int, h_in: int,
            h_out: int, part_cs: tuple, part_wps: tuple,
            row_shared: tuple, aligned_out: bool, g: int,
            lane_rep: tuple = (), wp_rep: int = 0,
            pool_out: bool = False):
    """Grid step = one (batch, H-tile) block on a flattened grid.

    d_hbm/c_hbm: (B, Hx, cin_pad, wp_in) aligned-form data / confidence in
             HBM — each step DMAs its clamped halo window into the two
             halves of a VMEM scratch slot (slot, rows, 2, cin_pad, wp_s),
             then forms data*conf in place with one VMEM pass. Keeping the
             operands separate in HBM kills the XLA-side dc-multiply pass
             AND the [dc ; c] concat copy the fused input needed.
             DMAs are double-buffered across grid steps: step i prefetches
             step i+1's windows into the other slot before waiting.
    w2_ref:  (kw, 2*cout, kh*2*cin_pad)  block-diagonal tap matrices
    bias_ref/wsum_ref: (cout, 1)
    out_ref/cout_ref:  (1, th, cout, wp_out)
    """
    n_parts = len(part_cs)
    d_hbms = refs[:n_parts]
    c_hbms = refs[n_parts : 2 * n_parts]
    pos = 2 * n_parts
    w2_ref, bias_ref, wsum_ref = refs[pos : pos + 3]
    pos += 3
    if any(lane_rep):
        srep_ref = refs[pos]
        pos += 1
    if pool_out:
        out_ref, cout_ref, pout_ref, pcnf_ref, xs, sem_d, sem_c = refs[pos:]
    else:
        out_ref, cout_ref, xs, sem_d, sem_c = refs[pos:]
    lane_rep = lane_rep or (False,) * n_parts
    coffs = [sum(part_cs[:i]) for i in range(n_parts)]
    idx = pl.program_id(0)
    rows_full = th + kh - 1
    wins = _tile_windows(n_tiles, th, kh, pad_top, h_in)
    # per-tile static window-start parity: full row a+j maps to source
    # row (a+j)//2 = a//2 + (j+par)//2 for row-shared parts (odd pad_top
    # makes starts odd on every tile but the clamped first)
    pars = [max(t * th - pad_top, 0) % 2 for t in range(n_tiles)]
    classes = sorted(
        {(o, s, pars[k]) for k, (o, s, _zt, _zb) in enumerate(wins) if s}
    )

    def dma_apply(step, slot, action):
        t = step % n_tiles
        bi = step // n_tiles
        for off, size, par in classes:
            tiles = [
                k for k, wn in enumerate(wins)
                if wn[:2] == (off, size) and pars[k] == par
            ]
            cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

            @pl.when(cond)
            def _go(off=off, size=size, par=par):
                a = jnp.maximum(t * th - pad_top, 0)
                for hbms, half, sem in ((d_hbms, 0, sem_d), (c_hbms, 1, sem_c)):
                    for i in range(n_parts):
                        if row_shared[i]:
                            # half-row source (2x row nearest-repeat folds
                            # into the kernel): fetch the covering source
                            # rows; expansion duplicates them after the
                            # wait. Block position of full row a+j is
                            # (j+par)//2.
                            sz = (size + par + 1) // 2
                            src = pl.ds(a // 2, sz)
                            dst = pl.ds(off, sz)
                        else:
                            src = pl.ds(a, size)
                            dst = pl.ds(off, size)
                        cp = pltpu.make_async_copy(
                            hbms[i].at[bi, src],
                            xs.at[slot, dst, half,
                                  pl.ds(coffs[i], part_cs[i]),
                                  pl.ds(FRONT, part_wps[i])],
                            sem.at[slot, i],
                        )
                        cp.start() if action == "start" else cp.wait()

    @pl.when(idx == 0)
    def _zero_scratch():
        # one-time: lane margins, channel-granule tail and per-part lane
        # slack all stay zero for the whole (sequential) grid
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

    # expand row-shared parts in place, back to front (dst row j reads
    # source scratch row (j+par)//2 <= j, still untouched in descending
    # order) — VMEM-only traffic replacing a full-tensor XLA row-repeat
    if any(row_shared):
        for off, size, par in classes:
            tiles = [
                k for k, wn in enumerate(wins)
                if wn[:2] == (off, size) and pars[k] == par
            ]
            cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

            @pl.when(cond)
            def _expand(off=off, size=size, par=par):
                for j in range(size - 1, 0, -1):
                    if (j + par) // 2 == j:
                        continue
                    for i in range(n_parts):
                        if not row_shared[i]:
                            continue
                        sl = pl.ds(coffs[i], part_cs[i])
                        xs[slot, off + j, :, sl] = (
                            xs[slot, off + (j + par) // 2, :, sl]
                        )

    # expand lane-repeated parts: the DMA'd half-width lanes spread to
    # full width with ONE constant matmul per part (S[k, 2k] = S[k, 2k+1]
    # = 1 for k < w_half — an MXU nearest-repeat; zero rows blank the
    # source's pad lanes). The XLA up2 repeats (~46 MB at the step-1
    # decoder) never materialize in HBM.
    for i in range(n_parts):
        if not lane_rep[i]:
            continue
        sl = pl.ds(coffs[i], part_cs[i])
        blk = xs[slot, :, :, sl, FRONT : FRONT + part_wps[i]]
        rows_b = blk.shape[0] * blk.shape[1] * blk.shape[2]
        y = lax.dot_general(
            blk.reshape(rows_b, part_wps[i]),
            srep_ref[: part_wps[i], :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(xs.dtype)
        xs[slot, :, :, sl, FRONT : FRONT + wp_rep] = y.reshape(
            blk.shape[0], blk.shape[1], blk.shape[2], wp_rep
        )

    # zero the scratch rows the clamped DMA did not fill (virtual halo rows)
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

    # data half := data * conf, once per tile (VMEM-only traffic); the
    # (rows, 2, cin_pad, wp_s) layout reshapes to the (dy, half, ci) row
    # order the tap matrices expect.
    xs[slot, :, 0] = xs[slot, :, 0] * xs[slot, :, 1]

    f32 = jnp.float32
    cin2 = 2 * cin_pad
    k_rows = (kh + g - 1) * cin2
    wp_s = xs.shape[-1]
    bias_col = bias_ref[:, :]
    wsum_col = wsum_ref[:, :]
    mask_lanes = wp_out > w_out
    if mask_lanes:
        lane_ok = lax.broadcasted_iota(jnp.int32, (1, wp_out), 1) < w_out

    # G output rows per block-Toeplitz matmul: at 8-channel widths a single
    # row's matmul is (16, kh*2cin) — 12% of the MXU's M dimension; grouping
    # rows stacks g*2cout into M (measured ~2x on the full-res 5x5 layers).
    # Groups run PAIRED where the tile allows: two groups' tap windows
    # lane-concatenate into one dot (same lane offsets; N doubles and the
    # tap matrices load half as often).
    def window(h0):
        return xs[slot, pl.ds(h0, kh + g - 1)].reshape(k_rows, wp_s)

    def finish(h0, acc):
        outs, cnfs = [], []
        for r in range(g):
            nomin = acc[r * 2 * cout : r * 2 * cout + cout]
            denom = acc[r * 2 * cout + cout : (r + 1) * 2 * cout]
            out = nomin / (denom + eps) + bias_col
            cnf = denom / wsum_col
            if mask_lanes:
                out = jnp.where(lane_ok, out, 0.0)
                cnf = jnp.where(lane_ok, cnf, 0.0)
            outs.append(out)
            cnfs.append(cnf)
        out_g = jnp.concatenate(outs, 0) if g > 1 else outs[0]
        cnf_g = jnp.concatenate(cnfs, 0) if g > 1 else cnfs[0]
        og = out_g.reshape(g, cout, wp_out)
        cg = cnf_g.reshape(g, cout, wp_out)
        out_ref[0, pl.ds(h0, g)] = og.astype(out_ref.dtype)
        cout_ref[0, pl.ds(h0, g)] = cg.astype(cout_ref.dtype)
        if pool_out:
            # fused 2x2 max pool of the WS output (the step-1 downsample):
            # in [ev|od] channel blocks the lane pair IS a channel pair, so
            # the pool is a row-pair max + a channel-block max — pure VMEM
            # elementwise work replacing the XLA reshape/slice/max graph at
            # the full-res level. g is even (asserted).
            pc = cout // 2
            for arr, dst in ((og, pout_ref), (cg, pcnf_ref)):
                v = arr.reshape(g // 2, 2, cout, wp_out)
                m = jnp.maximum(v[:, 0], v[:, 1])
                m = jnp.maximum(m[:, :pc], m[:, pc:])
                dst[0, pl.ds(h0 // 2, g // 2)] = m.astype(dst.dtype)
        return 0

    def group(i, _):
        h0 = i * g
        a = window(h0)
        acc = jnp.zeros((g * 2 * cout, wp_out), f32)
        for dx in range(kw):
            off = FRONT - pad_left + dx
            acc += lax.dot_general(
                w2_ref[dx],
                a[:, off : off + wp_out],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return finish(h0, acc)

    def group2(i, _):
        h0 = i * 2 * g
        a0, a1 = window(h0), window(h0 + g)
        acc = jnp.zeros((g * 2 * cout, 2 * wp_out), f32)
        for dx in range(kw):
            off = FRONT - pad_left + dx
            rhs = jnp.concatenate(
                [a0[:, off : off + wp_out], a1[:, off : off + wp_out]], 1
            )
            acc += lax.dot_general(
                w2_ref[dx], rhs,
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        finish(h0, acc[:, :wp_out])
        finish(h0 + g, acc[:, wp_out:])
        return 0

    # scoped-VMEM gate (see ops/pallas_conv.py): the nconv kernels are
    # narrow-channel, so the paired temporaries stay small — every graph
    # instance compiles well under this bound
    if (th // g) % 2 == 0 and k_rows * wp_s * 4 <= 2_500_000:
        lax.fori_loop(0, th // (2 * g), group2, 0)
    else:
        lax.fori_loop(0, th // g, group, 0)

    overhang = n_tiles * th - h_out
    if overhang and aligned_out:
        @pl.when(t == n_tiles - 1)
        def _zero_tail_rows():
            cut = th - min(overhang, th)
            out_ref[0, cut:] = jnp.zeros_like(out_ref[0, cut:])
            cout_ref[0, cut:] = jnp.zeros_like(cout_ref[0, cut:])
            if pool_out:
                pout_ref[0, cut // 2 :] = jnp.zeros_like(
                    pout_ref[0, cut // 2 :]
                )
                pcnf_ref[0, cut // 2 :] = jnp.zeros_like(
                    pcnf_ref[0, cut // 2 :]
                )


def build_tap_matrices(
    w_pos: jax.Array, cin_pad: int, g: int = 1
) -> tuple[jax.Array, jax.Array]:
    """HWIO non-negative kernel -> (w2, wsum).

    A-row ordering is (dy, half, ci) with halves [dc ; c] each ``cin_pad``
    channels (zero-padded past the real cin). w2[dx]:
    (g*2*Cout, (kh+g-1)*2*cin_pad) block-Toeplitz over the row group — row
    group r contracts the same taps shifted r rows into the input window —
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
    w2 = jnp.stack(
        [
            jnp.pad(w2, ((0, 0), (0, 0), (r, g - 1 - r), (0, 0), (0, 0)))
            for r in range(g)
        ],
        axis=1,
    )  # (kw, g, 2cout, kh+g-1, 2, cin_pad)
    w2 = w2.reshape(kw, g * 2 * cout, (kh + g - 1) * 2 * cin_pad)
    wsum = jnp.sum(w_pos, axis=(0, 1, 2))
    return w2, wsum


def _nconv_core(
    data_parts, conf_parts, w_pos, bias, *, pad_top: int, pad_left: int,
    h_in: int, w_in: int, h_out: int, w_out: int, wp_out: int, eps: float,
    tile_h: int | None, aligned_out: bool,
    row_shared: tuple | None = None,
    lane_rep: tuple | None = None,
    pool_out: bool = False,
):
    """Shared core. ``data_parts``/``conf_parts`` are parallel lists of
    (B, Hx_i, c_i, wp_i) aligned-form arrays forming a logical channel
    concat (zeros outside rows [0,h_in) x lanes [0,w_in)); ``w_pos`` is the
    already-positive HWIO kernel, zero-extended to the granule-padded
    channel total. A ``row_shared[i]`` part carries HALF the rows (a 2x row
    nearest-repeat source): the kernel DMAs the half-row window and
    duplicates rows in VMEM — the repeat never materializes in HBM."""
    kh, kw, cin, cout = w_pos.shape
    part_cs = tuple(p.shape[2] for p in data_parts)
    part_wps = tuple(p.shape[-1] for p in data_parts)
    row_shared = tuple(row_shared or (False,) * len(data_parts))
    lane_rep = tuple(lane_rep or (False,) * len(data_parts))
    b = data_parts[0].shape[0]
    assert cin == max(_round_up(sum(part_cs), 4), 4), (cin, part_cs)
    for i, (dp, cp) in enumerate(zip(data_parts, conf_parts)):
        assert dp.shape == cp.shape and dp.shape[0] == b
        need_rows = (h_in + 1) // 2 if row_shared[i] else h_in
        assert dp.shape[1] >= need_rows and dp.shape[-1] % 128 == 0
        assert dp.dtype == data_parts[0].dtype
    w_half = w_in // 2
    wp_rep = _round_up(w_in, 128) if any(lane_rep) else 0
    if any(lane_rep):
        assert w_in % 2 == 0, w_in
    wp_in = max(max(part_wps), wp_rep)
    from .pallas_conv import auto_row_group

    g = auto_row_group(kh, 2 * cin, 2 * cout)
    w2, wsum = build_tap_matrices(w_pos, cin, g)

    dtype = data_parts[0].dtype
    itemsize = jnp.dtype(dtype).itemsize
    wp_s = wp_in + 2 * FRONT
    if tile_h is None:
        tile_h = auto_tile_h(
            2 * cin * wp_s * itemsize,
            2 * cout * wp_out * itemsize,  # two outputs (depth + confidence)
            kh, h_out,
        )
    th = min(_round_up(tile_h, g), _round_up(h_out, g))
    if any(row_shared) and th % 2:
        # even th keeps every tile's window-start parity identical (the
        # DMA classes handle mixed parities, but each extra parity doubles
        # the static DMA variants) while keeping g | th for the group loop
        th = _round_up(th, 2 * g)
    if aligned_out:
        # exact tiling when h_out has a divisor near the VMEM-fit tile;
        # otherwise keep the overhang and mask it
        for cand in range(th, max(th // 2, 7), -1):
            if h_out % cand == 0 and cand % g == 0 and not (
                any(row_shared) and cand % 2
            ):
                th = cand
                break
    n_tiles = -(-h_out // th)

    n_total = b * n_tiles
    kfun = functools.partial(
        _kernel, kh=kh, kw=kw, cin_pad=cin, cout=cout, th=th,
        w_out=w_out, wp_out=wp_out, eps=eps, n_tiles=n_tiles,
        n_total=n_total, pad_top=pad_top, pad_left=pad_left, h_in=h_in,
        h_out=h_out, part_cs=part_cs, part_wps=part_wps,
        row_shared=row_shared, aligned_out=aligned_out, g=g,
        lane_rep=lane_rep, wp_rep=wp_rep, pool_out=pool_out,
    )
    block_out = pl.BlockSpec(
        (1, th, cout, wp_out), lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
        memory_space=pltpu.VMEM,
    )
    if pool_out:
        assert h_out % 2 == 0 and th % 2 == 0 and g % 2 == 0 and cout % 2 == 0
        block_pool = pl.BlockSpec(
            (1, th // 2, cout // 2, wp_out),
            lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        )
    if bias is None or bias.ndim == 0:  # None or scalar sentinel
        bias = jnp.zeros((cout,), dtype)
    n_parts = len(data_parts)
    extra_ops = []
    if any(lane_rep):
        # lane nearest-repeat constant: S[k, 2k] = S[k, 2k+1] = 1, k < w/2
        wp_h_max = max(p for p, lr in zip(part_wps, lane_rep) if lr)
        srep = np.zeros((wp_h_max, wp_rep), np.float32)
        ks = np.arange(w_half)
        srep[ks, 2 * ks] = 1.0
        srep[ks, 2 * ks + 1] = 1.0
        extra_ops.append(jnp.asarray(srep, dtype))
    out_specs = [block_out, block_out]
    out_shape = [
        jax.ShapeDtypeStruct((b, n_tiles * th, cout, wp_out), dtype),
        jax.ShapeDtypeStruct((b, n_tiles * th, cout, wp_out), dtype),
    ]
    if pool_out:
        out_specs += [block_pool, block_pool]
        out_shape += [
            jax.ShapeDtypeStruct(
                (b, n_tiles * th // 2, cout // 2, wp_out), dtype
            )
        ] * 2
    return pl.pallas_call(
        kfun,
        name=f"nconv{kh}x{kw}_{cin}x{cout}_w{w_out}_g{g}"
        + ("_up2" if any(lane_rep) else "")
        + ("_pool" if pool_out else ""),
        grid=(n_total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_parts)  # HBM
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(extra_ops)),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, th + kh - 1, 2, cin, wp_s), dtype),
            pltpu.SemaphoreType.DMA((2, n_parts)),
            pltpu.SemaphoreType.DMA((2, n_parts)),
        ],
        # NOTE: deliberately no raised vmem limit here — the nconv kernels
        # never exceed the default scoped budget (narrow channels; the pair
        # gate above), and passing one measured nconv2 169 -> 204 us (the
        # limit perturbs Mosaic's scheduling).
    )(*data_parts, *conf_parts, w2, bias.reshape(-1, 1),
      wsum.reshape(-1, 1), *extra_ops)


def nconv2d_pallas_aligned(
    data: jax.Array,
    conf: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    w: int,
    h: int | None = None,
    padding: int = 0,
    pos_fn: str = "softplus",
    eps: float = EPS_DEFAULT,
    tile_h: int | None = None,
    kernel_transform=None,
    row_shared: tuple | None = None,
    lane_rep: tuple | None = None,
    pool_out: bool = False,
) -> tuple:
    """Aligned-form normalized conv: operands (B, Hx, cin, Wp) with data at
    rows [0, h) x lanes [0, w), zeros elsewhere (cin % 4 == 0). Returns
    ``(out, conf_out, h_out, w_out)`` in aligned form — no XLA pads.
    Inference-only (training uses :func:`nconv2d_pallas_mxu_bhcw`).

    ``kernel_transform(w_pos) -> (w', pad_left, pad_right)`` re-expresses the
    positive kernel over a different operand form (the W-phase-split graph:
    ops.convops.conv_kernel_wsplit_parts). It runs AFTER pos_fn — the split
    kernel's structural zeros must stay exact zeros — and overrides the
    horizontal pads; vertical padding stays ``padding``. The confidence
    normalizer sum(w') per output channel equals the original sum by
    construction, so the epilogue needs no change."""
    data_parts = list(data) if isinstance(data, (list, tuple)) else [data]
    conf_parts = list(conf) if isinstance(conf, (list, tuple)) else [conf]
    p = padding
    h_in = data_parts[0].shape[1] if h is None else h
    w_pos = POS_FNS[pos_fn](kernel)
    # pl_ (not pl): keep the module's `pallas as pl` alias visible here
    pl_, pr = p, p
    if kernel_transform is not None:
        w_pos, pl_, pr = kernel_transform(w_pos)
    kh, kw, cin, _ = w_pos.shape
    h_out = h_in + 2 * p - (kh - 1)
    w_out = w + pl_ + pr - (kw - 1)
    cin_total = sum(dp.shape[2] for dp in data_parts)
    cin_alloc = max(_round_up(cin_total, 4), 4)
    assert cin <= cin_total, (cin, [dp.shape for dp in data_parts])
    # pad channels may only TRAIL (see conv2d_pallas_bhcw_aligned): a padded
    # part before the end would mis-bind every later part's kernel channels
    assert cin_total - data_parts[-1].shape[2] <= cin, (
        "granule-padded part must be last",
        cin,
        [dp.shape for dp in data_parts],
    )
    assert [dp.shape for dp in data_parts] == [cp.shape for cp in conf_parts], (
        [dp.shape for dp in data_parts],
        [cp.shape for cp in conf_parts],
    )
    if cin_alloc != cin:
        # zero taps for the channel-granule tail (after pos_fn —
        # softplus(0) != 0, the pad must be exact)
        w_pos = jnp.pad(w_pos, ((0, 0), (0, 0), (0, cin_alloc - cin), (0, 0)))
    res = _nconv_core(
        data_parts, conf_parts, w_pos, bias,
        pad_top=p, pad_left=pl_, h_in=h_in, w_in=w, h_out=h_out, w_out=w_out,
        wp_out=_round_up(w_out, 128), eps=eps, tile_h=tile_h,
        aligned_out=True, row_shared=row_shared, lane_rep=lane_rep,
        pool_out=pool_out,
    )
    if pool_out:
        # ``pool_out``: the kernel ALSO emits the 2x2 max pool of its WS
        # output (a row-pair + channel-block max in VMEM — the step-1
        # downsample without any XLA pool traffic)
        out, carr, pout, pcnf = res
        return out, carr, pout, pcnf, h_out, w_out
    out, carr = res
    return out, carr, h_out, w_out


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
    """Hand-rolled backward that never re-runs the forward convolution and
    never leaves the (B,H,C,W) layout.

    The intermediates are reconstructed algebraically from the saved Pallas
    outputs — ``denom = conf_out * sum(w)`` and
    ``nomin = (out - bias) * (denom + eps)`` — and because both inner
    convolutions are linear, the data/conf cotangents come from ONE
    batch-stacked transposed conv **run on the Pallas kernel itself**
    (XLA's NHWC lowering pads these 8-channel tensors 16x into the lane
    dim; keeping the backward BHCW more than halves the train step). The
    kernel cotangent stays an XLA filter-grad conv (different contraction
    shape), fed by the minimal transposes.
    """

    data, conf, kernel, bias, (out, cout_out) = res
    g_out, g_cout = g
    p = padding

    w, pos_vjp = jax.vjp(POS_FNS[pos_fn], kernel)
    ksum = jnp.sum(w, axis=(0, 1, 2))  # (cout,)
    kcol = ksum.reshape(1, 1, -1, 1)
    has_bias = bias is not None and bias.ndim > 0
    b_col = (
        bias if has_bias else jnp.zeros(w.shape[-1], w.dtype)
    ).reshape(1, 1, -1, 1)

    denom = cout_out * kcol
    nomin = (out - b_col) * (denom + eps)
    d_nomin = g_out / (denom + eps)
    d_denom = -g_out * nomin / (denom + eps) ** 2 + g_cout / kcol

    dc = data * conf
    n = data.shape[0]
    # one transposed conv for both branches (batch-stacked cotangents)
    cot = jnp.concatenate([d_nomin, d_denom], axis=0)
    d_stacked = transpose_conv_bhcw(cot, w, p)
    d_dc, d_c_denom = d_stacked[:n], d_stacked[n:]
    # one filter-grad conv: contraction over the stacked batch sums the
    # dc·d_nomin and c·d_denom contributions — on the Pallas filter-grad
    # kernel, staying in BHCW
    from .pallas_conv import conv_filtergrad_pallas_bhcw

    d_w = conv_filtergrad_pallas_bhcw(
        jnp.concatenate([dc, conf], axis=0), cot,
        kh=w.shape[0], kw=w.shape[1], padding=p,
    ).astype(w.dtype)
    # cout = denom / ksum also differentiates through ksum = sum(w)
    d_ksum = -jnp.sum(g_cout * cout_out, axis=(0, 1, 3)) / ksum
    d_w = d_w + d_ksum.reshape(1, 1, 1, -1)

    d_data = (d_dc * conf).astype(data.dtype)
    d_conf = (d_dc * data + d_c_denom).astype(conf.dtype)
    d_kernel = pos_vjp(d_w.astype(w.dtype))[0]
    d_bias = (
        jnp.sum(g_out, axis=(0, 1, 3)).astype(bias.dtype)
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
    if cin_pad != cin:
        w_pos = jnp.pad(w_pos, ((0, 0), (0, 0), (0, cin_pad - cin), (0, 0)))
    if bias is not None and bias.ndim == 0:  # scalar sentinel
        bias = None

    # one XLA pad to aligned form (right-side lanes + channel granule: a
    # sub-tile channel DMA slab is rejected by Mosaic; the kernel
    # synthesizes the conv halos itself). data and conf stay separate in
    # HBM — the kernel DMAs both into one scratch and forms data*conf
    # there, so neither the dc elementwise pass nor the [dc ; c] concat
    # ever touches HBM.
    wp = _round_up(w, 128)
    zpad = ((0, 0), (0, 0), (0, cin_pad - cin), (0, wp - w))
    d_p = jnp.pad(data, zpad) if (cin_pad != cin or wp != w) else data
    c_p = jnp.pad(conf, zpad) if (cin_pad != cin or wp != w) else conf

    out, cout_arr = _nconv_core(
        [d_p], [c_p], w_pos, bias,
        pad_top=p, pad_left=p, h_in=h, w_in=w, h_out=h_out, w_out=w_out,
        wp_out=w_out, eps=eps, tile_h=tile_h, aligned_out=False,
    )
    if out.shape[1] != h_out:
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
