"""Fused convolution chains: N stages of conv3x3(+bias,ReLU) in ONE kernel
pass, with every intermediate activation kept in VMEM scratch — their HBM
write+read traffic (57 MB per full-resolution fusion-stage boundary at
KITTI geometry) never happens.

Same aligned-form contract as ``conv2d_pallas_bhcw_aligned``
(ops/pallas_conv.py): operands (B, Hx, c, Wp) with data at rows [0,h) x
lanes [0,w), zeros elsewhere; the halo rows/lanes of EVERY stage are
synthesized (input halos from the zero margins, later stages' halos by
zeroing the virtual intermediate rows that fall outside the image). Any
stage's kernel may be a W-phase-split transform (ops/convops.py) — the
chain is agnostic: it just runs 3x3 pad-1 convs.

Geometry: N chained 3x3 pad-1 convs behave like one (2N+1)x(2N+1) pad-N
conv for tiling purposes — a tile of ``th`` output rows consumes
``th + 2N`` input rows, and stage i materializes ``th + 2*(N-1-i)``
intermediate rows in its scratch buffer. The input DMA is double-buffered
across grid steps exactly like the single-conv kernel.

Used by NewFusionBlock (models/guided.py): fuse_conv2 -> fuse_conv3 runs
as one 2-stage chain. Deeper compositions were measured SLOWER full-graph
on v5e (a 3-stage tail and an UpCat-conv+rgb_conv chain cost ~450 us
combined): an N-stage chain's tile reads th+2N input rows per th output
rows, and the VMEM-forced th=8 re-reads 1.75x the input at N=3 — the
HBM round-trip it saves is cheaper. The kernel still supports any N for
narrower/shallower geometries. Inference-only (the training graph keeps
separate differentiable convs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import vmem
from .pallas_conv import (
    FRONT,
    _round_up,
    _tile_windows,
    auto_row_group,
    ws_effective_kernels,
    ws_schedule,
)

# scoped-VMEM ceiling the fit model (modeled_bytes * _OBS_FACTOR) is held
# under; module-level so tests can force the split fallback on tiny shapes
_VMEM_CAP_BYTES = 15.5 * 1024 * 1024
_OBS_FACTOR = 0.76  # observed-scoped-VMEM / modeled_bytes (measured)


def _taps(kernel: jax.Array, g: int) -> jax.Array:
    """(3,3,cin,cout) -> per-tap block-Toeplitz (3, g*cout, (2+g)*cin)."""
    kh, kw, cin, cout = kernel.shape
    w_t = jnp.transpose(kernel, (1, 3, 0, 2))  # (kw, cout, kh, cin)
    return jnp.stack(
        [jnp.pad(w_t, ((0, 0), (0, 0), (r, g - 1 - r), (0, 0)))
         for r in range(g)],
        axis=1,
    ).reshape(kw, g * cout, (kh + g - 1) * cin)


def _taps_ws(kernel: jax.Array, g: int, keys, sched) -> jax.Array:
    """(3,3,C,F) FULL-width kernel -> (n_dots, g*2F, (2+g)*C) exact-split
    block-Toeplitz tap matrices, one per (source parity, lane offset)."""
    kh, _, cin, cout = kernel.shape
    mats = []
    for e in ws_effective_kernels(kernel, keys, sched):  # (kh, C, 2F)
        e_t = jnp.transpose(e, (2, 0, 1))  # (2F, kh, C)
        mats.append(
            jnp.stack(
                [jnp.pad(e_t, ((0, 0), (r, g - 1 - r), (0, 0)))
                 for r in range(g)],
                axis=0,
            ).reshape(g * 2 * cout, (kh + g - 1) * cin)
        )
    return jnp.stack(mats)


def _stage(src, dst_write, w2, w2_rem, bias_col, n_rows, g, cin_p, cout,
           wp_s, wp_out, pad_left, lane_ok, itm=4, ws_keys=None):
    """Run one conv stage: ``src(row0, nrows, ph)`` yields the (nrows,
    cin_p, wp_s) input window for a row group (``ph`` selects the parity
    plane in exact-split mode, else None); ``dst_write(h0, res)`` stores
    the (rows, cout, wp_out) result. Full row groups run PAIRED — two
    groups' tap windows lane-concatenated into one dot (same lane offsets,
    legal concat; N doubles, the tap matrices load half as often).

    ``ws_keys``: exact W-phase-split schedule (see pallas_conv.ws_schedule)
    — one dot per (source parity, half-width lane offset) over per-parity
    K; ``cout`` is then the [ev F | od F] doubled count and ``w2`` is
    stacked per key."""
    f32 = jnp.float32
    phases = (None,) if ws_keys is None else tuple(
        sorted({k[0] for k in ws_keys})
    )

    def epilogue(h0, rows, acc):
        res = jnp.maximum(acc + bias_col[: rows * cout], 0.0)
        if lane_ok is not None:
            res = jnp.where(lane_ok, res, 0.0)
        dst_write(h0, res.reshape(rows, cout, wp_out))

    def wins(h0, rows):
        return {
            ph: src(h0, 3 + rows - 1, ph).reshape(
                (3 + rows - 1) * cin_p, wp_s
            )
            for ph in phases
        }

    def dots(mat):
        # (tap-matrix, parity, lane-offset) per MXU dot of this stage
        if ws_keys is None:
            for dx in range(3):
                yield mat[dx], None, FRONT - pad_left + dx
        else:
            for di, (ph, d) in enumerate(ws_keys):
                yield mat[di], ph, FRONT + d

    def run_group(h0, rows, mat):
        a = wins(h0, rows)
        acc = jnp.zeros((rows * cout, wp_out), f32)
        for m, ph, off in dots(mat):
            acc += lax.dot_general(
                m, a[ph][:, off : off + wp_out],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        epilogue(h0, rows, acc)

    def run_pair(h0):
        a0, a1 = wins(h0, g), wins(h0 + g, g)
        acc = jnp.zeros((g * cout, 2 * wp_out), f32)
        for m, ph, off in dots(w2):
            rhs = jnp.concatenate(
                [a0[ph][:, off : off + wp_out],
                 a1[ph][:, off : off + wp_out]], 1
            )
            acc += lax.dot_general(
                m, rhs,
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        epilogue(h0, g, acc[:, :wp_out])
        epilogue(h0 + g, g, acc[:, wp_out:])

    # same scoped-VMEM gate as ops/pallas_conv.py: pairing's extra
    # temporaries blow the 16 MB limit on wide-channel f32 stages
    pair_ok = (
        len(phases) * (2 + g) * cin_p * wp_s * itm
        <= 1_200_000 * vmem.chain_scale()
    )

    full = n_rows // g
    i = 0
    while pair_ok and i + 1 < full:
        run_pair(i * g)
        i += 2
    while i < full:
        run_group(i * g, g, w2)
        i += 1
    rem = n_rows - full * g
    if rem:
        run_group(full * g, rem, w2_rem)


def _chain_kernel(*refs, chans, gs, rems, th, w_out, wp_out, n_tiles,
                  n_total, h_in, h_out, part_cs, part_wps, ws_keys=None):
    n_stages = len(chans) - 1
    ws = ws_keys is not None
    n_parts = len(part_cs)
    x_hbms = refs[:n_parts]
    # per stage: full tap matrix, remainder tap matrix (only when the row
    # count doesn't divide by the group — saves its VMEM otherwise), bias
    pos = n_parts
    stage_ops = []
    for i in range(n_stages):
        w2 = refs[pos]
        pos += 1
        if rems[i]:
            w2r = refs[pos]
            pos += 1
        else:
            w2r = w2
        bias = refs[pos]
        pos += 1
        stage_ops.append((w2, w2r, bias))
    out_ref = refs[pos]
    xs = refs[pos + 1]
    mids = refs[pos + 2 : pos + 1 + n_stages]
    sem = refs[pos + 1 + n_stages]

    coffs = [sum(part_cs[:i]) for i in range(n_parts)]
    idx = pl.program_id(0)
    rows_full = th + 2 * n_stages
    # tiling identical to a (2N+1) pad-N conv: th output rows read th+2N
    wins = _tile_windows(n_tiles, th, 2 * n_stages + 1, n_stages, h_in)
    classes = sorted({(o, s) for (o, s, _zt, _zb) in wins if s})

    def dma_apply(step, slot, action):
        t = step % n_tiles
        bi = step // n_tiles
        for off, size in classes:
            tiles = [k for k, wn in enumerate(wins) if wn[:2] == (off, size)]
            cond = functools.reduce(jnp.logical_or, [t == k for k in tiles])

            @pl.when(cond)
            def _go(off=off, size=size):
                src = pl.ds(jnp.maximum(t * th - n_stages, 0), size)
                for i in range(n_parts):
                    if ws:
                        # exact split: each part is [ev c | od c]; the
                        # parity halves DMA into separate scratch planes
                        # (granule-aligned channel slices of the source)
                        for ph in range(2):
                            cp = pltpu.make_async_copy(
                                x_hbms[i].at[
                                    bi, src,
                                    pl.ds(ph * part_cs[i], part_cs[i]),
                                    pl.ds(0, part_wps[i]),
                                ],
                                xs.at[slot, ph, pl.ds(off, size),
                                      pl.ds(coffs[i], part_cs[i]),
                                      pl.ds(FRONT, part_wps[i])],
                                sem.at[slot, 2 * i + ph],
                            )
                            cp.start() if action == "start" else cp.wait()
                        continue
                    # lane clamp: copy only the lanes the taps can read
                    # (over-allocated parts — e.g. a 768-wide producer
                    # feeding a 640-lane conv — waste scratch + DMA bytes)
                    cp = pltpu.make_async_copy(
                        x_hbms[i].at[bi, src, slice(None),
                                     pl.ds(0, part_wps[i])],
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
        for m in mids:
            m[...] = jnp.zeros_like(m)

    @pl.when(idx == 0)
    def _warmup():
        dma_apply(0, 0, "start")

    @pl.when(idx + 1 < n_total)
    def _prefetch():
        dma_apply(idx + 1, (idx + 1) % 2, "start")

    slot = idx % 2
    t = idx % n_tiles
    dma_apply(idx, slot, "wait")

    # (in ws mode the scratch row axis sits behind the parity plane axis)
    row_sl = (slice(None),) if ws else ()
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

    mask = lax.broadcasted_iota(jnp.int32, (1, wp_out), 1) < w_out

    for i in range(n_stages):
        w2, w2r, bias = stage_ops[i]
        rows_out = th + 2 * (n_stages - 1 - i)
        last = i == n_stages - 1
        cout_i = 2 * chans[i + 1] if ws else chans[i + 1]

        if i == 0:
            def src(h0, nrows, ph=None):
                return (
                    xs[slot, pl.ds(h0, nrows)] if ph is None
                    else xs[slot, ph, pl.ds(h0, nrows)]
                )
        else:
            def src(h0, nrows, ph=None, m=mids[i - 1]):
                return (
                    m[pl.ds(h0, nrows)] if ph is None
                    else m[ph, pl.ds(h0, nrows)]
                )

        if last:
            def dst(h0, res):
                out_ref[0, pl.ds(h0, res.shape[0])] = res.astype(
                    out_ref.dtype
                )
        elif ws:
            # the [ev F | od F] result splits back into parity planes so
            # the next stage's per-parity windows stay free reshapes
            def dst(h0, res, m=mids[i], F=chans[i + 1]):
                r = res.astype(m.dtype)
                m[0, pl.ds(h0, res.shape[0]), :, pl.ds(FRONT, wp_out)] = (
                    r[:, :F]
                )
                m[1, pl.ds(h0, res.shape[0]), :, pl.ds(FRONT, wp_out)] = (
                    r[:, F:]
                )
        else:
            def dst(h0, res, m=mids[i]):
                m[pl.ds(h0, res.shape[0]), :, pl.ds(FRONT, wp_out)] = (
                    res.astype(m.dtype)
                )

        src_wp = xs.shape[-1] if i == 0 else mids[i - 1].shape[-1]
        _stage(src, dst, w2, w2r, bias, rows_out, gs[i], chans[i],
               cout_i, src_wp, wp_out, 1, mask,
               itm=jnp.dtype(xs.dtype).itemsize, ws_keys=ws_keys)

        if not last:
            # aligned invariant for the next stage's halo: intermediate
            # rows outside the image must be ZERO — stage i produced
            # relu(bias) over virtual zero input rows there. Local row j
            # of mids[i] is absolute row t*th - (n_stages-1-i) + j.
            lead = n_stages - 1 - i

            @pl.when(t == 0)
            def _zero_mid_top(m=mids[i], lead=lead):
                ix = (*row_sl, slice(0, lead))
                m[ix] = jnp.zeros_like(m[ix])

            for k in range(n_tiles):
                j0 = h_in + lead - k * th
                if j0 < rows_out:
                    @pl.when(t == k)
                    def _zero_mid_tail(m=mids[i], j0=max(j0, 0)):
                        ix = (*row_sl, slice(j0, None))
                        m[ix] = jnp.zeros_like(m[ix])

    overhang = n_tiles * th - h_out
    if overhang:
        @pl.when(t == n_tiles - 1)
        def _zero_tail_rows():
            cut = th - min(overhang, th)
            out_ref[0, cut:] = jnp.zeros_like(out_ref[0, cut:])


def conv_chain_pallas_aligned(
    x,
    stages,
    *,
    w: int,
    h: int | None = None,
    tile_h: int | None = None,
    ws_cs: tuple | list | None = None,
) -> tuple[jax.Array, int, int]:
    """Fused chain of N conv3x3(+bias,relu) stages, aligned form in/out.

    ``x`` may be a list of parts (logical channel concat); ``stages`` is a
    list of (kernel, bias) pairs, each 3x3 pad 1 (geometry-preserving).
    Kernels may be W-phase-split transforms — the chain only ever sees 3x3
    kernels.

    ``ws_cs=[c_i, ...]``: exact W-phase-split mode (see
    pallas_conv.ws_schedule): each part is a HALF-width [ev c_i | od c_i]
    channel-block tensor (2*c_i physical channels), stage kernels the
    ORIGINAL full-width ones, ``w`` the half width. Every stage's parity
    halves live in separate scratch planes and run one dot per (source
    parity, lane offset) over per-parity K — half the executed tap MACs
    of the dense ``conv_kernel_wsplit`` transform. Output is the
    half-width [ev F | od F] form. Every c_i and every stage width must
    be a multiple of the 8-channel granule."""
    parts = list(x) if isinstance(x, (list, tuple)) else [x]
    kernels = [jnp.asarray(k) for k, _ in stages]
    biases = [jnp.asarray(b) for _, b in stages]
    n_stages = len(stages)
    assert all(k.shape[:2] == (3, 3) for k in kernels)
    part_wps = tuple(p.shape[-1] for p in parts)
    ws_keys = sched = None
    if ws_cs is not None:
        part_cs = tuple(ws_cs)  # per-parity slab widths
        assert all(c % 8 == 0 for c in part_cs), part_cs
        for p, c in zip(parts, part_cs):
            assert p.shape[2] == 2 * c, (p.shape, c)
        cin_p = sum(part_cs)
        assert kernels[0].shape[2] == cin_p, (kernels[0].shape, part_cs)
        for i in range(1, n_stages):
            c = kernels[i - 1].shape[-1]
            assert c % 8 == 0 and kernels[i].shape[2] == c, (
                i, kernels[i - 1].shape, kernels[i].shape
            )
        assert kernels[-1].shape[-1] % 8 == 0, kernels[-1].shape
        ws_keys, sched = ws_schedule(3, 1)
    else:
        part_cs = tuple(p.shape[2] for p in parts)
        cin_total = sum(part_cs)
        cin1 = kernels[0].shape[2]
        assert cin1 <= cin_total, (cin1, part_cs)
        assert cin_total - parts[-1].shape[2] <= cin1, (
            "padded part must be last"
        )
        cin_p = _round_up(cin_total, 8)
        if cin_p != cin1:
            kernels[0] = jnp.pad(
                kernels[0], ((0, 0), (0, 0), (0, cin_p - cin1), (0, 0))
            )
        # granule-pad every intermediate channel count; the downstream
        # stage gets zero taps on the pad channels
        for i in range(1, n_stages):
            c = kernels[i - 1].shape[-1]
            assert kernels[i].shape[2] == c, (i, kernels[i - 1].shape,
                                              kernels[i].shape)
            cp = _round_up(c, 8)
            if cp != c:
                kernels[i - 1] = jnp.pad(
                    kernels[i - 1], ((0, 0), (0, 0), (0, 0), (0, cp - c))
                )
                kernels[i] = jnp.pad(
                    kernels[i], ((0, 0), (0, 0), (0, cp - c), (0, 0))
                )
                biases[i - 1] = jnp.pad(biases[i - 1], (0, cp - c))
    # per-parity channel counts in ws mode (memory/layout uses pf*chans)
    chans = [cin_p] + [k.shape[-1] for k in kernels]
    cout = chans[-1]
    pf = 2 if ws_cs is not None else 1  # parity-plane factor
    n_dots = len(ws_keys) if ws_cs is not None else 3
    cout_store = pf * cout  # the ws output is the [ev F | od F] concat

    h_in = parts[0].shape[1] if h is None else h
    h_out = h_in  # pad-1 3x3 convs preserve geometry
    w_out = w
    wp_out = _round_up(w_out, 128)
    b_ = parts[0].shape[0]
    x_dtype = parts[0].dtype
    itemsize = jnp.dtype(x_dtype).itemsize
    # lane clamp: a part wider than round_up(w, 128) carries only zero
    # lanes past the data region — don't DMA or stage them (the scratch
    # zeros supply every tap read past the clamped width)
    part_wps = tuple(min(wp, _round_up(w, 128)) for wp in part_wps)
    wp_in = max(part_wps)
    wp_s = wp_in + 2 * FRONT

    # row groups capped at 4: each stage carries up to two block-Toeplitz
    # tap matrices whose size grows ~g^2 — g=8 alone puts ~8 MB of taps in
    # scoped VMEM and blew the 16 MB limit on the two-stage chain
    gs = [min(auto_row_group(3, chans[i], pf * chans[i + 1]), 4)
          for i in range(n_stages)]

    def tap_bytes(th_val):
        tot = 0
        for i in range(n_stages):
            rows = th_val + 2 * (n_stages - 1 - i)
            n_mats = 1 + (1 if rows % gs[i] else 0)
            tot += (
                n_mats * itemsize * n_dots * gs[i] * pf * chans[i + 1]
                * (2 + gs[i]) * chans[i]
            )
        return tot

    tile_h_arg = tile_h  # caller's pin (None = auto), preserved on split
    if tile_h is None:
        # VMEM budget: two xs slots + mids + out block + tap matrices. The
        # budget is deliberately conservative — the observed scoped-VMEM
        # accounting runs ~1.6x this model (output double-buffering, f32
        # accumulators, stage reshapes), and the fuse3 two-stage chain at
        # th=22 measured 17.73M against the 16M limit.
        budget = 10 * 1024 * 1024 * vmem.chain_scale()
        per_row = (
            2 * pf * cin_p * wp_s * itemsize
            + pf * sum(chans[1:-1]) * wp_s * itemsize
            + cout_store * wp_out * itemsize
        )
        tile_h = max(
            8, (budget - tap_bytes(8)) // per_row - 2 * n_stages - 4
        )
    th = min(_round_up(tile_h, 2), _round_up(h_out, 2))
    for cand in range(th, max(th // 2, 7), -1):
        if h_out % cand == 0 and cand % 2 == 0:
            th = cand
            break

    # Scoped-VMEM fit check. Mosaic's scoped accounting is dominated not
    # by the declared scratch but by per-stage TEMPORARIES — the window
    # reshape copy, the kw tap slices fed to the dots, and the f32
    # accumulator — so the model counts those per stage alongside the
    # buffers. _OBS_FACTOR calibrates model -> observed (f32 UpCat chain:
    # modeled 26.4 MB, compiler reported 20.1 MB). A chain that doesn't
    # fit splits its LAST stage off and recurses — numerically identical,
    # one intermediate round-trips HBM (in practice only wide-channel f32
    # graphs split; the bf16 engine's chains all fit).
    def modeled_bytes(th_val):
        xs_b = 2 * pf * (th_val + 2 * n_stages) * cin_p * wp_s * itemsize
        mids_b = sum(
            pf * (th_val + 2 * (n_stages - 1 - i)) * chans[i + 1]
            * wp_s * itemsize
            for i in range(n_stages - 1)
        )
        out_b = 2 * th_val * cout_store * wp_out * itemsize
        tmp_b = 0
        for i in range(n_stages):
            win_rows = (2 + gs[i]) * chans[i]
            tmp_b += pf * win_rows * wp_s * itemsize       # reshape copies
            tmp_b += n_dots * win_rows * wp_out * itemsize  # tap slices
            tmp_b += gs[i] * pf * chans[i + 1] * wp_out * 4  # f32 acc
        return xs_b + mids_b + out_b + tap_bytes(th_val) + tmp_b

    cap = _VMEM_CAP_BYTES * vmem.chain_scale()
    while th > 8 and modeled_bytes(th) * _OBS_FACTOR > cap:
        th -= 2  # shrink the tile before giving up on the chain
    n_tiles = -(-h_out // th)
    if n_stages > 1 and modeled_bytes(th) * _OBS_FACTOR > cap:
        # split the LAST stage off and recurse. The head/tail interface
        # must be a GRANULE channel count — Mosaic rejects sub-tile
        # channel DMA slabs — so pad the head's final cout (zero kernel
        # columns + bias) and let the tail's cin <= cin_total contract
        # zero-extend its kernel over the trailing pad channels.
        head_stages = list(stages[: n_stages - 1])
        hk, hb = head_stages[-1]
        c_mid = hk.shape[-1]
        c_pad = 0 if ws_cs is not None else _round_up(c_mid, 8) - c_mid
        if c_pad:
            head_stages[-1] = (
                jnp.pad(jnp.asarray(hk), ((0, 0),) * 3 + ((0, c_pad),)),
                jnp.pad(jnp.asarray(hb), (0, c_pad)),
            )
        head, hh, wh = conv_chain_pallas_aligned(
            parts, head_stages, w=w, h=h_in, tile_h=tile_h_arg,
            ws_cs=ws_cs,
        )
        return conv_chain_pallas_aligned(
            head, stages[n_stages - 1 :], w=wh, h=hh, tile_h=tile_h_arg,
            ws_cs=None if ws_cs is None else (c_mid,),
        )

    ops = []
    rems = []
    mk_taps = (
        _taps if ws_cs is None
        else functools.partial(_taps_ws, keys=ws_keys, sched=sched)
    )
    for i in range(n_stages):
        rows = th + 2 * (n_stages - 1 - i)
        g = gs[i]
        rem = rows % g
        rems.append(bool(rem))
        ops.append(mk_taps(kernels[i], g))
        if rem:
            ops.append(mk_taps(kernels[i], rem))
        b_eff = (
            biases[i] if ws_cs is None else jnp.tile(biases[i], 2)
        ).astype(jnp.float32)
        ops.append(jnp.tile(b_eff, max(g, rem or g)).reshape(-1, 1))

    n_total = b_ * n_tiles
    kfun = functools.partial(
        _chain_kernel, chans=chans, gs=gs, rems=rems, th=th, w_out=w_out,
        wp_out=wp_out, n_tiles=n_tiles, n_total=n_total, h_in=h_in,
        h_out=h_out, part_cs=part_cs, part_wps=part_wps, ws_keys=ws_keys,
    )
    mid_shapes = [
        pltpu.VMEM(
            (pf, th + 2 * (n_stages - 1 - i), chans[i + 1], wp_s)
            if ws_cs is not None
            else (th + 2 * (n_stages - 1 - i), chans[i + 1], wp_s),
            x_dtype,
        )
        for i in range(n_stages - 1)
    ]
    tag = f"chain{n_stages}_{'x'.join(str(c) for c in chans)}_w{w_out}"
    if ws_cs is not None:
        tag += "_wsx"
    out = pl.pallas_call(
        kfun,
        name=tag,
        grid=(n_total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(parts)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ops),
        out_specs=pl.BlockSpec(
            (1, th, cout_store, wp_out),
            lambda idx: (idx // n_tiles, idx % n_tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b_, n_tiles * th, cout_store, wp_out), x_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, pf, th + 2 * n_stages, cin_p, wp_s)
                if ws_cs is not None
                else (2, th + 2 * n_stages, cin_p, wp_s),
                x_dtype,
            ),
        ] + mid_shapes + [pltpu.SemaphoreType.DMA((2, pf * len(parts)))],
        compiler_params=vmem.compiler_params(),
    )(*parts, *ops)
    return out, h_out, w_out


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
    ws_cs: tuple | list | None = None,
) -> tuple[jax.Array, int, int]:
    """Two-stage wrapper of :func:`conv_chain_pallas_aligned`."""
    return conv_chain_pallas_aligned(
        x, [(k1, b1), (k2, b2)], w=w, h=h, tile_h=tile_h, ws_cs=ws_cs
    )
