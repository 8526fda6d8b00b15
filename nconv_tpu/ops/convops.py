"""NHWC convolution primitives with PyTorch-compatible semantics.

These are the layout-level building blocks of the framework: everything is
NHWC (TPU-native; channels land in the 128-wide lane dimension), while the
reference stack is NCHW PyTorch (`/root/reference/models/step1.py:119-122`,
`/root/reference/models/step2.py:140,205`). Parity with torch semantics
(explicit zero padding, transpose-conv output geometry) is covered by
tests/test_ops_parity.py against torch CPU golden values.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels — the native TPU convolution layout.
DIMSPEC = ("NHWC", "HWIO", "NHWC")


def _pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 1,
    padding: int | Sequence[int] = 0,
    dilation: int | Sequence[int] = 1,
    groups: int = 1,
    preferred_dtype=None,
) -> jax.Array:
    """2-D convolution, NHWC in / NHWC out, kernel HWIO.

    Matches ``torch.nn.functional.conv2d`` semantics (cross-correlation,
    explicit symmetric zero padding) used throughout the reference
    (`/root/reference/models/step1.py:119`).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=DIMSPEC,
        feature_group_count=groups,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


def conv_transpose2d_phased(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """4x4 stride-2 pad-1 transpose conv via phase decomposition.

    For stride 2, output parity (oy, ox) selects a fixed 2x2 subset of the
    4x4 kernel applied to neighbouring input pixels:

        out[2h]   row uses kernel rows [W3, W1] over x[h-1], x[h]
        out[2h+1] row uses kernel rows [W2, W0] over x[h],   x[h+1]

    (same per column), so the op becomes four small stride-1 convolutions
    plus an interleave — which lowers far better on TPU than XLA's
    input-dilated transpose conv (measured 2.1 ms -> sub-ms for the
    full-resolution decoder stage). ``kernel`` HWIO, I = input channels.
    """
    b, h, w, _ = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # phase kernels: rows (and cols) [3,1] for even output parity, [2,0] odd
    rows = {0: (3, 1), 1: (2, 0)}
    phases = []
    for oy in (0, 1):
        row_k = jnp.stack([kernel[rows[oy][0]], kernel[rows[oy][1]]], axis=0)
        row_x0 = 0 if oy == 0 else 1
        for ox in (0, 1):
            k2 = jnp.stack([row_k[:, rows[ox][0]], row_k[:, rows[ox][1]]], axis=1)
            xs = lax.slice(
                xp, (0, row_x0, 0 if ox == 0 else 1, 0),
                (b, row_x0 + h + 1, (0 if ox == 0 else 1) + w + 1, xp.shape[-1]),
            )
            phases.append(
                lax.conv_general_dilated(
                    xs, k2, (1, 1), ((0, 0), (0, 0)), dimension_numbers=DIMSPEC
                )
            )
    # interleave phases: (B, H, 2, W, 2, C) -> (B, 2H, 2W, C)
    p00, p01, p10, p11 = phases
    even_rows = jnp.stack([p00, p01], axis=3).reshape(b, h, 2 * w, cout)
    odd_rows = jnp.stack([p10, p11], axis=3).reshape(b, h, 2 * w, cout)
    out = jnp.stack([even_rows, odd_rows], axis=2).reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int | Sequence[int] = 2,
    padding: int | Sequence[int] = 1,
    method: str = "dilated",  # 'dilated' | 'phased' (4x4 s2 p1 only)
) -> jax.Array:
    """Transposed 2-D convolution matching ``torch.nn.ConvTranspose2d``.

    The reference decoder uses 4x4/stride-2/pad-1 transpose convs
    (`/root/reference/models/step2.py:205`). Implemented as the equivalent
    forward convolution: input dilated by ``stride``, kernel spatially
    flipped, padding ``k - 1 - p`` — this is what XLA lowers a gradient-conv
    to, and it keeps the op on the MXU.

    ``kernel`` is HWIO with I = input channels of this op (i.e. already
    transposed relative to torch's (in, out, kh, kw) storage; see
    ``torch_convtranspose_kernel_to_hwio``).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if method == "phased":
        assert (sh, sw, ph, pw, kh, kw) == (2, 2, 1, 1, 4, 4), "phased: 4x4 s2 p1 only"
        return conv_transpose2d_phased(x, kernel, bias)
    flipped = kernel[::-1, ::-1, :, :]
    out = lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=DIMSPEC,
    )
    if bias is not None:
        out = out + bias.reshape((1, 1, 1, -1)).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# (B, H, C, W) stride-2 machinery: space-to-depth turns a strided conv into
# a stride-1 conv the Pallas row-matmul kernel can run, and the 4x4 s2 p1
# transpose conv becomes a stride-1 conv with phase-stacked output channels
# plus a depth-to-space interleave.
# ---------------------------------------------------------------------------

def space_to_depth_bhcw(x: jax.Array, pad: int = 1) -> jax.Array:
    """(B, H, C, W) -> (B, (H+2p)/2, 4C, (W+2p)/2) with 2x2 phase blocks
    stacked along channels in (py, px, c) order. ``H+2p`` and ``W+2p`` must
    be even."""
    b, h, c, w = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (pad, pad)))
    hp, wp = h + 2 * pad, w + 2 * pad
    assert hp % 2 == 0 and wp % 2 == 0, (hp, wp)
    # rows-first: split the (cheap, non-minor) H axis, then deinterleave
    # lanes once per row parity. Lane deinterleave via a minor (W/2, 2)
    # reshape + unit slice — measured 477 vs 660 us for the stride-2 slice
    # form at [2,352,32,1280] bf16 on v5e (and 2.6x over 6-d transposes).
    v = xp.reshape(b, hp, c, wp // 2, 2)
    top, bot = v[:, 0::2], v[:, 1::2]
    return jnp.concatenate(
        [top[..., 0], top[..., 1], bot[..., 0], bot[..., 1]],
        axis=2,
    )


def space_to_depth_bhcw_even(x: jax.Array) -> jax.Array:
    """Pad-free s2d for even H, W: (B, H, C, W) -> (B, H/2, 4C, W/2), phase
    blocks in (py, px, c) order, via the minor (W/2, 2) reshape — NO XLA pad
    and no lane-stride slices. The odd-pad form (:func:`space_to_depth_bhcw`
    with pad=1) forces a non-lane-aligned relayout that measured ~2 ms fwd /
    4 ms fwd+bwd at the encoder-1 training shape; this form plus
    :func:`conv_kernel_s2d_aligned` + symmetric pad 1 + an end crop computes
    the same stride-2 convolution (the halo becomes one wasted output
    row/col)."""
    # identical deinterleave to the aligned form (a dense tensor is the
    # aligned form with zero slack) — one body, two entry points
    return space_to_depth_aligned(x)


def space_to_depth_aligned(x: jax.Array) -> jax.Array:
    """Aligned-form s2d: (B, H, C, Wp) with data [0,h)x[0,w) ->
    (B, H/2, 4C, Wp/2), phases (py, px) stacked as full-C channel blocks.

    No canvas padding: the consumer is a 2x2-tap aligned conv with a
    synthetic top/left halo (``conv_kernel_s2d_aligned``), so the stride-2
    conv's pad-1 halo never materializes. Pure deinterleave — the row split
    is a cheap non-minor slice; only two lane-stride-2 ops are issued.
    """
    b, h, c, wp = x.shape
    assert h % 2 == 0 and wp % 2 == 0, (h, wp)
    v = x.reshape(b, h, c, wp // 2, 2)
    top, bot = v[:, 0::2], v[:, 1::2]
    return jnp.concatenate(
        [top[..., 0], top[..., 1], bot[..., 0], bot[..., 1]],
        axis=2,
    )


def space_to_depth_aligned_parts(x: jax.Array) -> list[jax.Array]:
    """Like :func:`space_to_depth_aligned` but returns the four phase
    planes separately (py, px order) so a multi-input kernel can DMA them
    into adjacent channel slabs — the 4-way channel concat (XLA lowers it
    as one full-size pad + combine per operand) never materializes.

    Lane deinterleave via minor (W/2, 2) reshape + unit slices (477 vs
    660 us against stride-2 slices at the encoder-1 shape, v5e)."""
    b, h, c, wp = x.shape
    assert h % 2 == 0 and wp % 2 == 0, (h, wp)
    v = x.reshape(b, h, c, wp // 2, 2)
    top, bot = v[:, 0::2], v[:, 1::2]
    return [top[..., 0], top[..., 1], bot[..., 0], bot[..., 1]]


def conv_kernel_s2d_aligned(kernel: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 HWIO kernel -> the 2x2-tap stride-1 kernel over an
    *aligned* (canvas-free) space-to-depth input.

    Derivation: out(ho, wo) = sum_{dy,dx} K[dy,dx] x[2ho+dy-1, 2wo+dx-1];
    data row 2ho+dy-1 lives in phase py=(dy+1)%2 at block row
    ho + floor((dy-1)/2), i.e. kernel tap r = dy - 1 - 2*floor((dy-1)/2)
    mapped onto a 2-tap grid with a synthetic top/left halo of 1
    (pad_top=pad_left=1, pad_bottom=pad_right=0 in the aligned conv).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "aligned s2d form is for the 3x3/s2 encoders"

    def rmap(d):  # full-res tap offset d in {0,1,2} -> (tap_idx, phase)
        return (0, 1) if d == 0 else (1, 0) if d == 1 else (1, 1)

    out = jnp.zeros((2, 2, 4 * cin, cout), kernel.dtype)
    for dy in range(3):
        ry, py = rmap(dy)
        for dx in range(3):
            rx, px = rmap(dx)
            blk = (py * 2 + px) * cin
            out = out.at[ry, rx, blk : blk + cin].set(kernel[dy, dx])
    return out


def shortcut_kernel_s2d_aligned(kernel: jax.Array) -> jax.Array:
    """1x1 stride-2 (pad-0) kernel -> a tap in the same 2x2 aligned grid as
    :func:`conv_kernel_s2d_aligned`: out(t) = K x[2t] = phase (0,0) at block
    offset 0, i.e. tap (1,1) under the pad_top=pad_left=1 convention."""
    assert kernel.shape[:2] == (1, 1)
    _, _, cin, cout = kernel.shape
    out = jnp.zeros((2, 2, 4 * cin, cout), kernel.dtype)
    return out.at[1, 1, 0:cin].set(kernel[0, 0])


def conv_kernel_s2_rowpair(kernel: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 HWIO kernel -> a (2, 3, 2*cin, cout) kernel over
    the ROW-PAIR view of the input: ``x.reshape(b, h/2, 2*cin, wp)`` stacks
    each even/odd row pair as channel blocks [even cin | odd cin] — a FREE
    metadata reshape of the aligned (B, H, C, Wp) tensor, so the stride-2
    space-to-depth never materializes in HBM at all.

    Derivation: out(r, wo) = sum_{dy,dx} K[dy,dx] x[2r+dy-1, 2wo+dx-1].
    Full row 2r-1 is the ODD block of pair row r-1; rows 2r, 2r+1 are the
    EVEN/ODD blocks of pair row r — a kh=2 window (pad_top=1) with taps
    K[0]->ky0/odd, K[1]->ky1/even, K[2]->ky1/odd. The kw=3 lane taps stay
    at FULL width; the consumer kernel decimates lanes with a stride-2
    selection matmul on the MXU (``lane_stride2`` in ops.pallas_conv).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "row-pair s2 form is for the 3x3/s2 encoders"
    out = jnp.zeros((2, 3, 2 * cin, cout), kernel.dtype)
    out = out.at[0, :, cin:].set(kernel[0])       # dy=0 -> ky0, odd block
    out = out.at[1, :, :cin].set(kernel[1])       # dy=1 -> ky1, even block
    out = out.at[1, :, cin:].set(kernel[2])       # dy=2 -> ky1, odd block
    return out


def shortcut_kernel_s2_rowpair(kernel: jax.Array) -> jax.Array:
    """1x1 stride-2 kernel in the row-pair form: out(r) = K x[2r] = EVEN
    block at ky=1, center lane tap (dx=1 under pad_left=1)."""
    assert kernel.shape[:2] == (1, 1)
    _, _, cin, cout = kernel.shape
    out = jnp.zeros((2, 3, 2 * cin, cout), kernel.dtype)
    return out.at[1, 1, :cin].set(kernel[0, 0])


def conv_s2_dx_kernel_phases(kernel: jax.Array) -> jax.Array:
    """3x3 stride-2 pad-1 HWIO kernel -> the (3, 3, cout, 4*cin) phase
    kernel computing the conv's INPUT gradient as a stride-1 conv over the
    half-res cotangent g (padding 1) with (py, px, ci)-phase-stacked output
    channels — consumed by the aligned kernel's ``d2s_channels`` epilogue,
    so the full-res d_x emerges interleaved with NO XLA scatter.

    Derivation: fwd out[t,s] = sum_{dy,dx} K[dy,dx] x[2t+dy-1, 2s+dx-1], so
    d_x[2u+py, 2v+px] = sum over the (dy,dx) with matching parity of
    K[dy,dx]^T g[(2u+py+1-dy)/2, ...]: phase 0 reads g[u] via dy=1; phase 1
    reads g[u] via dy=2 and g[u+1] via dy=0. In the padded-by-1 stride-1
    conv y[o] = sum_s K'[s] g[o-1+s], that is tap s=1 (g[o]) and s=2
    (g[o+1]) — tap s=0 stays zero."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "s2 dx phase form is for the 3x3/s2 encoders"
    # phase p: {conv tap s: fwd kernel index d}
    taps = ({1: 1}, {1: 2, 2: 0})
    out = jnp.zeros((3, 3, cout, 4 * cin), kernel.dtype)
    for py in (0, 1):
        for px in (0, 1):
            blk = (py * 2 + px) * cin
            for sy, dy in taps[py].items():
                for sx, dx in taps[px].items():
                    out = out.at[sy, sx, :, blk : blk + cin].set(
                        jnp.transpose(kernel[dy, dx])
                    )
    return out


def convtranspose_s2_dx_kernel_rowpair(kernel: jax.Array) -> jax.Array:
    """4x4 s2 p1 HWIO transpose-conv kernel -> the (3, 4, 2*cout, cin)
    kernel computing the transpose conv's INPUT gradient over the ROW-PAIR
    view of the full-res cotangent g (a FREE reshape), with full-width kw=4
    lane taps decimated in-kernel (``lane_stride2``).

    Derivation: d_x[u] = sum_{d=0..3} K[d]^T g[2u+d-1] per axis. Row
    2u+d-1 lives in pair u-1 (odd block) for d=0, pair u (even/odd) for
    d=1/2, pair u+1 (even) for d=3 — a kh=3 pair window with pad_top =
    pad_bottom = 1. Lanes: full-width taps at offsets d-1 (pad_left 1),
    keep even output lanes."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (4, 4), "rowpair dx form is for the 4x4 s2 p1 decoder"
    # d -> (pair window row sy, block: 0 even / 1 odd)
    rowmap = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0)}
    out = jnp.zeros((3, 4, 2 * cout, cin), kernel.dtype)
    for dy in range(4):
        sy, blk = rowmap[dy]
        for dx in range(4):
            out = out.at[sy, dx, blk * cout : (blk + 1) * cout].set(
                jnp.transpose(kernel[dy, dx])
            )
    return out


def lane_dilate2(x: jax.Array) -> jax.Array:
    """(B, H, C, W) -> (B, H, C, 2W) with x at even lanes, zeros at odd —
    the zero-dilation that turns a stride-2 filter-grad contraction into
    the stride-1 contraction the Pallas filtergrad kernel runs."""
    b, h, c, w = x.shape
    return jnp.stack([x, jnp.zeros_like(x)], axis=-1).reshape(b, h, c, 2 * w)


def conv_kernel_s2d(kernel: jax.Array) -> jax.Array:
    """HWIO stride-2 kernel -> the stride-1 kernel over a space-to-depth
    input: K'[qy, qx, (py, px, ci), co] = K[2qy+py, 2qx+px, ci, co]."""
    kh, kw, cin, cout = kernel.shape
    khp, kwp = -(-kh // 2), -(-kw // 2)
    out = jnp.zeros((khp, kwp, 4 * cin, cout), kernel.dtype)
    for dy in range(kh):
        qy, py = divmod(dy, 2)
        for dx in range(kw):
            qx, px = divmod(dx, 2)
            blk = (py * 2 + px) * cin
            out = out.at[qy, qx, blk : blk + cin].set(kernel[dy, dx])
    return out


def shortcut_kernel_s2d(kernel: jax.Array, pad: int = 1) -> jax.Array:
    """1x1 stride-2 (pad-0) kernel -> 1x1 stride-1 kernel over the *same*
    padded space-to-depth tensor as the main conv: out[t] = K x[2t] lives in
    phase (pad%2, pad%2) at offset (pad//2, pad//2) (offset must be 0 here,
    i.e. pad in {0, 1})."""
    assert kernel.shape[:2] == (1, 1) and pad in (0, 1)
    _, _, cin, cout = kernel.shape
    out = jnp.zeros((1, 1, 4 * cin, cout), kernel.dtype)
    blk = (pad * 2 + pad) * cin
    return out.at[0, 0, blk : blk + cin].set(kernel[0, 0])


def conv_kernel_wsplit_parts(
    kernel: jax.Array,
    parts: list[tuple[str, int]],
    pad: int,
) -> tuple[jax.Array, int, int]:
    """Stride-1 HWIO kernel over full-W operands -> the kernel over
    W-phase-split operands. Returns ``(kernel', pad_left', pad_right')`` for
    a half-width conv whose output channels are [even F | odd F].

    ``parts`` lists ``(mode, c_i)`` per input tensor, in part order:
      * ``'split'`` — the tensor is stored as channel blocks
        [even-lane c_i | odd-lane c_i] at half width (2*c_i physical);
      * ``'shared'`` — the tensor is a half-width array whose 2x W-repeat
        the full conv would consume (nearest upsample): both output phases
        read the SAME c_i physical channels, with the repeat folded into
        the tap coefficients (e.g. a [K0,K1,K2] row becomes K0 at δ=-1 and
        K1+K2 at δ=0 for the even phase).

    Derivation: output phase q ∈ {0,1} at half-col k is full col 2k+q; full
    tap dx reads full col 2k+q-pad+dx = phase ``(q-pad+dx) % 2`` at half-col
    k + δ, δ = floor((q-pad+dx)/2) — for a shared part the source col is
    floor((2k+q-pad+dx)/2) - k regardless of phase. Same arithmetic as the
    full conv; the W interleave never materializes (the aligned kernel
    synthesizes the half-width halo from the zero margins).
    """
    # spec entries: (mode, c) or (mode, c, phys) — phys above the natural
    # block width declares trailing zero channels INSIDE the part (granule
    # padding of a part that is not last; the kernel gets zero taps there)
    specs = [
        (p[0], p[1],
         p[2] if len(p) > 2 else (2 if p[0] == "split" else 1) * p[1])
        for p in parts
    ]
    kh, kw, cin, cout = kernel.shape
    assert sum(c for _, c, _ in specs) == cin, (parts, cin)
    # full w_out = w + 2*pad - (kw-1) must split evenly into the two phases
    assert (2 * pad - kw + 1) % 2 == 0, (kw, pad)
    # tap range over both phases
    deltas = sorted({(q - pad + dx) // 2 for q in (0, 1) for dx in range(kw)})
    dmin, dmax = deltas[0], deltas[-1]
    kwp = dmax - dmin + 1
    # per-phase width: w_out/2 = w/2 + pad_l' + pad_r' - (kwp-1)
    pad_r = (2 * pad - kw + 1) // 2 + kwp - 1 + dmin
    out = jnp.zeros(
        (kh, kwp, sum(ph for _, _, ph in specs), 2 * cout), kernel.dtype
    )
    off_full = 0
    off_phys = 0
    for mode, ci, phys in specs:
        kfull = kernel[:, :, off_full : off_full + ci]  # (kh, kw, ci, cout)
        for q in (0, 1):
            q_out = slice(q * cout, (q + 1) * cout)
            for dx in range(kw):
                s = q - pad + dx
                if mode == "split":
                    ph = s % 2
                    d = (s - ph) // 2
                    blk = slice(off_phys + ph * ci, off_phys + (ph + 1) * ci)
                else:  # shared: floor-divide source col, phase-independent
                    d = s // 2  # python floor handles negatives
                    blk = slice(off_phys, off_phys + ci)
                out = out.at[:, d - dmin, blk, q_out].add(kfull[:, dx])
        off_full += ci
        off_phys += phys
    return out, -dmin, pad_r


def conv_kernel_wsplit(kernel: jax.Array, in_channels: list[int]) -> jax.Array:
    """All-'split' wrapper of :func:`conv_kernel_wsplit_parts` for the
    symmetric-pad guided fusion convs (pad = (kw-1)//2, so pad' = pad and
    the caller keeps its ``padding`` argument unchanged)."""
    kh, kw, _, _ = kernel.shape
    pad = (kw - 1) // 2
    k2, pl, pr = conv_kernel_wsplit_parts(
        kernel, [("split", c) for c in in_channels], pad
    )
    assert (pl, pr) == (pad, pad), (pl, pr, pad)
    return k2


def expand_kernel_channels(kernel: jax.Array, spec) -> jax.Array:
    """Re-express a kernel over GRANULE-PADDED multi-part operands: insert
    zero input-channel taps so kernel channel i binds to the i-th channel
    of the parts' PHYSICAL concat. ``spec`` is [(logical, phys), ...] per
    part; the parts' pad channels must be zero in HBM (they get zero taps,
    so any value would be ignored arithmetically — but the aligned-form
    invariant keeps them zero anyway). This lets a sub-granule part (e.g.
    the 1-channel depth in UpCat's [depth ‖ fusion]) sit ANYWHERE in the
    part list instead of forcing an HBM concat: the multi-input kernels
    bind positionally against the physical layout."""
    blocks = []
    off = 0
    for logical, phys in spec:
        blk = kernel[:, :, off : off + logical]
        if phys > logical:
            blk = jnp.pad(
                blk, ((0, 0), (0, 0), (0, phys - logical), (0, 0))
            )
        blocks.append(blk)
        off += logical
    assert off == kernel.shape[2], (off, kernel.shape)
    return jnp.concatenate(blocks, axis=2)


def convtranspose_kernel_phases(kernel: jax.Array) -> jax.Array:
    """4x4 HWIO transpose-conv kernel -> a 3x3 stride-1 kernel whose output
    channels stack the four stride-2 phases in (ry, rx, co) order; apply to
    the input padded by 1 and interleave with :func:`depth_to_space_bhcw`.

    Derivation: out[2t+r] = sum_s K[r+3-2s] x[t-1+s] (s in 0..2, indices
    outside [0,4) contribute nothing), per axis.
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (4, 4), "phase form is for the 4x4 s2 p1 decoder conv"
    out = jnp.zeros((3, 3, cin, 4 * cout), kernel.dtype)
    for ry in range(2):
        for rx in range(2):
            blk = (ry * 2 + rx) * cout
            for sy in range(3):
                ky = ry + 3 - 2 * sy
                if not 0 <= ky < 4:
                    continue
                for sx in range(3):
                    kx = rx + 3 - 2 * sx
                    if not 0 <= kx < 4:
                        continue
                    out = out.at[sy, sx, :, blk : blk + cout].set(
                        kernel[ky, kx]
                    )
    return out


def depth_to_space_bhcw(x: jax.Array, cout: int) -> jax.Array:
    """(B, H, 4*cout, W) with (ry, rx, c)-ordered phase channels ->
    (B, 2H, cout, 2W)."""
    b, h, c4, w = x.shape
    assert c4 == 4 * cout, (c4, cout)
    # (ry, rx, c) channel order makes the row interleave a FREE reshape —
    # (h, ry) merge to 2h with (rx, c) left in channels — so only one
    # lane interleave remains (measured 504 vs 854 us for the 6-d
    # transpose form at [2,176,128,608] bf16 on v5e)
    rows = x.reshape(b, 2 * h, 2 * cout, w)
    ev, od = rows[:, :, :cout], rows[:, :, cout:]
    return jnp.stack([ev, od], axis=-1).reshape(b, 2 * h, cout, 2 * w)


# ---------------------------------------------------------------------------
# Torch checkpoint layout adapters (used by the converter and parity tests).
# ---------------------------------------------------------------------------

def torch_conv_kernel_to_hwio(w) -> jnp.ndarray:
    """(out, in, kh, kw) torch conv weight -> HWIO."""
    w = jnp.asarray(w)
    return jnp.transpose(w, (2, 3, 1, 0))


def torch_convtranspose_kernel_to_hwio(w) -> jnp.ndarray:
    """(in, out, kh, kw) torch transpose-conv weight -> HWIO with I=in."""
    w = jnp.asarray(w)
    return jnp.transpose(w, (2, 3, 0, 1))
