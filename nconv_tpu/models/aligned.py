"""Aligned-form tensor plumbing for the full-(B,H,C,W) inference graph.

An *aligned-form* tensor is a (B, H_alloc, C, Wp) array whose logical data
occupies rows [0, h) x lanes [0, w), with zeros everywhere else (Wp a
multiple of 128, H_alloc >= h). The Pallas kernels synthesize conv halos
from the zero margins (see ops/pallas_conv.py), so chained convolutions,
channel concats, pools, 2x-repeats and s2d/d2s re-layouts compose with no
XLA padding ops at all — the round-1 profile showed ~1.6 ms/frame of pads
feeding the kernels at KITTI 352x1216.

``AT`` carries the logical (h, w) alongside the array; shapes are static
under jit, so this is free bookkeeping.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class AT(NamedTuple):
    """Aligned-form tensor: array (B, H_alloc, C, Wp) + logical (h, w).

    ``c`` is the logical channel count when the physical channels carry a
    zero tail (granule padding); None means channels are exact. The Pallas
    aligned entries zero-extend their kernels to match, so the padding is
    arithmetically invisible.
    """

    arr: jax.Array
    h: int
    w: int
    c: int | None = None

    @property
    def wp(self) -> int:
        return self.arr.shape[-1]

    @property
    def channels(self) -> int:
        return self.arr.shape[2]

    @property
    def logical_c(self) -> int:
        return self.c if self.c is not None else self.arr.shape[2]


def to_aligned(x: jax.Array, channels: int | None = None) -> AT:
    """Exact (B, H, C, W) -> aligned form: one right-side pad of lanes to a
    128 multiple (and channels up to ``channels`` if given)."""
    b, h, c, w = x.shape
    cpad = (channels - c) if channels else 0
    wp = _round_up(w, 128)
    if cpad or wp != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, cpad), (0, wp - w)))
    return AT(x, h, w, c if cpad else None)


def from_aligned(at: AT, channels: int | None = None) -> jax.Array:
    """Aligned form -> exact (B, h, C[, :channels], w) (one narrowing slice)."""
    c = channels if channels is not None else at.channels
    return at.arr[:, : at.h, :c, : at.w]


def ensure_wp(at: AT, wp: int) -> AT:
    """Match the lane allocation (slice zeros off, or pad zeros on) — used
    where two branches of different pyramid provenance meet (the sliced
    lanes are outside both operands' data regions)."""
    if at.wp == wp:
        return at
    if at.wp > wp:
        assert wp >= _round_up(at.w, 128), (at.w, wp)
        return AT(at.arr[..., :wp], at.h, at.w, at.c)
    return AT(jnp.pad(at.arr, ((0, 0), (0, 0), (0, 0), (0, wp - at.wp))),
              at.h, at.w, at.c)


def realign(at: AT) -> AT:
    """Re-establish Wp % 128 == 0 after an op that halved the lanes (pool,
    s2d). Pads lanes only — a small copy at the low-resolution levels."""
    wp = _round_up(at.wp, 128)
    return at if wp == at.wp else ensure_wp(at, wp)


def _match_rows(ats: list[AT]) -> list[AT]:
    """Harmonize the row allocation across operands by slicing the larger
    ones down to the smallest (only zero tail rows differ; allocations only
    diverge at sizes without an even tile divisor, i.e. odd test
    geometries — production sizes tile exactly and this is a no-op)."""
    n = min(a.arr.shape[1] for a in ats)
    assert all(n >= a.h for a in ats), [(a.arr.shape, a.h) for a in ats]
    return [a if a.arr.shape[1] == n else AT(a.arr[:, :n], a.h, a.w, a.c)
            for a in ats]


def granule8(at: AT) -> AT:
    """Zero-pad an AT's physical channels to the sublane granule (Mosaic
    rejects sub-tile channel DMA slabs; the pad channels carry zero taps)."""
    c = at.arr.shape[2]
    if c % 8 == 0:
        return at
    return AT(
        jnp.pad(at.arr, ((0, 0), (0, 0), (0, -c % 8), (0, 0))),
        at.h, at.w, at.logical_c,
    )


def add(a: AT, b: AT) -> AT:
    a, b = _match_rows([a, b])
    assert (a.h, a.w) == (b.h, b.w) and a.arr.shape == b.arr.shape, (
        a.arr.shape, b.arr.shape, a.h, a.w, b.h, b.w,
    )
    return AT(a.arr + b.arr, a.h, a.w, a.c)


class WS(NamedTuple):
    """W-phase-split aligned tensor: array (B, H_alloc, 2C, Wp_half) whose
    channel axis stacks [even-lane C | odd-lane C] planes of a logical
    (B, h, C, w) tensor (w even), each at half width. The full-width W
    interleave never materializes: convs run on the split form via
    ``ops.convops.conv_kernel_wsplit`` (same arithmetic, half the lanes,
    twice the channels) and only the 1-channel final depth ever merges.
    Zeros outside rows [0, h) x lanes [0, w/2) — the aligned invariant."""

    arr: jax.Array
    h: int
    w: int  # FULL logical width (even); per-phase data width is w // 2
    c: int  # per-phase channel count

    @property
    def wp(self) -> int:
        return self.arr.shape[-1]


class Shared(NamedTuple):
    """Marker for a half-width operand whose 2x W nearest-repeat the full
    conv would consume: fed to the kernel ONCE, with the repeat folded into
    the tap coefficients (conv_kernel_wsplit_parts mode='shared') — the
    upsample never materializes. ``at.w`` must equal half the consumer's
    full logical width. W-phase-split consumers only."""

    at: AT


class Up2(NamedTuple):
    """Marker for a half-resolution operand whose 2x nearest upsample a
    FULL-width aligned consumer would read: the kernel DMAs the half-rows
    (duplicated in VMEM, ``row_shared``) and spreads the half lanes with a
    constant nearest-repeat matmul on the MXU (``lane_rep`` in
    ops.pallas_nconv_mxu) — the upsample never materializes in HBM.
    ``at.h``/``at.w`` must be half the consumer's logical geometry."""

    at: AT


def wsplit(at: AT) -> WS:
    """AT -> WS: the one lane deinterleave (minor (W/2, 2) reshape + unit
    slices), shared by every consumer of the split form."""
    assert at.c is None, "split channel-exact tensors only"
    b, ha, c, wp = at.arr.shape
    assert wp % 2 == 0 and at.w % 2 == 0, (wp, at.w)
    v = at.arr.reshape(b, ha, c, wp // 2, 2)
    arr = jnp.concatenate([v[..., 0], v[..., 1]], axis=2)
    wq = _round_up(wp // 2, 128)
    if wq != wp // 2:  # e.g. full wp 640 -> half 320 -> realign to 384
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, 0), (0, wq - wp // 2)))
    return WS(arr, at.h, at.w, c)


def wsplit_entry(x: jax.Array, c: int) -> WS:
    """Channel-exact (B, H, c, W) ENTRY tensor -> WS with channel layout
    [ev c | od c | zero pad to granule] at half width.

    Splitting at the wire (3-channel u8 RGB, ~1.3 MB/stream) costs two
    copies of a tiny tensor; splitting the 32-channel encoder OUTPUT costs
    the same two copies of 58 MB — so the split moves upstream of the
    channel expansion and the first encoder runs split end-to-end."""
    b, h, cc, w = x.shape
    assert cc == c and w % 2 == 0, (x.shape, c)
    v = x.reshape(b, h, c, w // 2, 2)
    arr = jnp.concatenate([v[..., 0], v[..., 1]], axis=2)
    wq = _round_up(w // 2, 128)
    pad_c = _round_up(2 * c, 8) - 2 * c
    if pad_c or wq != w // 2:
        arr = jnp.pad(
            arr, ((0, 0), (0, 0), (0, pad_c), (0, wq - w // 2))
        )
    return WS(arr, h, w, c)


def wmerge(ws: WS) -> AT:
    """WS -> AT: one lane interleave. Only used on the tiny 1-channel final
    depth; everything wide stays split."""
    b, ha, c2, wph = ws.arr.shape
    ev, od = ws.arr[:, :, : ws.c], ws.arr[:, :, ws.c : 2 * ws.c]
    arr = jnp.stack([ev, od], axis=-1).reshape(b, ha, ws.c, 2 * wph)
    return AT(arr, ws.h, ws.w)


def ws_add(a: WS, b: WS) -> WS:
    assert (a.h, a.w, a.c) == (b.h, b.w, b.c), (a, b)
    n = min(a.arr.shape[1], b.arr.shape[1])
    return WS(a.arr[:, :n] + b.arr[:, :n], a.h, a.w, a.c)
