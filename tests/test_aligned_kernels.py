"""Aligned-form kernel unit tests (interpret mode).

The aligned entries (`conv2d_pallas_bhcw_aligned`, `nconv2d_pallas_aligned`)
take (B, H, C, Wp) arrays with data at rows [0,h) x lanes [0,w) and zeros
elsewhere, synthesize their conv halos in-kernel, and emit the same form —
the full-(B,H,C,W) inference graph chains them with no XLA pads at all
(see ops/pallas_conv.py docstring). These tests pin the core invariants:
parity vs the XLA formulation, zero margins on the outputs, asymmetric
halos (the canvas-free s2d consumers), and the multi-input (concat-free)
form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from nconv_tpu.ops.convops import (
    conv_kernel_s2d_aligned,
    shortcut_kernel_s2d_aligned,
    space_to_depth_aligned_parts,
)
from nconv_tpu.ops.nconv import nconv2d
from nconv_tpu.ops.pallas_conv import _round_up, conv2d_pallas_bhcw_aligned
from nconv_tpu.ops.pallas_nconv_mxu import nconv2d_pallas_aligned

rng = np.random.default_rng(7)


def _pad_lanes(x):
    w = x.shape[-1]
    wp = _round_up(w, 128)
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w)))


def _xla_conv(x_bhcw, k, b, pads, relu=False, residual=None):
    (pt, pb), (pl_, pr) = pads
    x = jnp.transpose(x_bhcw, (0, 1, 3, 2)).astype(jnp.float32)

    def c(kk, bb):
        o = lax.conv_general_dilated(
            x, kk, (1, 1), ((pt, pb), (pl_, pr)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return o if bb is None else o + bb.reshape(1, 1, 1, -1)

    if residual is not None:
        o = jax.nn.relu(c(k[..., :residual], b)) + c(k[..., residual:], None)
    else:
        o = c(k, b)
        if relu:
            o = jax.nn.relu(o)
    return jnp.transpose(o, (0, 1, 3, 2))


@pytest.mark.parametrize(
    "shape,kk,pads,res,relu",
    [
        ((1, 16, 8, 130), (3, 3), ((1, 1), (1, 1)), None, True),
        ((2, 24, 16, 200), (3, 3), ((1, 1), (1, 1)), 16, False),
        ((1, 12, 8, 96), (2, 2), ((1, 0), (1, 0)), None, False),  # s2d form
        ((1, 20, 8, 140), (5, 5), ((2, 2), (2, 2)), None, False),
        ((1, 18, 8, 132), (1, 1), ((2, 2), (2, 2)), None, False),  # nconv7 grow
    ],
)
def test_aligned_conv_parity_and_margins(shape, kk, pads, res, relu):
    B, h, c, w = shape
    kh, kw = kk
    cout = 16 if res is None else 32
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, c, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(
        rng.standard_normal((cout if res is None else res,)), jnp.float32
    )
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), k, b, w=w,
            pad_top=pads[0][0], pad_bottom=pads[0][1],
            pad_left=pads[1][0], pad_right=pads[1][1],
            relu=relu, residual_channels=res,
        )
    ref = _xla_conv(x, k, b, pads, relu, res)
    assert (ho, wo) == (ref.shape[1], ref.shape[3])
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, :, :wo]), np.asarray(ref), atol=1e-4
    )
    # aligned-form invariants: zeros outside the data region
    assert float(jnp.max(jnp.abs(got[:, :, :, wo:]))) == 0.0
    if got.shape[1] > ho:
        assert float(jnp.max(jnp.abs(got[:, ho:]))) == 0.0


def test_aligned_conv_multi_input_matches_concat():
    """Parts with mixed lane allocations == one conv over their concat."""
    B, h, w = 1, 16, 140
    cs = (8, 24)
    cout = 16
    parts_c = [
        jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32) for c in cs
    ]
    k = jnp.asarray(
        rng.standard_normal((3, 3, sum(cs), cout)) * 0.1, jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    parts = [_pad_lanes(p) for p in parts_c]
    parts[1] = jnp.pad(parts[1], ((0, 0), (0, 0), (0, 0), (0, 128)))
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            parts, k, b, w=w, padding=1, relu=True
        )
    ref = _xla_conv(
        jnp.concatenate(parts_c, axis=2), k, b, ((1, 1), (1, 1)), relu=True
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, :, :wo]), np.asarray(ref), atol=1e-4
    )


def test_aligned_s2d_conv_matches_strided_residual_block():
    """Canvas-free s2d + 2x2 aligned conv == 3x3/s2/p1 residual encoder."""
    B, h, c, w, f = 1, 16, 8, 140, 16
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    km = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.2, jnp.float32)
    ks = jnp.asarray(rng.standard_normal((1, 1, c, f)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    phases = space_to_depth_aligned_parts(_pad_lanes(x))
    kcat = jnp.concatenate(
        [conv_kernel_s2d_aligned(km), shortcut_kernel_s2d_aligned(ks)], -1
    )
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            phases, kcat, b, w=w // 2, pad_top=1, pad_bottom=0,
            pad_left=1, pad_right=0, residual_channels=f,
        )
    xn = jnp.transpose(x, (0, 1, 3, 2))
    dn = ("NHWC", "HWIO", "NHWC")
    main = lax.conv_general_dilated(
        xn, km, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn
    )
    short = lax.conv_general_dilated(
        xn, ks, (2, 2), ((0, 0), (0, 0)), dimension_numbers=dn
    )
    ref = jnp.transpose(jax.nn.relu(main + b) + short, (0, 1, 3, 2))
    assert (ho, wo) == (ref.shape[1], ref.shape[3])
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, :, :wo]), np.asarray(ref), atol=1e-4
    )


@pytest.mark.parametrize(
    "shape,k,p", [((1, 16, 8, 130), 5, 2), ((1, 14, 8, 120), 3, 0),
                  ((2, 16, 16, 133), 3, 1)]
)
def test_aligned_nconv_parity(shape, k, p):
    B, h, c, w = shape
    d = jnp.asarray(rng.random(shape), jnp.float32)
    cf = jnp.asarray(rng.random(shape) > 0.5, jnp.float32)
    kk = jnp.asarray(rng.standard_normal((k, k, c, 8)) * 0.3, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((8,)) * 0.01, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, carr, ho, wo = nconv2d_pallas_aligned(
            _pad_lanes(d), _pad_lanes(cf), kk, bb, w=w, padding=p
        )
    t = lambda a: jnp.transpose(a, (0, 1, 3, 2))
    ref_o, ref_c = nconv2d(t(d), t(cf), kk, bb, padding=p)
    np.testing.assert_allclose(
        np.asarray(out[:, :ho, :, :wo]), np.asarray(t(ref_o)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(carr[:, :ho, :, :wo]), np.asarray(t(ref_c)), atol=1e-5
    )
    assert float(jnp.max(jnp.abs(out[:, :, :, wo:]))) == 0.0


def test_aligned_nconv_pool_out_matches_xla_pool():
    """pool_out: the WS nconv kernel's fused 2x2 pool == the separate XLA
    pool of its (merged) output — the step-1 level-0 downsample."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit_parts

    B, c, h, w = 1, 8, 16, 256  # full-res W; WS operands at w//2
    d = jnp.asarray(rng.random((B, h, c, w)), jnp.float32)
    cf = jnp.asarray(rng.random((B, h, c, w)) > 0.5, jnp.float32)
    kk = jnp.asarray(rng.standard_normal((5, 5, c, c)) * 0.3, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)

    def ws(t):  # [even-lane c | odd-lane c] at half width
        v = t.reshape(B, h, c, w // 2, 2)
        return _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))

    with pltpu.force_tpu_interpret_mode():
        out, carr, pout, pcnf, ho, wo = nconv2d_pallas_aligned(
            ws(d), ws(cf), kk, jnp.tile(bb, 2), w=w // 2, h=h, padding=2,
            kernel_transform=lambda wp: conv_kernel_wsplit_parts(
                wp, [("split", c)], 2
            ),
            pool_out=True, tile_h=8,
        )
    # reference: merge the WS output, 2x2 max pool
    def merge(o):
        ev, od = o[:, :ho, :c, :wo], o[:, :ho, c:, :wo]
        return jnp.stack([ev, od], -1).reshape(B, ho, c, 2 * wo)

    for got_p, full in ((pout, merge(out)), (pcnf, merge(carr))):
        v = full[:, : (ho // 2) * 2].reshape(B, ho // 2, 2, c, wo, 2)
        ref = jnp.max(jnp.max(v, axis=2), axis=-1)
        np.testing.assert_allclose(
            np.asarray(got_p[:, : ho // 2, :, :wo]), np.asarray(ref),
            atol=1e-6,
        )
    if pout.shape[1] > ho // 2:  # pooled overhang rows must be zero
        assert float(jnp.max(jnp.abs(pout[:, ho // 2 :]))) == 0.0


@pytest.mark.parametrize("hw", [(16, 120), (12, 260)])
def test_aligned_nconv_up2_part_matches_explicit_repeat(hw):
    """A half-res part fed with row_shared + lane_rep (Up2) == the nconv
    over the explicit 2x nearest-repeat — the step-1 decoder's
    [skip, up2(x)] form with padding=1 (odd window starts)."""
    h, w = hw
    B, c = 1, 8
    skip_d = jnp.asarray(rng.random((B, h, c, w)), jnp.float32)
    skip_c = jnp.asarray(rng.random((B, h, c, w)) > 0.5, jnp.float32)
    src_d = jnp.asarray(rng.random((B, h // 2, c, w // 2)), jnp.float32)
    src_c = jnp.asarray(rng.random((B, h // 2, c, w // 2)) > 0.5, jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.3, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
    up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=3)
    with pltpu.force_tpu_interpret_mode():
        # tile_h=4 forces a multi-tile grid so the odd-window-start
        # (par=1) DMA/expansion classes actually run (pad_top=1 makes
        # every tile but the clamped first start on an odd row)
        got_x, got_c, ho, wo = nconv2d_pallas_aligned(
            [_pad_lanes(skip_d), _pad_lanes(src_d)],
            [_pad_lanes(skip_c), _pad_lanes(src_c)],
            kk, bb, w=w, h=h, padding=1, tile_h=4,
            row_shared=(False, True), lane_rep=(False, True),
        )
        ref_x, ref_c, hr, wr = nconv2d_pallas_aligned(
            [_pad_lanes(skip_d), _pad_lanes(up(src_d))],
            [_pad_lanes(skip_c), _pad_lanes(up(src_c))],
            kk, bb, w=w, h=h, padding=1,
        )
    assert (ho, wo) == (hr, wr)
    np.testing.assert_allclose(
        np.asarray(got_x[:, :ho, :, :wo]),
        np.asarray(ref_x[:, :ho, :, :wo]), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got_c[:, :ho, :, :wo]),
        np.asarray(ref_c[:, :ho, :, :wo]), atol=1e-5,
    )
    assert float(jnp.max(jnp.abs(got_x[:, :, :, wo:]))) == 0.0


def test_aligned_nconv_multi_input_matches_concat():
    """Decoder-style (x ‖ skip) pairs as separate parts."""
    B, h, w = 1, 16, 120
    d1 = jnp.asarray(rng.random((B, h, 8, w)), jnp.float32)
    d2 = jnp.asarray(rng.random((B, h, 8, w)), jnp.float32)
    c1 = jnp.asarray(rng.random((B, h, 8, w)) > 0.5, jnp.float32)
    c2 = jnp.asarray(rng.random((B, h, 8, w)) > 0.5, jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.3, jnp.float32)
    bb = jnp.asarray(rng.standard_normal((8,)) * 0.01, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, carr, ho, wo = nconv2d_pallas_aligned(
            [_pad_lanes(d1), _pad_lanes(d2)],
            [_pad_lanes(c1), _pad_lanes(c2)],
            kk, bb, w=w, padding=1,
        )
    t = lambda a: jnp.transpose(a, (0, 1, 3, 2))
    ref_o, ref_c = nconv2d(
        t(jnp.concatenate([d1, d2], 2)), t(jnp.concatenate([c1, c2], 2)),
        kk, bb, padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :ho, :, :wo]), np.asarray(t(ref_o)), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(carr[:, :ho, :, :wo]), np.asarray(t(ref_c)), atol=1e-5
    )


@pytest.mark.parametrize(
    "shape,kk,p,co",
    [
        ((2, 20, 8, 140), (5, 5), 2, 8),
        ((1, 14, 3, 96), (3, 3), 1, 32),
        ((1, 12, 8, 100), (3, 3), 0, 8),
        ((2, 18, 8, 120), (1, 1), 2, 4),   # the nconv7 1x1/pad-2 quirk
        ((1, 40, 33, 128), (4, 4), 1, 64),  # upf-style geometry
    ],
)
def test_filtergrad_kernel_matches_xla(shape, kk, p, co):
    """The Pallas filter-gradient kernel (weight cotangent) vs XLA's
    filter-grad conv — the op that was 32 of the 35 ms unguided backward
    when lowered through XLA's NHWC layouts."""
    from nconv_tpu.ops.pallas_conv import conv_filtergrad_pallas_bhcw

    B, h, cin, w = shape
    kh, kw = kk
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    h_out, w_out = h + 2 * p - (kh - 1), w + 2 * p - (kw - 1)
    g = jnp.asarray(rng.standard_normal((B, h_out, co, w_out)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv_filtergrad_pallas_bhcw(x, g, kh=kh, kw=kw, padding=p)
    xn = jnp.transpose(x, (0, 1, 3, 2))
    gn = jnp.transpose(g, (0, 1, 3, 2))
    ref = jax.linear_transpose(
        lambda kk_: lax.conv_general_dilated(
            xn, kk_, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        jnp.zeros((kh, kw, cin, co), jnp.float32),
    )(gn)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref),
        atol=float(jnp.max(jnp.abs(ref))) * 1e-4 + 1e-5,
    )


# ---------------------------------------------------------------------------
# W-phase-split form (round 3): conv_kernel_wsplit_parts re-expresses a
# stride-1 kernel over [even|odd] channel-block operands at half width —
# including 'shared' parts whose 2x nearest W-repeat folds into the taps.
# ---------------------------------------------------------------------------

def _split_w_nhwc(x):
    return jnp.concatenate([x[:, :, 0::2], x[:, :, 1::2]], axis=-1)


def _conv_nhwc(x, k, pads):
    (pt, pb), (pl_, pr) = pads
    return lax.conv_general_dilated(
        x, k, (1, 1), ((pt, pb), (pl_, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "kh,kw,pad", [(3, 3, 1), (3, 3, 0), (5, 5, 2), (1, 1, 2), (1, 1, 0)]
)
def test_wsplit_kernel_transform_matches_full_conv(kh, kw, pad):
    """Pure kernel-space check (no Pallas): the transformed kernel applied
    to phase-split NHWC operands reproduces the full-width conv for every
    (kw, pad) used in the graph (3x3 p1/p0, the 5x5 p2 nconvs, the 1x1 p2
    nconv7)."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit_parts

    h, w, ci, co = 12, 20, 5, 7
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kw, ci, co)) * 0.2, jnp.float32)
    ref = _conv_nhwc(x, k, ((pad, pad), (pad, pad)))
    k2, pl_, pr = conv_kernel_wsplit_parts(k, [("split", ci)], pad)
    out = _conv_nhwc(_split_w_nhwc(x), k2, ((pad, pad), (pl_, pr)))
    ev, od = out[..., :co], out[..., co:]
    got = jnp.stack([ev, od], axis=3).reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_wsplit_shared_part_folds_nearest_repeat():
    """A 'shared' part consumes the HALF-width source whose 2x W-repeat the
    full conv would see (step-1's decoder upsample feeding nconv6) — the
    repeat never materializes; pad-0 exercises nconv6's exact geometry."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit_parts

    h, w, cs, ci, co = 12, 20, 3, 5, 7
    src = jnp.asarray(rng.standard_normal((2, h, w // 2, cs)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cs + ci, co)) * 0.2, jnp.float32)
    rep = jnp.repeat(src, 2, axis=2)
    ref = _conv_nhwc(jnp.concatenate([rep, skip], -1), k, ((0, 0), (0, 0)))
    k2, pl_, pr = conv_kernel_wsplit_parts(
        k, [("shared", cs), ("split", ci)], 0
    )
    xin = jnp.concatenate([src, _split_w_nhwc(skip)], axis=-1)
    out = _conv_nhwc(xin, k2, ((0, 0), (pl_, pr)))
    ev, od = out[..., :co], out[..., co:]
    got = jnp.stack([ev, od], axis=3).reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_wsplit_interior_pad_channels():
    """A (mode, c, phys) spec declares trailing zero channels INSIDE a part
    (granule padding of a non-last part): the transform zero-fills those
    kernel channels, so the binding of later parts stays correct."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit_parts

    h, w, co = 10, 16, 4
    d = jnp.asarray(rng.standard_normal((1, h, w, 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, co)) * 0.2, jnp.float32)
    ref = _conv_nhwc(jnp.concatenate([d, f], -1), k, ((1, 1), (1, 1)))
    k2, pl_, pr = conv_kernel_wsplit_parts(
        k, [("split", 1, 8), ("split", 3)], 1
    )
    d_split = _split_w_nhwc(d)  # (.., 2)
    d8 = jnp.pad(d_split, ((0, 0), (0, 0), (0, 0), (0, 6)))
    xin = jnp.concatenate([d8, _split_w_nhwc(f)], axis=-1)
    out = _conv_nhwc(xin, k2, ((1, 1), (pl_, pr)))
    ev, od = out[..., :co], out[..., co:]
    got = jnp.stack([ev, od], axis=3).reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_aligned_conv_wsplit_matches_full_width():
    """The aligned Pallas kernel fed split parts + the transformed kernel
    == the full-width aligned conv (interpret mode)."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit

    B, h, c, w, f = 1, 12, 8, 136, 16
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    # split (B,H,C,W) -> channels [ev|od] at half width, lanes realigned
    v = x.reshape(B, h, c, w // 2, 2)
    xs = jnp.concatenate([v[..., 0], v[..., 1]], axis=2)
    xs = _pad_lanes(xs)
    k2 = conv_kernel_wsplit(k, [c])
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            xs, k2, jnp.tile(b, 2), w=w // 2, padding=1, relu=True
        )
        ref, hr, wr = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), k, b, w=w, padding=1, relu=True
        )
    # interleave got's phase blocks back to full width
    ev, od = got[:, :ho, :f, :wo], got[:, :ho, f:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, f, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :hr, :, :wr]), atol=1e-4
    )


def test_aligned_conv_wsplit_exact_matches_full_width():
    """The EXACT wsplit mode (wsplit_cs: per-parity scratch planes, one dot
    per (source parity, lane offset)) == the full-width aligned conv, for
    single- and multi-part inputs (interpret mode)."""
    B, h, w, f = 1, 20, 272, 16
    cs = (8, 16)
    xs_full = [
        jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
        for c in cs
    ]
    k = jnp.asarray(
        rng.standard_normal((3, 3, sum(cs), f)) * 0.2, jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((f,)), jnp.float32)

    def split(x):  # (B,H,C,W) -> [ev|od] at half width, lanes aligned
        c = x.shape[2]
        v = x.reshape(B, h, c, w // 2, 2)
        return _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))

    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            [split(x) for x in xs_full], k, b,
            w=w // 2, padding=1, relu=True, wsplit_cs=cs,
        )
        ref, hr, wr = conv2d_pallas_bhcw_aligned(
            _pad_lanes(jnp.concatenate(xs_full, axis=2)), k, b,
            w=w, padding=1, relu=True,
        )
    ev, od = got[:, :ho, :f, :wo], got[:, :ho, f:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, f, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :hr, :, :wr]), atol=1e-4
    )


def test_aligned_nconv_wsplit_shared_matches_full():
    """nconv2d_pallas_aligned with kernel_transform: [shared-upsample ;
    split-skip] parts == the full-width nconv on [repeat ; skip] (the
    step-1 nconv6 geometry, pad 0), confidence included."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit_parts

    B, h, w, c = 1, 12, 136, 8
    src_d = jnp.asarray(rng.random((B, h, w // 2, c)), jnp.float32)
    src_c = jnp.asarray(rng.random((B, h, w // 2, c)) > 0.4, jnp.float32)
    skip_d = jnp.asarray(rng.random((B, h, w, c)), jnp.float32)
    skip_c = jnp.asarray(rng.random((B, h, w, c)) > 0.4, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.random((c,)) * 0.01, jnp.float32)

    def bhcw(x):
        return jnp.transpose(x, (0, 1, 3, 2))

    def split(x):  # NHWC -> (B,H,[ev|od],W/2) bhcw, lanes aligned
        v = bhcw(x).reshape(B, h, c, w // 2, 2)
        return _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))

    spec = [("shared", c), ("split", c)]
    with pltpu.force_tpu_interpret_mode():
        got_x, got_c, ho, wo = nconv2d_pallas_aligned(
            [_pad_lanes(bhcw(src_d)), split(skip_d)],
            [_pad_lanes(bhcw(src_c)), split(skip_c)],
            k, jnp.tile(b, 2), w=w // 2, padding=0, pos_fn="softplus",
            kernel_transform=lambda wp: conv_kernel_wsplit_parts(wp, spec, 0),
        )
        rep_d = jnp.repeat(src_d, 2, axis=2)
        rep_c = jnp.repeat(src_c, 2, axis=2)
        ref_x, ref_c, hr, wr = nconv2d_pallas_aligned(
            [_pad_lanes(bhcw(jnp.concatenate([rep_d, skip_d], -1)))],
            [_pad_lanes(bhcw(jnp.concatenate([rep_c, skip_c], -1)))],
            k, b, w=w, padding=0, pos_fn="softplus",
        )

    def merge(o):
        ev, od = o[:, :ho, :c, :wo], o[:, :ho, c:2*c, :wo]
        return jnp.stack([ev, od], -1).reshape(B, ho, c, 2 * wo)

    np.testing.assert_allclose(
        np.asarray(merge(got_x)), np.asarray(ref_x[:, :hr, :, :wr]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(merge(got_c)), np.asarray(ref_c[:, :hr, :, :wr]), atol=1e-4
    )


def test_aligned_nconv_row_shared_duplicates_in_vmem():
    """row_shared: the shared part carries HALF the rows as well — the
    kernel DMAs the half-row window and duplicates rows in VMEM scratch
    (the full 2x2 nearest-upsample of step-1's decoder, with neither the
    W nor the H repeat materializing in HBM)."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit_parts

    B, h, w, c = 1, 12, 136, 8
    src_d = jnp.asarray(rng.random((B, h // 2, w // 2, c)), jnp.float32)
    src_c = jnp.asarray(rng.random((B, h // 2, w // 2, c)) > 0.4, jnp.float32)
    skip_d = jnp.asarray(rng.random((B, h, w, c)), jnp.float32)
    skip_c = jnp.asarray(rng.random((B, h, w, c)) > 0.4, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.random((c,)) * 0.01, jnp.float32)

    def bhcw(x):
        return jnp.transpose(x, (0, 1, 3, 2))

    def split(x):
        v = bhcw(x).reshape(B, h, c, w // 2, 2)
        return _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))

    spec = [("shared", c), ("split", c)]
    with pltpu.force_tpu_interpret_mode():
        got_x, got_c, ho, wo = nconv2d_pallas_aligned(
            [_pad_lanes(bhcw(src_d)), split(skip_d)],
            [_pad_lanes(bhcw(src_c)), split(skip_c)],
            k, jnp.tile(b, 2), w=w // 2, h=h, padding=0, pos_fn="softplus",
            kernel_transform=lambda wp: conv_kernel_wsplit_parts(wp, spec, 0),
            row_shared=(True, False),
        )
        rep_d = jnp.repeat(jnp.repeat(src_d, 2, axis=1), 2, axis=2)
        rep_c = jnp.repeat(jnp.repeat(src_c, 2, axis=1), 2, axis=2)
        ref_x, ref_c, hr, wr = nconv2d_pallas_aligned(
            [_pad_lanes(bhcw(jnp.concatenate([rep_d, skip_d], -1)))],
            [_pad_lanes(bhcw(jnp.concatenate([rep_c, skip_c], -1)))],
            k, b, w=w, padding=0, pos_fn="softplus",
        )

    def merge(o):
        ev, od = o[:, :ho, :c, :wo], o[:, :ho, c:2*c, :wo]
        return jnp.stack([ev, od], -1).reshape(B, ho, c, 2 * wo)

    np.testing.assert_allclose(
        np.asarray(merge(got_x)), np.asarray(ref_x[:, :hr, :, :wr]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(merge(got_c)), np.asarray(ref_c[:, :hr, :, :wr]), atol=1e-4
    )


@pytest.mark.parametrize("shape,f1,f2", [
    ((1, 16, 8, 130), 16, 8),
    ((2, 22, 24, 140), 16, 16),   # h_out with tile overhang
    ((1, 12, 5, 136), 7, 9),      # non-granule channels everywhere
])
def test_conv2_chain_matches_sequential(shape, f1, f2):
    """Fused conv->relu->conv chain (intermediate in VMEM) == two
    sequential aligned convs, including the virtual-row zeroing that keeps
    stage 2's halo aligned."""
    from nconv_tpu.ops.pallas_chain import conv2_chain_pallas_aligned

    B, h, c, w = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, f1)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f1,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, f1, f2)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((f2,)) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2_chain_pallas_aligned(
            _pad_lanes(x), k1, b1, k2, b2, w=w, tile_h=8,
        )
        m1, h1, w1 = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), k1, b1, w=w, padding=1, relu=True
        )
        ref, h2, w2_ = conv2d_pallas_bhcw_aligned(
            m1, k2, b2, w=w1, h=h1, padding=1, relu=True
        )
    assert (ho, wo) == (h2, w2_)
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, :, :wo]),
        np.asarray(ref[:, :ho, :, :wo]), atol=1e-4,
    )
    assert float(jnp.max(jnp.abs(got[:, :, :, wo:]))) == 0.0


def test_conv2_chain_multi_part_and_split():
    """Chain over multi-part input with W-phase-split kernels == the full
    conv pair (the fuse_conv2->fuse_conv3 WS geometry)."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit
    from nconv_tpu.ops.pallas_chain import conv2_chain_pallas_aligned

    B, h, c, w, f = 1, 12, 8, 136, 16
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, f, f)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    v = x.reshape(B, h, c, w // 2, 2)
    xs = _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2_chain_pallas_aligned(
            xs, conv_kernel_wsplit(k1, [c]), jnp.tile(b1, 2),
            conv_kernel_wsplit(k2, [f]), jnp.tile(b2, 2),
            w=w // 2, tile_h=6,
        )
        m1, h1, w1 = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), k1, b1, w=w, padding=1, relu=True
        )
        ref, h2, w2_ = conv2d_pallas_bhcw_aligned(
            m1, k2, b2, w=w1, h=h1, padding=1, relu=True
        )
    ev, od = got[:, :ho, :f, :wo], got[:, :ho, f:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, f, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :h2, :, :w2_]), atol=1e-4
    )


def test_conv2_chain_ws_exact_matches_full():
    """EXACT-split chain (ws_cs: per-parity scratch planes at every stage,
    original full-width kernels) == the sequential full-width conv pair —
    the fuse3 fuse_conv2->fuse_conv3 geometry, multi-tile."""
    from nconv_tpu.ops.pallas_chain import conv2_chain_pallas_aligned

    B, h, c, w, f = 2, 20, 8, 272, 16
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, f, f)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    v = x.reshape(B, h, c, w // 2, 2)
    xs = _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2_chain_pallas_aligned(
            xs, k1, b1, k2, b2, w=w // 2, tile_h=6, ws_cs=(c,),
        )
        m1, h1, w1 = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), k1, b1, w=w, padding=1, relu=True
        )
        ref, h2, w2_ = conv2d_pallas_bhcw_aligned(
            m1, k2, b2, w=w1, h=h1, padding=1, relu=True
        )
    ev, od = got[:, :ho, :f, :wo], got[:, :ho, f:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, f, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :h2, :, :w2_]), atol=1e-4
    )


@pytest.mark.parametrize("shape,feats", [
    ((1, 16, 8, 130), (16, 16, 16)),
    ((2, 22, 11, 140), (9, 8, 16)),   # overhang + non-granule channels
])
def test_conv3_chain_matches_sequential(shape, feats):
    """Three-stage chain (both intermediates in VMEM) == three sequential
    aligned convs — exercises the per-stage virtual-row zeroing at depth
    N-1-i and the remainder-tap dedup."""
    from nconv_tpu.ops.pallas_chain import conv_chain_pallas_aligned

    B, h, c, w = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    kbs = []
    cin = c
    for f in feats:
        k = jnp.asarray(rng.standard_normal((3, 3, cin, f)) * 0.2,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
        kbs.append((k, b))
        cin = f
    # multi-part split of the input channels
    parts = [_pad_lanes(x[:, :, : c // 2]), _pad_lanes(x[:, :, c // 2 :])]
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv_chain_pallas_aligned(parts, kbs, w=w, tile_h=8)
        ref = _pad_lanes(x)
        hr, wr = h, w
        for k, b in kbs:
            ref, hr, wr = conv2d_pallas_bhcw_aligned(
                ref, k, b, w=wr, h=hr, padding=1, relu=True
            )
    assert (ho, wo) == (hr, wr)
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, : feats[-1], :wo]),
        np.asarray(ref[:, :ho, :, :wo]), atol=1e-4,
    )
    assert float(jnp.max(jnp.abs(got[:, :, :, wo:]))) == 0.0


def test_conv_chain_vmem_split_fallback(monkeypatch):
    """When the scoped-VMEM model says a chain can't fit, it splits the
    last stage off and recurses — numerically identical to the full
    chain (this is the path wide-channel f32 graphs take)."""
    from nconv_tpu.ops import pallas_chain
    from nconv_tpu.ops.pallas_chain import conv_chain_pallas_aligned

    B, h, c, w = 1, 16, 8, 130
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    kbs = []
    cin = c
    # the 12-channel middle makes the head/tail interface sub-granule:
    # the split path must granule-pad it (Mosaic rejects sub-tile slabs)
    for f in (16, 12, 8):
        kbs.append((
            jnp.asarray(rng.standard_normal((3, 3, cin, f)) * 0.2,
                        jnp.float32),
            jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32),
        ))
        cin = f
    with pltpu.force_tpu_interpret_mode():
        full, ho, wo = conv_chain_pallas_aligned(
            _pad_lanes(x), kbs, w=w, tile_h=8
        )
        # force the fit model to reject everything chainable: every chain
        # splits down to single-stage kernels
        monkeypatch.setattr(pallas_chain, "_VMEM_CAP_BYTES", 1)
        split, hs, ws_ = conv_chain_pallas_aligned(
            _pad_lanes(x), kbs, w=w, tile_h=8
        )
    assert (ho, wo) == (hs, ws_)
    np.testing.assert_allclose(
        np.asarray(split[:, :ho, :8, :wo]),
        np.asarray(full[:, :ho, :8, :wo]), atol=1e-4,
    )


def test_conv_chain_ws_exact_vmem_split_fallback(monkeypatch):
    """The EXACT-split chain's VMEM fallback recursion: the head keeps
    ws_cs, the tail re-enters ws mode on the head's [ev F | od F] output
    — numerically identical to the unsplit exact chain."""
    from nconv_tpu.ops import pallas_chain
    from nconv_tpu.ops.pallas_chain import conv_chain_pallas_aligned

    B, h, c, w = 1, 16, 8, 272
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    kbs = []
    cin = c
    for f in (16, 8):
        kbs.append((
            jnp.asarray(rng.standard_normal((3, 3, cin, f)) * 0.2,
                        jnp.float32),
            jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32),
        ))
        cin = f
    v = x.reshape(B, h, c, w // 2, 2)
    xs = _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))
    with pltpu.force_tpu_interpret_mode():
        full, ho, wo = conv_chain_pallas_aligned(
            xs, kbs, w=w // 2, tile_h=8, ws_cs=(c,)
        )
        monkeypatch.setattr(pallas_chain, "_VMEM_CAP_BYTES", 1)
        split, hs, ws_ = conv_chain_pallas_aligned(
            xs, kbs, w=w // 2, tile_h=8, ws_cs=(c,)
        )
    assert (ho, wo) == (hs, ws_)
    np.testing.assert_allclose(
        np.asarray(split[:, :ho, :, :wo]),
        np.asarray(full[:, :ho, :, :wo]), atol=1e-4,
    )


@pytest.mark.parametrize("shape,f", [
    ((1, 16, 8, 140), 16),
    ((2, 20, 16, 260), 8),
])
def test_rowpair_lane_stride2_matches_strided_residual_block(shape, f):
    """Row-pair + lane-gather stride-2 form == 3x3/s2/p1 residual encoder:
    the input is a FREE (b, h/2, 2c, wp) reshape (even/odd row pair as
    channel blocks), the kw=3 lane taps run at full width, and a 0/1
    gather matmul keeps even lanes — no space-to-depth in XLA at all."""
    from nconv_tpu.ops.convops import (
        conv_kernel_s2_rowpair,
        shortcut_kernel_s2_rowpair,
    )

    B, h, c, w = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    km = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.2, jnp.float32)
    ks = jnp.asarray(rng.standard_normal((1, 1, c, f)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    xp = _pad_lanes(x)
    v2 = xp.reshape(B, h // 2, 2 * c, xp.shape[-1])
    kcat = jnp.concatenate(
        [conv_kernel_s2_rowpair(km), shortcut_kernel_s2_rowpair(ks)], -1
    )
    with pltpu.force_tpu_interpret_mode():
        # tile_h=4 forces a multi-tile grid over the pair rows
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            v2, kcat, b, w=w, h=h // 2, pad_top=1, pad_bottom=0,
            pad_left=1, pad_right=0, residual_channels=f, lane_stride2=True,
            tile_h=4,
        )
    xn = jnp.transpose(x, (0, 1, 3, 2))
    dn = ("NHWC", "HWIO", "NHWC")
    main = lax.conv_general_dilated(
        xn, km, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn
    )
    short = lax.conv_general_dilated(
        xn, ks, (2, 2), ((0, 0), (0, 0)), dimension_numbers=dn
    )
    ref = jnp.transpose(jax.nn.relu(main + b) + short, (0, 1, 3, 2))
    assert (ho, wo) == (ref.shape[1], ref.shape[3])
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, :, :wo]), np.asarray(ref), atol=1e-4
    )
    assert float(jnp.max(jnp.abs(got[:, :, :, wo:]))) == 0.0


@pytest.mark.parametrize("shape,f", [
    ((1, 12, 8, 130), 8),
    ((2, 10, 16, 140), 16),   # multi-row-group, wider channels
])
def test_conv_d2s_epilogue_matches_xla_interleave(shape, f):
    """conv(..., d2s_channels=F): the kernel emits full-width interleaved
    rows via constant selection matmuls == phase conv + XLA depth_to_space.
    This is the transpose-conv (Basic2dTrans) inference form."""
    from nconv_tpu.ops.convops import (
        convtranspose_kernel_phases,
        depth_to_space_bhcw,
    )

    B, h, c, w = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    kt = jnp.asarray(rng.standard_normal((4, 4, c, f)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    kph = convtranspose_kernel_phases(kt)
    bias4 = jnp.tile(bias, 4)
    with pltpu.force_tpu_interpret_mode():
        out_ph, ho, wo = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), kph, bias4, w=w, padding=1, relu=True,
        )
        ref = depth_to_space_bhcw(out_ph[:, :ho, :, : _round_up(wo, 128)],
                                  f)
        # tile_h forces a multi-tile grid (doubled store rows, overhang
        # zeroing at 2x scale)
        got, ho2, wo2 = conv2d_pallas_bhcw_aligned(
            _pad_lanes(x), kph, bias4, w=w, padding=1, relu=True,
            d2s_channels=f, tile_h=8,
        )
    assert (ho2, wo2) == (ho, wo)
    np.testing.assert_allclose(
        np.asarray(got[:, : 2 * ho, :, : 2 * wo]),
        np.asarray(ref[:, : 2 * ho, :, : 2 * wo]), atol=1e-4,
    )
    # aligned form: zeros outside the data region
    assert float(jnp.max(jnp.abs(got[:, :, :, 2 * wo :]))) == 0.0
    assert float(jnp.max(jnp.abs(got[:, 2 * ho :]))) == 0.0


def test_conv_chain_lane_clamp_overwide_part():
    """A part allocated wider than round_up(w, 128) (zero lanes past the
    data region) is DMA-clamped; the result matches the tight allocation."""
    from nconv_tpu.ops.pallas_chain import conv2_chain_pallas_aligned

    B, h, c, w, f = 1, 12, 8, 120, 8
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, f, f)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    tight = _pad_lanes(x)                                  # wp = 128
    wide = jnp.pad(tight, ((0, 0), (0, 0), (0, 0), (0, 128)))  # wp = 256
    with pltpu.force_tpu_interpret_mode():
        got_w, ho, wo = conv2_chain_pallas_aligned(
            wide, k1, b1, k2, b2, w=w, tile_h=8
        )
        got_t, _, _ = conv2_chain_pallas_aligned(
            tight, k1, b1, k2, b2, w=w, tile_h=8
        )
    np.testing.assert_allclose(
        np.asarray(got_w[:, :ho, :, :wo]),
        np.asarray(got_t[:, :ho, :, :wo]), atol=1e-5,
    )


def test_conv3_chain_wsplit_fusion_geometry():
    """The NewFusionBlock WS tail as one 3-stage chain: two split parts
    (rgb_feat ‖ depth_feat) through three W-phase-split kernels == the
    sequential full-width convs."""
    from nconv_tpu.ops.convops import conv_kernel_wsplit
    from nconv_tpu.ops.pallas_chain import conv_chain_pallas_aligned

    B, h, c, w, f = 1, 12, 8, 136, 16
    xr = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    xd = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 2 * c, f)) * 0.2,
                     jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, f, f)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, f, c)) * 0.2, jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    def split(t):
        v = t.reshape(B, h, c, w // 2, 2)
        return _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))

    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv_chain_pallas_aligned(
            [split(xr), split(xd)],
            [
                (conv_kernel_wsplit(k1, [c, c]), jnp.tile(b1, 2)),
                (conv_kernel_wsplit(k2, [f]), jnp.tile(b2, 2)),
                (conv_kernel_wsplit(k3, [f]), jnp.tile(b3, 2)),
            ],
            w=w // 2, tile_h=6,
        )
        ref, hr, wr = conv2d_pallas_bhcw_aligned(
            [_pad_lanes(xr), _pad_lanes(xd)], k1, b1, w=w, padding=1,
            relu=True,
        )
        ref, hr, wr = conv2d_pallas_bhcw_aligned(
            ref, k2, b2, w=wr, h=hr, padding=1, relu=True
        )
        ref, hr, wr = conv2d_pallas_bhcw_aligned(
            ref, k3, b3, w=wr, h=hr, padding=1, relu=True
        )
    ev, od = got[:, :ho, :c, :wo], got[:, :ho, c:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, c, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :hr, :, :wr]), atol=1e-4
    )


@pytest.mark.parametrize("budget_scale", [1, 4])
def test_aligned_conv_pack_width_parity(monkeypatch, budget_scale):
    """Row-group packing (2-way at the default scoped-VMEM budget, 4-way at
    the raised default — ops/vmem.py) must be numerically invisible."""
    from nconv_tpu.ops import vmem

    monkeypatch.setattr(vmem, "_BUDGET_SCALE", budget_scale)
    B, h, c, w = 1, 64, 8, 200  # th divisible by 4*g -> 4-way eligible
    x = rng.standard_normal((B, h, c, w)).astype(np.float32)
    k = rng.standard_normal((3, 3, c, 16)).astype(np.float32) * 0.2
    b = rng.standard_normal((16,)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            _pad_lanes(jnp.asarray(x)), jnp.asarray(k), jnp.asarray(b),
            w=w, h=h, padding=1, relu=True, tile_h=32,
        )
    ref = _xla_conv(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b),
                    ((1, 1), (1, 1)), relu=True)
    np.testing.assert_allclose(
        np.asarray(got[:, :ho, :, :wo]), np.asarray(ref), atol=1e-4
    )
    # pad lanes stay zero (aligned-form contract)
    assert not np.any(np.asarray(got[:, :, :, wo:]))


@pytest.mark.parametrize(
    "kw,vpad,B,relu", [(3, 0, 1, False), (3, 2, 2, True), (5, 1, 1, True), (5, 2, 2, False)]
)
def test_aligned_conv_wsplit_exact_geometry_sweep(kw, vpad, B, relu):
    """The exact ws mode (ws_schedule is generic over kw/pad) == full width
    across kernel sizes, vertical pads, batch, multi-part inputs and a
    multi-tile H with remainder (tile_h=8, h=20)."""
    h, w, f = 20, 144, 8
    cs = (8, 8)
    xs_full = [
        jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32) for c in cs
    ]
    k = jnp.asarray(
        rng.standard_normal((kw, kw, sum(cs), f)) * 0.2, jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((f,)), jnp.float32)

    def split(x):
        c = x.shape[2]
        v = x.reshape(B, h, c, w // 2, 2)
        return _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))

    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv2d_pallas_bhcw_aligned(
            [split(x) for x in xs_full], k, b,
            w=w // 2, padding=vpad, relu=relu, tile_h=8, wsplit_cs=cs,
        )
        ref, hr, wr = conv2d_pallas_bhcw_aligned(
            _pad_lanes(jnp.concatenate(xs_full, axis=2)), k, b,
            w=w, pad_top=vpad, pad_left=(kw - 1) // 2, relu=relu, tile_h=8,
        )
    assert (ho, 2 * wo) == (hr, wr)
    ev, od = got[:, :ho, :f, :wo], got[:, :ho, f:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, f, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :hr, :, :wr]), atol=1e-4
    )


def test_conv3_chain_ws_exact_matches_full_width():
    """3-stage exact-split chain (every intermediate as parity planes in
    VMEM) == the full-width 3-stage chain on interleaved input."""
    from nconv_tpu.ops.pallas_chain import conv_chain_pallas_aligned

    B, h, c, w = 1, 16, 8, 272
    x = jnp.asarray(rng.standard_normal((B, h, c, w)), jnp.float32)
    kbs = []
    cin = c
    for f in (16, 8, 8):
        kbs.append((
            jnp.asarray(rng.standard_normal((3, 3, cin, f)) * 0.2, jnp.float32),
            jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32),
        ))
        cin = f
    v = x.reshape(B, h, c, w // 2, 2)
    xs = _pad_lanes(jnp.concatenate([v[..., 0], v[..., 1]], axis=2))
    with pltpu.force_tpu_interpret_mode():
        got, ho, wo = conv_chain_pallas_aligned(
            xs, kbs, w=w // 2, tile_h=8, ws_cs=(c,)
        )
        ref, hr, wr = conv_chain_pallas_aligned(
            _pad_lanes(x), kbs, w=w, tile_h=8
        )
    f = kbs[-1][1].shape[0]
    assert (ho, 2 * wo) == (hr, wr)
    ev, od = got[:, :ho, :f, :wo], got[:, :ho, f:, :wo]
    merged = jnp.stack([ev, od], -1).reshape(B, ho, f, 2 * wo)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(ref[:, :hr, :, :wr]), atol=1e-4
    )
