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
