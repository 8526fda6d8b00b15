"""Unguided sparse-to-dense depth network (step 1).

TPU-native rebuild of the reference ``DNET``/``SETP1_NCONV``
(`/root/reference/models/step1.py:15-94`): a 3-level confidence-carrying
encoder–decoder of normalized convolutions at 8 channels.

Geometry note: the reference hardcodes its output crop to 480x640
(`step1.py:94`). That crop exists because nconv6 runs 3x3/pad-0 (shrinks H,W
by 2) and nconv7 is 1x1 accidentally built with pad=2 (grows by 4), netting
H+2 x W+2; ``[1:H+1, 1:W+1]`` recovers the input size with a 1-px bias-only
border. This implementation reproduces that arithmetic *generically*, so any
resolution with H, W divisible by 8 works (NYU 480x640, KITTI 352x1216, ...).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import max_pool_pair, resize_nearest
from .nconv_layers import NConv2d

# Confidence seed threshold: c0 = (S > 0.01) (reference step1.py:53).
CONF_THRESHOLD = 0.01


class NConvUNet(nn.Module):
    """Confidence-carrying NConv encoder–decoder (reference ``DNET``).

    Input  ``(B, H, W, 1)`` sparse depth; H, W divisible by 8.
    Output ``(dense_depth, confidence)`` both ``(B, H, W, 1)``.

    The reference returns only the depth; confidence is returned here too
    (callers that want reference behaviour just drop it).
    """

    num_channels: int = 8
    pos_fn: str = "softplus"
    dtype: Any = None
    backend: str = "xla"  # 'pallas' = fused (B,H,C,W) kernels for the hot path
    # aligned-form inference graph (pallas only): every inter-layer tensor
    # is (B, H, C, Wp) with zeros outside the data region, and NO XLA pad is
    # issued anywhere (kernels synthesize halos; see models/aligned.py).
    # Inference-only: this path bypasses the custom-VJP entry points.
    aligned: bool = False

    @nn.compact
    def __call__(self, sparse):
        h_, w_ = sparse.shape[1:3]
        if (h_ % 8 or w_ % 8) and self.backend == "pallas":
            # the XLA path is shape-agnostic (floor-mode pools + resize-to-
            # skip-size decoder); only the fused (B,H,C,W) kernels assume the
            # clean /8 pyramid geometry
            raise ValueError(
                f"NConvUNet(backend='pallas') needs H and W divisible by 8 "
                f"for its 3-level pyramid; got {h_}x{w_} — pad or crop the "
                f"input (reference geometry: NYU 480x640, KITTI 352x1216), "
                f"or use backend='xla' for arbitrary sizes"
            )
        c = self.num_channels
        # With the pallas backend the whole body runs in the kernels' native
        # (B, H, C, W) layout: the 1-channel input/output boundary makes the
        # NHWC<->BHCW conversion a free reshape ((B,H,W,1) and (B,H,1,W) have
        # identical element order), and the 12 nconv layers plus every pool/
        # resize/concat between them stay transpose-free. NHWC would instead
        # pad the 8 channels into the 128-wide lane dim (16x inflated HBM
        # tensors on each elementwise op between kernels).
        bhcw = self.backend == "pallas"
        layout = "bhcw" if bhcw else "nhwc"
        cat_ax = 2 if bhcw else -1
        mk = lambda feats, ks, pad, init="p", name=None: NConv2d(
            feats, ks, pad, pos_fn=self.pos_fn, init_method=init,
            dtype=self.dtype, backend=self.backend, layout=layout, name=name,
        )

        b = sparse.shape[0]
        h, w = sparse.shape[1:3]
        if bhcw and self.aligned:
            return self._aligned_graph(sparse, mk, b, h, w)
        x0 = sparse.reshape(b, h, 1, w) if bhcw else sparse
        c0 = (x0 > CONF_THRESHOLD).astype(sparse.dtype)

        def size_of(t):
            return (t.shape[1], t.shape[3]) if bhcw else t.shape[1:3]

        # Full-resolution encoder
        x1, c1 = mk(c, 5, 2, name="nconv1")(x0, c0)
        x1, c1 = mk(c, 5, 2, name="nconv2")(x1, c1)

        # Downsample pyramid: joint max-pool then 5x5 nconv per level
        x1_ds, c1_ds = max_pool_pair(x1, c1, layout=layout)
        x2_ds, c2_ds = mk(c, 5, 2, name="nconv_down1")(x1_ds, c1_ds)

        x2_dss, c2_dss = max_pool_pair(x2_ds, c2_ds, layout=layout)
        x3_ds, c3_ds = mk(c, 5, 2, name="nconv_down2")(x2_dss, c2_dss)

        x3_dss, c3_dss = max_pool_pair(x3_ds, c3_ds, layout=layout)
        x4_ds, c4_ds = mk(c, 5, 2, name="nconv_down3")(x3_dss, c3_dss)

        # Decoder: nearest upsample to the skip's size, concat (x, c) skips,
        # 3x3 nconv (pads 1, 1, 0 — the pad-0 stage shrinks by 2)
        size3 = size_of(x3_ds)
        x4 = resize_nearest(x4_ds, size3, layout=layout)
        c4 = resize_nearest(c4_ds, size3, layout=layout)
        x34, c34 = mk(c, 3, 1, name="nconv4")(
            jnp.concatenate([x3_ds, x4], cat_ax),
            jnp.concatenate([c3_ds, c4], cat_ax),
        )

        size2 = size_of(x2_ds)
        x34u = resize_nearest(x34, size2, layout=layout)
        c34u = resize_nearest(c34, size2, layout=layout)
        x23, c23 = mk(c, 3, 1, name="nconv5")(
            jnp.concatenate([x2_ds, x34u], cat_ax),
            jnp.concatenate([c2_ds, c34u], cat_ax),
        )

        size1 = (h, w)
        x23u = resize_nearest(x23, size1, layout=layout)
        c23u = resize_nearest(c23, size1, layout=layout)
        xout, cout = mk(c, 3, 0, name="nconv6")(
            jnp.concatenate([x23u, x1], cat_ax),
            jnp.concatenate([c23u, c1], cat_ax),
        )  # (H-2, W-2)

        # Final 1x1 fusion with pad 2 (reference's accidental-but-load-bearing
        # default padding, step1.py:49,98) -> (H+2, W+2)
        xout, cout = mk(1, 1, 2, init="k", name="nconv7")(xout, cout)

        # Center-recover the input size: [1:H+1, 1:W+1]
        if bhcw:
            xout = xout[:, 1 : h + 1, :, 1 : w + 1].reshape(b, h, w, 1)
            cout = cout[:, 1 : h + 1, :, 1 : w + 1].reshape(b, h, w, 1)
            return xout, cout
        return xout[:, 1 : h + 1, 1 : w + 1, :], cout[:, 1 : h + 1, 1 : w + 1, :]

    def _aligned_graph(self, sparse, mk, b: int, h: int, w: int):
        """Aligned-form body: identical math and param tree to the bhcw
        path, but every inter-layer tensor is aligned-form and the graph
        contains exactly ONE pad (the 1-channel entry) and one crop.

        The full-resolution level runs W-PHASE-SPLIT (WS: channel blocks
        [even|odd] at half width): the entry split is a tiny 1-channel
        deinterleave, nconv1/2/6/7 use wsplit-transformed kernels, the
        first pool's 2x2 max is pure elementwise on the split form, and
        nconv6's decoder upsample feeds the HALF-width source as a 'shared'
        kernel part (W-repeat folded into the taps) — so no full-width lane
        interleave or repeat ever materializes; only the 1-channel output
        merges."""
        from .aligned import AT, Shared, Up2, WS, _round_up, realign, wmerge

        c = self.num_channels
        # entry: 1-ch split, channels padded to the granule (Mosaic DMA
        # slabs on the sublane dim must be tile-aligned)
        wh = w // 2
        whp = _round_up(wh, 128)
        v = sparse.reshape(b, h, 1, wh, 2)
        arr = jnp.concatenate([v[..., 0], v[..., 1]], axis=2)
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, 2), (0, whp - wh)))
        x0 = WS(arr, h, w, 1)
        c0 = WS((arr > CONF_THRESHOLD).astype(sparse.dtype), h, w, 1)

        x1, c1 = mk(c, 5, 2, name="nconv1")(x0, c0)
        # nconv2 ALSO emits the 2x2-pooled pair from its kernel epilogue
        # (row-pair + channel-block max in VMEM): the level-0 pool's
        # ~150 MB of XLA reshape/slice/max traffic never happens
        (x1, c1), (x1d, c1d) = mk(c, 5, 2, name="nconv2")(
            x1, c1, pool_out=True
        )

        def pool(x, cc):
            xp, cp = max_pool_pair(x.arr, cc.arr, layout="bhcw")
            return (
                realign(AT(xp, x.h // 2, x.w // 2)),
                realign(AT(cp, x.h // 2, x.w // 2)),
            )

        x2, c2 = mk(c, 5, 2, name="nconv_down1")(x1d, c1d)
        x2d, c2d = pool(x2, c2)
        x3, c3 = mk(c, 5, 2, name="nconv_down2")(x2d, c2d)
        x3d, c3d = pool(x3, c3)
        x4, c4 = mk(c, 5, 2, name="nconv_down3")(x3d, c3d)

        # decoder concats feed the multi-input kernel as separate parts —
        # no (x ‖ skip) concat ever materializes in HBM; the 2x nearest
        # upsamples feed their HALF-res sources directly (Up2: rows
        # duplicate in VMEM, lanes spread via a constant MXU matmul) — no
        # repeat in HBM either
        x34, c34 = mk(c, 3, 1, name="nconv4")(
            [x3, Up2(x4)], [c3, Up2(c4)]
        )
        x23, c23 = mk(c, 3, 1, name="nconv5")(
            [x2, Up2(x34)], [c2, Up2(c34)]
        )
        # the decoder upsample feeds its HALF-width, HALF-row source
        # directly: the W repeat folds into the kernel taps and the row
        # repeat happens in VMEM scratch (row_shared) — neither repeat
        # ever materializes in HBM
        xout, cout = mk(c, 3, 0, name="nconv6")(
            [Shared(x23), x1], [Shared(c23), c1]
        )  # (H-2, W-2)
        xout, cout = mk(1, 1, 2, init="k", name="nconv7")(xout, cout)

        # Center-recover the input size: [1:H+1, 1:W+1] — merge the tiny
        # 1-channel split outputs, then one small crop
        xa, ca = wmerge(xout), wmerge(cout)
        dense = xa.arr[:, 1 : h + 1, :, 1 : w + 1].reshape(b, h, w, 1)
        conf = ca.arr[:, 1 : h + 1, :, 1 : w + 1].reshape(b, h, w, 1)
        return dense, conf


class Step1Unguided(nn.Module):
    """Thin wrapper mirroring reference ``SETP1_NCONV`` (step1.py:15-27),
    with the *intended* two-stream semantics: multiple sparse-depth streams
    are batch-concatenated through one shared network (SURVEY.md §0)."""

    num_channels: int = 8
    pos_fn: str = "softplus"
    dtype: Any = None

    def setup(self):
        self.d_net = NConvUNet(self.num_channels, self.pos_fn, self.dtype)

    def __call__(self, *depths):
        if len(depths) == 1:
            out, _ = self.d_net(depths[0])
            return out
        stacked = jnp.concatenate(depths, axis=0)
        out, _ = self.d_net(stacked)
        return out  # batch-stacked: stream i occupies rows [i*B:(i+1)*B]
