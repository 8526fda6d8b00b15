"""RGB-guided depth refinement network (step 2).

TPU-native rebuild of ``SETP2_BP_TRAIN`` / ``SETP2_BP_EXPORT``
(`/root/reference/models/step2.py:22-126`): a frozen step-1 unguided
densifier feeding a 4-stage coarse-to-fine residual-refinement decoder
guided by an RGB encoder pyramid.

Design deltas vs the reference (deliberate, SURVEY.md §7):
  * two input streams are batch-concatenated through shared weights — the
    reference's (broken-as-committed) two-arg step-1 call is implemented as
    the intended concat semantics;
  * the export border zeroing (45 top/bottom rows, 20 left cols, in-place
    slice assignment at `models/step2.py:122-124`) is a static mask multiply
    — trace-safe and fusible;
  * step-1 freezing uses ``stop_gradient`` on its output plus optimizer
    param masking, instead of ``requires_grad=False``;
  * the reference TRAIN variant's dead ``rgb_encoder4`` (41,152 params that
    survive a double definition but are never called, `models/step2.py:46`)
    is not reproduced: trainable params here are 978,336 vs the reference's
    1,019,488 = 978,336 live + 41,152 dead. The checkpoint converter drops
    those weights on load.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import downscale_bilinear
from .layers import Basic2d, Basic2dTrans, Conv3x3Head, ConvBlock, RGBEncoder
from .unguided import NConvUNet

# Export-mode sensor border (reference models/step2.py:122-124).
BORDER_TOP = 45
BORDER_BOTTOM = 45
BORDER_LEFT = 20


def border_mask(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Static 0/1 mask zeroing the sensor border of the final depth."""
    m = np.ones((1, h, w, 1), np.float32)
    m[:, :BORDER_TOP] = 0.0
    m[:, h - BORDER_BOTTOM :] = 0.0
    m[:, :, :BORDER_LEFT] = 0.0
    return jnp.asarray(m, dtype)


class UpCat(nn.Module):
    """Transpose-conv x2 upsample of [depth ‖ fusion-features], concat with
    the skip RGB, conv (reference `models/step2.py:160-176`).

    Channel order note: at the reference call site the previous *depth* lands
    in the first slot of the 65-channel concat and the fusion features after
    it (`models/step2.py:250` passes (rgb, prev_fusion, prev_depth) into a
    forward whose parameter names are swapped) — preserved here for
    checkpoint compatibility.
    """

    features: int
    dtype: Any = None
    backend: str = "xla"
    fold_bn: bool = False
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, rgb_skip, fusion, depth, train: bool = False):
        if self.layout == "bhcw":
            from .aligned import AT, WS, granule8

            if isinstance(rgb_skip, WS):
                # phase-split full-res stage: the upsample's rx phase planes
                # ARE the split form (split_out — no d2s interleave), and the
                # conv runs on [fout ‖ rgb_skip] as split-channel parts.
                # (Deferring this conv into the consumer's chain kernel was
                # measured SLOWER full-graph — see docs/ARCHITECTURE.md.)
                # [depth ‖ fusion] feeds the upsample kernel as parts: the
                # 1-ch depth granule-pads and the kernel binds to the
                # physical layout (expand_kernel_channels) — no HBM concat
                assert isinstance(fusion, AT) and isinstance(depth, AT)
                fout = Basic2dTrans(
                    self.features, dtype=self.dtype, backend=self.backend,
                    fold_bn=self.fold_bn, layout=self.layout, split_out=True,
                    name="upf",
                )([granule8(depth), fusion], train)
                conv = Basic2d(
                    self.features, dtype=self.dtype, backend=self.backend,
                    fold_bn=self.fold_bn, layout=self.layout, name="conv"
                )
                return conv([fout, rgb_skip], train)
            if isinstance(fusion, AT):
                # aligned inference graph: BOTH concats feed multi-input
                # kernels directly — [depth ‖ fusion] via granule8 + the
                # physical kernel binding, [fout ‖ rgb_skip] natively
                fout = Basic2dTrans(
                    self.features, dtype=self.dtype, backend=self.backend,
                    fold_bn=self.fold_bn, layout=self.layout, name="upf"
                )([granule8(depth), fusion], train)
                conv = Basic2d(
                    self.features, dtype=self.dtype, backend=self.backend,
                    fold_bn=self.fold_bn, layout=self.layout, name="conv"
                )
                return conv([fout, rgb_skip], train)
            # plain-BHCW training graph: same blocks on (B, H, C, W) arrays;
            # the channel concats feed the differentiable multi-input kernel
            # as separate operands — no HBM concat materializes
            fout = Basic2dTrans(
                self.features, dtype=self.dtype, backend=self.backend,
                fold_bn=self.fold_bn, layout=self.layout, name="upf"
            )([depth, fusion], train)
            return Basic2d(
                self.features, dtype=self.dtype, backend=self.backend,
                fold_bn=self.fold_bn, layout=self.layout, name="conv"
            )([fout, rgb_skip], train)
        fout = Basic2dTrans(
            self.features, dtype=self.dtype, backend=self.backend,
            fold_bn=self.fold_bn, layout=self.layout, name="upf"
        )(jnp.concatenate([depth, fusion], -1), train)
        fout = Basic2d(
            self.features, dtype=self.dtype, backend=self.backend,
            fold_bn=self.fold_bn, layout=self.layout, name="conv"
        )(jnp.concatenate([fout, rgb_skip], -1), train)
        return fout


class NewFusionBlock(nn.Module):
    """RGB branch conv + depth branch conv, concat, 3 ConvBlocks
    (reference `models/step2.py:216-236`)."""

    rgb_channels: int
    features: int
    dtype: Any = None
    backend: str = "xla"
    # 'nhwc': NHWC in/out (pallas chains internally in BHCW with one edge
    # transpose per input/output); 'bhcw': operands already (B, H, C, W) —
    # no edge transposes at all (full-BHCW graph mode)
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, rgb, depth):
        chain_bhcw = self.backend == "pallas" or self.layout == "bhcw"
        conv_layout = "bhcw" if chain_bhcw else "nhwc"
        mk = lambda feats, name: ConvBlock(
            feats, dtype=self.dtype, backend=self.backend, layout=conv_layout,
            name=name,
        )
        from .aligned import AT, WS

        if self.layout == "bhcw" and isinstance(rgb, WS):
            # phase-split chain: same blocks on WS operands; the 1-channel
            # depth pair pads its physical channels to a sublane granule
            # (trailing zeros — the kernel zero-extends to match)
            d8 = (
                WS(
                    jnp.pad(
                        depth.arr,
                        ((0, 0), (0, 0), (0, 8 - depth.arr.shape[2]), (0, 0)),
                    ),
                    depth.h, depth.w, depth.c,
                )
                if depth.arr.shape[2] < 8 else depth
            )
            rgb_feat = mk(self.rgb_channels, "rgb_conv")(rgb)
            depth_feat = mk(self.rgb_channels, "depth_conv")(d8)
            # fuse_conv1 runs standalone (the rgb‖depth feature concat
            # feeds its multi-input kernel — no HBM concat); fuse_conv2 ->
            # fuse_conv3 as ONE two-stage kernel. A 3-stage chain was
            # measured SLOWER on hardware (+450 us full-graph: the deep
            # chain forces 8-row tiles whose th+2N input windows re-read
            # 1.75x the input and thrash VMEM) — see docs/ARCHITECTURE.md.
            fused = mk(self.rgb_channels, "fuse_conv1")(
                [rgb_feat, depth_feat]
            )
            from ..ops.convops import conv_kernel_wsplit
            from ..ops.pallas_chain import conv2_chain_pallas_aligned

            k2_, b2_ = mk(self.features, "fuse_conv2")(
                fused, params_only=True
            )
            k3_, b3_ = mk(self.features, "fuse_conv3")(
                self.features, params_only=True
            )
            dt = fused.arr.dtype
            if fused.c % 8 == 0 and self.features % 8 == 0:
                # exact-split chain: per-parity scratch planes at every
                # stage, half the executed tap MACs of the dense wsplit
                # transform (see ops/pallas_chain.py)
                out, ho, wo = conv2_chain_pallas_aligned(
                    fused.arr, k2_.astype(dt), b2_.astype(dt),
                    k3_.astype(dt), b3_.astype(dt),
                    w=fused.w // 2, h=fused.h, ws_cs=(fused.c,),
                )
            else:
                out, ho, wo = conv2_chain_pallas_aligned(
                    fused.arr,
                    conv_kernel_wsplit(k2_.astype(dt), [fused.c]),
                    jnp.tile(b2_.astype(dt), 2),
                    conv_kernel_wsplit(k3_.astype(dt), [self.features]),
                    jnp.tile(b3_.astype(dt), 2),
                    w=fused.w // 2, h=fused.h,
                )
            return WS(out, ho, fused.w, self.features)
        if self.layout == "bhcw" and isinstance(rgb, AT):
            # aligned-form chain: rgb/depth are ATs; the rgb‖depth feature
            # concat feeds the multi-input kernel directly (no HBM concat).
            # The 1-channel depth is granule-padded (Mosaic rejects
            # sub-tile channel DMA slabs).
            d8 = AT(
                jnp.pad(depth.arr, ((0, 0), (0, 0), (0, 8 - depth.channels),
                                    (0, 0)))
                if depth.channels < 8 else depth.arr,
                depth.h, depth.w, depth.logical_c,
            )
            rgb_feat = mk(self.rgb_channels, "rgb_conv")(rgb)
            depth_feat = mk(self.rgb_channels, "depth_conv")(d8)
            # fuse_conv1 standalone + fuse_conv2 -> fuse_conv3 as one
            # two-stage kernel (VMEM intermediate) — the 3-stage form
            # measured slower on hardware (tile-depth tradeoff; see the
            # WS branch note) — same param tree via params_only
            fused = mk(self.rgb_channels, "fuse_conv1")(
                [rgb_feat, depth_feat]
            )
            from ..ops.pallas_chain import conv2_chain_pallas_aligned

            k2_, b2_ = mk(self.features, "fuse_conv2")(
                fused, params_only=True
            )
            k3_, b3_ = mk(self.features, "fuse_conv3")(
                self.features, params_only=True
            )
            dt = fused.arr.dtype
            out, ho, wo = conv2_chain_pallas_aligned(
                fused.arr, k2_.astype(dt), b2_.astype(dt),
                k3_.astype(dt), b3_.astype(dt),
                w=fused.w, h=fused.h,
            )
            return AT(out, ho, wo)
        edges = chain_bhcw and self.layout == "nhwc"
        if edges:
            # NHWC edges: one transpose in per input, one out
            rgb = jnp.transpose(rgb, (0, 1, 3, 2))
            depth = jnp.transpose(depth, (0, 1, 3, 2))
        rgb_feat = mk(self.rgb_channels, "rgb_conv")(rgb)
        depth_feat = mk(self.rgb_channels, "depth_conv")(depth)
        fused = (
            # BHCW training chain: the rgb‖depth feature concat feeds the
            # differentiable multi-input kernel — no HBM concat
            [rgb_feat, depth_feat]
            if chain_bhcw
            else jnp.concatenate([rgb_feat, depth_feat], -1)
        )
        fused = mk(self.rgb_channels, "fuse_conv1")(fused)
        fused = mk(self.features, "fuse_conv2")(fused)
        fused = mk(self.features, "fuse_conv3")(fused)
        if edges:
            fused = jnp.transpose(fused, (0, 1, 3, 2))
        return fused


def _downscale_depth(
    x, factor: int, layout: str, wp: int | None = None, split: bool = False
):
    """Bilinear downscale of the step-1 dense map. NHWC in/out for 'nhwc'.
    For 'bhcw' the input is the NHWC dense map and the result is a 1-channel
    (B, H, 1, W) tensor — a FREE reshape of the NHWC result (one channel:
    same element order) — as an aligned-form AT when ``wp`` is given
    (inference graph) or a plain array otherwise (training graph).
    ``split=True`` returns the W-phase-split WS form (channels [ev|od], half
    width ``wp``) for the phase-split full-res stage — a tiny 1-channel
    deinterleave."""
    if layout == "bhcw":
        from .aligned import AT, WS, ensure_wp, to_aligned

        y = downscale_bilinear(x, factor)
        b, h, w, _ = y.shape
        if split:
            assert wp is not None and w % 2 == 0
            v = y.reshape(b, h, 1, w // 2, 2)
            arr = jnp.concatenate([v[..., 0], v[..., 1]], axis=2)
            if wp != w // 2:
                arr = jnp.pad(
                    arr, ((0, 0), (0, 0), (0, 0), (0, wp - w // 2))
                )
            return WS(arr, h, w, 1)
        y = y.reshape(b, h, 1, w)
        if wp is None:
            return y
        return ensure_wp(to_aligned(y), wp)
    return downscale_bilinear(x, factor)


class FusionResolution0(nn.Module):
    """Coarsest fusion stage (reference `models/step2.py:262-278`)."""

    features: int
    downsample_factor: int = 8
    dtype: Any = None
    backend: str = "xla"
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, rgb, dense_depth):
        from .aligned import AT

        aligned = self.layout == "bhcw" and isinstance(rgb, AT)
        depth = _downscale_depth(
            dense_depth, self.downsample_factor, self.layout,
            wp=rgb.wp if aligned else None,
        )
        fout = NewFusionBlock(
            self.features, self.features, dtype=self.dtype,
            backend=self.backend, layout=self.layout, name="fuse",
        )(rgb, depth)
        res = Conv3x3Head(
            dtype=self.dtype, backend=self.backend, layout=self.layout,
            name="conv",
        )(fout)
        if aligned:
            from .aligned import add

            return fout, add(depth, res)
        return fout, depth + res


class FusionResolutionBlock(nn.Module):
    """Per-scale refinement stage (reference `models/step2.py:238-259`)."""

    in_channels: int
    features: int
    downsample_factor: int
    dtype: Any = None
    backend: str = "xla"
    fold_bn: bool = False
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, rgb, dense_depth, prev_fusion, prev_depth, train: bool = False):
        from .aligned import AT, WS

        split = self.layout == "bhcw" and isinstance(rgb, WS)
        aligned = self.layout == "bhcw" and isinstance(rgb, AT)
        fout = UpCat(
            self.in_channels, dtype=self.dtype, backend=self.backend,
            fold_bn=self.fold_bn, layout=self.layout, name="upcat",
        )(rgb, prev_fusion, prev_depth, train)
        depth = _downscale_depth(
            dense_depth, self.downsample_factor, self.layout,
            wp=rgb.wp if (aligned or split) else None, split=split,
        )
        fout = NewFusionBlock(
            self.in_channels, self.features, dtype=self.dtype,
            backend=self.backend, layout=self.layout, name="fuse",
        )(fout, depth)
        res = Conv3x3Head(
            dtype=self.dtype, backend=self.backend, layout=self.layout,
            name="conv",
        )(fout)
        if split:
            from .aligned import ws_add

            return fout, ws_add(depth, res)
        if aligned:
            from .aligned import add

            return fout, add(depth, res)
        return fout, depth + res


class GuidedDepthNet(nn.Module):
    """The full two-stream guided network.

    ``__call__(rgb0, depth0, rgb1, depth1, train=...)`` returns
    ``(scales_stream0, scales_stream1)`` where each is the list of 4
    multi-scale depths (coarse -> fine) — reference TRAIN contract
    (`models/step2.py:77`). Use :meth:`export` for the deployment contract
    (final scale only, border-masked — `models/step2.py:105-126`).

    Inputs are NHWC: rgb ``(B, H, W, 3)``, depth ``(B, H, W, 1)``.
    """

    freeze_step1: bool = True
    # 'softplus' for training; 'identity' for inference from converted
    # reference checkpoints (reference eval applies no kernel transform).
    step1_pos_fn: str = "softplus"
    dtype: Any = None
    # Mixed precision: set dtype=bf16 with step1_dtype=f32 to run the RGB /
    # fusion feature convs in bf16 while the unguided densifier and every
    # depth tensor stay f32 (the per-scale residual adds promote bf16
    # residuals back to f32, so depth never loses mantissa).
    step1_dtype: Any = None  # None = follow `dtype`
    backend: str = "xla"  # 'pallas' = fused TPU kernels for stride-1 convs
    # Inference-only: BatchNorms folded into conv weights (see models.fold).
    # Construct variables with fold_batchnorm_variables(trained_variables).
    fold_bn: bool = False
    # Run the FROZEN step 1 on its fast aligned (pad-free) graph during
    # TRAINING too. The aligned kernels are non-differentiable, so this
    # requires the caller to hold step-1 params as constants under
    # jax.grad (differentiate only the trainable subtree — the Trainer
    # does this automatically); plain jax.grad over the full param tree
    # would trace a JVP into step 1 and fail. 1.4 ms/step at 480x640.
    step1_aligned: bool = False

    def setup(self):
        lay0 = "bhcw" if (self.backend == "pallas" and self.fold_bn) else "nhwc"
        if self.step1_aligned:
            assert self.backend == "pallas" and self.freeze_step1, (
                "step1_aligned needs the pallas backend and a frozen step 1"
            )
        self.step1 = NConvUNet(
            pos_fn=self.step1_pos_fn,
            dtype=self.step1_dtype if self.step1_dtype is not None else self.dtype,
            backend=self.backend,
            # the aligned (pad-free) graph bypasses the custom-VJP entry
            # points: always on for folded inference; opt-in for training
            # via step1_aligned (see above — even a frozen step 1 under
            # plain jax.grad would need a JVP rule, because param tangents
            # flow INTO the submodule before stop_gradient cuts them)
            aligned=lay0 == "bhcw" or self.step1_aligned,
        )
        # Effective encoder config — the reference defines the stack twice
        # and the second block wins: 3->32 s1, 32->64 s2, 64->64 s2, 64->64 s2
        # (models/step2.py:48-51; SURVEY.md §2.3).
        be = self.backend
        fb = self.fold_bn
        # Full-BHCW graph: with pallas kernels every block runs natively in
        # (B, H, C, W) — the only layout conversions left are one 3-channel
        # RGB transpose at the input and free 1-channel reshapes at the
        # step-1/depth boundaries. With folded BN (inference) the blocks
        # additionally use the aligned (pad-free) AT form; for training they
        # run on plain BHCW arrays through the custom-VJP kernels, so the
        # per-block NHWC<->BHCW transposes of the round-2 training graph are
        # gone (round-3 verdict item 4).
        lay = "bhcw" if be == "pallas" else "nhwc"
        self.layout = lay
        mk_enc = lambda feats, stride: RGBEncoder(
            feats, stride, dtype=self.dtype, backend=be, fold_bn=fb, layout=lay
        )
        self.rgb_encoder0 = mk_enc(32, 1)
        self.rgb_encoder1 = mk_enc(64, 2)
        self.rgb_encoder2 = mk_enc(64, 2)
        self.rgb_encoder3 = mk_enc(64, 2)

        self.fuse0 = FusionResolution0(
            64, 8, dtype=self.dtype, backend=be, layout=lay)
        self.fuse1 = FusionResolutionBlock(
            64, 64, 4, dtype=self.dtype, backend=be, fold_bn=fb, layout=lay)
        self.fuse2 = FusionResolutionBlock(
            64, 32, 2, dtype=self.dtype, backend=be, fold_bn=fb, layout=lay)
        self.fuse3 = FusionResolutionBlock(
            32, 32, 1, dtype=self.dtype, backend=be, fold_bn=fb, layout=lay)

    def _backbone(self, rgb0, depth0, rgb1, depth1, train: bool):
        bhcw = self.layout == "bhcw"
        # rgb1/depth1 may be None: single-stream mode (used for training —
        # see __call__). Otherwise the two streams batch-concatenate through
        # the shared weights (reference models/step2.py:60-77).
        if depth1 is None:
            depth = depth0
            rgb = rgb0
        else:
            depth = jnp.concatenate([depth0, depth1], axis=0)
            rgb = jnp.concatenate([rgb0, rgb1], axis=0)
        dense, _ = self.step1(depth)
        if self.freeze_step1:
            dense = jax.lax.stop_gradient(dense)
        if bhcw and self.fold_bn:
            from .aligned import WS, from_aligned, wmerge, wsplit_entry

            # the W-phase split happens AT THE WIRE (3-channel u8 RGB,
            # ~2.6 MB) instead of on the 32-channel encoder output (58 MB):
            # encoder0 runs split end-to-end and its output IS the shared
            # r0 split serving encoder1's s2d (py = cheap row slices) and
            # the phase-split fuse3 skip — no full-width lane deinterleave
            # anywhere in the graph
            rgb_ws = wsplit_entry(jnp.transpose(rgb, (0, 1, 3, 2)), 3)
            r0s = self.rgb_encoder0(rgb_ws, train)  # H, WS(c=32)
            r1 = self.rgb_encoder1(r0s, train)      # H/2
            r2 = self.rgb_encoder2(r1, train)       # H/4
            r3 = self.rgb_encoder3(r2, train)       # H/8

            # dense stays NHWC: the per-stage bilinear downscales read it
            # compactly and re-align their small 1-channel results
            f0, d0 = self.fuse0(r3, dense)
            f1, d1 = self.fuse1(r2, dense, f0, d0, train)
            f2, d2 = self.fuse2(r1, dense, f1, d1, train)
            # fuse3 runs entirely W-phase-split: its upsample's rx phase
            # planes stay split (no d2s), every conv uses the wsplit kernel
            # transform, and only the 1-channel d3 merges at the end
            _, d3 = self.fuse3(r0s, dense, f2, d2, train)
            to_nhwc = lambda d: from_aligned(
                wmerge(d) if isinstance(d, WS) else d
            ).reshape(d.arr.shape[0], d.h, d.w, 1)
            return tuple(to_nhwc(d) for d in (d0, d1, d2, d3))
        if bhcw:
            # plain-BHCW training graph: one 3-channel transpose at entry;
            # every block (incl. stride-2 encoders and transpose convs) runs
            # the differentiable BHCW kernels; the four 1-channel depth
            # outputs convert back to NHWC as FREE reshapes
            rgb_b = jnp.transpose(rgb, (0, 1, 3, 2))
            r0 = self.rgb_encoder0(rgb_b, train)   # H
            r1 = self.rgb_encoder1(r0, train)      # H/2
            r2 = self.rgb_encoder2(r1, train)      # H/4
            r3 = self.rgb_encoder3(r2, train)      # H/8

            f0, d0 = self.fuse0(r3, dense)
            f1, d1 = self.fuse1(r2, dense, f0, d0, train)
            f2, d2 = self.fuse2(r1, dense, f1, d1, train)
            _, d3 = self.fuse3(r0, dense, f2, d2, train)
            to_nhwc = lambda d: d.reshape(d.shape[0], d.shape[1], d.shape[3], 1)
            return tuple(to_nhwc(d) for d in (d0, d1, d2, d3))
        r0 = self.rgb_encoder0(rgb, train)   # H
        r1 = self.rgb_encoder1(r0, train)    # H/2
        r2 = self.rgb_encoder2(r1, train)    # H/4
        r3 = self.rgb_encoder3(r2, train)    # H/8

        f0, d0 = self.fuse0(r3, dense)
        f1, d1 = self.fuse1(r2, dense, f0, d0, train)
        f2, d2 = self.fuse2(r1, dense, f1, d1, train)
        _, d3 = self.fuse3(r0, dense, f2, d2, train)
        return d0, d1, d2, d3

    def __call__(self, rgb0, depth0, rgb1=None, depth1=None, train: bool = False):
        """Two-stream train contract; pass ``rgb1=depth1=None`` for the
        single-stream form, which returns ``(scales_stream0, None)``.

        The reference's training loop feeds the SAME (rgb, depth) into both
        streams (`train_step2.py:62`) and its loss reads stream 0 only, so
        the duplicated half of the batch is a bit-for-bit copy. Dropping it
        is exact, not an approximation: with the batch duplicated,
        BatchNorm's batch mean and (biased) variance over [x; x] equal those
        over x, so ``stream0`` — and therefore the loss, the gradients, and
        the batch-stats updates — is the same function of (x, params) in
        both forms. Training through the single-stream path halves the
        backbone compute of every reference-equivalent train/val step.
        """
        b = rgb0.shape[0]
        d0, d1, d2, d3 = self._backbone(rgb0, depth0, rgb1, depth1, train)
        if depth1 is None:
            return [d0, d1, d2, d3], None
        stream0 = [d[:b] for d in (d0, d1, d2, d3)]
        stream1 = [d[b:] for d in (d0, d1, d2, d3)]
        return stream0, stream1

    def export(self, rgb0, depth0, rgb1, depth1):
        """Deployment forward: final-scale depth per stream, border-masked."""
        b = rgb0.shape[0]
        *_, d3 = self._backbone(rgb0, depth0, rgb1, depth1, train=False)
        h, w = d3.shape[1:3]
        d3 = d3 * border_mask(h, w, d3.dtype)
        return d3[:b], d3[b:]
