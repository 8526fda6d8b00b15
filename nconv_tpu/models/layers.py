"""Common NN building blocks (flax.linen, NHWC) for the guided network.

Re-designs of the reference's torch blocks (`/root/reference/models/step2.py`)
with torch-compatible initialization so training trajectories start from the
same distribution. All modules take a ``train`` flag for BatchNorm and carry
an optional compute ``dtype`` (bf16 inference mode).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv2d, conv_transpose2d


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
    fan_in = kh*kw*cin (HWIO shape)."""
    kh, kw, cin, _ = shape
    bound = 1.0 / np.sqrt(kh * kw * cin)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """Plain conv (NHWC/HWIO) with torch-default init and explicit padding.

    ``backend='pallas'`` routes stride-1 calls through the fused (B,H,C,W)
    row-matmul kernel (``ops.pallas_conv``), with optional fused ReLU.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Any = None
    backend: str = "xla"
    fuse_relu: bool = False  # pallas path only; xla path applies relu after
    # 'nhwc' (default) or 'bhcw': with 'bhcw' the call takes and returns
    # (B, H, C, W) so chained pallas convs skip per-layer transposes
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        from .aligned import AT, WS

        # x may be an AT, a WS (W-phase-split), a list of ATs or WSs (logical
        # channel concat fed to the multi-input kernel — no HBM concat), a
        # plain array, or (params_only) a bare input-channel count
        if params_only and isinstance(x, int):
            parts, split, aligned, cin = None, False, False, x
        else:
            parts = (
                [x] if isinstance(x, (AT, WS)) else
                list(x) if isinstance(x, (list, tuple)) else None
            )
            split = parts is not None and isinstance(parts[0], WS)
            plain_cat = parts is not None and not isinstance(
                parts[0], (AT, WS)
            )  # plain (B,H,C,W) arrays: differentiable multi-input conv
            aligned = parts is not None and not split and not plain_cat
            if split:
                assert all(isinstance(p, WS) for p in parts)
                cin = sum(p.c for p in parts)  # full-W logical channels
            elif aligned:
                cin = sum(p.logical_c for p in parts)
            elif plain_cat:
                assert self.layout == "bhcw"
                cin = sum(p.shape[2] for p in parts)
            else:
                cin = x.shape[-1] if self.layout == "nhwc" else x.shape[2]
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (k, k, cin, self.features)
        )
        bias = (
            self.param("bias", torch_conv_bias_init(k * k * cin), (self.features,))
            if self.use_bias
            else None
        )
        if params_only:
            # parameter access for fused multi-conv paths (e.g. the
            # RGBEncoder block kernel) — keeps the param tree identical to
            # the unfused form
            return kernel, bias
        if split:
            # W-phase-split chain (full-res fusion stage): same params, the
            # kernel transformed onto [even|odd] channel-block operands at
            # half width — the lane interleave never materializes
            from ..ops.convops import conv_kernel_wsplit
            from ..ops.pallas_conv import conv2d_pallas_bhcw_aligned

            assert self.backend == "pallas" and self.stride == 1
            assert all(
                (p.w, p.h, p.wp) == (parts[0].w, parts[0].h, parts[0].wp)
                for p in parts
            ), [(p.arr.shape, p.h, p.w) for p in parts]
            dtype = self.dtype or parts[0].arr.dtype
            n = min(p.arr.shape[1] for p in parts)
            xin = [p.arr[:, :n].astype(dtype) for p in parts]
            if (
                all(p.c % 8 == 0 for p in parts)
                and k % 2 == 1 and self.padding == (k - 1) // 2
            ):
                # exact-FLOPs split kernel (per-parity scratch planes):
                # executes HALF the tap MACs of the dense wsplit form —
                # the fusion stages' 32/64-channel convs are MXU-tile
                # bound, where the dense form's zero parity-blocks cost
                # real time (the 8-channel nconvs are not; they keep the
                # dense form via the granule gate here)
                out, ho, _ = conv2d_pallas_bhcw_aligned(
                    xin, kernel.astype(dtype), bias,
                    w=parts[0].w // 2, h=parts[0].h, padding=self.padding,
                    relu=self.fuse_relu, wsplit_cs=[p.c for p in parts],
                )
                return WS(out, ho, parts[0].w, self.features)
            ksplit = conv_kernel_wsplit(
                kernel.astype(dtype), [p.c for p in parts]
            )
            out, ho, _ = conv2d_pallas_bhcw_aligned(
                xin, ksplit,
                None if bias is None else jnp.tile(bias, 2),
                w=parts[0].w // 2, h=parts[0].h, padding=self.padding,
                relu=self.fuse_relu,
            )
            return WS(out, ho, parts[0].w, self.features)
        if aligned:
            # aligned-form inference chain: no XLA pads anywhere (see
            # ops/pallas_conv.py); halo synthesized in the kernel
            from .aligned import _match_rows
            from ..ops.pallas_conv import conv2d_pallas_bhcw_aligned

            assert self.backend == "pallas" and self.stride == 1
            parts = _match_rows(parts)
            is_int = jnp.issubdtype(parts[0].arr.dtype, jnp.integer)
            dtype = self.dtype or (jnp.float32 if is_int else parts[0].arr.dtype)
            xin = [
                p.arr if is_int else p.arr.astype(dtype) for p in parts
            ]
            out, ho, wo = conv2d_pallas_bhcw_aligned(
                xin, kernel.astype(dtype),
                None if bias is None else bias,
                w=parts[0].w, h=parts[0].h, padding=self.padding,
                relu=self.fuse_relu,
            )
            return AT(out, ho, wo)
        if plain_cat:
            # plain-BHCW training graph: conv over a logical channel concat
            # without the HBM concat — differentiable (custom VJP), per-part
            # DMA slabs (ops.pallas_conv.conv2d_pallas_bhcw_cat)
            from ..ops.pallas_conv import conv2d_pallas_bhcw_cat

            assert self.backend == "pallas" and self.stride == 1
            dtype = self.dtype or parts[0].dtype
            return conv2d_pallas_bhcw_cat(
                [p.astype(dtype) for p in parts],
                kernel.astype(dtype),
                None if bias is None else bias,
                padding=self.padding,
                relu=self.fuse_relu,
            )
        is_int = jnp.issubdtype(x.dtype, jnp.integer)
        dtype = self.dtype or (jnp.float32 if is_int else x.dtype)
        # integer (wire-format) inputs pass straight into the pallas kernels,
        # which decode them in VMEM — no XLA-level float materialization
        xin = x if (is_int and self.backend == "pallas") else x.astype(dtype)
        if self.layout == "bhcw":
            from ..ops.pallas_conv import conv2d_pallas_bhcw

            assert self.backend == "pallas" and self.stride == 1
            return conv2d_pallas_bhcw(
                xin,
                kernel.astype(dtype),
                None if bias is None else bias,
                padding=self.padding,
                relu=self.fuse_relu,
            )
        if self.backend == "pallas" and self.stride == 1:
            from ..ops.pallas_conv import conv2d_pallas

            out = conv2d_pallas(
                xin,
                kernel.astype(dtype),
                None if bias is None else bias,
                padding=self.padding,
                relu=self.fuse_relu,
            )
            return out
        out = conv2d(
            xin.astype(dtype),
            kernel.astype(dtype),
            None if bias is None else bias,
            stride=self.stride,
            padding=self.padding,
        )
        if self.fuse_relu:
            out = nn.relu(out)
        return out


class ConvTranspose(nn.Module):
    """4x4 stride-2 pad-1 transpose conv (the decoder upsampler,
    reference `models/step2.py:205`). ``method='phased'`` decomposes it into
    four 2x2 stride-1 convs + interleave — much faster than XLA's
    input-dilated lowering on TPU."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Any = None
    method: str = "dilated"

    @nn.compact
    def __call__(self, x, *, params_only: bool = False, layout: str = "nhwc"):
        from .aligned import AT

        if isinstance(x, AT):
            cin = x.logical_c
        elif isinstance(x, (list, tuple)):
            cin = sum(
                p.logical_c if isinstance(p, AT) else p.shape[2] for p in x
            )
        else:
            cin = x.shape[-1] if layout == "nhwc" else x.shape[2]
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (k, k, cin, self.features)
        )
        bias = (
            self.param("bias", torch_conv_bias_init(k * k * cin), (self.features,))
            if self.use_bias
            else None
        )
        if params_only:
            return kernel, bias
        dtype = self.dtype or x.dtype
        return conv_transpose2d(
            x.astype(dtype),
            kernel.astype(dtype),
            None if bias is None else bias,
            stride=self.stride,
            padding=self.padding,
            method=self.method,
        )


class _ChannelBN(nn.Module):
    """BatchNorm core with f32 statistics but INPUT-dtype elementwise math.

    flax's ``nn.BatchNorm`` promotes the whole tensor to f32
    (``force_float32_reductions``), normalizes at f32, and casts back.
    Here only the per-channel REDUCTIONS accumulate in f32 (mean /
    mean-of-squares, exactly flax's formulation, upcast fused into the
    reduce); the per-channel scalars are then cast to ``x.dtype`` so the
    full-res ``(x - mean) * (rsqrt(var+eps)*scale) + bias`` stays in the
    input dtype. For f32 inputs every cast is a no-op and the op sequence
    is flax's exactly, so f32 graphs are bit-identical (pinned in
    tests/test_models.py::test_batchnorm_bit_exact_vs_flax). On the bf16
    480x640 guided train step this removes the full-res f32 BN
    materializations from the compiled graph (456 -> 392 MB of HLO
    copies); device time is neutral (XLA overlapped them) — the measured
    training-copy hotspots are the s2d/d2s lane interleaves, see
    ARCHITECTURE.md.

    Param/stat names and shapes match ``nn.BatchNorm`` (params
    ``scale``/``bias`` (C,) f32, batch_stats ``mean``/``var`` (C,) f32);
    callers pass ``name='BatchNorm_0'`` for checkpoint compatibility."""

    axis: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, *, use_running_average: bool):
        feat = x.shape[self.axis]
        axis = self.axis % x.ndim
        red = tuple(i for i in range(x.ndim) if i != axis)
        bshape = [1] * x.ndim
        bshape[axis] = feat

        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # flax _compute_stats: E[x], E[x^2]; var = E[x^2] - E[x]^2.
            # Accumulation dtype promotes to AT LEAST f32 (f64 inputs keep
            # f64 — the f64 exactness tests depend on it); the dtype= form
            # fuses the upcast into the reduce — a shared x.astype(f32)
            # operand feeding both reductions would materialize a full-res
            # f32 copy per BN site. The square runs in x.dtype (bf16:
            # ~0.4% elementwise rounding on E[x^2], inside the bf16
            # feature path's own noise; f32/f64: exact, so those graphs
            # stay bit-identical to flax).
            acc = jnp.promote_types(x.dtype, jnp.float32)
            mean = x.mean(red, dtype=acc)
            mean2 = (x * x).mean(red, dtype=acc)
            var = mean2 - mean * mean
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        dt = x.dtype
        return (x - mean.astype(dt).reshape(bshape)) * mul.astype(dt).reshape(
            bshape
        ) + bias.astype(dt).reshape(bshape)


class BatchNorm(nn.Module):
    """torch-default BatchNorm2d (eps=1e-5, momentum 0.1 -> EMA decay 0.9).

    ``layout='bhcw'`` normalizes axis 2 (the channel/sublane axis of the
    kernels' native layout) — param and stat shapes stay (C,), so BHCW and
    NHWC training graphs share checkpoints."""

    dtype: Any = None
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, train: bool):
        return _ChannelBN(
            axis=2 if self.layout == "bhcw" else -1,
            name="BatchNorm_0",
        )(x, use_running_average=not train)


class ConvBlock(nn.Module):
    """conv3x3(bias) + ReLU, no norm (reference `models/step2.py:290-297`).
    With the pallas backend the ReLU is fused into the conv's row store."""

    features: int
    dtype: Any = None
    backend: str = "xla"
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, *, params_only: bool = False):
        return Conv(
            self.features, dtype=self.dtype, backend=self.backend,
            fuse_relu=True, layout=self.layout,
        )(x, params_only=params_only)


class Basic2d(nn.Module):
    """conv3x3 [+BN] + ReLU; bias iff no norm (reference
    `models/step2.py:178-195`).

    ``fold_bn=True`` builds the inference-folded form — conv with bias and
    fused ReLU, no BN module — fed by :func:`models.fold.fold_batchnorm_variables`.
    """

    features: int
    use_norm: bool = True
    dtype: Any = None
    backend: str = "xla"
    fold_bn: bool = False
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, train: bool = False, *, params_only: bool = False):
        if self.fold_bn and self.use_norm:
            return Conv(
                self.features, use_bias=True, dtype=self.dtype,
                backend=self.backend, fuse_relu=True, layout=self.layout,
            )(x, params_only=params_only)
        x = Conv(
            self.features, use_bias=not self.use_norm, dtype=self.dtype,
            backend=self.backend, layout=self.layout,
        )(x)
        if self.use_norm:
            x = BatchNorm(dtype=self.dtype, layout=self.layout)(x, train)
        return nn.relu(x)


class Basic2dTrans(nn.Module):
    """ConvTranspose 4x4 s2 p1 + BN + ReLU (reference
    `models/step2.py:197-214`)."""

    features: int
    use_norm: bool = True
    dtype: Any = None
    backend: str = "xla"
    fold_bn: bool = False
    layout: str = "nhwc"
    # aligned path: return the upsample as a W-phase-split WS (the rx phase
    # planes ARE the split form — the d2s lane interleave never runs)
    split_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.layout == "bhcw":
            from .aligned import AT

            if isinstance(x, AT) or (
                isinstance(x, (list, tuple)) and isinstance(x[0], AT)
            ):
                return self._phased_bhcw(x)
            return self._train_phased_bhcw(x, train)
        # note: the 'phased' decomposition measured neutral at the XLA level
        # (16.2 vs 15.9 ms full-graph) — kept available on ConvTranspose for
        # a future pallas-phase variant, default stays 'dilated'
        if self.fold_bn and self.use_norm:
            x = ConvTranspose(self.features, use_bias=True, dtype=self.dtype)(x)
            return nn.relu(x)
        x = ConvTranspose(
            self.features, use_bias=not self.use_norm, dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = BatchNorm(dtype=self.dtype)(x, train)
        return nn.relu(x)

    def _train_phased_bhcw(self, x, train: bool):
        """Differentiable phased transpose conv on plain (B,H,C,W): the 4x4
        s2 p1 transpose conv as the phase-aware custom-VJP kernel
        (ops/pallas_s2.py) whose d2s epilogue emits the full-res output
        interleaved from the MXU — the XLA depth-to-space (and its reverse
        in the backward) never runs. A list input is a logical channel
        concat fed to the multi-input kernel (no HBM concat — UpCat's
        [depth ‖ fusion]). BN+ReLU in BHCW; param/stat tree identical to
        the NHWC path."""
        from ..ops.pallas_s2 import convtranspose2d_s2_pallas_bhcw

        kernel, bias = ConvTranspose(
            self.features, use_bias=not self.use_norm, dtype=self.dtype,
        )(x, params_only=True, layout="bhcw")
        parts = list(x) if isinstance(x, (list, tuple)) else None
        dtype = self.dtype or (parts[0] if parts else x).dtype
        out = convtranspose2d_s2_pallas_bhcw(
            [p.astype(dtype) for p in parts] if parts is not None
            else x.astype(dtype),
            kernel.astype(dtype),
            None if bias is None else bias.astype(dtype),
        )
        if self.use_norm:
            out = BatchNorm(dtype=self.dtype, layout="bhcw")(out, train)
        return nn.relu(out)

    def _phased_bhcw(self, x):
        """Transpose conv as a stride-1 pallas conv with phase-stacked output
        channels (relu fused) + a depth-to-space interleave; fold_bn only.
        Aligned form: the phased conv synthesizes its halo, and the d2s of an
        aligned array is itself aligned (zeros interleave to zeros)."""
        from .aligned import AT, _match_rows
        from ..ops.convops import convtranspose_kernel_phases
        from ..ops.pallas_conv import conv2d_pallas_bhcw_aligned

        assert self.fold_bn and self.backend == "pallas"
        parts = [x] if isinstance(x, AT) else list(x)
        parts = _match_rows(parts)
        kernel, bias = ConvTranspose(
            self.features, use_bias=True, dtype=self.dtype,
        )(parts if len(parts) > 1 else parts[0], params_only=True,
          layout="bhcw")
        dtype = self.dtype or parts[0].arr.dtype
        kph = convtranspose_kernel_phases(kernel.astype(dtype))
        spec = [(p.logical_c, p.arr.shape[2]) for p in parts]
        if any(l != c for l, c in spec):
            # granule-padded parts anywhere in the list: bind the kernel
            # to the PHYSICAL channel layout (zero taps on pad channels)
            # instead of materializing an HBM concat (ops/convops.py)
            from ..ops.convops import expand_kernel_channels

            kph = expand_kernel_channels(kph, spec)
        bias4 = jnp.tile(bias.astype(dtype), 4)
        if self.split_out:
            # (ry, rx, c) phase channels: the ry row merge is a FREE reshape
            # and the rx planes [rx0 F | rx1 F] are exactly the W-phase-split
            # channel blocks — no lane interleave at all
            from .aligned import WS

            out_ph, ho, wo = conv2d_pallas_bhcw_aligned(
                [p.arr.astype(dtype) for p in parts], kph, bias4,
                w=parts[0].w, h=parts[0].h, padding=1, relu=True,
            )
            b, alloc, c4, wp = out_ph.shape
            rows = out_ph.reshape(b, 2 * alloc, c4 // 2, wp)
            return WS(rows, 2 * ho, 2 * wo, self.features)
        # full-width output: the kernel performs the depth-to-space itself
        # (lane interleave as constant selection matmuls on the MXU) — the
        # XLA d2s copy (~74 MB at the fuse2 boundary) never runs
        out, ho, wo = conv2d_pallas_bhcw_aligned(
            [p.arr.astype(dtype) for p in parts], kph, bias4,
            w=parts[0].w, h=parts[0].h, padding=1, relu=True,
            d2s_channels=self.features,
        )
        return AT(out, 2 * ho, 2 * wo)


class RGBEncoder(nn.Module):
    """Residual encoder stage: conv3x3(stride)+BN+ReLU plus a 1x1(stride)
    shortcut, summed (reference `models/step2.py:134-154`).

    ``layout='bhcw'`` (requires ``fold_bn`` + pallas) runs the whole block as
    ONE fused kernel: the 1x1 shortcut is embedded in the 3x3 tap grid and
    stacked on the output channels, and ``relu(main + bias) + shortcut``
    happens in the kernel epilogue — one HBM read of the input, one write of
    the block output. Stride 2 goes through a space-to-depth re-layout so
    the strided conv becomes a stride-1 row-matmul (ops/convops.py).
    """

    features: int
    stride: int = 1
    dtype: Any = None
    backend: str = "xla"
    fold_bn: bool = False
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.layout == "bhcw":
            from .aligned import AT, WS

            if isinstance(x, (AT, WS)):
                return self._fused_bhcw(x)
            if self.stride == 2:
                # plain-BHCW training form: stride 2 via differentiable
                # space-to-depth + the custom-VJP stride-1 kernel
                return self._train_bhcw_s2(x, train)
            if self.backend == "pallas":
                return self._train_bhcw_s1(x, train)
        # the reference's encoder conv keeps its (redundant-under-BN) bias —
        # torch Conv2d default (models/step2.py:141); the fold transform
        # absorbs it into the folded bias
        out = Conv(
            self.features, stride=self.stride, dtype=self.dtype,
            backend=self.backend, fuse_relu=self.fold_bn, layout=self.layout,
        )(x)
        if not self.fold_bn:
            out = BatchNorm(dtype=self.dtype, layout=self.layout)(out, train)
            out = nn.relu(out)
        shortcut = Conv(
            self.features,
            kernel_size=1,
            stride=self.stride,
            padding=0,
            use_bias=False,
            dtype=self.dtype,
            backend=self.backend,
            layout=self.layout,
        )(x)
        return out + shortcut

    def _train_bhcw_s2(self, x, train: bool):
        """Differentiable stride-2 block on plain (B,H,C,W) operands: the
        phase-aware custom-VJP pair kernel (ops/pallas_s2.py) consumes the
        FREE row-pair reshape of x with in-kernel lane decimation — main
        conv and shortcut stacked on the output channels, one HBM read of
        x, and NO XLA space-to-depth in either direction (the backward's
        d_x emerges interleaved from the d2s kernel epilogue, d_w runs the
        row-pair filter-grad against a lane-dilated cotangent). BN+ReLU
        apply to the main half; the add stays XLA (BN between conv and add
        rules out the inference path's fused residual epilogue). Module
        order matches the generic path, so the param/stat tree is
        identical."""
        from ..ops.pallas_s2 import conv2d_s2_res_pallas_bhcw

        k_main, b_main = Conv(
            self.features, stride=self.stride, dtype=self.dtype,
            backend=self.backend, layout="bhcw",
        )(x, params_only=True)
        k_short, _ = Conv(
            self.features, kernel_size=1, stride=self.stride, padding=0,
            use_bias=False, dtype=self.dtype, backend=self.backend,
            layout="bhcw",
        )(x, params_only=True)
        dtype = self.dtype or x.dtype
        f = self.features
        y = conv2d_s2_res_pallas_bhcw(
            x.astype(dtype), k_main.astype(dtype), k_short.astype(dtype),
            b_main.astype(dtype),
        )
        out, shortcut = y[:, :, :f], y[:, :, f:]
        if not self.fold_bn:
            out = BatchNorm(dtype=self.dtype, layout="bhcw")(out, train)
            out = nn.relu(out)
        return out + shortcut

    def _train_bhcw_s1(self, x, train: bool):
        """Differentiable stride-1 block on plain (B,H,C,W): the 1x1
        shortcut embeds at the 3x3 center tap and stacks on the main conv's
        output channels — ONE kernel pass reads x once (the reference block
        reads it twice, `models/step2.py:148-152`), and the backward is one
        transposed conv / filter-grad for the pair. Param/stat tree
        identical to the generic path."""
        from ..ops.pallas_conv import conv2d_pallas_bhcw

        k_main, b_main = Conv(
            self.features, stride=1, dtype=self.dtype,
            backend=self.backend, layout="bhcw",
        )(x, params_only=True)
        k_short, _ = Conv(
            self.features, kernel_size=1, stride=1, padding=0,
            use_bias=False, dtype=self.dtype, backend=self.backend,
            layout="bhcw",
        )(x, params_only=True)
        dtype = self.dtype or x.dtype
        f = self.features
        k_sh3 = jnp.zeros_like(k_main).at[1, 1].set(k_short[0, 0])
        kcat = jnp.concatenate([k_main, k_sh3], -1).astype(dtype)
        bcat = jnp.concatenate(
            [b_main.astype(dtype), jnp.zeros((f,), dtype)]
        )
        y = conv2d_pallas_bhcw(x.astype(dtype), kcat, bcat, padding=1)
        out, shortcut = y[:, :, :f], y[:, :, f:]
        if not self.fold_bn:
            out = BatchNorm(dtype=self.dtype, layout="bhcw")(out, train)
            out = nn.relu(out)
        return out + shortcut

    def _fused_bhcw(self, x):
        """Aligned-form fused block (see models/aligned.py): one kernel for
        the whole residual stage, no XLA pads; stride 2 runs on the FREE
        row-pair channel-stack reshape — the WS input's pair rows ARE the
        (py, px, c) s2d order (conv_kernel_s2d_aligned), and the AT input
        uses full-lane taps + an in-kernel stride-2 lane gather
        (conv_kernel_s2_rowpair + lane_stride2)."""
        from .aligned import AT, WS
        from ..ops.convops import (
            conv_kernel_s2d_aligned,
            shortcut_kernel_s2d_aligned,
        )
        from ..ops.pallas_conv import conv2d_pallas_bhcw_aligned

        assert self.fold_bn and self.backend == "pallas"
        assert isinstance(x, (AT, WS)), "bhcw layout expects aligned-form input"
        # same submodule order as the unfused path -> identical param tree
        k_main, b_main = Conv(
            self.features, stride=self.stride, dtype=self.dtype,
            backend=self.backend, layout="bhcw",
        )(x, params_only=True)
        k_short, _ = Conv(
            self.features, kernel_size=1, stride=self.stride, padding=0,
            use_bias=False, dtype=self.dtype, backend=self.backend,
            layout="bhcw",
        )(x, params_only=True)

        is_int = jnp.issubdtype(x.arr.dtype, jnp.integer)
        dtype = self.dtype or (jnp.float32 if is_int else x.arr.dtype)
        if isinstance(x, WS) and self.stride == 1:
            # split-input stride-1 residual block (the entry encoder on
            # wire-split RGB): wsplit kernel with outputs permuted to
            # [main ev, main od | short ev, short od] so the fused residual
            # epilogue pairs phases correctly; the result IS the shared
            # r0 split — the 58 MB encoder-output deinterleave never runs
            from ..ops.convops import conv_kernel_wsplit_parts

            F = self.features
            k_sh3 = jnp.zeros_like(k_main).at[1, 1].set(k_short[0, 0])
            kcat = jnp.concatenate([k_main, k_sh3], -1).astype(dtype)
            k2, pl_, pr = conv_kernel_wsplit_parts(
                kcat, [("split", x.c, x.arr.shape[2])], 1
            )
            k2 = k2.reshape(k2.shape[:3] + (2, 2, F))  # (.., q, m/s, F)
            k2 = jnp.swapaxes(k2, 3, 4).reshape(k2.shape[:3] + (4 * F,))
            xin = x.arr if is_int else x.arr.astype(dtype)
            out, ho, wo = conv2d_pallas_bhcw_aligned(
                xin, k2, jnp.tile(b_main.astype(dtype), 2),
                w=x.w // 2, h=x.h, pad_left=pl_, pad_right=pr, padding=1,
                residual_channels=2 * F,
            )
            return WS(out, ho, 2 * wo, F)
        if isinstance(x, WS):
            # pre-split input (the shared r0 W-split): the row-pair reshape
            # (b, alloc/2, 2*c2, wp) stacks each even/odd ROW pair as
            # channel blocks — with the [lane-ev | lane-od] WS channels
            # inside, the result is EXACTLY the (py, px, c) s2d channel
            # order as ONE free metadata reshape: no XLA slice, no copy.
            assert self.stride == 2 and x.c * 2 == x.arr.shape[2]
            km = conv_kernel_s2d_aligned(k_main.astype(dtype))
            ks = shortcut_kernel_s2d_aligned(k_short.astype(dtype))
            kcat = jnp.concatenate([km, ks], -1)
            b_, alloc, c2, wp = x.arr.shape
            assert alloc % 2 == 0, alloc
            v2 = x.arr.astype(dtype).reshape(b_, alloc // 2, 2 * c2, wp)
            out, ho, wo = conv2d_pallas_bhcw_aligned(
                v2, kcat, b_main.astype(dtype),
                w=x.w // 2, h=x.h // 2,
                pad_top=1, pad_bottom=0, pad_left=1, pad_right=0,
                residual_channels=self.features,
            )
            return AT(out, ho, wo)
        # zero-extend kernels over the input's granule-padded channel tail
        cpad = x.channels - x.logical_c
        if cpad:
            zk = ((0, 0), (0, 0), (0, cpad), (0, 0))
            k_main = jnp.pad(k_main, zk)
            k_short = jnp.pad(k_short, zk)
        k_main = k_main.astype(dtype)
        k_short = k_short.astype(dtype)
        b_main = b_main.astype(dtype)
        if self.stride == 1:
            # embed the 1x1 shortcut at the 3x3 center tap
            k_sh3 = jnp.zeros_like(k_main).at[1, 1].set(k_short[0, 0])
            kcat = jnp.concatenate([k_main, k_sh3], -1)
            xin = x.arr if is_int else x.arr.astype(dtype)
            out, ho, wo = conv2d_pallas_bhcw_aligned(
                xin, kcat, b_main, w=x.w, h=x.h, padding=1,
                residual_channels=self.features,
            )
            return AT(out, ho, wo)
        assert self.stride == 2
        # row-pair + lane-gather stride-2: the even/odd row pair stacks as
        # channel blocks via a FREE reshape, the kw=3 lane taps run at full
        # width, and a 0/1 gather matmul on the MXU keeps even lanes
        # (ops/pallas_conv.py lane_stride2) — the XLA space-to-depth
        # (95 MB at the enc2 boundary) never materializes.
        from ..ops.convops import (
            conv_kernel_s2_rowpair,
            shortcut_kernel_s2_rowpair,
        )

        xin = x.arr.astype(dtype)
        b_, alloc, cph, wp = xin.shape
        assert alloc % 2 == 0, alloc
        v2 = xin.reshape(b_, alloc // 2, 2 * cph, wp)
        kcat = jnp.concatenate(
            [conv_kernel_s2_rowpair(k_main),
             shortcut_kernel_s2_rowpair(k_short)], -1
        )
        out, ho, wo = conv2d_pallas_bhcw_aligned(
            v2, kcat, b_main, w=x.w, h=x.h // 2,
            pad_top=1, pad_bottom=0, pad_left=1, pad_right=0,
            residual_channels=self.features, lane_stride2=True,
        )
        return AT(out, ho, wo)


class Conv3x3Head(nn.Module):
    """3x3 -> 1 channel, no bias: the per-scale residual-depth head.

    The reference's ``Conv3x3(out_channel, 1)`` swallows its second argument
    as ``stride`` and always emits one channel (`models/step2.py:156-158`);
    this module makes that behaviour explicit.
    """

    dtype: Any = None
    backend: str = "xla"
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x):
        return Conv(
            1, use_bias=False, dtype=self.dtype, backend=self.backend,
            layout=self.layout,
        )(x)
