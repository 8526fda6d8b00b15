"""Flax module wrapping the normalized-convolution op.

Reference: ``NConv2d`` (`/root/reference/models/step1.py:97-172`). Differences
by design (SURVEY.md §2.1):
  * non-negativity is a pure kernel reparameterization (``pos_fn`` applied in
    apply), not an in-place weight mutation;
  * the reference's constructed-but-unused BatchNorm/ReLU state is dropped
    (its 130 dead trainable params across the DNET are why the reference
    reports 10,259 step-1 params vs 10,129 live ones here);
  * NHWC / HWIO layouts.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import nconv2d
from ..ops.nconv import INIT_FNS


class NConv2d(nn.Module):
    """Normalized convolution layer with confidence propagation."""

    features: int
    kernel_size: int = 5
    padding: int = 2
    stride: int = 1
    pos_fn: str = "softplus"
    init_method: str = "p"  # 'p' Poisson, 'k' Kaiming, 'x' Xavier
    bias_value: float = 0.01  # reference inits bias to 0.01 (step1.py:172)
    eps: float = 1e-7
    dtype: Any = None
    # 'xla' = stacked-batch conv; 'pallas' = fused NCHW kernel (TPU hot path,
    # stride 1 only)
    backend: str = "xla"
    # 'bhcw': operands and results are (B, H, C, W) — chained pallas layers
    # skip the per-layer NHWC<->BHCW transposes (pallas backend only)
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, data, conf, *, pool_out: bool = False):
        from .aligned import AT, WS, Shared, Up2

        # data/conf may be ATs, WSs / Shared markers (W-phase-split chain),
        # Up2 markers (half-res sources upsampled IN the kernel), or
        # parallel lists thereof (logical channel concat fed to the
        # multi-input kernel — no HBM concat)
        d_parts = (
            [data] if isinstance(data, (AT, WS, Shared, Up2)) else
            list(data) if isinstance(data, (list, tuple)) else None
        )
        split = d_parts is not None and any(
            isinstance(p, (WS, Shared)) for p in d_parts
        )
        aligned = d_parts is not None and not split
        if split:
            cin = sum(
                p.c if isinstance(p, WS) else p.at.logical_c for p in d_parts
            )
        elif aligned:
            cin = sum(
                p.at.logical_c if isinstance(p, Up2) else p.logical_c
                for p in d_parts
            )
        else:
            ch_axis = 2 if self.layout == "bhcw" else -1
            cin = data.shape[ch_axis]
        k = self.kernel_size
        kernel = self.param(
            "kernel", INIT_FNS[self.init_method], (k, k, cin, self.features)
        )
        bias = self.param(
            "bias", nn.initializers.constant(self.bias_value), (self.features,)
        )
        if split:
            # W-phase-split chain: same params, the positive kernel
            # re-expressed over [even|odd] channel-block operands at half
            # width (Shared parts fold a 2x nearest-repeat into the taps)
            from ..ops.convops import conv_kernel_wsplit_parts
            from ..ops.pallas_nconv_mxu import nconv2d_pallas_aligned

            assert self.backend == "pallas" and self.stride == 1
            c_parts = [conf] if isinstance(conf, (WS, Shared)) else list(conf)
            spec = [
                ("split", p.c) if isinstance(p, WS)
                else ("shared", p.at.logical_c)
                for p in d_parts
            ]
            w_full = next(
                p.w for p in d_parts if isinstance(p, WS)
            )
            h_l = next(p.h for p in d_parts if isinstance(p, WS))
            arrs = []
            for p in d_parts + c_parts:
                if isinstance(p, WS):
                    assert p.w == w_full
                    arrs.append(p.arr)
                else:
                    # Shared: half-width AND half-row source — the kernel
                    # folds the W repeat into its taps and duplicates rows
                    # in VMEM scratch (row_shared); no repeat in HBM
                    assert 2 * p.at.w == w_full, (p.at.w, w_full)
                    assert 2 * p.at.h == h_l, (p.at.h, h_l)
                    arrs.append(p.at.arr)
            dtype = self.dtype or arrs[0].dtype
            arrs = [a.astype(dtype) for a in arrs]
            nd = len(d_parts)
            shared = tuple(not isinstance(p, WS) for p in d_parts)
            res = nconv2d_pallas_aligned(
                arrs[:nd], arrs[nd:],
                kernel.astype(dtype),
                jnp.tile(bias.astype(dtype), 2),  # [ev F | od F] outputs
                w=w_full // 2, h=h_l, padding=self.padding,
                pos_fn=self.pos_fn, eps=self.eps,
                kernel_transform=lambda wp: conv_kernel_wsplit_parts(
                    wp, spec, self.padding
                ),
                row_shared=shared,
                pool_out=pool_out,
            )
            if pool_out:
                # the kernel's fused 2x2 pool: [ev|od] channel blocks make
                # the lane-pair max a channel max — the pooled result IS
                # the next level's contiguous AT tensor
                out, carr, pout, pcnf, ho, wo = res
                pooled = (
                    AT(pout, ho // 2, wo, self.features),
                    AT(pcnf, ho // 2, wo, self.features),
                )
                return (
                    WS(out, ho, 2 * wo, self.features),
                    WS(carr, ho, 2 * wo, self.features),
                ), pooled
            out, carr, ho, wo = res
            return (
                WS(out, ho, 2 * wo, self.features),
                WS(carr, ho, 2 * wo, self.features),
            )
        if aligned:
            # aligned-form inference chain — no XLA pads (ops/pallas_nconv_mxu)
            from .aligned import _match_rows
            from ..ops.pallas_nconv_mxu import nconv2d_pallas_aligned

            assert self.backend == "pallas" and self.stride == 1
            c_parts = (
                [conf] if isinstance(conf, (AT, Up2)) else list(conf)
            )
            up2 = tuple(isinstance(p, Up2) for p in d_parts)
            assert not all(up2), (
                "Up2 parts need at least one full-resolution part to fix "
                "the output grid"
            )
            assert up2 == tuple(isinstance(p, Up2) for p in c_parts), (
                "conf parts must mirror the data parts' Up2 markers"
            )
            ref = next(p for p, u in zip(d_parts, up2) if not u)
            if any(up2):
                # Up2 parts carry the half-res source; the kernel
                # duplicates rows in VMEM and lane-repeats via a constant
                # MXU matmul — the upsample never exists in HBM
                for p, u in zip(d_parts + c_parts, up2 + up2):
                    if u:
                        assert (2 * p.at.h, 2 * p.at.w) == (ref.h, ref.w), (
                            (p.at.h, p.at.w), (ref.h, ref.w)
                        )
                unwrap = lambda p, u: p.at if u else p
                d_parts = [unwrap(p, u) for p, u in zip(d_parts, up2)]
                c_parts = [unwrap(p, u) for p, u in zip(c_parts, up2)]
            else:
                both = _match_rows(d_parts + c_parts)
                d_parts, c_parts = both[: len(d_parts)], both[len(d_parts) :]
            dtype = self.dtype or d_parts[0].arr.dtype
            out, carr, ho, wo = nconv2d_pallas_aligned(
                [p.arr.astype(dtype) for p in d_parts],
                [p.arr.astype(dtype) for p in c_parts],
                kernel.astype(dtype),
                bias.astype(dtype),
                w=ref.w, h=ref.h, padding=self.padding,
                pos_fn=self.pos_fn, eps=self.eps,
                row_shared=up2 if any(up2) else None,
                lane_rep=up2 if any(up2) else None,
            )
            return AT(out, ho, wo), AT(carr, ho, wo)
        dtype = self.dtype or data.dtype
        if self.layout == "bhcw":
            from ..ops.pallas_nconv_mxu import nconv2d_pallas_mxu_bhcw

            assert self.backend == "pallas" and self.stride == 1
            return nconv2d_pallas_mxu_bhcw(
                data.astype(dtype),
                conf.astype(dtype),
                kernel.astype(dtype),
                bias.astype(dtype),
                padding=self.padding,
                pos_fn=self.pos_fn,
                eps=self.eps,
            )
        if self.backend == "pallas" and self.stride == 1:
            from ..ops.pallas_nconv_mxu import nconv2d_pallas_mxu

            return nconv2d_pallas_mxu(
                data.astype(dtype),
                conf.astype(dtype),
                kernel.astype(dtype),
                bias.astype(dtype),
                padding=self.padding,
                pos_fn=self.pos_fn,
                eps=self.eps,
            )
        return nconv2d(
            data.astype(dtype),
            conf.astype(dtype),
            kernel.astype(dtype),
            bias.astype(dtype),
            stride=self.stride,
            padding=self.padding,
            pos_fn=self.pos_fn,
            eps=self.eps,
        )
