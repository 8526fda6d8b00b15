"""Self-contained PyTorch mirror of the guided export graph.

Purpose: produce the reference's actual deployment artifact — an ONNX file
with the `export_to_onnx.py` I/O contract (4 named NCHW inputs, 2 outputs,
dynamic batch, opset 17; `/root/reference/export_to_onnx.py:57-74`) — from
weights trained in THIS framework, without needing the reference repo.

This is *interop glue*, not a compute path: the TPU inference/training
graphs live in :mod:`nconv_tpu.models`. The mirror is a single functional
``nn.Module`` whose weights come from a reference-format state dict (see
:func:`nconv_tpu.compat.torch_convert.to_guided_state_dict`), so the
key names double as the layer map. Tracing it through torch's legacy ONNX
exporter yields the same operator inventory the reference's artifact has
(Conv / ConvTranspose / BatchNormalization / MaxPool / Resize / elementwise).

Numerics match the flax ``GuidedDepthNet.export`` because every op here is
the torch primitive those jax ops are parity-tested against
(``tests/test_ops_parity.py``); ``tests/test_onnx_export.py`` pins the
mirror-vs-jax equality end-to-end.
"""
from __future__ import annotations

from typing import Mapping

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

from ..models.guided import BORDER_BOTTOM, BORDER_LEFT, BORDER_TOP
from ..ops.nconv import EPS_DEFAULT

__all__ = ["GuidedExportMirror"]

# step-1 layer geometry: (name, kernel padding); kernels' spatial sizes are
# carried by the weights themselves (reference models/step1.py:38-49)
_STEP1_PAD = {
    "nconv1": 2,
    "nconv2": 2,
    "nconv_down1": 2,
    "nconv_down2": 2,
    "nconv_down3": 2,
    "nconv4": 1,
    "nconv5": 1,
    "nconv6": 0,  # 3x3 pad-0: shrinks H,W by 2
    "nconv7": 2,  # 1x1 with the reference's accidental pad=2: grows by 4
}


def _buf_name(key: str) -> str:
    # state-dict keys contain '.', which nn.Module attribute names reject
    return "w__" + key.replace(".", "__")


class GuidedExportMirror(nn.Module):
    """Functional torch twin of ``GuidedDepthNet.export``.

    ``forward(rgb0, depth0, rgb1, depth1)`` takes NCHW float tensors
    (rgb ``(B,3,H,W)``, depth ``(B,1,H,W)``, H and W divisible by 8) and
    returns ``(depth0_out, depth1_out)`` border-masked final-scale depths —
    the deployed two-stream contract.

    Weights are registered as buffers (this module is export-only, nothing
    trains here) from a reference-format state dict whose NConv kernels are
    already positive — the form reference checkpoints store and
    ``to_guided_state_dict(kernel_mode='softplus')`` emits.
    """

    def __init__(self, state_dict: Mapping[str, np.ndarray]):
        super().__init__()
        for key, value in state_dict.items():
            # copy=True: jax arrays arrive as non-writable numpy views, which
            # torch.as_tensor would alias and warn about
            v = torch.as_tensor(np.array(value, dtype=np.float32, copy=True))
            self.register_buffer(_buf_name(key), v)

    def p(self, key: str) -> torch.Tensor:
        return getattr(self, _buf_name(key))

    # -- primitive blocks ---------------------------------------------------

    def _conv_relu(self, x, key):
        """3x3/s1/p1 conv with bias + ReLU (ConvBlock, step2.py:290-297)."""
        y = F.conv2d(x, self.p(f"{key}.weight"), self.p(f"{key}.bias"), padding=1)
        return F.relu(y)

    def _bn(self, x, key):
        return F.batch_norm(
            x,
            self.p(f"{key}.running_mean"),
            self.p(f"{key}.running_var"),
            self.p(f"{key}.weight"),
            self.p(f"{key}.bias"),
            training=False,
            eps=1e-5,
        )

    def _nconv(self, d, c, name):
        """Normalized conv: conv(d*c)/(conv(c)+eps) + b; conf = conv(c)/Σw.

        Kernels arrive positive (see class docstring), so no EnforcePos
        transform is applied — matching reference eval (step1.py:190-193).
        """
        w = self.p(f"step1.d_net.{name}.weight")
        b = self.p(f"step1.d_net.{name}.bias")
        pad = _STEP1_PAD[name]
        nomin = F.conv2d(d * c, w, None, padding=pad)
        denom = F.conv2d(c, w, None, padding=pad)
        out = nomin / (denom + EPS_DEFAULT) + b.view(1, -1, 1, 1)
        conf = denom / w.sum(dim=(1, 2, 3)).view(1, -1, 1, 1)
        return out, conf

    # -- step 1: unguided densifier (models/unguided.py NConvUNet) ----------

    def _step1(self, sparse):
        h, w = sparse.shape[2], sparse.shape[3]
        c = (sparse > 0.01).to(sparse.dtype)

        x1, c1 = self._nconv(sparse, c, "nconv1")
        x1, c1 = self._nconv(x1, c1, "nconv2")

        x1d, c1d = F.max_pool2d(x1, 2), F.max_pool2d(c1, 2)
        x2, c2 = self._nconv(x1d, c1d, "nconv_down1")
        x2d, c2d = F.max_pool2d(x2, 2), F.max_pool2d(c2, 2)
        x3, c3 = self._nconv(x2d, c2d, "nconv_down2")
        x3d, c3d = F.max_pool2d(x3, 2), F.max_pool2d(c3, 2)
        x4, c4 = self._nconv(x3d, c3d, "nconv_down3")

        def up(t, size):
            return F.interpolate(t, size=size, mode="nearest")

        s3 = (x3.shape[2], x3.shape[3])
        x34, c34 = self._nconv(
            torch.cat([x3, up(x4, s3)], 1), torch.cat([c3, up(c4, s3)], 1),
            "nconv4",
        )
        s2 = (x2.shape[2], x2.shape[3])
        x23, c23 = self._nconv(
            torch.cat([x2, up(x34, s2)], 1), torch.cat([c2, up(c34, s2)], 1),
            "nconv5",
        )
        xo, co = self._nconv(
            torch.cat([up(x23, (h, w)), x1], 1),
            torch.cat([up(c23, (h, w)), c1], 1),
            "nconv6",
        )  # (H-2, W-2)
        xo, co = self._nconv(xo, co, "nconv7")  # (H+2, W+2)
        return xo[:, :, 1 : h + 1, 1 : w + 1]

    # -- step 2 blocks (models/guided.py) -----------------------------------

    def _encoder(self, x, name, stride):
        """relu(BN(conv3x3)) + 1x1 shortcut (RGBEncoder, step2.py:134-154)."""
        main = F.conv2d(
            x, self.p(f"{name}.encoder.0.weight"),
            self.p(f"{name}.encoder.0.bias"), stride=stride, padding=1,
        )
        main = F.relu(self._bn(main, f"{name}.encoder.1"))
        short = F.conv2d(
            x, self.p(f"{name}.downsample.0.weight"), None, stride=stride
        )
        return main + short

    def _fusion(self, prefix, feat, depth):
        """NewFusionBlock: rgb/depth branch convs, concat, 3 ConvBlocks."""
        r = self._conv_relu(feat, f"{prefix}.rgb_conv.conv")
        d = self._conv_relu(depth, f"{prefix}.depth_conv.conv")
        x = torch.cat([r, d], 1)
        x = self._conv_relu(x, f"{prefix}.fuse_conv1.conv")
        x = self._conv_relu(x, f"{prefix}.fuse_conv2.conv")
        return self._conv_relu(x, f"{prefix}.fuse_conv3.conv")

    def _head(self, fout, key):
        """Conv3x3Head: 3x3 -> 1 channel, no bias (step2.py:156-158)."""
        return F.conv2d(fout, self.p(f"{key}.weight"), None, padding=1)

    def _downscale(self, dense, factor):
        if factor == 1:
            return dense
        size = (dense.shape[2] // factor, dense.shape[3] // factor)
        return F.interpolate(
            dense, size=size, mode="bilinear", align_corners=True
        )

    def _fuse_block(self, name, rgb_skip, dense, prev_fusion, prev_depth, factor):
        """FusionResolutionBlock: UpCat, downscale, fusion, residual head.

        UpCat concat order is [depth ‖ fusion] — the reference call site's
        swapped-argument quirk (step2.py:250), preserved for weight compat.
        """
        up = F.conv_transpose2d(
            torch.cat([prev_depth, prev_fusion], 1),
            self.p(f"{name}.upcat.upf.conv.weight"), None, stride=2, padding=1,
        )
        up = F.relu(self._bn(up, f"{name}.upcat.upf.bn"))
        fout = F.conv2d(
            torch.cat([up, rgb_skip], 1),
            self.p(f"{name}.upcat.conv.conv.conv.weight"), None, padding=1,
        )
        fout = F.relu(self._bn(fout, f"{name}.upcat.conv.conv.bn"))
        depth = self._downscale(dense, factor)
        fused = self._fusion(f"{name}.fuse", fout, depth)
        return fused, depth + self._head(fused, f"{name}.conv")

    def _stream(self, rgb, depth):
        dense = self._step1(depth)

        r0 = self._encoder(rgb, "rgb_encoder0", 1)
        r1 = self._encoder(r0, "rgb_encoder1", 2)
        r2 = self._encoder(r1, "rgb_encoder2", 2)
        r3 = self._encoder(r2, "rgb_encoder3", 2)

        dep8 = self._downscale(dense, 8)
        f0 = self._fusion("fuse0.fuse", r3, dep8)
        d0 = dep8 + self._head(f0, "fuse0.conv")
        f1, d1 = self._fuse_block("fuse1", r2, dense, f0, d0, 4)
        f2, d2 = self._fuse_block("fuse2", r1, dense, f1, d1, 2)
        _, d3 = self._fuse_block("fuse3", r0, dense, f2, d2, 1)

        # export border zeroing (step2.py:122-124) as a static mask multiply.
        # H/W are trace-time ints (only batch is dynamic), so building the
        # mask in numpy makes it a single folded constant in the ONNX —
        # tracing in-place slice zeroing instead would leave ScatterND /
        # Expand / Where subgraphs in the artifact.
        h, w = int(d3.shape[2]), int(d3.shape[3])
        mask = np.ones((1, 1, h, w), np.float32)
        mask[:, :, :BORDER_TOP] = 0
        mask[:, :, h - BORDER_BOTTOM :] = 0
        mask[:, :, :, :BORDER_LEFT] = 0
        return d3 * torch.as_tensor(mask, dtype=d3.dtype, device=d3.device)

    def forward(self, rgb0, depth0, rgb1, depth1):
        # one backbone pass per stream (weights shared). The reference's
        # batch-stacked export splits with literal [0:1]/[1:2] slices
        # (step2.py:126), silently wrong for B>1 despite its dynamic batch
        # axes; per-stream passes are numerically identical (no op crosses
        # the batch axis in eval) and honestly batch-dynamic.
        return self._stream(rgb0, depth0), self._stream(rgb1, depth1)
