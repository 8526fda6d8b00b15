"""Reference (PyTorch) checkpoint -> flax variables converter.

Translates state dicts of the reference models
(`/root/reference/models/step1.py` ``SETP1_NCONV``,
`/root/reference/models/step2.py` ``SETP2_BP_TRAIN``/``SETP2_BP_EXPORT``)
into variable trees for :class:`nconv_tpu.models.NConvUNet` /
:class:`nconv_tpu.models.GuidedDepthNet`. Enables inference parity testing
(<1e-3 relative RMSE target, BASELINE.md) and warm-starting TPU training
from reference weights.

Handled reference quirks:
  * ``module.`` DataParallel prefixes are stripped (the reference always
    saves DP-wrapped models, `train_step1.py:153`);
  * dead state is dropped: per-NConv ``bnorm.*`` (never used in forward),
    ``rgb_encoder4.*`` (registered but never called),
    ``num_batches_tracked``;
  * NConv kernels are stored raw by default (reference eval applies no
    transform — its EnforcePos hook only fires in train mode), so build the
    model with ``pos_fn='identity'``; pass ``kernel_mode='softplus_inverse'``
    to re-parameterize positive weights for continued training with
    ``pos_fn='softplus'``.

Works on plain numpy-valued state dicts; torch is only needed by
:func:`load_pth_tar`.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from ..ops.nconv import softplus10_inverse

__all__ = [
    "convert_unguided_state_dict",
    "convert_guided_state_dict",
    "load_pth_tar",
    "strip_data_parallel_prefix",
]

_SKIP = re.compile(
    r"(\.bnorm\.)|(^rgb_encoder4\.)|(num_batches_tracked$)"
)


def strip_data_parallel_prefix(sd: Mapping[str, Any]) -> dict[str, Any]:
    return {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_kernel(v) -> np.ndarray:
    """(out, in, kh, kw) -> HWIO."""
    return np.transpose(_np(v), (2, 3, 1, 0))


def _convtranspose_kernel(v) -> np.ndarray:
    """(in, out, kh, kw) -> HWIO with I = in."""
    return np.transpose(_np(v), (2, 3, 0, 1))


def _unflatten(flat: dict[tuple[str, ...], np.ndarray]) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    return tree


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}


def _convert_nconv_entry(
    params: dict, path: tuple[str, ...], leaf: str, v, kernel_mode: str
):
    if leaf == "weight":
        k = _conv_kernel(v)
        if kernel_mode == "softplus_inverse":
            k = softplus10_inverse(k)
        params[path + ("kernel",)] = k
    elif leaf == "bias":
        params[path + ("bias",)] = _np(v)
    else:
        raise KeyError(f"unexpected NConv leaf {leaf}")


def convert_unguided_state_dict(
    sd: Mapping[str, Any], *, kernel_mode: str = "raw"
) -> dict:
    """``SETP1_NCONV`` state dict -> ``{'params': ...}`` for ``NConvUNet``."""
    sd = strip_data_parallel_prefix(sd)
    params: dict[tuple[str, ...], np.ndarray] = {}
    for key, v in sd.items():
        if _SKIP.search(key):
            continue
        m = re.fullmatch(r"d_net\.(nconv(?:_down)?\d)\.(weight|bias)", key)
        if not m:
            raise KeyError(f"unrecognized step-1 key: {key}")
        _convert_nconv_entry(params, (m.group(1),), m.group(2), v, kernel_mode)
    return {"params": _unflatten(params)}


def convert_guided_state_dict(
    sd: Mapping[str, Any], *, kernel_mode: str = "raw"
) -> dict:
    """``SETP2_BP_*`` state dict -> variables for ``GuidedDepthNet``
    (``{'params': ..., 'batch_stats': ...}``)."""
    sd = strip_data_parallel_prefix(sd)
    params: dict[tuple[str, ...], np.ndarray] = {}
    stats: dict[tuple[str, ...], np.ndarray] = {}

    def bn(prefix: tuple[str, ...], leaf: str, v) -> bool:
        if leaf in _BN_PARAM:
            params[prefix + ("BatchNorm_0", "BatchNorm_0", _BN_PARAM[leaf])] = _np(v)
            return True
        if leaf in _BN_STAT:
            stats[prefix + ("BatchNorm_0", "BatchNorm_0", _BN_STAT[leaf])] = _np(v)
            return True
        return False

    for key, v in sd.items():
        if _SKIP.search(key):
            continue

        # frozen step-1 subtree
        m = re.fullmatch(r"step1\.d_net\.(nconv(?:_down)?\d)\.(weight|bias)", key)
        if m:
            _convert_nconv_entry(params, ("step1", m.group(1)), m.group(2), v, kernel_mode)
            continue

        # RGB encoders: conv, BN, 1x1 shortcut
        m = re.fullmatch(r"(rgb_encoder\d)\.encoder\.0\.(weight|bias)", key)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            val = _conv_kernel(v) if leaf == "kernel" else _np(v)
            params[(m.group(1), "Conv_0", leaf)] = val
            continue
        m = re.fullmatch(r"(rgb_encoder\d)\.encoder\.1\.(\w+)", key)
        if m and bn((m.group(1),), m.group(2), v):
            continue
        m = re.fullmatch(r"(rgb_encoder\d)\.downsample\.0\.weight", key)
        if m:
            params[(m.group(1), "Conv_1", "kernel")] = _conv_kernel(v)
            continue

        # Fusion stages
        m = re.fullmatch(
            r"(fuse\d)\.fuse\.(rgb_conv|depth_conv|fuse_conv\d)\.conv\.(weight|bias)",
            key,
        )
        if m:
            leaf = "kernel" if m.group(3) == "weight" else "bias"
            val = _conv_kernel(v) if leaf == "kernel" else _np(v)
            params[(m.group(1), "fuse", m.group(2), "Conv_0", leaf)] = val
            continue
        m = re.fullmatch(r"(fuse\d)\.conv\.weight", key)
        if m:
            params[(m.group(1), "conv", "Conv_0", "kernel")] = _conv_kernel(v)
            continue
        m = re.fullmatch(r"(fuse\d)\.upcat\.upf\.conv\.weight", key)
        if m:
            params[(m.group(1), "upcat", "upf", "ConvTranspose_0", "kernel")] = (
                _convtranspose_kernel(v)
            )
            continue
        m = re.fullmatch(r"(fuse\d)\.upcat\.upf\.bn\.(\w+)", key)
        if m and bn((m.group(1), "upcat", "upf"), m.group(2), v):
            continue
        m = re.fullmatch(r"(fuse\d)\.upcat\.conv\.conv\.conv\.weight", key)
        if m:
            params[(m.group(1), "upcat", "conv", "Conv_0", "kernel")] = _conv_kernel(v)
            continue
        m = re.fullmatch(r"(fuse\d)\.upcat\.conv\.conv\.bn\.(\w+)", key)
        if m and bn((m.group(1), "upcat", "conv"), m.group(2), v):
            continue

        raise KeyError(f"unrecognized step-2 key: {key}")

    return {"params": _unflatten(params), "batch_stats": _unflatten(stats)}


def load_pth_tar(path: str) -> dict[str, np.ndarray]:
    """Load a reference ``.pth.tar`` checkpoint (``{'state_dict': ...}``
    wrapper, `/root/reference/utils.py:42-51`) into a numpy state dict."""
    import torch  # local import: torch is a conversion-time-only dependency

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    sd = checkpoint.get("state_dict", checkpoint)
    return {k: _np(v) for k, v in sd.items()}
