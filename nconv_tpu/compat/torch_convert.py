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
    "to_unguided_state_dict",
    "to_guided_state_dict",
    "load_pth_tar",
    "save_pth_tar",
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


# ---------------------------------------------------------------------------
# Reverse direction: flax variables -> reference state dict. Lets weights
# trained on TPU flow back into the reference's existing deployment pipeline —
# in particular its ONNX export (`/root/reference/export_to_onnx.py:26-34`
# loads a `.pth.tar` with `module.`-prefix strip + strict=False, so the dicts
# emitted here drop straight in; this image has no `onnx` wheel, so the ONNX
# file itself is produced by running that script in the reference env).
# ---------------------------------------------------------------------------

def _flatten(tree: Mapping, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    flat: dict[tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _softplus10_np(w: np.ndarray) -> np.ndarray:
    # numpy twin of ops.nconv._softplus10 (torch F.softplus(w, beta=10))
    return np.logaddexp(0.0, 10.0 * np.asarray(w, np.float64)) / 10.0


def _export_nconv_kernel(v: np.ndarray, kernel_mode: str) -> np.ndarray:
    """HWIO raw parameter -> the positive OIHW weight a reference checkpoint
    carries (EnforcePos mutates the stored weight in place during training,
    `/root/reference/models/step1.py:190-193`, so saved reference weights are
    already post-softplus and its eval applies no transform)."""
    k = _np(v)
    if kernel_mode == "softplus":
        k = _softplus10_np(k).astype(k.dtype)
    elif kernel_mode != "raw":
        raise ValueError(f"unknown kernel_mode {kernel_mode!r}")
    return np.transpose(k, (3, 2, 0, 1))


def to_unguided_state_dict(
    variables: Mapping, *, kernel_mode: str = "softplus"
) -> dict[str, np.ndarray]:
    """``NConvUNet`` variables -> a ``SETP1_NCONV`` state dict.

    ``kernel_mode='softplus'`` (default) exports the *effective* positive
    kernels of a ``pos_fn='softplus'`` model; use ``'raw'`` for variables that
    came from :func:`convert_unguided_state_dict` with ``kernel_mode='raw'``
    (already positive).
    """
    sd: dict[str, np.ndarray] = {}
    for path, v in _flatten(variables.get("params", variables)).items():
        name, leaf = path
        if leaf == "kernel":
            sd[f"d_net.{name}.weight"] = _export_nconv_kernel(v, kernel_mode)
        elif leaf == "bias":
            sd[f"d_net.{name}.bias"] = _np(v)
        else:
            raise KeyError(f"unexpected unguided param leaf {path}")
    return sd


_BN_PARAM_INV = {v: k for k, v in _BN_PARAM.items()}
_BN_STAT_INV = {v: k for k, v in _BN_STAT.items()}


def to_guided_state_dict(
    variables: Mapping, *, kernel_mode: str = "softplus"
) -> dict[str, np.ndarray]:
    """``GuidedDepthNet`` variables -> a ``SETP2_BP_EXPORT``-loadable state
    dict (also loads into ``SETP2_BP_TRAIN`` — its extra dead ``rgb_encoder4``
    / per-NConv ``bnorm`` state stays at init under ``strict=False``, which is
    how every reference load site works, `models/step2.py:36`,
    `export_to_onnx.py:34`).

    Expects *unfolded* variables (``params`` + ``batch_stats``); fold_bn'd
    trees have no BN state left to export.
    """
    sd: dict[str, np.ndarray] = {}

    def put_bn(ref_prefix: str, leaf: str, v) -> None:
        if leaf in _BN_PARAM_INV:
            sd[f"{ref_prefix}.{_BN_PARAM_INV[leaf]}"] = _np(v)
        elif leaf in _BN_STAT_INV:
            sd[f"{ref_prefix}.{_BN_STAT_INV[leaf]}"] = _np(v)
        else:
            raise KeyError(f"unexpected BN leaf {leaf}")

    def bn_prefix(path: tuple[str, ...]) -> str | None:
        # (..., 'BatchNorm_0', 'BatchNorm_0', leaf) -> reference bn module
        if len(path) < 3 or path[-3:-1] != ("BatchNorm_0", "BatchNorm_0"):
            return None
        head = path[:-3]
        if len(head) == 1 and head[0].startswith("rgb_encoder"):
            return f"{head[0]}.encoder.1"
        if len(head) == 3 and head[1:] == ("upcat", "upf"):
            return f"{head[0]}.upcat.upf.bn"
        if len(head) == 3 and head[1:] == ("upcat", "conv"):
            return f"{head[0]}.upcat.conv.conv.bn"
        raise KeyError(f"unrecognized BN site {path}")

    for path, v in _flatten(variables["params"]).items():
        ref = bn_prefix(path)
        if ref is not None:
            put_bn(ref, path[-1], v)
            continue
        head, leaf = path[:-1], path[-1]
        if head[0] == "step1":
            sd[f"step1.d_net.{head[1]}.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                _export_nconv_kernel(v, kernel_mode) if leaf == "kernel" else _np(v)
            )
        elif head[0].startswith("rgb_encoder") and head[1] == "Conv_0":
            w = f"{head[0]}.encoder.0.{'weight' if leaf == 'kernel' else 'bias'}"
            sd[w] = np.transpose(_np(v), (3, 2, 0, 1)) if leaf == "kernel" else _np(v)
        elif head[0].startswith("rgb_encoder") and head[1] == "Conv_1":
            # bias-free sites below mirror the reference exactly (parity
            # tests pin the trees equal), so only kernels can appear here
            assert leaf == "kernel", path
            sd[f"{head[0]}.downsample.0.weight"] = np.transpose(_np(v), (3, 2, 0, 1))
        elif head[1] == "fuse":  # (fuseN, 'fuse', conv_name, 'Conv_0')
            w = f"{head[0]}.fuse.{head[2]}.conv.{'weight' if leaf == 'kernel' else 'bias'}"
            sd[w] = np.transpose(_np(v), (3, 2, 0, 1)) if leaf == "kernel" else _np(v)
        elif head[1:] == ("conv", "Conv_0"):
            assert leaf == "kernel", path
            sd[f"{head[0]}.conv.weight"] = np.transpose(_np(v), (3, 2, 0, 1))
        elif head[1:] == ("upcat", "upf", "ConvTranspose_0"):
            # HWIO (I=in) -> torch ConvTranspose2d (in, out, kh, kw)
            assert leaf == "kernel", path
            sd[f"{head[0]}.upcat.upf.conv.weight"] = np.transpose(_np(v), (2, 3, 0, 1))
        elif head[1:] == ("upcat", "conv", "Conv_0"):
            assert leaf == "kernel", path
            sd[f"{head[0]}.upcat.conv.conv.conv.weight"] = np.transpose(
                _np(v), (3, 2, 0, 1)
            )
        else:
            raise KeyError(f"unrecognized guided param path {path}")

    for path, v in _flatten(variables.get("batch_stats", {})).items():
        ref = bn_prefix(path)
        if ref is None:
            raise KeyError(f"unrecognized batch_stats path {path}")
        put_bn(ref, path[-1], v)

    return sd


def save_pth_tar(
    path: str,
    variables: Mapping,
    *,
    model: str = "guided",
    kernel_mode: str = "softplus",
    epoch: int = 0,
    stats=None,
) -> str:
    """Write variables as a reference-format ``.pth.tar``
    (``{'epoch','state_dict','stats'}`` with DataParallel ``module.``
    prefixes, the exact shape `/root/reference/utils.py:42-51` saves), ready
    for `export_to_onnx.py` / continued reference training."""
    import torch

    to_sd = to_guided_state_dict if model == "guided" else to_unguided_state_dict

    def tt(v: np.ndarray):
        if v.dtype not in (np.float32, np.float64):  # e.g. bfloat16 params
            v = v.astype(np.float32)
        return torch.from_numpy(np.array(v, copy=True))  # owned, writable

    sd = {
        "module." + k: tt(v)
        for k, v in to_sd(variables, kernel_mode=kernel_mode).items()
    }
    torch.save({"epoch": epoch, "state_dict": sd, "stats": stats}, path)
    return path


def load_pth_tar(path: str) -> dict[str, np.ndarray]:
    """Load a reference ``.pth.tar`` checkpoint (``{'state_dict': ...}``
    wrapper, `/root/reference/utils.py:42-51`) into a numpy state dict."""
    import torch  # local import: torch is a conversion-time-only dependency

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    sd = checkpoint.get("state_dict", checkpoint)
    return {k: _np(v) for k, v in sd.items()}
