"""BatchNorm folding for frozen inference graphs.

Every BatchNorm in the guided net normalizes the output of the convolution
immediately before it (`Basic2d`, `Basic2dTrans`, `RGBEncoder` — reference
`models/step2.py:141,190,207`). At inference BN is an affine map with fixed
statistics, so it folds into the convolution:

    g       = scale / sqrt(var + eps)
    kernel' = kernel * g           (broadcast over the HWIO output axis)
    bias'   = beta - mean * g

This removes one full-resolution elementwise pass per normalized conv —
which matters on the Pallas backend, where the conv runs as a fused kernel
and an unfolded BN would be a separate XLA op re-reading the activation
from HBM. Use with models constructed with ``fold_bn=True`` (they build
conv+bias[+fused relu] and skip the BN module).
"""
from __future__ import annotations

import numpy as np

BN_EPS = 1e-5  # torch BatchNorm2d default, matched by models.layers.BatchNorm


def _as_np(x):
    return np.asarray(x)


def _fold_node(params: dict, stats: dict) -> dict:
    out = {}
    for name, child in params.items():
        if isinstance(child, dict):
            out[name] = _fold_node(child, stats.get(name, {}) if isinstance(stats, dict) else {})
        else:
            out[name] = child

    if "BatchNorm_0" in out and ("Conv_0" in out or "ConvTranspose_0" in out):
        bn_p = out.pop("BatchNorm_0")["BatchNorm_0"]
        bn_s = stats["BatchNorm_0"]["BatchNorm_0"]
        conv_key = "Conv_0" if "Conv_0" in out else "ConvTranspose_0"
        conv = dict(out[conv_key])
        g = _as_np(bn_p["scale"]) / np.sqrt(_as_np(bn_s["var"]) + BN_EPS)
        kernel = _as_np(conv["kernel"])
        conv["kernel"] = (kernel * g).astype(kernel.dtype)
        base = _as_np(conv["bias"]) if "bias" in conv else 0.0
        conv["bias"] = (
            _as_np(bn_p["bias"]) + (base - _as_np(bn_s["mean"])) * g
        ).astype(kernel.dtype)
        out[conv_key] = conv
    return out


def maybe_fold(model, variables, fold_bn: bool = True):
    """``(model, variables) -> (model', variables')`` with every BatchNorm
    folded into its conv, when possible: the model is not already folded and
    the variables actually carry batch stats. The shared inference-engine
    entry (StreamingEngine / DataParallelEngine) — keeps the fold policy in
    one place."""
    if (
        fold_bn
        and not getattr(model, "fold_bn", False)
        and isinstance(variables, dict)
        and variables.get("batch_stats")
    ):
        model = model.clone(fold_bn=True)
        variables = fold_batchnorm_variables(variables)
    return model, variables


def fold_batchnorm_variables(variables: dict) -> dict:
    """``{'params', 'batch_stats'}`` of a BN model -> ``{'params'}`` for the
    same model constructed with ``fold_bn=True``. Weights come back as
    host numpy arrays."""
    stats = variables.get("batch_stats", {})
    params = _fold_node(dict(variables["params"]), dict(stats))
    return {"params": params}
