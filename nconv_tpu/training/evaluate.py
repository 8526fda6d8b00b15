"""Standalone evaluation: run a model over a dataset and report the full
depth-completion metric set.

The reference has no evaluation tooling beyond its training-loss validation
sweeps (its test scripts were deleted, SURVEY.md §4); this provides the
KITTI/NYU-style RMSE/MAE/iRMSE/iMAE/delta report the community compares on.
"""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .. import metrics
from ..models import GuidedDepthNet, NConvUNet


def evaluate(
    predict_fn: Callable[[dict], jax.Array],
    loader: Iterable[dict],
    *,
    max_batches: int | None = None,
) -> dict[str, float]:
    """Average each metric over the loader. ``predict_fn(batch) -> depth``
    (NHWC). Batches must carry ``gt``."""
    sums: dict[str, float] = {}
    n = 0
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        pred = predict_fn(batch)
        m = metrics.compute_all(pred, jnp.asarray(batch["gt"]))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    if n == 0:
        raise ValueError("empty loader")
    return {k: v / n for k, v in sums.items()}


def make_unguided_predict(variables: dict, model: NConvUNet | None = None):
    model = model or NConvUNet()
    fn = jax.jit(lambda v, d: model.apply(v, d)[0])

    def predict(batch):
        return fn(variables, jnp.asarray(batch["depth"]))

    return predict


def make_guided_predict(variables: dict, model: GuidedDepthNet | None = None):
    """Final-scale guided prediction. The reference's validation feeds the
    same input into both streams and reads stream 0 (train_step2.py); the
    single-stream form is exact at half the cost (GuidedDepthNet.__call__)."""
    model = model or GuidedDepthNet()
    fn = jax.jit(
        lambda v, r, d: model.apply(v, r, d, None, None, False)[0][-1]
    )

    def predict(batch):
        return fn(variables, jnp.asarray(batch["rgb"]), jnp.asarray(batch["depth"]))

    return predict
