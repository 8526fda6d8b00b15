"""Device mesh + sharding utilities (the distributed layer).

The reference's only parallelism is single-process ``nn.DataParallel``
replication (`/root/reference/train_step1.py:153`, SURVEY.md §2.7). The
TPU-native equivalent is SPMD over a ``jax.sharding.Mesh``: parameters
replicated, batch sharded over the ``data`` axis, gradients all-reduced by
XLA over ICI when the jitted train step runs on sharded inputs. Checkpoints
are replica-free by construction (no ``module.`` prefixes to strip).

A second ``model`` axis is provisioned for spatial partitioning of the
convolutional graph (XLA SPMD inserts halo exchanges for spatially-sharded
convs); the model zoo here fits easily on one chip, so it defaults to 1.
"""
from __future__ import annotations

from typing import Any, Iterable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC sharding that splits H over the ``model`` axis (XLA SPMD halo
    exchange handles the conv overlaps) and batch over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))


def pad_batch_to(batch: Any, size: int) -> Any:
    """Pad every leaf's leading axis up to ``size`` (for even sharding of a
    ragged final batch); returns (padded, n_real)."""
    def _pad(x):
        n = x.shape[0]
        if n == size:
            return x
        pad = [(0, size - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad)

    leaves = jax.tree.leaves(batch)
    n_real = leaves[0].shape[0] if leaves else 0
    return jax.tree.map(_pad, batch), n_real
