"""Model export: serialized StableHLO via ``jax.export``.

The TPU-native equivalent of the reference's ONNX deliverable
(`/root/reference/export_to_onnx.py`): the guided export graph — two RGB +
two sparse-depth inputs -> two dense-depth outputs, same I/O contract as the
ONNX file's ``rgb_0, depth_0, rgb_1, depth_1 -> output_depth_0,
output_depth_1`` naming — serialized portably with the weights baked in.
The artifact reloads into any JAX process (CPU/GPU/TPU) without the model
code."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from ..models import GuidedDepthNet


def export_guided(
    variables: dict,
    *,
    height: int,
    width: int,
    batch: int | None = None,
    compute_dtype=jnp.float32,
    model: GuidedDepthNet | None = None,
) -> jexport.Exported:
    """Trace + lower the deployment forward to a serializable Exported.

    ``batch=None`` (default) exports a **dynamic batch axis** via
    ``jax.export`` symbolic shapes — matching the reference's ONNX contract,
    which declares a dynamic batch dim on all 4 inputs / 2 outputs
    (`/root/reference/export_to_onnx.py:65-73`). Pass an int for a
    fixed-batch artifact."""
    model = model or GuidedDepthNet(dtype=compute_dtype)
    frozen = jax.tree.map(jnp.asarray, variables)

    def fn(rgb_0, depth_0, rgb_1, depth_1):
        f = lambda x: x.astype(compute_dtype)
        return model.apply(
            frozen, f(rgb_0), f(depth_0), f(rgb_1), f(depth_1),
            method=GuidedDepthNet.export,
        )

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    rgb_spec = jax.ShapeDtypeStruct((b, height, width, 3), jnp.float32)
    d_spec = jax.ShapeDtypeStruct((b, height, width, 1), jnp.float32)
    return jexport.export(jax.jit(fn))(rgb_spec, d_spec, rgb_spec, d_spec)


def save_exported(exported: jexport.Exported, path: str) -> str:
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str):
    """Load a serialized graph; returns a callable
    ``(rgb0, d0, rgb1, d1) -> (depth0, depth1)``."""
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def call(rgb0, d0, rgb1, d1):
        return exported.call(
            jnp.asarray(rgb0), jnp.asarray(d0), jnp.asarray(rgb1), jnp.asarray(d1)
        )

    return call
