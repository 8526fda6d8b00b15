"""Multi-chip batched-stream serving.

The reference serves one two-stream ONNX session per host
(`/root/reference/export_to_onnx.py`); scaling to a camera rack means
running N sessions. The TPU-native equivalent is ONE jitted dispatch with
the frame batch sharded over the mesh's ``data`` axis: each chip densifies
its slice of the streams, weights replicated, no cross-chip traffic in the
forward (XLA inserts nothing — the graph is batch-parallel).

``shard_map`` is used rather than auto-SPMD so the fused Pallas kernels run
as-is on each chip's local shard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models import GuidedDepthNet
from .mesh import DATA_AXIS, make_mesh, pad_batch_to


class DataParallelEngine:
    """Rack-scale serving: ``engine(rgb0, d0, rgb1, d1)`` takes stacked
    frame arrays ``(N, H, W, C)`` (N two-stream rigs) and returns the two
    dense depth stacks. N is padded to a multiple of the mesh's data size;
    each device computes its local slice.
    """

    def __init__(
        self,
        variables: dict,
        *,
        height: int,
        width: int,
        mesh=None,
        model: GuidedDepthNet | None = None,
        fold_bn: bool = True,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        from ..models import maybe_fold, resolve_backend

        self.model, variables = maybe_fold(
            model or GuidedDepthNet(backend=resolve_backend("auto")),
            variables,
            fold_bn,
        )
        self.height, self.width = height, width
        self.n_data = self.mesh.shape[DATA_AXIS]

        mdl = self.model

        def local_forward(v, rgb0, d0, rgb1, d1):
            return mdl.apply(v, rgb0, d0, rgb1, d1, method=GuidedDepthNet.export)

        sharded = P(DATA_AXIS, None, None, None)
        fwd = shard_map(
            local_forward,
            mesh=self.mesh,
            in_specs=(P(), sharded, sharded, sharded, sharded),
            out_specs=(sharded, sharded),
            check_vma=False,
        )
        self._fn = jax.jit(fwd)
        self.variables = jax.device_put(
            variables, NamedSharding(self.mesh, P())
        )
        self._in_sharding = NamedSharding(self.mesh, sharded)

    def _stage(self, arr, channels: int) -> jax.Array:
        a = np.asarray(arr, np.float32)
        if a.ndim == 3 and channels == 1:
            a = a[..., None]
        assert a.shape[1:] == (self.height, self.width, channels), a.shape
        return jax.device_put(a, self._in_sharding)

    def __call__(self, rgb0, depth0, rgb1, depth1):
        n = np.asarray(rgb0).shape[0]
        n_pad = -(-n // self.n_data) * self.n_data
        batch = {"r0": rgb0, "d0": depth0, "r1": rgb1, "d1": depth1}
        batch, _ = pad_batch_to(
            {k: np.asarray(v, np.float32) for k, v in batch.items()}, n_pad
        )
        out0, out1 = self._fn(
            self.variables,
            self._stage(batch["r0"], 3),
            self._stage(batch["d0"], 1),
            self._stage(batch["r1"], 3),
            self._stage(batch["d1"], 1),
        )
        return out0[:n], out1[:n]
