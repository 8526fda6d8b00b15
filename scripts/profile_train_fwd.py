"""Trace the trainer-config guided TRAIN forward (and optionally the
value_and_grad) at 480x640 b=1 on the TPU, with per-op digests.

The full train step (with optimizer) hangs the profiler over the tunnel;
the forward traces fine. Pass --vg to try the value_and_grad graph (no
optimizer), bounded by the shell timeout.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nconv_tpu.losses import multi_resolution_loss
from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.utils import profile_fn

ap = argparse.ArgumentParser()
ap.add_argument("--vg", action="store_true")
ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
args = ap.parse_args()

h, w, b = 480, 640, 1
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
d = jnp.asarray(
    rng.random((b, h, w, 1)) * 80 * (rng.random((b, h, w, 1)) < 0.06),
    jnp.float32,
)
gt = jnp.asarray(2 + rng.random((b, h, w, 1)), jnp.float32)

kw = {}
if args.dtype == "bf16":
    kw = dict(dtype=jnp.bfloat16, step1_dtype=jnp.float32)
model = GuidedDepthNet(backend="pallas", step1_aligned=True, **kw)
variables = GuidedDepthNet(backend="pallas", **kw).init(
    jax.random.key(0), rgb, d, rgb, d
)

if not args.vg:
    fwd = jax.jit(
        lambda v, rgb, d: model.apply(
            v, rgb, d, None, None, True, mutable=["batch_stats"]
        )
    )
    prof = profile_fn(lambda: fwd(variables, rgb, d), n_iters=4)
    print(prof.report(48))
else:
    params = variables["params"]
    stats = variables["batch_stats"]
    frozen = {"step1": params["step1"]}
    train_params = {k: v for k, v in params.items() if k != "step1"}

    def loss_p(tp, rgb, d, gt):
        (s0, _), mut = model.apply(
            {"params": {**tp, **frozen}, "batch_stats": stats}, rgb, d, None, None,
            True, mutable=["batch_stats"],
        )
        return multi_resolution_loss(s0, gt)

    vg = jax.jit(jax.value_and_grad(loss_p))
    prof = profile_fn(lambda: vg(train_params, rgb, d, gt), n_iters=4)
    print(prof.report(60))
