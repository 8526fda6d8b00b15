"""Trace the TRAIN-MODE guided forward (no grad) at 480x640 b=1 on the TPU.

The full train step hangs the profiler over the tunnel; the forward alone
is a plain jitted function and traces fine — it carries the train-mode tax
(live BN, unfolded graph, per-conv channel padding) we want to see.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.utils import profile_fn

h, w, b = 480, 640, 1
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
d = jnp.asarray(
    rng.random((b, h, w, 1)) * 80 * (rng.random((b, h, w, 1)) < 0.06),
    jnp.float32,
)
model = GuidedDepthNet(backend="pallas")
variables = model.init(jax.random.key(0), rgb, d, rgb, d)
fwd = jax.jit(
    lambda v, rgb, d: model.apply(
        v, rgb, d, rgb, d, True, mutable=["batch_stats"]
    )
)
prof = profile_fn(lambda: fwd(variables, rgb, d), n_iters=4)
print(prof.report(40))
