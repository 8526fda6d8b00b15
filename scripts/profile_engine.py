"""Trace the inference graph's device time on the real TPU; print top ops.

Usage:
  python scripts/profile_engine.py                 # b=1 two-stream engine
  python scripts/profile_engine.py --batch 8       # batched-throughput graph
  python scripts/profile_engine.py --height 480 --width 640
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

from nconv_tpu.models import GuidedDepthNet, fold_batchnorm_variables
from nconv_tpu.runtime import StreamingEngine
from nconv_tpu.utils import profile_fn

ap = argparse.ArgumentParser()
ap.add_argument("--height", type=int, default=352)
ap.add_argument("--width", type=int, default=1216)
ap.add_argument("--batch", type=int, default=1)
args = ap.parse_args()
h, w = args.height, args.width
rng = np.random.default_rng(0)
rgb = np.asarray(rng.random((1, h, w, 3)), np.float32)
d = np.asarray(
    rng.random((1, h, w, 1)) * 80 * (rng.random((1, h, w, 1)) < 0.06),
    np.float32,
)
variables = GuidedDepthNet().init(jax.random.key(0), rgb, d, rgb, d)
model = GuidedDepthNet(
    backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32,
)
if args.batch == 1:
    engine = StreamingEngine(variables, height=h, width=w, model=model)
    engine.warmup()
    r_s = engine._stage((rng.random((h, w, 3)) * 255).astype(np.float32), 3)
    d_s = engine._stage((rng.random((h, w)) * 80).astype(np.float32), 1)
    prof = profile_fn(
        lambda: engine._fn(engine.variables, r_s, d_s, r_s, d_s), n_iters=4
    )
else:
    b = args.batch
    folded_model = GuidedDepthNet(
        backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32,
        fold_bn=True,
    )
    folded = fold_batchnorm_variables(variables)
    rgbs = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
    ds = jnp.asarray(
        rng.random((b, h, w, 1)) * 80 * (rng.random((b, h, w, 1)) < 0.06),
        jnp.float32,
    )
    fwd = jax.jit(lambda v, r, d: folded_model.apply(v, r, d, r, d, method="export"))
    prof = profile_fn(lambda: fwd(folded, rgbs, ds), n_iters=3)
    print(f"per-frame (2 streams x b={b}): "
          f"{prof.ms_per_iter / (2 * b):.3f} ms", flush=True)
print(prof.report(24), flush=True)
