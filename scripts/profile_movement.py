"""Dump ALL trace ops (with categories) for the b=1 engine — movement hunt.

Usage: python scripts/profile_movement.py [--height 352 --width 1216]
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

from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.runtime import StreamingEngine
from nconv_tpu.utils import profile_fn

ap = argparse.ArgumentParser()
ap.add_argument("--height", type=int, default=352)
ap.add_argument("--width", type=int, default=1216)
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
engine = StreamingEngine(variables, height=h, width=w, model=model)
engine.warmup()
r_s = engine._stage((rng.random((h, w, 3)) * 255).astype(np.float32), 3)
d_s = engine._stage((rng.random((h, w)) * 80).astype(np.float32), 1)
prof = profile_fn(
    lambda: engine._fn(engine.variables, r_s, d_s, r_s, d_s), n_iters=4
)
print(f"device time: {prof.ms_per_iter:.3f} ms/iter")
print("-- every op >= 3 us/iter:")
for k, v in sorted(prof.by_op.items(), key=lambda kv: -kv[1]):
    if v >= 3:
        print(f"  {v:>8.0f}  {k}")
