"""Where does the guided TRAINING forward's time go (480x640, b=1, pallas)?

Compares, at identical geometry on the real TPU:
  - train-mode apply (mutable batch_stats, multi-scale outputs)
  - eval-mode apply (running stats, multi-scale outputs)
  - the aligned fold_bn inference graph (final scale only)
  - step1 alone in its aligned form (what the trainer actually runs frozen)

Usage: python scripts/profile_train_fwd2.py [--dtype bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nconv_tpu.models import GuidedDepthNet, NConvUNet
from nconv_tpu.models.fold import fold_batchnorm_variables
from nconv_tpu.runtime.streaming import _force_complete

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
args = ap.parse_args()

h, w, b = 480, 640, 1
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
d = jnp.asarray(
    (2 + rng.random((b, h, w, 1))) * (rng.random((b, h, w, 1)) < 0.06),
    jnp.float32,
)

if args.dtype == "bf16":
    model = GuidedDepthNet(
        backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32
    )
else:
    model = GuidedDepthNet(backend="pallas")
variables = model.init(jax.random.key(0), rgb, d, rgb, d)


def timeit(name, fn, *arrs, n=20):
    out = fn(*arrs)
    _force_complete(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*arrs)
    _force_complete(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return ms


# 1. train-mode forward (what value_and_grad differentiates)
tr = jax.jit(
    lambda v, rgb, d: model.apply(v, rgb, d, rgb, d, True, mutable=["batch_stats"])
)
timeit("train-mode fwd (multi-scale)", tr, variables, rgb, d)

# 1b. same but step1 aligned (the trainer's actual configuration)
model_a = model.clone(step1_aligned=True)
tra = jax.jit(
    lambda v, rgb, d: model_a.apply(v, rgb, d, rgb, d, True, mutable=["batch_stats"])
)
timeit("train-mode fwd, step1 aligned", tra, variables, rgb, d)

# 2. eval-mode forward (multi-scale, running stats)
ev = jax.jit(lambda v, rgb, d: model_a.apply(v, rgb, d, rgb, d, False))
timeit("eval-mode fwd (multi-scale)", ev, variables, rgb, d)

# 3. the aligned fold_bn inference graph (final scale)
mi = GuidedDepthNet(
    backend="pallas",
    fold_bn=True,
    dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    step1_dtype=jnp.float32,
)
vi = fold_batchnorm_variables(variables)
ex = jax.jit(lambda v, rgb, d: mi.apply(v, rgb, d, rgb, d, method=mi.export))
timeit("aligned fold_bn export fwd", ex, vi, rgb, d)

# 4. step1 alone, aligned form, b=2 (frozen cost inside training)
s1 = NConvUNet(backend="pallas", aligned=True)
s1v = {"params": variables["params"]["step1"]}
d2 = jnp.concatenate([d, d], axis=0)
s1f = jax.jit(lambda v, x: s1.apply(v, x))
timeit("step1 aligned fwd b=2", s1f, s1v, d2)
