"""Wall-clock decomposition of the guided backward's conv kernels on the
real TPU: forward vs transpose-conv (d_x) vs filter-grad (d_w) at the
training graph's hot shapes. jax.profiler hangs on the train step over the
axon tunnel, so each kernel is timed as its own jitted function with a
result-dependent completion fetch (see CLAUDE.md).

Usage: python scripts/profile_train_bwd.py [--dtype bf16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nconv_tpu.ops.pallas_conv import (
    conv2d_pallas_bhcw,
    conv_filtergrad_pallas_bhcw,
    transpose_conv_bhcw,
)
from nconv_tpu.runtime.streaming import _force_complete

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
args = ap.parse_args()
dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

rng = np.random.default_rng(0)
# the guided training graph's dominant conv shapes at 480x640 b=1
# (two streams -> batch 2): (h, cin, cout, w)
SHAPES = [
    ("enc0/fuse3 32ch full-res", 480, 32, 32, 640),
    ("fuse3 upcat 64->32", 480, 64, 32, 640),
    ("enc1 out / fuse2 64ch", 240, 64, 64, 320),
    ("fuse2 upcat 128->64", 240, 128, 64, 320),
]


def timeit(name, fn, *arrs, n=10):
    out = fn(*arrs)
    _force_complete(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*arrs)
    _force_complete(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name}: {ms:.3f} ms", flush=True)
    return ms


for tag, h, cin, cout, w in SHAPES:
    x = jnp.asarray(rng.standard_normal((2, h, cin, w)), dt)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, dt)
    b = jnp.asarray(rng.standard_normal((cout,)), dt)
    g = jnp.asarray(rng.standard_normal((2, h, cout, w)), dt)
    print(f"{tag} (b2 {h}x{w} {cin}->{cout}, {args.dtype}):", flush=True)
    fwd = jax.jit(lambda x, k, b: conv2d_pallas_bhcw(x, k, b, padding=1))
    t_f = timeit("forward", fwd, x, k, b)
    dx = jax.jit(lambda g, k: transpose_conv_bhcw(g, k, 1))
    t_dx = timeit("d_x (transpose conv)", dx, g, k)
    dw = jax.jit(
        lambda x, g: conv_filtergrad_pallas_bhcw(x, g, kh=3, kw=3, padding=1)
    )
    t_dw = timeit("d_w (filter grad)", dw, x, g)
    print(f"  bwd/fwd ratio: {(t_dx + t_dw) / t_f:.2f}", flush=True)
