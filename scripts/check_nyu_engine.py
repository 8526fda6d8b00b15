"""Cross-check: StreamingEngine p50 at NYU 480x640 vs KITTI 352x1216."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.runtime.streaming import StreamingEngine

rng = np.random.default_rng(0)

for h, w in [(480, 640), (352, 1216)]:
    model = GuidedDepthNet()
    rgb = rng.random((1, h, w, 3)).astype(np.float32)
    d = (2 + rng.random((1, h, w, 1))).astype(np.float32)
    d *= rng.random((1, h, w, 1)) < 0.06
    variables = model.init(jax.random.key(0), rgb, d, rgb, d)
    eng = StreamingEngine(variables, height=h, width=w)
    eng.warmup()
    r8 = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    d16 = (d[0] * 256).astype(np.uint16)
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = eng(r8, d16, r8, d16)
        ts.append(time.perf_counter() - t0)
    ts = np.array(sorted(ts))
    print(f"{h}x{w}: p50 {ts[len(ts)//2]*1e3:.2f} ms", flush=True)
