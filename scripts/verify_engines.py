"""Compile-and-parity probe: f32 + mixed engines at KITTI and NYU geometry."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.runtime import StreamingEngine

rng = np.random.default_rng(0)
for h, w in ((352, 1216), (480, 640)):
    rgb = np.asarray(rng.random((1, h, w, 3)), np.float32)
    d = np.asarray(
        rng.random((1, h, w, 1)) * 80 * (rng.random((1, h, w, 1)) < 0.06),
        np.float32,
    )
    variables = GuidedDepthNet().init(jax.random.key(0), rgb, d, rgb, d)
    e32 = StreamingEngine(
        variables, height=h, width=w,
        model=GuidedDepthNet(backend="pallas"),
    )
    e32.warmup()
    emix = StreamingEngine(
        variables, height=h, width=w,
        model=GuidedDepthNet(
            backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32
        ),
    )
    emix.warmup()
    r_s = e32._stage((rng.random((h, w, 3)) * 255).astype(np.float32), 3)
    d_s = e32._stage(
        (rng.random((h, w)) * 80 * (rng.random((h, w)) < 0.06)).astype(
            np.float32
        ),
        1,
    )
    o32 = e32._fn(e32.variables, r_s, d_s, r_s, d_s)
    omix = emix._fn(emix.variables, r_s, d_s, r_s, d_s)
    rel = jax.jit(
        lambda a, b: jnp.sqrt(jnp.mean((a.astype(jnp.float32) - b) ** 2))
        / jnp.sqrt(jnp.mean(b.astype(jnp.float32) ** 2))
    )
    v = float(np.asarray(rel(omix[0], o32[0])))
    print(f"{h}x{w}: engines compiled; mixed-vs-f32 rel RMSE {v:.3g}",
          flush=True)
    assert v < 1e-3, v
print("OK", flush=True)
