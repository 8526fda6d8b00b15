"""Guided train-step throughput vs batch size (480x640, pallas).

The reference trains step 2 at batch=1 only (train_step2.py); on TPU the
same graph batches freely (B is a leading tile dim in the BHCW kernels).
Prints ms/step and ms/sample for b in {1, 2, 4}.

Usage: python scripts/train_batch_sweep.py [--precision bf16] [--batches 1 2 4]
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

from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.runtime.streaming import _force_complete
from nconv_tpu.training import GuidedTask, OptimizerConfig, TrainConfig, Trainer

ap = argparse.ArgumentParser()
ap.add_argument("--precision", choices=["f32", "bf16"], default="f32")
ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
args = ap.parse_args()

h, w = 480, 640
rng = np.random.default_rng(0)

for b in args.batches:
    truth = np.fromfunction(
        lambda n, i, j, c: 2 + np.sin(i / 40) + np.cos(j / 60), (b, h, w, 1)
    ).astype(np.float32)
    batch = {
        "rgb": rng.random((b, h, w, 3)).astype(np.float32),
        "depth": (truth * (rng.random((b, h, w, 1)) < 0.06)).astype(np.float32),
        "gt": truth,
    }
    kw = (
        dict(dtype=jnp.bfloat16, step1_dtype=jnp.float32)
        if args.precision == "bf16"
        else {}
    )
    task = GuidedTask(GuidedDepthNet(backend="pallas", **kw))
    cfg = TrainConfig(
        epochs=1, batch_size=b, optimizer=OptimizerConfig("adamw", 1e-3, 1e-7),
        log_every=0,
    )
    trainer = Trainer(task, cfg, log_fn=lambda m: None)
    dbatch = trainer._device_batch(batch)
    state = trainer.init_state(jax.random.key(0), dbatch)
    trainer._build_steps()
    st = {
        "params": state["params"],
        "batch_stats": state["batch_stats"],
        "opt_state": state["opt_state"],
    }

    def step_once(st):
        p, s, o, loss = trainer._train_step(
            st["params"], st["batch_stats"], st["opt_state"], dbatch
        )
        return {"params": p, "batch_stats": s, "opt_state": o}, loss

    st, loss = step_once(st)
    _force_complete(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        st, loss = step_once(st)
    _force_complete(loss)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(
        f"b={b}: {ms:.2f} ms/step, {ms / b:.2f} ms/sample "
        f"({1e3 / (ms / b):.1f} samples/s)",
        flush=True,
    )
