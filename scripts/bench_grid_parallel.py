"""Measure mesh-parallel vs serial grid search on the 8-device virtual CPU
mesh (the multi-chip stand-in — see CLAUDE.md). 4-cell lr x wd grid,
unguided task, synthetic loaders.

Usage: python scripts/bench_grid_parallel.py [--epochs 2] [--hw 48 64]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--epochs", type=int, default=2)
ap.add_argument("--hw", type=int, nargs=2, default=(48, 64))
ap.add_argument("--batches", type=int, default=4)
args = ap.parse_args()

import jax  # noqa: E402

from nconv_tpu.training import (  # noqa: E402
    GridSearchConfig, OptimizerConfig, TrainConfig, UnguidedTask,
    grid_search, parallel_grid_search,
)

print("devices:", len(jax.devices()))
H, W = args.hw
rng = np.random.default_rng(0)


def synth(b=2):
    truth = np.fromfunction(
        lambda n, i, j, c: 2 + np.sin(i / 10) + np.cos(j / 12), (b, H, W, 1)
    ).astype(np.float32)
    return {
        "rgb": rng.random((b, H, W, 3)).astype(np.float32),
        "depth": truth * (rng.random((b, H, W, 1)) < 0.15),
        "gt": truth,
    }


train_b = [synth() for _ in range(args.batches)]
val_b = [synth() for _ in range(2)]
tr = lambda: iter(train_b)
va = lambda: iter(val_b)

cfg = TrainConfig(
    epochs=args.epochs, batch_size=2,
    optimizer=OptimizerConfig("adamw", 1e-2, 1e-7), log_every=0,
)
grid = GridSearchConfig(learning_rates=(1e-2, 1e-3), weight_decays=(1e-7, 1e-2))
quiet = lambda m: None

t0 = time.perf_counter()
bs, lrs_, wds_ = grid_search(UnguidedTask, cfg, grid, tr, va, log_fn=quiet)
t_serial = time.perf_counter() - t0

t0 = time.perf_counter()
bp, lrp, wdp = parallel_grid_search(UnguidedTask, cfg, grid, tr, va, log_fn=quiet)
t_parallel = time.perf_counter() - t0

assert (lrs_, wds_) == (lrp, wdp), ((lrs_, wds_), (lrp, wdp))
assert abs(bs.best_val_loss - bp.best_val_loss) / bs.best_val_loss < 1e-5
print(
    f"serial {t_serial:.2f}s  parallel {t_parallel:.2f}s  "
    f"speedup {t_serial / t_parallel:.2f}x  (same winner, "
    f"val {bs.best_val_loss:.5f} vs {bp.best_val_loss:.5f})"
)
