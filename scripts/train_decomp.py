"""Decompose the guided train step at 480x640 b=1, backend=pallas."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from nconv_tpu.losses import multi_resolution_loss
from nconv_tpu.models import GuidedDepthNet, NConvUNet
from nconv_tpu.runtime.streaming import _force_complete
from nconv_tpu.training import GuidedTask, OptimizerConfig, TrainConfig, Trainer

h, w, b = 480, 640, 1
rng = np.random.default_rng(0)
truth = np.fromfunction(
    lambda n, i, j, c: 2 + np.sin(i / 40) + np.cos(j / 60), (b, h, w, 1)
).astype(np.float32)
batch = {
    "rgb": rng.random((b, h, w, 3)).astype(np.float32),
    "depth": (truth * (rng.random((b, h, w, 1)) < 0.06)).astype(np.float32),
    "gt": truth,
}

task = GuidedTask(GuidedDepthNet(backend="pallas"))
cfg = TrainConfig(
    epochs=1, batch_size=b, optimizer=OptimizerConfig("adamw", 1e-3, 1e-7),
    log_every=0,
)
trainer = Trainer(task, cfg, log_fn=lambda m: None)
dbatch = trainer._device_batch(batch)
state = trainer.init_state(jax.random.key(0), dbatch)
trainer._build_steps()
params, stats, opt_state = state["params"], state["batch_stats"], state["opt_state"]
model = task.model
variables = {"params": params, "batch_stats": stats}


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _force_complete(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _force_complete(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return out


rgb, d, gt = dbatch["rgb"], dbatch["depth"], dbatch["gt"]

# 1. full train step (incl optimizer) — thread state (donated buffers)
st = {"params": params, "batch_stats": stats, "opt_state": opt_state}


def step_once(st):
    p, s, o, loss = trainer._train_step(
        st["params"], st["batch_stats"], st["opt_state"], dbatch
    )
    return {"params": p, "batch_stats": s, "opt_state": o}, loss


st, loss = step_once(st)
_force_complete(loss)
t0 = time.perf_counter()
for _ in range(10):
    st, loss = step_once(st)
_force_complete(loss)
print(f"full train step: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)
params, stats, opt_state = st["params"], st["batch_stats"], st["opt_state"]
variables = {"params": params, "batch_stats": stats}

# 2. forward only, train mode (mutable batch_stats)
fwd = jax.jit(
    lambda v, rgb, d: model.apply(v, rgb, d, None, None, True, mutable=["batch_stats"])
)
timeit("forward (train mode)", fwd, variables, rgb, d)

# 3. forward + loss, fwd only
def loss_fn(v, rgb, d, gt):
    (s0, _), mut = model.apply(v, rgb, d, None, None, True, mutable=["batch_stats"])
    return multi_resolution_loss(s0, gt), mut

jl = jax.jit(loss_fn)
timeit("forward + loss", jl, variables, rgb, d, gt)

# 4. value_and_grad (no optimizer) — trainable subtree only, like the
# Trainer (the frozen step 1 runs the non-differentiable aligned graph)
frozen = {"step1": params["step1"]}
train_params = {k: v for k, v in params.items() if k != "step1"}


def loss_p(tp, rgb, d, gt):
    (s0, _), mut = model.apply(
        {"params": {**tp, **frozen}, "batch_stats": stats}, rgb, d, None, None,
        True, mutable=["batch_stats"],
    )
    return multi_resolution_loss(s0, gt)

vg = jax.jit(jax.value_and_grad(loss_p))
timeit("value_and_grad", vg, train_params, rgb, d, gt)

# 5. step1 alone b=2 fwd (frozen in guided training)
s1 = NConvUNet(backend="pallas")
s1v = {"params": params["step1"]}
d2 = jnp.concatenate([d, d], axis=0)
s1fwd = jax.jit(lambda v, x: s1.apply(v, x))
timeit("step1 fwd b=2", s1fwd, s1v, d2)

# 6. loss alone fwd+bwd w.r.t. scales
(s0, _), _ = fwd(variables, rgb, d)
s0 = [jnp.asarray(x) for x in s0]
lvg = jax.jit(jax.value_and_grad(lambda s, gt: multi_resolution_loss(s, gt)))
timeit("loss fwd+bwd (given scales)", lvg, s0, gt)

# 7. optimizer update alone (full-tree grads: zeros for the frozen step1)
_, g_t = vg(train_params, rgb, d, gt)
g = {**g_t, "step1": jax.tree.map(jnp.zeros_like, frozen["step1"])}
upd = jax.jit(lambda g, o, p: trainer.tx.update(g, o, p))
try:
    timeit("optimizer update", upd, g, opt_state, params)
except Exception as e:
    print("optimizer update: skipped:", type(e).__name__, str(e)[:200])
