"""Dump the compiled HLO of the guided value_and_grad graph (CPU compile is
fine for attribution — op set matches; run with JAX_PLATFORMS=cpu to avoid
touching the TPU) and list pad/copy/slice/dus instructions with shapes and
source metadata, largest first.

Usage: JAX_PLATFORMS=cpu python scripts/dump_vg_hlo.py [--dtype bf16]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nconv_tpu.losses import multi_resolution_loss
from nconv_tpu.models import GuidedDepthNet

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
ap.add_argument("--out", default="/tmp/vg_hlo.txt")
args = ap.parse_args()

h, w, b = 480, 640, 1
rng = np.random.default_rng(0)
rgb = jnp.asarray(rng.random((b, h, w, 3)), jnp.float32)
d = jnp.asarray(
    rng.random((b, h, w, 1)) * 80 * (rng.random((b, h, w, 1)) < 0.06),
    jnp.float32,
)
gt = jnp.asarray(2 + rng.random((b, h, w, 1)), jnp.float32)

kw = {}
if args.dtype == "bf16":
    kw = dict(dtype=jnp.bfloat16, step1_dtype=jnp.float32)
model = GuidedDepthNet(backend="pallas", step1_aligned=True, **kw)
variables = GuidedDepthNet(backend="pallas", **kw).init(
    jax.random.key(0), rgb, d, rgb, d
)
params = variables["params"]
stats = variables["batch_stats"]
frozen = {"step1": params["step1"]}
train_params = {k: v for k, v in params.items() if k != "step1"}


def loss_p(tp, rgb, d, gt):
    (s0, _), mut = model.apply(
        {"params": {**tp, **frozen}, "batch_stats": stats}, rgb, d, None, None,
        True, mutable=["batch_stats"],
    )
    return multi_resolution_loss(s0, gt)

vg = jax.jit(jax.value_and_grad(loss_p))
lowered = vg.lower(train_params, rgb, d, gt)
compiled = lowered.compile()
txt = compiled.as_text()
with open(args.out, "w") as f:
    f.write(txt)
print(f"wrote {args.out}: {len(txt)} bytes")


def nbytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for x in dims.split(","):
        if x:
            n *= int(x)
    size = {"f32": 4, "bf16": 2, "s32": 4, "u8": 1, "u16": 2, "f64": 8,
            "pred": 1, "s8": 1, "u32": 4}.get(dt, 4)
    return n * size


rows = []
for line in txt.splitlines():
    ls = line.strip()
    m = re.match(r"(\S+)\s*=\s*(\S+\[[\d,]*\][^ ]*)\s+(pad|copy|slice|dynamic-update-slice|dynamic-slice|concatenate|transpose|broadcast)\(", ls)
    if not m:
        continue
    name, shape, op = m.groups()
    meta = ""
    mm = re.search(r'op_name="([^"]*)"', ls)
    if mm:
        meta = mm.group(1)[-110:]
    src = ""
    sm = re.search(r'source_file="([^"]*)".*source_line=(\d+)', ls)
    if sm:
        src = f"{os.path.basename(sm.group(1))}:{sm.group(2)}"
    rows.append((nbytes(shape), op, shape, name, meta, src))

rows.sort(reverse=True)
total = {}
for nb, op, shape, name, meta, src in rows:
    total[op] = total.get(op, 0) + nb
print("-- total bytes by op:")
for op, nb in sorted(total.items(), key=lambda kv: -kv[1]):
    print(f"  {op:24s} {nb/1e6:9.1f} MB")
print("-- top 45 movement instructions:")
for nb, op, shape, name, meta, src in rows[:45]:
    print(f"  {nb/1e6:7.1f} MB {op:10s} {shape:28s} {src:28s} {meta}")
