"""f64 decomposition of the ours-vs-torch gradient gap (the evidence
behind test_guided_train_grad_parity_vs_torch's tolerances).

Runs the guided train-mode forward/backward three ways at 480x640 —
torch f32 (patched reference SETP2_BP_TRAIN + its loss), ours f32, ours
f64 — and reports, per leaf, the ours-vs-torch gap against the sum of
both sides' own f32 rounding noise measured around the common f64 value.
The torch graph cannot run in f64 (models/step1.py:53 hardcodes
``.float()``), so the f64 truth comes from our graph; the decomposition
is still conclusive because gap <= ours_noise + torch_noise holds with
ratio <= 1.00 for every leaf (measured), i.e. the gap IS the rounding.

Takes ~45 min on CPU (the f64 jit dominates).

Usage: JAX_PLATFORMS=cpu python scripts/grad_parity_deep.py [--mode all]
       (or run modes torch32 / jax32 / jax64 in separate processes and
        then --mode compare; jax_enable_x64 is process-global)
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ap = argparse.ArgumentParser()
ap.add_argument(
    "--mode", choices=["all", "torch32", "jax32", "jax64", "compare"],
    default="all",
)
ap.add_argument("--outdir", default=os.path.join(tempfile.gettempdir(), "gpd"))
args = ap.parse_args()
os.makedirs(args.outdir, exist_ok=True)


def dump(mode: str) -> None:
    import numpy as np

    if mode == "jax64":
        import jax

        jax.config.update("jax_enable_x64", True)
    import jax
    import jax.numpy as jnp
    import torch

    from convergence_harness import build_torch_side
    from nconv_tpu.compat import convert_guided_state_dict
    from nconv_tpu.compat.torch_convert import _flatten
    from nconv_tpu.losses import multi_resolution_loss
    from nconv_tpu.models import GuidedDepthNet

    h, w = 480, 640
    rng = np.random.default_rng(11)
    rgb = rng.random((1, 3, h, w)).astype(np.float32)
    truth = np.fromfunction(
        lambda n, c, i, j: 2 + np.sin(i / 17) + np.cos(j / 23), (1, 1, h, w)
    ).astype(np.float32)
    d = (truth * (rng.random((1, 1, h, w)) < 0.05)).astype(np.float32)
    gt_nchw = (truth * (rng.random((1, 1, h, w)) < 0.8)).astype(np.float32)

    model_t, ref_loss, sd0 = build_torch_side(seed=11)

    if mode == "torch32":
        est0, _ = model_t(
            torch.tensor(rgb), torch.tensor(d),
            torch.tensor(rgb), torch.tensor(d),
        )
        loss = ref_loss(est0, torch.tensor(gt_nchw))
        loss.backward()
        grads = {
            k: p.grad.detach().clone()
            for k, p in model_t.named_parameters()
            if p.grad is not None
        }
        tree = convert_guided_state_dict(grads, kernel_mode="raw")["params"]
        flat = {"/".join(p): np.asarray(v) for p, v in _flatten(tree).items()}
    else:
        variables = convert_guided_state_dict(sd0, kernel_mode="raw")
        if mode == "jax64":
            variables = jax.tree.map(
                lambda x: np.asarray(x, np.float64)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else x,
                variables,
            )
        model_j = GuidedDepthNet()
        nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # noqa: E731
        gt = nhwc(gt_nchw)

        def loss_fn(params):
            (s0, _), _ = model_j.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                nhwc(rgb), nhwc(d), None, None, True, mutable=["batch_stats"],
            )
            return multi_resolution_loss(
                s0, gt, use_gradient_loss=False, batch_reduce="first"
            )

        _, g = jax.value_and_grad(loss_fn)(variables["params"])
        flat = {
            "/".join(p): np.asarray(v, np.float64)
            for p, v in _flatten(g).items()
        }
    np.savez(os.path.join(args.outdir, f"g_{mode}.npz"), **flat)
    print(f"saved {mode}: {len(flat)} leaves", file=sys.stderr)


def compare() -> None:
    import numpy as np

    t = dict(np.load(os.path.join(args.outdir, "g_torch32.npz")))
    j32 = dict(np.load(os.path.join(args.outdir, "g_jax32.npz")))
    j64 = dict(np.load(os.path.join(args.outdir, "g_jax64.npz")))
    rows = []
    for k in t:
        gap = float(np.linalg.norm(j32[k] - t[k]))
        ours = float(np.linalg.norm(j32[k] - j64[k]))
        theirs = float(np.linalg.norm(t[k] - j64[k]))
        rows.append(
            {
                "leaf": k,
                "gap": gap,
                "ours_noise": ours,
                "torch_noise": theirs,
                "ratio": gap / (ours + theirs + 1e-30),
            }
        )
    rows.sort(key=lambda r: -r["ratio"])
    print(json.dumps({"max_ratio": rows[0]["ratio"], "worst": rows[:5]}))


if args.mode == "all":
    # x64 is process-global in jax: run each dump in its own interpreter
    for m in ("torch32", "jax32", "jax64"):
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", m,
             "--outdir", args.outdir],
            check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
    compare()
elif args.mode == "compare":
    compare()
else:
    dump(args.mode)
