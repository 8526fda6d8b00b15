"""Train the patched reference torch harness and ours side-by-side and
compare the loss curves (VERDICT r3 item 2b).

Both start from the SAME converted weights, see the SAME synthetic frames,
and step the SAME AdamW. Defaults: 200 steps at 96x128 (the reference graph
made geometry-generic by the no-op-at-native step-1 crop patch — see
tests/convergence_harness.py; pass --h 480 --w 640 for the native geometry
if you have hours of CPU). Prints one JSON line with both curves and the
max relative gap.

Usage: JAX_PLATFORMS=cpu python scripts/convergence_vs_torch.py \
           [--steps 200] [--h 96] [--w 128] [--lr 1e-4]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=200)
ap.add_argument("--h", type=int, default=96)
ap.add_argument("--w", type=int, default=128)
ap.add_argument("--lr", type=float, default=1e-4)
ap.add_argument("--wd", type=float, default=1e-7)
args = ap.parse_args()

from convergence_harness import run_comparison  # noqa: E402

r = run_comparison(
    n_steps=args.steps, h=args.h, w=args.w, lr=args.lr, weight_decay=args.wd
)
print(
    json.dumps(
        {
            "steps": args.steps,
            "geometry": [args.h, args.w],
            "max_rel_gap": r["max_rel_gap"],
            "torch_first_last": [r["losses_torch"][0], r["losses_torch"][-1]],
            "jax_first_last": [r["losses_jax"][0], r["losses_jax"][-1]],
            "losses_torch": r["losses_torch"],
            "losses_jax": r["losses_jax"],
        }
    )
)
