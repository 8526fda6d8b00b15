#!/usr/bin/env python
"""Dump the guided export graph as plain StableHLO MLIR text.

The text module is the interchange payload for non-JAX consumers
(docs/INTEROP.md): a PJRT C-API client compiles it directly, and the
public StableHLO/ONNX bridges translate it offline. Weights are embedded
as constants, matching the reference ONNX deliverable
(/root/reference/export_to_onnx.py:57-74).

Usage:
  python scripts/export_stablehlo_mlir.py CKPT OUT.mlir \
      [--height 352] [--width 1216] [--batch N]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument(
        "--batch", type=int, default=None,
        help="fixed batch; default exports a dynamic batch axis",
    )
    args = ap.parse_args()

    from nconv_tpu.runtime import export_guided
    from nconv_tpu.training import load_best

    variables = load_best(args.checkpoint)
    exported = export_guided(
        variables, height=args.height, width=args.width, batch=args.batch
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(exported.mlir_module())
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
