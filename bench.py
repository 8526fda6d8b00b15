"""Headline benchmark: guided two-stream depth completion, batch=1,
KITTI test geometry 352x1216, on the default platform (TPU under axon).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/60, ...}

vs_baseline is measured against the BASELINE.json north-star target of
60 FPS on one v5e chip (the reference publishes no numbers of its own —
BASELINE.md).
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main() -> None:
    import jax

    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.runtime import StreamingEngine, benchmark

    h, w = 352, 1216
    model = GuidedDepthNet()
    rng = np.random.default_rng(0)
    rgb = np.asarray(rng.random((1, h, w, 3)), np.float32)
    d = np.asarray(
        rng.random((1, h, w, 1)) * 80 * (rng.random((1, h, w, 1)) < 0.06), np.float32
    )
    variables = model.init(jax.random.key(0), rgb, d, rgb, d)

    engine = StreamingEngine(variables, height=h, width=w, model=model)
    engine.warmup()
    stats = benchmark(engine, n_frames=120, warmup=10)
    dev = stats["device"]
    synced = stats.get("synced")
    e2e = stats.get("e2e")

    # Headline: amortized device execution of the fused frame graph with
    # completion forced (see streaming._force_complete — block_until_ready
    # is not a real sync on the axon tunnel). "synced"/"e2e" add one
    # transport round trip per frame (tiny on PCIe; tens of ms on the
    # relay), reported with wire size so transport-bound numbers are
    # interpretable.
    target_fps = 60.0
    result = {
        "metric": "guided_nconv_fps_kitti_352x1216_b1",
        "value": round(dev.fps, 2),
        "unit": "fps",
        "vs_baseline": round(dev.fps / target_fps, 3),
        "p50_ms": round(dev.p50_ms, 3),
        "p90_ms": round(dev.p90_ms, 3),
        "p99_ms": round(dev.p99_ms, 3),
        "synced_p50_ms": round(synced.p50_ms, 3) if synced else None,
        "e2e_p50_ms": round(e2e.p50_ms, 3) if e2e else None,
        "wire_mb_per_frame": round(engine.wire_bytes_per_frame / 1e6, 2),
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
