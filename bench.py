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
    import time

    import jax

    # persistent compile cache (works under the axon remote compiler; saves
    # minutes of XLA recompiles across runs)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.runtime import StreamingEngine, benchmark

    h, w = 352, 1216
    # Headline mode: fused Pallas kernels with the mixed-precision schedule
    # (bf16 feature convs, f32 unguided densifier + all depth tensors) —
    # measured 7e-5 relative RMSE vs the all-f32 path, well inside the
    # <1e-3 parity bar.
    model = GuidedDepthNet(
        backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    rgb = np.asarray(rng.random((1, h, w, 3)), np.float32)
    d = np.asarray(
        rng.random((1, h, w, 1)) * 80 * (rng.random((1, h, w, 1)) < 0.06), np.float32
    )
    variables = GuidedDepthNet().init(jax.random.key(0), rgb, d, rgb, d)

    engine = StreamingEngine(variables, height=h, width=w, model=model)
    engine.warmup()
    stats = benchmark(engine, n_frames=120, warmup=10)
    dev = stats["device"]
    synced = stats.get("synced")
    e2e = stats.get("e2e")

    # secondary: all-f32 reference mode (exact parity path)
    model_f32 = GuidedDepthNet(backend="pallas")
    fn = jax.jit(
        lambda v, r, dd: model_f32.apply(
            v, r, dd, r, dd, method=GuidedDepthNet.export
        )[0].sum()
    )
    rgb_j, d_j = jnp.asarray(rgb), jnp.asarray(d)
    _ = float(np.asarray(fn(variables, rgb_j, d_j)))
    t0 = time.perf_counter()
    for _ in range(30):
        s = fn(variables, rgb_j, d_j)
    _ = float(np.asarray(s))
    f32_ms = (time.perf_counter() - t0) / 30 * 1e3

    # Headline: amortized device execution of the fused frame graph with
    # completion forced (see streaming._force_complete — block_until_ready
    # is not a real sync on the axon tunnel). "synced"/"e2e" add one
    # transport round trip per frame (tiny on PCIe; tens of ms on the
    # relay), reported with wire size so transport-bound numbers are
    # interpretable.
    # XLA-trace device time: the purest per-frame number — excludes the
    # tunnel's ~2ms/frame dispatch overhead that a local host wouldn't pay
    trace_ms = None
    try:
        from nconv_tpu.utils import profile_fn

        rng2 = np.random.default_rng(1)
        r_s = engine._stage((rng2.random((h, w, 3)) * 255).astype(np.float32), 3)
        d_s = engine._stage((rng2.random((h, w)) * 80).astype(np.float32), 1)
        prof = profile_fn(
            lambda: engine._fn(engine.variables, r_s, d_s, r_s, d_s), n_iters=3
        )
        if prof.ms_per_iter > 0:
            trace_ms = prof.ms_per_iter
    except Exception:
        pass

    target_fps = 60.0
    # p50-based: the shared TPU tunnel shows rare multi-frame stalls that
    # poison a mean but not the median
    p50_fps = 1000.0 / dev.p50_ms
    result = {
        "metric": "guided_nconv_fps_kitti_352x1216_b1",
        "value": round(p50_fps, 2),
        "unit": "fps",
        "vs_baseline": round(p50_fps / target_fps, 3),
        "p50_ms": round(dev.p50_ms, 3),
        "p90_ms": round(dev.p90_ms, 3),
        "p99_ms": round(dev.p99_ms, 3),
        "synced_p50_ms": round(synced.p50_ms, 3) if synced else None,
        "e2e_p50_ms": round(e2e.p50_ms, 3) if e2e else None,
        "f32_fps": round(1000.0 / f32_ms, 2),
        "f32_ms": round(f32_ms, 3),
        "trace_ms": round(trace_ms, 3) if trace_ms else None,
        "trace_fps": round(1000.0 / trace_ms, 2) if trace_ms else None,
        "wire_mb_per_frame": round(engine.wire_bytes_per_frame / 1e6, 2),
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
