"""Headline benchmark: guided two-stream depth completion, batch=1,
KITTI test geometry 352x1216, on the default platform (TPU under axon).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N/60, ...}

vs_baseline is measured against the BASELINE.json north-star target of
60 FPS on one v5e chip (the reference publishes no numbers of its own —
BASELINE.md).

Headline mode: fused Pallas kernels, full aligned-form (B,H,C,W) graph
(no XLA pads, concat-free multi-input kernels), BatchNorm folded into conv
weights, mixed precision (bf16 feature convs, f32 unguided densifier +
every depth tensor) — measured 7e-5 relative RMSE vs the f32 XLA engine
on identical wire inputs, inside the <1e-3 parity bar.
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

    from nconv_tpu.models import GuidedDepthNet, fold_batchnorm_variables
    from nconv_tpu.runtime import StreamingEngine, benchmark
    from nconv_tpu.runtime.streaming import _force_complete, benchmark_throughput

    h, w = 352, 1216
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

    # secondary: all-f32 pallas engine (exact-parity path)
    engine32 = StreamingEngine(
        variables, height=h, width=w, model=GuidedDepthNet(backend="pallas")
    )
    engine32.warmup()
    s32 = benchmark(engine32, n_frames=40, warmup=5, include_e2e=False)
    f32_ms = s32["device"].p50_ms

    # pipelined streaming loop (StreamingEngine.run, depth-3 in flight):
    # sustained host->HBM->compute throughput including staging
    def frames(n):
        fs = []
        for i in range(4):
            fs.append((
                (rng.random((h, w, 3)) * 255).astype(np.float32),
                (rng.random((h, w)) * 80 * (rng.random((h, w)) < 0.06)).astype(np.float32),
                (rng.random((h, w, 3)) * 255).astype(np.float32),
                (rng.random((h, w)) * 80 * (rng.random((h, w)) < 0.06)).astype(np.float32),
            ))
        for i in range(n):
            yield fs[i % 4]

    n_stream = 60

    def pre_encode(eng, f):
        """Host-encode a frame into the engine's wire arrays (kept OUT of
        the link probes so they time transport only)."""
        from nconv_tpu.data import native

        def enc_rgb(a):
            if eng.rgb_wire == "yuv420":
                return native.encode_yuv420(
                    np.clip(a, 0, 255).astype(np.uint8)
                )
            return a.astype(np.uint8)

        def enc_d(a):
            if eng.depth_wire == "coo":
                idx, val, _ = native.encode_depth_coo(
                    a, eng.coo_capacity, eng.DEPTH_SCALE
                )
                return (idx, val)
            return eng._encode_depth(a)

        return enc_rgb(f[0]), enc_d(f[1]), enc_rgb(f[2]), enc_d(f[3])

    def link_probe(eng, wire4, n=10):
        """Upload-only host->HBM rate (MB/s) through eng's wire staging;
        completion forced through a scalar depending on every staged byte."""
        tsum = jax.jit(
            lambda tree, acc: acc
            + sum(jnp.sum(x, dtype=jnp.float32) for x in jax.tree.leaves(tree))
        )
        acc = jnp.float32(0)
        acc = tsum(
            (eng._stage(wire4[0][0], 3), eng._stage(wire4[0][1], 1),
             eng._stage(wire4[0][2], 3), eng._stage(wire4[0][3], 1)), acc,
        )
        float(np.asarray(acc))  # warm the probe's compile
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(n):
            f = wire4[i % 4]
            acc = tsum(
                (eng._stage(f[0], 3), eng._stage(f[1], 1),
                 eng._stage(f[2], 3), eng._stage(f[3], 1)), acc,
            )
        float(np.asarray(acc))
        return eng.wire_bytes_per_frame * n / (time.perf_counter() - t0) / 1e6

    # COO depth wire: ships (index, value) instead of the 94%-zero dense
    # u16 plane — ~1.5x less wire per frame, same outputs (bit-identical
    # quantization; rasterized in-graph, single-pass C host encode).
    # Compact wire: YUV420 RGB (1.5 B/px, BT.601, lossy chroma) + COO
    # depth — the smallest frame (~2.2x under dense); chroma subsampling
    # is the only loss, reported as parity vs the dense-wire engine on
    # the SAME frames (random-noise RGB = worst case for 4:2:0).
    #
    # The wires are measured in INTERLEAVED round-robin segments with
    # link probes woven between them: the tunnel's rate wanders 2-3x
    # minute to minute, so back-to-back full runs would compare
    # different links, not different wires.
    yuv_parity = None
    engine_yuv = None
    engines = {"dense": engine}
    try:
        engines["coo"] = StreamingEngine(
            variables, height=h, width=w, model=model, depth_wire="coo"
        )
        engines["coo"].warmup()
        engine_yuv = StreamingEngine(
            variables, height=h, width=w, model=model,
            rgb_wire="yuv420", depth_wire="coo",
        )
        engine_yuv.warmup()
        engines["yuv"] = engine_yuv
    except Exception:
        pass

    wire4 = {k: [pre_encode(e, f) for f in frames(4)] for k, e in engines.items()}
    seg, reps = max(10, n_stream // 6), 3
    t_stream = {k: 0.0 for k in engines}
    n_done = {k: 0 for k in engines}
    links = {k: [] for k in engines}
    for _rep in range(reps):
        for k, eng in engines.items():
            links[k].append(link_probe(eng, wire4[k], n=6))
            last = None
            t0 = time.perf_counter()
            for out in eng.run(frames(seg), depth=3):
                last = out
            _force_complete(last)
            t_stream[k] += time.perf_counter() - t0
            n_done[k] += seg

    def wire_stats(k):
        """fps + fraction of the relay's serialization bound
        1/(wire_bytes/link + device_time) — the attainable ceiling here
        (the relay SERIALIZES H2D with compute: measured, stream rate
        tracks bytes/link + device time, never the pure-upload rate)."""
        eng = engines[k]
        fps = n_done[k] / t_stream[k]
        link = max(links[k])
        bound = 1.0 / (eng.wire_bytes_per_frame / (link * 1e6) + 5.7e-3)
        return fps, link, fps / bound

    stream_fps, link_dense, eff_dense = wire_stats("dense")
    coo_fps = eff_coo = yuv_fps = eff_yuv = None
    if "coo" in engines:
        engine_coo = engines["coo"]
        coo_fps, _, eff_coo = wire_stats("coo")
    if "yuv" in engines:
        yuv_fps, _, eff_yuv = wire_stats("yuv")
    try:

        f0 = next(frames(1))
        o_dense = engine(*f0)
        o_yuv = engine_yuv(*f0)
        relf = jax.jit(
            lambda a, b: jnp.sqrt(
                jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
            )
            / (jnp.sqrt(jnp.mean(b.astype(jnp.float32) ** 2)) + 1e-12)
        )
        yuv_parity = max(
            float(np.asarray(relf(o_yuv[0], o_dense[0]))),
            float(np.asarray(relf(o_yuv[1], o_dense[1]))),
        )
    except Exception:
        pass

    # raw host->HBM wire bandwidth over the tunnel: on axon this is
    # ~30-650 MB/s and wanders 2-3x minute to minute — a locally-attached
    # host (PCIe/ICI) would not pay this. The per-wire link probes above
    # are measured ADJACENT to each stream (upload-only, completion forced
    # through a scalar depending on every staged byte); the headline
    # h2d_mb_per_s is the best rate seen anywhere this run, floored by
    # what the streams themselves sustained.
    h2d_mb_s = max(
        link_dense, stream_fps * engine.wire_bytes_per_frame / 1e6
    )
    if coo_fps:
        h2d_mb_s = max(
            h2d_mb_s, coo_fps * engine_coo.wire_bytes_per_frame / 1e6
        )
    if yuv_fps and engine_yuv is not None:
        h2d_mb_s = max(
            h2d_mb_s, yuv_fps * engine_yuv.wire_bytes_per_frame / 1e6
        )

    # batched multi-stream bf16 throughput (BASELINE config #5)
    tput_fps = None
    try:
        folded = fold_batchnorm_variables(variables)
        tput_fps = benchmark_throughput(
            folded,
            height=h,
            width=w,
            batch=8,
            n_iters=20,
            model=GuidedDepthNet(
                backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32,
                fold_bn=True,
            ),
        )
    except Exception:
        pass

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

    # accuracy next to speed: mixed-precision engine vs the all-f32 engine
    # on identical wire inputs; rel RMSE computed in-graph (scalar fetch)
    parity = None
    try:
        f0 = pre_encode(engine, next(frames(1)))
        staged0 = (
            engine._stage(f0[0], 3), engine._stage(f0[1], 1),
            engine._stage(f0[2], 3), engine._stage(f0[3], 1),
        )
        o_mix = engine._fn(engine.variables, *staged0)
        o_f32 = engine32._fn(engine32.variables, *staged0)
        rel = jax.jit(
            lambda a, b: jnp.sqrt(jnp.mean((a.astype(jnp.float32) - b) ** 2))
            / jnp.sqrt(jnp.mean(b.astype(jnp.float32) ** 2))
        )
        parity = max(
            float(np.asarray(rel(o_mix[0], o_f32[0]))),
            float(np.asarray(rel(o_mix[1], o_f32[1]))),
        )
    except Exception:
        pass

    # shard_map + Pallas lowering on the real chip: DataParallelEngine's
    # core claim ("Pallas kernels run as-is per shard", parallel/serving.py)
    # proven on TPU hardware with a 1-device mesh — outputs must match a
    # plain jit of the same folded pallas graph on the same f32 inputs.
    shardmap_rel = None
    try:
        from nconv_tpu.models import maybe_fold
        from nconv_tpu.parallel import DataParallelEngine, make_mesh

        mesh1 = make_mesh(devices=jax.devices()[:1])
        dpe = DataParallelEngine(
            variables, height=h, width=w, mesh=mesh1,
            model=GuidedDepthNet(backend="pallas"),
        )
        r0 = np.asarray(rng.random((1, h, w, 3)) * 255, np.float32)
        dd = np.asarray(
            rng.random((1, h, w, 1)) * 80 * (rng.random((1, h, w, 1)) < 0.06),
            np.float32,
        )
        o_sm = dpe(r0, dd, r0, dd)
        ref_model, ref_vars = maybe_fold(
            GuidedDepthNet(backend="pallas"), variables, True
        )
        o_ref = jax.jit(
            lambda v, r, d_: ref_model.apply(
                v, r, d_, r, d_, method=GuidedDepthNet.export
            )
        )(jax.device_put(ref_vars), jnp.asarray(r0), jnp.asarray(dd))
        rel = jax.jit(
            lambda a, b: jnp.sqrt(jnp.mean((a - b) ** 2))
            / (jnp.sqrt(jnp.mean(b**2)) + 1e-12)
        )
        shardmap_rel = max(
            float(np.asarray(rel(o_sm[0], o_ref[0]))),
            float(np.asarray(rel(o_sm[1], o_ref[1]))),
        )
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
        "stream_fps_pipelined": round(stream_fps, 2),
        "stream_fps_pipelined_coo": round(coo_fps, 2) if coo_fps else None,
        "wire_mb_per_frame_coo": (
            round(engine_coo.wire_bytes_per_frame / 1e6, 2) if coo_fps else None
        ),
        "stream_fps_pipelined_yuv": round(yuv_fps, 2) if yuv_fps else None,
        "wire_mb_per_frame_yuv": (
            round(engine_yuv.wire_bytes_per_frame / 1e6, 2) if yuv_fps else None
        ),
        # fraction of the relay's SERIALIZATION bound
        # 1/(wire_bytes/adjacent_link + device_time) each stream reached —
        # the attainable ceiling here (the relay serializes H2D with
        # compute; the pure-upload ceiling is structurally out of reach)
        "stream_eff_dense": round(eff_dense, 2),
        "stream_eff_coo": round(eff_coo, 2) if eff_coo else None,
        "stream_eff_yuv": round(eff_yuv, 2) if eff_yuv else None,
        "parity_rel_rmse_yuv": (
            float(f"{yuv_parity:.3g}") if yuv_parity is not None else None
        ),
        "shardmap_pallas_rel": (
            float(f"{shardmap_rel:.3g}") if shardmap_rel is not None else None
        ),
        # the pipelined stream is tunnel-transport-bound:
        # h2d_mb_per_s / wire_mb_per_frame is its ceiling here
        "h2d_mb_per_s": round(h2d_mb_s, 1),
        "stream_transport_ceiling_fps": round(
            h2d_mb_s * 1e6 / engine.wire_bytes_per_frame, 2
        ),
        "throughput_fps_b8_bf16": round(tput_fps, 2) if tput_fps else None,
        "trace_ms": round(trace_ms, 3) if trace_ms else None,
        "trace_fps": round(1000.0 / trace_ms, 2) if trace_ms else None,
        "wire_mb_per_frame": round(engine.wire_bytes_per_frame / 1e6, 2),
        "parity_rel_rmse": float(f"{parity:.3g}") if parity is not None else None,
        "platform": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
