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


def _bench_training(h: int = 480, w: int = 640) -> dict:
    """Trace-free train-step latency at NYU geometry on the default device.

    Returns ``train_step_ms_*`` fields for the reference's two training hot
    loops (train_step1.py:61-65 unguided b4, train_step2.py:62-64 guided b1,
    f32 and the bf16-mixed recipe). Wall-clock over 10 dispatches with
    completion forced through the loss scalar — jax.profiler hangs on the
    train step over the axon tunnel (CLAUDE.md), and async dispatch makes
    the amortized wall number track device time to ~0.3 ms.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nconv_tpu.models import GuidedDepthNet, NConvUNet
    from nconv_tpu.runtime.streaming import _force_complete
    from nconv_tpu.training import (
        GuidedTask, OptimizerConfig, TrainConfig, Trainer, UnguidedTask,
    )

    rng = np.random.default_rng(0)

    def synth(b):
        truth = np.fromfunction(
            lambda n, i, j, c: 2 + np.sin(i / 40) + np.cos(j / 60), (b, h, w, 1)
        ).astype(np.float32)
        return {
            "rgb": rng.random((b, h, w, 3)).astype(np.float32),
            "depth": truth * (rng.random((b, h, w, 1)) < 0.06),
            "gt": truth,
        }

    configs = [
        ("unguided_b4", UnguidedTask(NConvUNet(backend="pallas")), 4),
        ("guided_b1_f32", GuidedTask(GuidedDepthNet(backend="pallas")), 1),
        (
            "guided_b1_bf16",
            GuidedTask(
                GuidedDepthNet(
                    backend="pallas", dtype=jnp.bfloat16,
                    step1_dtype=jnp.float32,
                )
            ),
            1,
        ),
    ]
    out = {}
    for name, task, b in configs:
        cfg = TrainConfig(
            epochs=1, batch_size=b,
            optimizer=OptimizerConfig("adamw", 1e-3, 1e-7), log_every=0,
        )
        trainer = Trainer(task, cfg, log_fn=lambda m: None)
        batch = trainer._device_batch(synth(b))
        state = trainer.init_state(jax.random.key(0), batch)
        trainer._build_steps()

        def step(state):
            p, s, o, loss = trainer._train_step(
                state["params"], state["batch_stats"], state["opt_state"], batch
            )
            return {"params": p, "batch_stats": s, "opt_state": o}, loss

        state, loss = step(state)  # compile
        _force_complete(loss)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state)
        _force_complete(loss)
        out[f"train_step_ms_{name}"] = round(
            (time.perf_counter() - t0) / n * 1e3, 2
        )
    # trace-anchored guided training number: the full train step hangs
    # jax.profiler over the tunnel, but the value_and_grad graph traces
    # fine and the optimizer adds ~nothing (measured r4) — this is the
    # tunnel-independent field to compare round over round (the wall
    # numbers above moved 17 -> 23 ms same-day with zero code change)
    try:
        from nconv_tpu.losses import multi_resolution_loss
        from nconv_tpu.models import GuidedDepthNet
        from nconv_tpu.utils import profile_fn

        model = GuidedDepthNet(
            backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32
        )
        d0 = synth(1)
        rgb = jnp.asarray(d0["rgb"])
        dep = jnp.asarray(d0["depth"])
        gt = jnp.asarray(d0["gt"])
        variables = model.init(jax.random.key(0), rgb, dep, None, None, True)

        def loss_fn(p):
            (s0, _), mut = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                rgb, dep, None, None, True, mutable=["batch_stats"],
            )
            return multi_resolution_loss(
                s0, gt, use_gradient_loss=False, batch_reduce="first"
            ), mut

        vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        params = variables["params"]
        prof = profile_fn(lambda: vg(params), n_iters=3)
        if prof.ms_per_iter > 0:
            out["train_vg_trace_ms_guided_bf16"] = round(prof.ms_per_iter, 2)
    except Exception:
        pass
    return out


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

    # XLA-trace device time: the purest per-frame number — excludes the
    # tunnel's ~2ms/frame dispatch overhead that a local host wouldn't pay.
    # Measured BEFORE the wire streams so the serialization-bound
    # efficiency below normalizes by THIS run's device time, not a
    # hardcoded constant.
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
    # device time each wire's stream pays per frame (the relay SERIALIZES
    # H2D with compute); fall back to the synced p50 if the trace failed
    dev_s = (trace_ms or dev.p50_ms) * 1e-3

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
        bound = 1.0 / (eng.wire_bytes_per_frame / (link * 1e6) + dev_s)
        return fps, link, fps / bound

    stream_fps, link_dense, eff_dense = wire_stats("dense")
    coo_fps = eff_coo = yuv_fps = eff_yuv = None
    if "coo" in engines:
        engine_coo = engines["coo"]
        coo_fps, _, eff_coo = wire_stats("coo")
    if "yuv" in engines:
        yuv_fps, _, eff_yuv = wire_stats("yuv")
    # YUV wire parity, two content classes per wire:
    #   * uniform-noise RGB — the documented WORST case for chroma
    #     subsampling (no spatial correlation for the 2x-mean to exploit);
    #   * natural-content synthetic frames (smooth gradients + edges) —
    #     representative of camera input.
    # 'yuv422' (2 B/px, full vertical chroma) is the sub-dense wire that
    # must hold the <1e-3 accuracy bar on natural content.
    yuv_parity = yuv_parity_nat = yuv422_parity = yuv422_parity_nat = None
    try:
        relf = jax.jit(
            lambda a, b: jnp.sqrt(
                jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
            )
            / (jnp.sqrt(jnp.mean(b.astype(jnp.float32) ** 2)) + 1e-12)
        )

        def parity(eng_lossy, f):
            o_ref = engine(*f)
            o = eng_lossy(*f)
            return max(
                float(np.asarray(relf(o[0], o_ref[0]))),
                float(np.asarray(relf(o[1], o_ref[1]))),
            )

        ii, jj = np.mgrid[0:h, 0:w].astype(np.float32)
        nat_rgb = np.stack(
            [
                110 + 70 * np.sin(ii / 37) * np.cos(jj / 53),
                100 + 60 * np.cos(jj / 29),
                90 + 50 * ((ii // 80 + jj // 96) % 2),  # blocky edges
            ],
            axis=-1,
        ).astype(np.float32)
        f_noise = next(frames(1))
        f_nat = (nat_rgb, f_noise[1], nat_rgb, f_noise[3])
        if engine_yuv is not None:
            yuv_parity = parity(engine_yuv, f_noise)
            yuv_parity_nat = parity(engine_yuv, f_nat)
        import warnings as _warnings

        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            engine_yuv422 = StreamingEngine(
                variables, height=h, width=w, model=model,
                rgb_wire="yuv422", depth_wire="coo",
            )
        engine_yuv422.warmup()
        yuv422_parity = parity(engine_yuv422, f_noise)
        yuv422_parity_nat = parity(engine_yuv422, f_nat)
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

    # batched multi-stream bf16 throughput (BASELINE config #5): wall fps
    # PLUS the trace-derived per-frame device cost — the wall number rides
    # the tunnel's H2D weather (measured 301 -> 180 fps round-over-round
    # with no code change), the trace number is the chip's.
    tput_fps = None
    tput_trace_ms = None
    try:
        from nconv_tpu.utils import profile_fn

        folded = fold_batchnorm_variables(variables)
        model_b8 = GuidedDepthNet(
            backend="pallas", dtype=jnp.bfloat16, step1_dtype=jnp.float32,
            fold_bn=True,
        )
        tput_fps = benchmark_throughput(
            folded, height=h, width=w, batch=8, n_iters=20, model=model_b8
        )
        rng3 = np.random.default_rng(2)
        rgb8 = jnp.asarray(
            rng3.random((8, h, w, 3)).astype(np.float32), jnp.bfloat16
        )
        d8 = jnp.asarray(
            (rng3.random((8, h, w, 1)) * (rng3.random((8, h, w, 1)) < 0.06)
             ).astype(np.float32),
            jnp.bfloat16,
        )
        fn8 = jax.jit(
            lambda v, r, dd: model_b8.apply(
                v, r, dd, r, dd, method=GuidedDepthNet.export
            )
        )
        vput = jax.device_put(folded)
        prof8 = profile_fn(lambda: fn8(vput, rgb8, d8), n_iters=3)
        if prof8.ms_per_iter > 0:
            tput_trace_ms = prof8.ms_per_iter / 16  # 8 batch x 2 streams
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

    # --- e2e decomposition: e2e_p50 ≈ host wire encode + H2D at the day's
    # link + dispatch+compute. Published so a slow-tunnel day's doubled
    # e2e number reads as tunnel weather, not a device regression.
    e2e_stage_ms = e2e_upload_ms = None
    try:
        fr = [next(frames(1)) for _ in range(4)]
        for f in fr:
            pre_encode(engine, f)  # warm encoder buffers
        t0 = time.perf_counter()
        n_enc = 8
        for i in range(n_enc):
            pre_encode(engine, fr[i % 4])
        e2e_stage_ms = (time.perf_counter() - t0) / n_enc * 1e3
        e2e_upload_ms = engine.wire_bytes_per_frame / (link_dense * 1e6) * 1e3
    except Exception:
        pass

    # --- training performance, trace-free wall timing (jax.profiler hangs
    # on the train step over the tunnel): each step is timed over 10
    # dispatches with completion forced through the loss scalar, amortizing
    # the relay's ~0.3 ms/dispatch. Geometry 480x640 (NYU train shapes,
    # reference train_step1.py:61-65 / train_step2.py:62-64) — the
    # documented numbers in docs/ARCHITECTURE.md use the same recipe.
    train_metrics = {}
    try:
        train_metrics = _bench_training()
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
        # worst-case (uniform-noise RGB) and natural-content parity for the
        # lossy YUV wires vs the dense wire on the same frames; 'yuv422'
        # (2 B/px) is the sub-dense wire that holds the <1e-3 bar
        "parity_rel_rmse_yuv": (
            float(f"{yuv_parity:.3g}") if yuv_parity is not None else None
        ),
        "parity_rel_rmse_yuv_natural": (
            float(f"{yuv_parity_nat:.3g}")
            if yuv_parity_nat is not None else None
        ),
        "parity_rel_rmse_yuv422": (
            float(f"{yuv422_parity:.3g}")
            if yuv422_parity is not None else None
        ),
        "parity_rel_rmse_yuv422_natural": (
            float(f"{yuv422_parity_nat:.3g}")
            if yuv422_parity_nat is not None else None
        ),
        "shardmap_pallas_rel": (
            float(f"{shardmap_rel:.3g}") if shardmap_rel is not None else None
        ),
        # the pipelined stream is tunnel-transport-bound; the adjacent-link
        # rate is the day's tunnel weather (the old
        # stream_transport_ceiling_fps field was dropped: pure-upload is
        # structurally unattainable on a relay that serializes H2D with
        # compute — the eff-normalized fields above are the honest ones)
        "h2d_mb_per_s": round(h2d_mb_s, 1),
        "throughput_fps_b8_bf16": round(tput_fps, 2) if tput_fps else None,
        # trace-derived per-frame b8 device cost: the chip's number, stable
        # across tunnel weather (compare THIS round over round, not the fps)
        "throughput_b8_trace_ms": (
            round(tput_trace_ms, 3) if tput_trace_ms else None
        ),
        "trace_ms": round(trace_ms, 3) if trace_ms else None,
        "trace_fps": round(1000.0 / trace_ms, 2) if trace_ms else None,
        # e2e_p50 ≈ stage (host wire encode) + upload (wire_bytes at the
        # day's adjacent link) + synced dispatch+compute
        "e2e_stage_ms": (
            round(e2e_stage_ms, 2) if e2e_stage_ms is not None else None
        ),
        "e2e_upload_ms": (
            round(e2e_upload_ms, 2) if e2e_upload_ms is not None else None
        ),
        "wire_mb_per_frame": round(engine.wire_bytes_per_frame / 1e6, 2),
        "parity_rel_rmse": float(f"{parity:.3g}") if parity is not None else None,
        "platform": str(jax.devices()[0]),
        **train_metrics,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
