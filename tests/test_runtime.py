"""Streaming runtime + export tests (CPU, small geometry)."""
import numpy as np
import pytest

import jax

from nconv_tpu.models import GuidedDepthNet
from nconv_tpu.runtime import (
    StreamingEngine,
    benchmark,
    export_guided,
    load_exported,
    save_exported,
)

H, W = 96, 128
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def guided_vars():
    model = GuidedDepthNet()
    rgb = np.zeros((1, H, W, 3), np.float32)
    d = np.zeros((1, H, W, 1), np.float32)
    return model.init(jax.random.key(0), rgb, d, rgb, d)


def frame():
    rgb = (RNG.random((H, W, 3)) * 255).astype(np.float32)
    d = (RNG.random((H, W)) * 5 * (RNG.random((H, W)) < 0.1)).astype(np.float32)
    return rgb, d


def test_engine_basic(guided_vars):
    engine = StreamingEngine(guided_vars, height=H, width=W)
    engine.warmup()
    rgb, d = frame()
    out0, out1 = engine(rgb, d, rgb, d)
    a = np.asarray(out0)
    assert a.shape == (1, H, W, 1)
    assert (a[:, :45] == 0).all()  # border mask applied
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), rtol=1e-5)


def test_engine_streaming_pipeline(guided_vars):
    engine = StreamingEngine(guided_vars, height=H, width=W)
    engine.warmup()
    frames = []
    for _ in range(5):
        rgb, d = frame()
        frames.append((rgb, d, rgb, d))
    outs = list(engine.run(iter(frames), depth=2))
    assert len(outs) == 5
    # pipelined results must equal one-at-a-time results
    ref0, _ = engine(*frames[0])
    np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(ref0), rtol=1e-5)


def test_engine_accepts_uint8_rgb(guided_vars):
    engine = StreamingEngine(guided_vars, height=H, width=W)
    rgb = (RNG.random((H, W, 3)) * 255).astype(np.uint8)
    d = (RNG.random((H, W))).astype(np.float32)
    out0, _ = engine(rgb, d, rgb, d)
    assert np.isfinite(np.asarray(out0)).all()


def test_engine_rejects_wrong_geometry(guided_vars):
    engine = StreamingEngine(guided_vars, height=H, width=W)
    rgb, d = frame()
    with pytest.raises(AssertionError):
        engine(rgb[:50], d, rgb, d)


def test_benchmark_smoke(guided_vars):
    engine = StreamingEngine(guided_vars, height=H, width=W)
    stats = benchmark(engine, n_frames=5, warmup=2)
    dev, e2e = stats["device"], stats["e2e"]
    assert dev.fps > 0 and e2e.fps > 0 and stats["synced"].fps > 0
    assert dev.p50_ms <= dev.p99_ms
    assert dev.n_frames == 3  # amortized windows
    # uint8 RGB (3B) + uint16 depth (2B) wire: 5 bytes/px/stream
    assert engine.wire_bytes_per_frame == 2 * H * W * 5


def test_depth_wire_quantization_is_lossless_for_png_data(guided_vars):
    """uint16 wire = the dataset PNGs' own encoding: staging depths that
    came from 16-bit PNGs must be exact."""
    engine = StreamingEngine(guided_vars, height=H, width=W)
    d = (RNG.integers(0, 65535, (H, W)) / 256.0).astype(np.float32)
    staged = engine._stage(d, 1)
    back = np.asarray(staged).astype(np.float32)[0, :, :, 0] / 256.0
    np.testing.assert_array_equal(back, d)


def test_default_backend_selection(guided_vars, monkeypatch):
    """Zero-config engines resolve 'auto': XLA off-TPU (this CPU suite),
    Pallas on anything that is not cpu/gpu (TPU may be named 'tpu' or a
    tunneled platform like 'axon')."""
    from nconv_tpu.models import resolve_backend

    assert resolve_backend("auto") == "xla"  # CPU test env
    assert resolve_backend("pallas") == "xla"  # explicit pallas off-TPU
    engine = StreamingEngine(guided_vars, height=H, width=W)
    assert engine.model.backend == "xla"

    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    assert resolve_backend("auto") == "pallas"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_backend("auto") == "pallas"
    assert resolve_backend("xla") == "xla"

    # unknown accelerator plugins fail SAFE onto the portable XLA graph
    # (the Mosaic kernels only lower on TPU backends)
    monkeypatch.setattr(jax, "default_backend", lambda: "METAL")
    assert resolve_backend("auto") == "xla"
    assert resolve_backend("pallas") == "xla"


def test_coo_wire_matches_dense_u16(guided_vars):
    """'coo' depth wire (index+value arrays, rasterized in-graph) must give
    bit-identical outputs to the dense uint16 wire — both quantize to the
    same d*256 fixed point."""
    dense = StreamingEngine(guided_vars, height=H, width=W)
    coo = StreamingEngine(guided_vars, height=H, width=W, depth_wire="coo")
    assert coo.wire_bytes_per_frame < dense.wire_bytes_per_frame
    rgb, d = frame()
    ref0, ref1 = dense(rgb, d, rgb, d)
    out0, out1 = coo(rgb, d, rgb, d)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(ref0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(ref1))


def test_streaming_pipeline_background_staging_preserves_order(guided_vars):
    """run() stages on background threads; distinct frames must come back
    in order and equal the one-at-a-time results."""
    engine = StreamingEngine(guided_vars, height=H, width=W)
    engine.warmup()
    frames = []
    for _ in range(6):
        rgb, d = frame()
        frames.append((rgb, d, rgb, d))
    outs = list(engine.run(iter(frames), depth=2, stage_ahead=3))
    assert len(outs) == 6
    for f, out in zip(frames, outs):
        ref0, _ = engine(*f)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref0), rtol=1e-5
        )


def test_coo_encode_c_matches_numpy_fallback():
    """The C single-pass COO encoder and the numpy fallback emit identical
    wires, including zeroed padding and capacity overflow."""
    from nconv_tpu.data import native

    rng = np.random.default_rng(7)
    d = (rng.random((64, 96)) * 80 * (rng.random((64, 96)) < 0.1)).astype(
        np.float32
    )
    for cap in (2048, 100):  # roomy + overflowing
        got = native.encode_depth_coo(d, cap)
        flat = d.ravel()
        nz = np.flatnonzero(flat)
        keep = nz[:cap]
        idx = np.zeros((1, cap), np.int32)
        val = np.zeros((1, cap), np.uint16)
        idx[0, : keep.size] = keep
        val[0, : keep.size] = np.clip(flat[keep] * 256.0, 0, 65535).astype(
            np.uint16
        )
        assert got[2] == nz.size
        np.testing.assert_array_equal(got[0], idx)
        np.testing.assert_array_equal(got[1], val)


def test_wire_encoders_numpy_fallback_matches_c(monkeypatch):
    """Force the numpy fallback (as on a box with no toolchain) and pin it
    against whichever backend _load() resolves here. Regression test for two
    real fallback bugs: the f32->u16 np.clip UFuncTypeError in the COO
    encoder and the luma/chroma aliasing in the YUV encoder."""
    from nconv_tpu.data import native

    rng = np.random.default_rng(11)
    d = (rng.random((64, 96)) * 80 * (rng.random((64, 96)) < 0.1)).astype(
        np.float32
    )
    rgb = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    ref_coo = native.encode_depth_coo(d, 512)
    ref_wire = native.encode_depth_wire(d)
    ref_yuv = native.encode_yuv420(rgb)
    ref_yuv2 = native.encode_yuv422(rgb)

    monkeypatch.setattr(native, "_load", lambda: None)
    got_coo = native.encode_depth_coo(d, 512)
    np.testing.assert_array_equal(got_coo[0], ref_coo[0])
    np.testing.assert_array_equal(got_coo[1], ref_coo[1])
    assert got_coo[2] == ref_coo[2]
    np.testing.assert_array_equal(native.encode_depth_wire(d), ref_wire)
    # BT.601 rounding may differ by 1 LSB between the float fallback and the
    # C integer path; chroma must be CORRECT (the aliasing bug was ~40 off)
    for enc, ref3 in (
        (native.encode_yuv420, ref_yuv), (native.encode_yuv422, ref_yuv2)
    ):
        for got, ref in zip(enc(rgb), ref3):
            assert (
                np.max(np.abs(got.astype(np.int32) - ref.astype(np.int32))) <= 1
            )


def test_yuv420_wire(guided_vars):
    """'yuv420' RGB wire: half the RGB bytes; outputs must track the dense
    wire closely on chroma-smooth frames (4:2:0 is lossy on chroma only)."""
    dense = StreamingEngine(guided_vars, height=H, width=W)
    yuv = StreamingEngine(guided_vars, height=H, width=W, rgb_wire="yuv420")
    assert yuv.wire_bytes_per_frame == 2 * H * W * 7 // 2  # 1.5 + 2 B/px
    # smooth luma-dominant frame (the realistic case for a camera stream)
    i, j = np.mgrid[0:H, 0:W].astype(np.float32)
    rgb = np.stack(
        [100 + 50 * np.sin(i / 19), 100 + 50 * np.cos(j / 23), 90 + i / 4],
        axis=-1,
    ).astype(np.float32)
    d = (RNG.random((H, W)) * 5 * (RNG.random((H, W)) < 0.1)).astype(np.float32)
    ref0, _ = dense(rgb, d, rgb, d)
    out0, _ = yuv(rgb, d, rgb, d)
    ref0, out0 = np.asarray(ref0, np.float64), np.asarray(out0, np.float64)
    rel = np.sqrt(np.mean((out0 - ref0) ** 2)) / (
        np.sqrt(np.mean(ref0**2)) + 1e-12
    )
    assert rel < 5e-3, rel
    # u8 wire path accepts pre-encoded planes too
    y, u, v = __import__(
        "nconv_tpu.data.native", fromlist=["native"]
    ).encode_yuv420(np.clip(rgb, 0, 255).astype(np.uint8))
    out0b, _ = yuv((y, u, v), d, (y, u, v), d)
    np.testing.assert_array_equal(np.asarray(out0b), np.asarray(out0))


def test_yuv422_wire_tighter_than_yuv420(guided_vars):
    """'yuv422' (2 B/px): sub-dense wire whose output parity on natural
    content must hold the <1e-3 accuracy bar and beat 4:2:0 (it keeps
    full vertical chroma). 'yuv420' must warn about the bar it trades."""
    dense = StreamingEngine(guided_vars, height=H, width=W)
    with pytest.warns(UserWarning, match="yuv420"):
        yuv0 = StreamingEngine(
            guided_vars, height=H, width=W, rgb_wire="yuv420"
        )
    yuv2 = StreamingEngine(guided_vars, height=H, width=W, rgb_wire="yuv422")
    assert (
        yuv0.wire_bytes_per_frame
        < yuv2.wire_bytes_per_frame
        < dense.wire_bytes_per_frame
    )
    i, j = np.mgrid[0:H, 0:W].astype(np.float32)
    rgb = np.stack(
        [100 + 50 * np.sin(i / 19), 100 + 50 * np.cos(j / 23), 90 + i / 4],
        axis=-1,
    ).astype(np.float32)
    d = (RNG.random((H, W)) * 5 * (RNG.random((H, W)) < 0.1)).astype(np.float32)

    def rel(a, ref0):
        a = np.asarray(a, np.float64)
        ref0 = np.asarray(ref0, np.float64)
        return np.sqrt(np.mean((a - ref0) ** 2)) / (
            np.sqrt(np.mean(ref0**2)) + 1e-12
        )

    ref0, _ = dense(rgb, d, rgb, d)
    o422, _ = yuv2(rgb, d, rgb, d)
    o420, _ = yuv0(rgb, d, rgb, d)
    # the 4:2:2 wire's contract: hold the <1e-3 bar on natural content
    # (4:2:0 has no such contract — it warns instead). On uniform noise
    # both are far outside the bar and statistically equivalent (measured
    # ~6e-2 each), so no ordering is asserted there.
    assert rel(o422, ref0) < 1e-3, rel(o422, ref0)
    assert rel(o420, ref0) < 5e-3, rel(o420, ref0)


def test_coo_wire_capacity_truncates(guided_vars):
    engine = StreamingEngine(
        guided_vars, height=H, width=W, depth_wire="coo", coo_capacity=64
    )
    d = np.ones((H, W), np.float32)  # fully dense: must truncate, not crash
    with pytest.warns(UserWarning, match="COO depth wire capacity"):
        idx, val = engine._encode_depth_coo(d)
    assert idx.shape == (1, 64) and val.shape == (1, 64)
    # the drop is counted, and the warning fires only once
    assert engine.coo_dropped_points == H * W - 64
    with np.errstate(all="ignore"):
        engine._encode_depth_coo(d)
    assert engine.coo_dropped_points == 2 * (H * W - 64)
    rgb, _ = frame()
    out0, _ = engine(rgb, d, rgb, d)
    assert np.isfinite(np.asarray(out0)).all()


def test_export_roundtrip(tmp_path, guided_vars):
    """StableHLO export (the ONNX-equivalent deliverable): serialize,
    reload without model code, outputs must match the live model."""
    exported = export_guided(guided_vars, height=H, width=W)
    path = str(tmp_path / "guided.stablehlo")
    save_exported(exported, path)

    fn = load_exported(path)
    rgb, d = frame()
    rgb_b = rgb[None]
    d_b = d[None, :, :, None]
    got0, got1 = fn(rgb_b, d_b, rgb_b, d_b)

    model = GuidedDepthNet()
    ref0, ref1 = model.apply(
        guided_vars, rgb_b, d_b, rgb_b, d_b, method=GuidedDepthNet.export
    )
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=1e-5, atol=1e-5)


def test_graft_entry_single_chip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None  # compiles single-chip


def test_profile_fn_runs_on_cpu():
    """profile_fn completes and returns a (possibly empty) profile on
    backends without device trace events (CPU)."""
    import jax
    import jax.numpy as jnp

    from nconv_tpu.utils import profile_fn

    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    p = profile_fn(f, jnp.ones((64, 64)), n_iters=2)
    assert p.n_iters == 2
    assert p.ms_per_iter >= 0.0
    assert "device time" in p.report()


def test_dynamic_batch_export_serves_multiple_batch_sizes(tmp_path):
    """Default export carries a symbolic batch axis (the reference ONNX
    contract, export_to_onnx.py:65-73): one artifact serves b=1 and b=2."""
    import numpy as np

    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.runtime import export_guided, load_exported, save_exported

    rng = np.random.default_rng(0)
    h, w = 104, 128
    rgb1 = np.asarray(rng.random((1, h, w, 3)), np.float32)
    d1 = np.asarray(rng.random((1, h, w, 1)), np.float32)
    v = GuidedDepthNet().init(jax.random.key(0), rgb1, d1, rgb1, d1)

    path = save_exported(
        export_guided(v, height=h, width=w), str(tmp_path / "dyn.stablehlo")
    )
    call = load_exported(path)
    for b in (1, 2):
        rgb = np.asarray(rng.random((b, h, w, 3)), np.float32)
        d = np.asarray(rng.random((b, h, w, 1)), np.float32)
        o0, o1 = call(rgb, d, rgb, d)
        assert o0.shape == (b, h, w, 1) and o1.shape == (b, h, w, 1)
