"""Deployment-ONNX interop: torch mirror parity + artifact contract.

The reference ships `NEWnconvCSPN.onnx` built by `export_to_onnx.py`
(`/root/reference/export_to_onnx.py:57-74`) for a robot-side ONNX Runtime
session. `nconv_tpu.compat.export_guided_onnx` produces that artifact from
TPU-trained flax variables via a functional torch mirror. These tests pin:

  * the mirror is BIT-exact vs the reference ``SETP2_BP_EXPORT`` given the
    same state dict (same torch primitives, same order) — so jax-vs-mirror
    parity reduces to the already-pinned jax-vs-reference parity;
  * the mirror is honestly batch-dynamic (the reference's own export graph
    hardcodes ``[0:1]``/``[1:2]`` batch slices, `models/step2.py:126`);
  * the emitted file is a well-formed ModelProto with the deployment I/O
    contract, checked without the ``onnx`` package via the wire-format
    reader.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import jax.random as jr  # noqa: E402

from nconv_tpu.compat import export_guided_onnx, read_onnx_summary  # noqa: E402
from nconv_tpu.compat.torch_convert import to_guided_state_dict  # noqa: E402
from nconv_tpu.compat.torch_mirror import GuidedExportMirror  # noqa: E402
from nconv_tpu.models import GuidedDepthNet  # noqa: E402
from reference_loader import load_reference  # noqa: E402


def rel_rmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-12)


def _inputs(rng, b, h, w):
    rgb = rng.random((b, 3, h, w)).astype(np.float32) * 255
    d = rng.random((b, 1, h, w)).astype(np.float32) * 5.0
    d *= rng.random((b, 1, h, w)) < 0.06
    return rgb, d.astype(np.float32)


@pytest.fixture(scope="module")
def small_variables():
    """Random-init guided variables (unfolded: params + batch_stats)."""
    net = GuidedDepthNet()
    z3 = jnp.zeros((1, 64, 96, 3))
    z1 = jnp.zeros((1, 64, 96, 1))
    return net.init(jr.PRNGKey(0), z3, z1, z3, z1)


def test_parse_tensor_negative_int64_varints():
    """Negative int64s in TensorProto.int64_data arrive as 2^64-complement
    varints; the parser must normalize them BEFORE array construction
    (np.asarray of a >=2^63 Python int raises OverflowError)."""
    from nconv_tpu.compat.onnx_exec import _parse_tensor

    def varint(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            out.append(b | (0x80 if v else 0))
            if not v:
                return bytes(out)

    # TensorProto: dims=[3] (field 1), data_type=7 int64 (field 2),
    # int64_data=[-1, 5, -300] as unpacked varints (field 7, wire 0)
    buf = b"\x08" + varint(3) + b"\x10" + varint(7)
    for v in (-1, 5, -300):
        buf += b"\x38" + varint(v & ((1 << 64) - 1))
    got = _parse_tensor(memoryview(buf))
    np.testing.assert_array_equal(got, np.asarray([-1, 5, -300], np.int64))


def test_mirror_bit_exact_vs_reference():
    """Same state dict -> identical outputs: every mirror op is the exact
    torch primitive the reference modules call, in the same order."""
    ref = load_reference()
    if ref is None:
        pytest.skip("reference repo not available")
    _, ref_step2 = ref
    torch.manual_seed(1)
    model_t = ref_step2.SETP2_BP_EXPORT().eval()
    # reference step1.forward(d0, d1) raises TypeError as committed; drive
    # the intended batch-concat semantics (see test_reference_parity.py)
    inner = model_t.step1.d_net
    model_t.step1.forward = lambda d0, d1: inner(torch.cat([d0, d1], dim=0))

    h, w = 480, 640  # the only size where the reference's hardcoded
    # step-1 crop (models/step1.py:94) is geometry-exact
    rng = np.random.default_rng(1)
    rgb0, d0 = _inputs(rng, 1, h, w)
    rgb1, d1 = _inputs(rng, 1, h, w)
    args = tuple(torch.tensor(x) for x in (rgb0, d0, rgb1, d1))
    with torch.no_grad():
        out0_t, out1_t = model_t(*args)

    sd = {k: v.numpy() for k, v in model_t.state_dict().items()}
    mirror = GuidedExportMirror(sd).eval()
    with torch.no_grad():
        out0_m, out1_m = mirror(*args)

    assert torch.equal(out0_m, out0_t)
    assert torch.equal(out1_m, out1_t)


def test_mirror_matches_jax_export(small_variables):
    """to_guided_state_dict('softplus') + mirror == GuidedDepthNet.export.

    On CPU the torch and XLA conv reductions agree to float precision; the
    1e-5 bar matches the jax-vs-reference parity tests."""
    net = GuidedDepthNet()
    rng = np.random.default_rng(7)
    rgb, dep = _inputs(rng, 1, 64, 96)
    nhwc = lambda x: jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # noqa: E731
    out_j = net.apply(
        small_variables, nhwc(rgb), nhwc(dep), nhwc(rgb), nhwc(dep),
        method=GuidedDepthNet.export,
    )

    sd = to_guided_state_dict(small_variables, kernel_mode="softplus")
    mirror = GuidedExportMirror(sd).eval()
    t = lambda x: torch.tensor(x)  # noqa: E731
    with torch.no_grad():
        out0_m, _ = mirror(t(rgb), t(dep), t(rgb), t(dep))

    j0 = np.transpose(np.asarray(out_j[0]), (0, 3, 1, 2))
    assert rel_rmse(out0_m.numpy(), j0) < 1e-5


def test_mirror_is_batch_dynamic(small_variables):
    """b=2 equals two independent b=1 passes stacked — the property the
    reference export graph's literal [0:1]/[1:2] slices break."""
    sd = to_guided_state_dict(small_variables, kernel_mode="softplus")
    mirror = GuidedExportMirror(sd).eval()
    rng = np.random.default_rng(3)
    rgb, dep = _inputs(rng, 2, 64, 96)
    t = lambda x: torch.tensor(x)  # noqa: E731
    with torch.no_grad():
        b2_0, b2_1 = mirror(t(rgb), t(dep), t(rgb), t(dep))
        rows = [
            mirror(t(rgb[i : i + 1]), t(dep[i : i + 1]),
                   t(rgb[i : i + 1]), t(dep[i : i + 1]))
            for i in range(2)
        ]
    for i in range(2):
        assert torch.equal(b2_0[i : i + 1], rows[i][0])
        assert torch.equal(b2_1[i : i + 1], rows[i][1])


def test_onnx_artifact_contract(tmp_path, small_variables):
    """The emitted file is a parseable ModelProto carrying the reference
    deployment contract: named NCHW I/O, opset 17, dynamic batch, the
    reference operator inventory, and all weights as initializers."""
    path = str(tmp_path / "guided.onnx")
    export_guided_onnx(small_variables, path, height=64, width=96)

    s = read_onnx_summary(path)
    assert s["opset"] == 17
    assert s["inputs"] == ["rgb_0", "depth_0", "rgb_1", "depth_1"]
    assert s["outputs"] == ["output_depth_0", "output_depth_1"]
    # weights travel as initializers: >= the 978,336 trainable params
    # (tests/test_models.py) plus BN running stats
    assert s["total_weight_floats"] >= 978_336
    ops = s["op_counts"]
    for required in (
        "Conv", "ConvTranspose", "BatchNormalization", "MaxPool",
        "Resize", "Relu", "Div", "Concat",
    ):
        assert ops.get(required, 0) > 0, f"missing {required} in {ops}"
    # two streams x 53 convs each (step1 9 nconvs x2 passes + encoders,
    # fusions, heads); exact count pins accidental graph dupes/drops
    assert ops["Conv"] == 106
    assert ops["ConvTranspose"] == 6


def test_onnx_selftest_structure(tmp_path, small_variables):
    """selftest_guided_onnx performs the structural validation standalone
    (variables=None -> no execution) and rejects malformed files."""
    from nconv_tpu.compat import selftest_guided_onnx

    path = str(tmp_path / "guided.onnx")
    export_guided_onnx(small_variables, path, height=64, width=96)
    s = selftest_guided_onnx(path, height=64, width=96)
    assert s["opset"] == 17
    assert s["exec_backend"] is None
    # a truncated file must be rejected
    with open(path, "rb") as f:
        data = f.read()
    bad = str(tmp_path / "bad.onnx")
    with open(bad, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(Exception):
        selftest_guided_onnx(bad)


@pytest.mark.slow
def test_onnx_artifact_executes(tmp_path):
    """EXECUTE the deployment artifact from its serialized bytes and match
    the flax export graph (<1e-4 rel RMSE on both streams), on NONZERO
    outputs (128x160 — big enough that the border mask leaves data).

    Uses onnxruntime where the wheel exists (the robot-side consumer
    contract, reference export_to_onnx.py:57-74); on this no-wheel TPU
    image the in-repo interpreter (compat.onnx_exec) runs the ModelProto
    bytes directly — the artifact itself is executed either way."""
    import jax
    import jax.numpy as jnp

    from nconv_tpu.compat import selftest_guided_onnx
    from nconv_tpu.compat.onnx_exec import run_onnx

    h, w = 128, 160
    net = GuidedDepthNet()
    z3 = jnp.zeros((1, h, w, 3))
    z1 = jnp.zeros((1, h, w, 1))
    variables = net.init(jax.random.PRNGKey(0), z3, z1, z3, z1)
    path = str(tmp_path / "guided.onnx")
    export_guided_onnx(variables, path, height=h, width=w)

    s = selftest_guided_onnx(path, variables, height=h, width=w)
    assert s["exec_backend"] in ("onnxruntime", "builtin")
    assert s["exec_rel_rmse"] < 1e-4

    # independent nonzero check straight through the interpreter
    rng = np.random.default_rng(7)
    rgb = (rng.random((1, 3, h, w)) * 255).astype(np.float32)
    truth = np.fromfunction(
        lambda n, c, i, j: 5 + 3 * np.sin(i / 9) + 2 * np.cos(j / 11),
        (1, 1, h, w),
    ).astype(np.float32)
    d = (truth * (rng.random((1, 1, h, w)) < 0.06)).astype(np.float32)
    outs = run_onnx(
        path, {"rgb_0": rgb, "depth_0": d, "rgb_1": rgb, "depth_1": d}
    )
    assert float(np.abs(outs[0]).mean()) > 0.1


@pytest.mark.slow
def test_onnx_artifact_executes_at_deployed_geometry(tmp_path):
    """EXECUTE the artifact at the geometry the reference DEPLOYS it at —
    480x640 (export_to_onnx.py:45-47) — end-to-end against the flax export
    graph (<1e-4 rel RMSE on both streams). Closes the r4 gap: the
    deployed geometry had only been argued from the 128x160 execution."""
    import jax
    import jax.numpy as jnp

    from nconv_tpu.compat import selftest_guided_onnx

    h, w = 480, 640
    net = GuidedDepthNet()
    z3 = jnp.zeros((1, h, w, 3))
    z1 = jnp.zeros((1, h, w, 1))
    variables = net.init(jax.random.PRNGKey(1), z3, z1, z3, z1)
    path = str(tmp_path / "guided_full.onnx")
    export_guided_onnx(variables, path, height=h, width=w)

    s = selftest_guided_onnx(path, variables, height=h, width=w)
    assert s["exec_backend"] in ("onnxruntime", "builtin")
    assert s["exec_rel_rmse"] < 1e-4, s["exec_rel_rmse"]


def test_onnx_artifact_executes_under_onnxruntime(tmp_path, small_variables):
    """Pin that the REAL onnxruntime executes the artifact wherever its
    wheel exists (skips on this no-wheel TPU image; the builtin-executor
    test above covers this environment)."""
    pytest.importorskip("onnxruntime")
    from nconv_tpu.compat import selftest_guided_onnx

    path = str(tmp_path / "guided.onnx")
    export_guided_onnx(small_variables, path, height=64, width=96)
    s = selftest_guided_onnx(path, small_variables, height=64, width=96)
    assert s["ort_checked"] is True
    assert s["ort_rel_rmse"] < 1e-4
