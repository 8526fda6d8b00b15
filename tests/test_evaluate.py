"""Evaluation harness + checkpoint interop tests."""
import numpy as np
import pytest

import jax

from nconv_tpu.models import NConvUNet
from nconv_tpu.training import (
    evaluate,
    load_best,
    make_unguided_predict,
    save_best,
)

RNG = np.random.default_rng(0)
H, W = 48, 64


def batches(n=3):
    out = []
    for _ in range(n):
        truth = np.fromfunction(
            lambda b, i, j, c: 2 + np.sin(i / 10), (1, H, W, 1)
        ).astype(np.float32)
        mask = (RNG.random((1, H, W, 1)) < 0.2).astype(np.float32)
        out.append({"depth": truth * mask, "gt": truth})
    return out


def test_evaluate_unguided_metrics():
    model = NConvUNet()
    bs = batches()
    variables = model.init(jax.random.key(0), bs[0]["depth"])
    predict = make_unguided_predict(variables, model)
    m = evaluate(predict, bs)
    assert set(m) == {"rmse", "mae", "irmse", "imae", "delta1", "delta2", "delta3"}
    assert m["rmse"] > 0 and m["delta1"] <= 1.0
    assert m["delta1"] <= m["delta2"] <= m["delta3"]


def test_evaluate_max_batches_and_empty():
    model = NConvUNet()
    bs = batches(4)
    variables = model.init(jax.random.key(0), bs[0]["depth"])
    predict = make_unguided_predict(variables, model)
    m_all = evaluate(predict, bs)
    m_two = evaluate(predict, bs, max_batches=2)
    assert np.isfinite(m_two["rmse"])
    with pytest.raises(ValueError, match="empty"):
        evaluate(predict, [])


def test_save_best_load_best_roundtrip(tmp_path):
    model = NConvUNet()
    d = batches(1)[0]["depth"]
    variables = model.init(jax.random.key(3), d)
    path = save_best(str(tmp_path), "best", variables)
    back = load_best(path)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored variables drive the model identically
    o1, _ = model.apply(variables, d)
    o2, _ = model.apply(back, d)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_converted_reference_checkpoint_roundtrips_through_orbax(tmp_path):
    """convert -> save_best -> load_best -> same outputs (the full
    reference-to-production path)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "tests")
    from reference_loader import load_reference

    ref = load_reference()
    if ref is None:
        pytest.skip("reference not available")
    from nconv_tpu.compat import convert_unguided_state_dict
    from nconv_tpu.models import NConvUNet as Net

    torch.manual_seed(0)
    model_t = ref[0].SETP1_NCONV().eval()
    variables = convert_unguided_state_dict(model_t.state_dict())
    path = save_best(str(tmp_path), "conv", variables)
    back = load_best(path)

    d = batches(1)[0]["depth"]
    model = Net(pos_fn="identity")
    o1, _ = model.apply(variables, d)
    o2, _ = model.apply(back, d)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
