"""Loss parity vs the reference loss functions (`/root/reference/utils.py`)
and metric sanity tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from nconv_tpu import losses, metrics

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

RNG = np.random.default_rng(0)


def ref_calculate_loss(pred_t, gt_t, use_gradient_loss):
    """Reference utils.py:138-151, reimplemented verbatim in torch for the
    golden comparison (the reference module itself imports its data layer)."""
    mask = gt_t == 0
    pred_t = pred_t.masked_fill(mask, 0)
    if use_gradient_loss:
        loss_metric = torch.sqrt(F.mse_loss(pred_t, gt_t))
        kx = torch.tensor([[[[1.0, 0, -1], [2, 0, -2], [1, 0, -1]]]])
        ky = torch.tensor([[[[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]]])
        diff = (gt_t - pred_t)
        gx = F.conv2d(diff, kx, padding=1)
        gy = F.conv2d(diff, ky, padding=1)
        loss_gradient = gx.abs().mean() + gy.abs().mean()
        return loss_metric * 0.8 + loss_gradient * 0.2
    return F.mse_loss(pred_t, gt_t)


def make_pair(b=2, h=24, w=32):
    pred = RNG.standard_normal((b, 1, h, w)).astype(np.float32)
    gt = RNG.standard_normal((b, 1, h, w)).astype(np.float32)
    gt *= (RNG.random((b, 1, h, w)) < 0.3).astype(np.float32)  # sparse GT
    return pred, gt


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


@pytest.mark.parametrize("use_grad", [False, True])
def test_depth_loss_matches_reference(use_grad):
    pred, gt = make_pair()
    ref = ref_calculate_loss(torch.tensor(pred), torch.tensor(gt), use_grad)
    got = losses.depth_loss(nhwc(pred), nhwc(gt), use_gradient_loss=use_grad)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_multi_resolution_loss_matches_reference():
    """Reference utils.py:63-71: resize each scale to full res
    (align_corners=False), loss on batch element 0, average over scales."""
    h, w = 48, 64
    gt = RNG.standard_normal((2, 1, h, w)).astype(np.float32)
    gt *= (RNG.random((2, 1, h, w)) < 0.3).astype(np.float32)
    scales_nchw = [
        RNG.standard_normal((2, 1, h // f, w // f)).astype(np.float32)
        for f in (8, 4, 2, 1)
    ]

    total = 0.0
    for s in scales_nchw:
        up = F.interpolate(
            torch.tensor(s), size=(h, w), mode="bilinear", align_corners=False
        )
        total += ref_calculate_loss(up[0:1], torch.tensor(gt[0:1]), True)
    ref = total / len(scales_nchw)

    got = losses.multi_resolution_loss(
        [nhwc(s) for s in scales_nchw], nhwc(gt), batch_reduce="first"
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_multi_resolution_loss_mean_uses_full_batch():
    h, w = 32, 32
    gt = np.ones((2, 1, h, w), np.float32)
    s = np.ones((2, 1, h, w), np.float32)
    s[1] = 5.0  # only element 1 is wrong
    first = losses.multi_resolution_loss([nhwc(s)], nhwc(gt), batch_reduce="first")
    mean = losses.multi_resolution_loss([nhwc(s)], nhwc(gt), batch_reduce="mean")
    assert float(first) < float(mean)


def test_masked_mse_ignores_invalid_gt():
    pred = np.full((1, 1, 8, 8), 7.0, np.float32)
    gt = np.zeros((1, 1, 8, 8), np.float32)
    # all GT invalid -> prediction fully masked -> zero loss
    assert float(losses.masked_mse(nhwc(pred), nhwc(gt))) == 0.0


def test_metrics_perfect_prediction():
    gt = np.abs(RNG.standard_normal((1, 1, 16, 16))).astype(np.float32) + 0.5
    gt *= (RNG.random((1, 1, 16, 16)) < 0.5).astype(np.float32)
    m = metrics.compute_all(nhwc(gt), nhwc(gt))
    assert float(m["rmse"]) == 0.0
    assert float(m["mae"]) == 0.0
    assert float(m["delta1"]) == 1.0


def test_metrics_only_valid_pixels_count():
    gt = np.zeros((1, 1, 4, 4), np.float32)
    gt[0, 0, 0, 0] = 2.0
    pred = np.full((1, 1, 4, 4), 3.0, np.float32)
    assert abs(float(metrics.mae(nhwc(pred), nhwc(gt))) - 1.0) < 1e-6
    assert abs(float(metrics.rmse(nhwc(pred), nhwc(gt))) - 1.0) < 1e-6
