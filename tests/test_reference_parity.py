"""End-to-end inference parity vs the actual reference PyTorch modules.

The BASELINE.md accuracy target is depth RMSE < 1e-3 *relative* vs the
reference. These tests instantiate the reference models on CPU with their
random init, convert the state dicts with nconv_tpu.compat, and compare
full forward passes. They skip if /root/reference isn't mounted.

Notes on reference quirks handled here (SURVEY.md §0, §2.2):
  * the reference's step-1 output crop is hardcoded to 480x640
    (`models/step1.py:94`), so exact-shape parity holds only there; at other
    sizes the reference emits one extra (bias-only) row/col, and the
    comparison truncates it;
  * the reference's two-arg ``step1(depth0, depth1)`` call raises TypeError
    as committed; tests monkey-patch in the intended batch-concat semantics.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from nconv_tpu.compat import (  # noqa: E402
    convert_guided_state_dict,
    convert_unguided_state_dict,
)
from nconv_tpu.models import GuidedDepthNet, NConvUNet  # noqa: E402
from reference_loader import load_reference  # noqa: E402

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference repo not available")


def rel_rmse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(b**2)) + 1e-12)


def make_sparse_depth(rng, b, h, w):
    d = rng.random((b, 1, h, w)).astype(np.float32) * 5.0
    mask = rng.random((b, 1, h, w)) < 0.05
    return (d * mask).astype(np.float32)


def nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def patch_two_stream(model_t):
    """Give the reference step-1 the intended batch-concat two-arg forward."""
    inner = model_t.step1.d_net

    def fixed(d0, d1):
        return inner(torch.cat([d0, d1], dim=0))

    model_t.step1.forward = fixed
    return model_t


def test_unguided_forward_parity_full_resolution():
    ref_step1, _ = ref
    torch.manual_seed(0)
    model_t = ref_step1.SETP1_NCONV().eval()

    rng = np.random.default_rng(0)
    d_nchw = make_sparse_depth(rng, 1, 480, 640)
    with torch.no_grad():
        out_t = np.asarray(model_t(torch.tensor(d_nchw)))

    variables = convert_unguided_state_dict(model_t.state_dict())
    model_j = NConvUNet(pos_fn="identity")
    out_j, _ = model_j.apply(variables, nhwc(d_nchw))

    assert out_t.shape == (1, 1, 480, 640)
    assert rel_rmse(from_nhwc(out_j), out_t) < 1e-5


def test_unguided_forward_parity_small_size_truncated():
    """At non-480x640 sizes the reference over-crops by one row/col; our
    generic geometry matches its interior exactly."""
    ref_step1, _ = ref
    torch.manual_seed(3)
    model_t = ref_step1.SETP1_NCONV().eval()
    h, w = 96, 128
    rng = np.random.default_rng(3)
    d_nchw = make_sparse_depth(rng, 1, h, w)
    with torch.no_grad():
        out_t = np.asarray(model_t(torch.tensor(d_nchw)))
    assert out_t.shape == (1, 1, h + 1, w + 1)  # the reference's extra border

    variables = convert_unguided_state_dict(model_t.state_dict())
    out_j, _ = NConvUNet(pos_fn="identity").apply(variables, nhwc(d_nchw))
    assert rel_rmse(from_nhwc(out_j), out_t[:, :, :h, :w]) < 1e-5


def test_guided_export_forward_parity_full_resolution():
    _, ref_step2 = ref
    torch.manual_seed(1)
    model_t = patch_two_stream(ref_step2.SETP2_BP_EXPORT().eval())

    h, w = 480, 640
    rng = np.random.default_rng(1)
    rgb0 = rng.random((1, 3, h, w)).astype(np.float32) * 255
    rgb1 = rng.random((1, 3, h, w)).astype(np.float32) * 255
    d0 = make_sparse_depth(rng, 1, h, w)
    d1 = make_sparse_depth(rng, 1, h, w)
    with torch.no_grad():
        out0_t, out1_t = model_t(
            torch.tensor(rgb0), torch.tensor(d0), torch.tensor(rgb1), torch.tensor(d1)
        )

    variables = convert_guided_state_dict(model_t.state_dict())
    model_j = GuidedDepthNet(step1_pos_fn="identity")
    out0_j, out1_j = model_j.apply(
        variables, nhwc(rgb0), nhwc(d0), nhwc(rgb1), nhwc(d1),
        method=GuidedDepthNet.export,
    )

    assert rel_rmse(from_nhwc(out0_j), np.asarray(out0_t)) < 1e-4
    assert rel_rmse(from_nhwc(out1_j), np.asarray(out1_t)) < 1e-4


def test_guided_two_streams_differ_and_share_weights():
    """Distinct inputs per stream give distinct outputs; identical inputs
    give identical outputs (shared weights, batch-concat semantics)."""
    _, ref_step2 = ref
    torch.manual_seed(2)
    model_t = patch_two_stream(ref_step2.SETP2_BP_EXPORT().eval())
    variables = convert_guided_state_dict(model_t.state_dict())
    model_j = GuidedDepthNet(step1_pos_fn="identity")

    h, w = 96, 128
    rng = np.random.default_rng(2)
    rgb_a = nhwc(rng.random((1, 3, h, w)).astype(np.float32))
    rgb_b = nhwc(rng.random((1, 3, h, w)).astype(np.float32))
    d_a = nhwc(make_sparse_depth(rng, 1, h, w))
    d_b = nhwc(make_sparse_depth(rng, 1, h, w))

    s0, s1 = model_j.apply(variables, rgb_a, d_a, rgb_a, d_a)
    for a, b in zip(s0, s1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    s0, s1 = model_j.apply(variables, rgb_a, d_a, rgb_b, d_b)
    assert rel_rmse(np.asarray(s0[-1]), np.asarray(s1[-1])) > 1e-3


# ---------------------------------------------------------------------------
# Training-side parity: gradients and convergence vs the torch harness.
# ---------------------------------------------------------------------------

def _run_grad_parity(h: int, w: int, seed: int):
    """Shared body for the grad-parity pins: torch autograd through the
    patched reference SETP2_BP_TRAIN + calculate_loss_multi_resolution vs
    our jax value_and_grad, in train mode (batch-stats BN), from identical
    converted weights.

    Tolerances are derived from a measured f64 decomposition (see
    scripts/grad_parity_deep.py): re-running OUR graph in f64 shows that
    for EVERY leaf, ||ours_f32 - torch_f32|| <= 1.00 x
    (||ours_f32 - ours_f64|| + ||torch_f32 - ours_f64||) — the gap is
    entirely both sides' own f32 rounding around the common f64 value
    (and torch's rounding noise dominates ours by ~10^3). Measured worst
    cases: elementwise gap 4.5e-5 of the global max |g|; per-leaf norm
    rel 8.6e-4 (leaves with norm >= 1% of the largest). A uniform 1e-4
    rel-per-leaf bar is NOT achievable in f32 — conv biases feeding BN
    have mathematically-zero gradients (pure rounding dust on both
    sides), and small leaves sit at the amplified-noise floor."""
    import jax

    from nconv_tpu.compat.torch_convert import _flatten
    from nconv_tpu.losses import multi_resolution_loss
    from convergence_harness import build_torch_side

    model_t, ref_loss, sd0 = build_torch_side(seed=seed)

    rng = np.random.default_rng(seed)
    rgb = rng.random((1, 3, h, w)).astype(np.float32)
    truth = np.fromfunction(
        lambda n, c, i, j: 2 + np.sin(i / 17) + np.cos(j / 23), (1, 1, h, w)
    ).astype(np.float32)
    d = (truth * (rng.random((1, 1, h, w)) < 0.05)).astype(np.float32)
    # gt is ALWAYS 480x640: the reference loss hardcodes that resize
    # target (utils.py:66), at any input geometry
    gt_truth = np.fromfunction(
        lambda n, c, i, j: 2 + np.sin(i / 17) + np.cos(j / 23), (1, 1, 480, 640)
    ).astype(np.float32)
    gt_nchw = (gt_truth * (rng.random((1, 1, 480, 640)) < 0.8)).astype(
        np.float32
    )

    # --- torch forward/backward (train mode; EnforcePos projects step-1
    # kernels pre-conv, matching our pos_fn='softplus' over the raw sd)
    est0, _ = model_t(
        torch.tensor(rgb), torch.tensor(d), torch.tensor(rgb), torch.tensor(d)
    )
    loss_t = ref_loss(est0, torch.tensor(gt_nchw))
    loss_t.backward()
    grads_t = {
        k: p.grad.detach().clone()
        for k, p in model_t.named_parameters()
        if p.grad is not None
    }

    # --- our forward/backward (xla f32, single-stream exact form,
    # batch_reduce='first')
    variables = convert_guided_state_dict(sd0, kernel_mode="raw")
    model_j = GuidedDepthNet()
    gt = nhwc(gt_nchw)

    def loss_fn(params):
        (s0, _), _mut = model_j.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            nhwc(rgb), nhwc(d), None, None, True, mutable=["batch_stats"],
        )
        return (
            multi_resolution_loss(
                s0, gt, use_gradient_loss=False, batch_reduce="first"
            ),
            s0,
        )

    (loss_j, s0_j), g_j = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )

    # loss + train-mode forward parity (batch-stats BN path vs torch)
    lt = float(loss_t.detach())
    assert abs(float(loss_j) - lt) / abs(lt) < 1e-6
    for sj, st in zip(s0_j, est0):
        assert rel_rmse(from_nhwc(sj), st.detach().numpy()) < 1e-5

    theirs = _flatten(
        convert_guided_state_dict(grads_t, kernel_mode="raw")["params"]
    )
    ours = _flatten(g_j)
    # coverage: torch's trainable set == our non-step1 leaves; our frozen
    # step-1 leaves carry exact zeros (stop_gradient)
    assert set(theirs) == {p for p in ours if p[0] != "step1"}
    for p in ours:
        if p[0] == "step1":
            assert not np.asarray(ours[p]).any(), p

    gmax = max(float(np.max(np.abs(np.asarray(v)))) for v in theirs.values())
    nmax = max(float(np.linalg.norm(np.asarray(v))) for v in theirs.values())
    for path, tg in theirs.items():
        og = np.asarray(ours[path], np.float64)
        tg = np.asarray(tg, np.float64)
        # every element within 1e-3 of the global gradient scale.
        # Measured across inits: worst 4.5e-5 (seed 0/1) and 2.2e-4
        # (seed 11) of gmax — torch's reduction noise is an absolute
        # floor (~1e-6 at these sizes) while gmax itself varies ~3x
        # with the random init, hence the seed-robust 4.5x margin.
        assert float(np.max(np.abs(og - tg))) <= 1e-3 * gmax, path
        # significant leaves additionally within 2e-3 relative norm
        # (measured worst 8.6e-4)
        n = float(np.linalg.norm(tg))
        if n >= 0.01 * nmax:
            assert float(np.linalg.norm(og - tg)) / n < 2e-3, path


@pytest.mark.slow
def test_guided_train_grad_parity_vs_torch():
    """Full-size pin at the reference's native 480x640 (seed 11)."""
    _run_grad_parity(480, 640, seed=11)


def test_guided_train_grad_parity_vs_torch_mini():
    """Fast-gate pin: same end-to-end grad parity at 48x64 — the claim is
    re-proven on every `pytest -m "not slow"` run (VERDICT r4 #5). The
    f64-decomposed tolerance bars are geometry-independent (both sides'
    f32 rounding around the common f64 value)."""
    _run_grad_parity(48, 64, seed=11)


@pytest.mark.slow
def test_training_convergence_tracks_reference():
    """Side-by-side training from identical converted init on identical
    synthetic frames with the same AdamW: the loss curves must track and
    both harnesses must actually converge. 60 steps at 96x128 (the
    480x640-native graph made geometry-generic by the no-op-at-native
    step-1 crop patch, see convergence_harness). The full 200-step run is
    scripts/convergence_vs_torch.py. Measured: rel gap grows ~4e-5/step
    (f32 trajectories through Adam's normalized updates)."""
    from convergence_harness import run_comparison

    r = run_comparison(n_steps=60, h=96, w=128)
    assert r["max_rel_gap"] < 1e-2, r["max_rel_gap"]
    lt, lj = r["losses_torch"], r["losses_jax"]
    assert lt[-1] < 0.8 * lt[0], (lt[0], lt[-1])
    assert lj[-1] < 0.8 * lj[0], (lj[0], lj[-1])


def test_training_convergence_tracks_reference_mini():
    """Fast-gate convergence pin: 10 steps at 48x64 side by side with the
    torch harness — the curves must track tightly (measured rel gap grows
    ~4e-5/step) and move in the same direction. The 60-step 96x128 and
    200-step runs stay slow-marked."""
    from convergence_harness import run_comparison

    r = run_comparison(n_steps=12, h=48, w=64)
    assert r["max_rel_gap"] < 5e-3, r["max_rel_gap"]
    # frames cycle with period 4: compare same-frames cycle means, not
    # adjacent steps (adjacent losses are on different frames)
    for ls in (r["losses_torch"], r["losses_jax"]):
        assert np.mean(ls[8:12]) < np.mean(ls[0:4]), ls


# ---------------------------------------------------------------------------
# Reverse direction: our variables -> reference .pth.tar. The reference's
# deployment pipeline (export_to_onnx.py) consumes these unchanged, which is
# the ONNX-deliverable bridge (docs/INTEROP.md).
# ---------------------------------------------------------------------------

def test_reverse_unguided_roundtrip_bit_exact():
    """reference sd -> variables -> sd reproduces every live key exactly."""
    from nconv_tpu.compat import to_unguided_state_dict

    ref_step1, _ = ref
    torch.manual_seed(4)
    sd0 = {k: np.asarray(v) for k, v in ref_step1.SETP1_NCONV().state_dict().items()}

    variables = convert_unguided_state_dict(sd0)  # raw mode
    sd1 = to_unguided_state_dict(variables, kernel_mode="raw")
    live = {k for k in sd0 if ".bnorm." not in k and not k.endswith("num_batches_tracked")}
    assert set(sd1) == live
    for k in sd1:
        np.testing.assert_array_equal(sd1[k], sd0[k], err_msg=k)


def test_reverse_guided_loads_into_reference_and_matches(tmp_path):
    """Natively-initialized GuidedDepthNet weights, exported via save_pth_tar,
    load into the reference SETP2_BP_EXPORT with no unexpected keys and give
    the same forward as our model (softplus'd kernels exported as the
    positive weights a reference checkpoint carries).

    Runs at 480x640: the reference graph only closes at its native NYU
    geometry (the step-1 crop quirk, SURVEY.md §2.1)."""
    import jax

    from nconv_tpu.compat import save_pth_tar, strip_data_parallel_prefix

    _, ref_step2 = ref
    h, w = 480, 640
    rng = np.random.default_rng(5)
    rgb0 = rng.random((1, 3, h, w)).astype(np.float32) * 255
    rgb1 = rng.random((1, 3, h, w)).astype(np.float32) * 255
    d0 = make_sparse_depth(rng, 1, h, w)
    d1 = make_sparse_depth(rng, 1, h, w)

    model_j = GuidedDepthNet()  # native defaults: step1 pos_fn='softplus'
    variables = model_j.init(jax.random.key(7), nhwc(rgb0), nhwc(d0), nhwc(rgb1), nhwc(d1))
    out0_j, out1_j = model_j.apply(
        variables, nhwc(rgb0), nhwc(d0), nhwc(rgb1), nhwc(d1),
        method=GuidedDepthNet.export,
    )

    path = str(tmp_path / "ours.pth.tar")
    save_pth_tar(path, variables, model="guided", kernel_mode="softplus")

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = strip_data_parallel_prefix(ckpt["state_dict"])
    torch.manual_seed(6)
    model_t = patch_two_stream(ref_step2.SETP2_BP_EXPORT().eval())
    result = model_t.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not result.unexpected_keys
    # only the reference's dead state may be missing
    assert all(
        ".bnorm." in k or k.endswith("num_batches_tracked")
        for k in result.missing_keys
    ), result.missing_keys

    with torch.no_grad():
        out0_t, out1_t = model_t(
            torch.tensor(rgb0), torch.tensor(d0), torch.tensor(rgb1), torch.tensor(d1)
        )
    assert rel_rmse(from_nhwc(out0_j), np.asarray(out0_t)) < 1e-5
    assert rel_rmse(from_nhwc(out1_j), np.asarray(out1_t)) < 1e-5
