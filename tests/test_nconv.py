"""Unit tests for the normalized-convolution op: closed-form math, softplus
reparameterization, initializers, and parity with the reference NConv2d
formula (SURVEY.md §4 test strategy)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nconv_tpu import ops
from nconv_tpu.ops.nconv import POS_FNS, softplus10_inverse

RNG = np.random.default_rng(1)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_nconv_closed_form():
    """out == conv(d*c)/(conv(c)+eps)+b ; cout == conv(c)/sum(w)."""
    d = jnp.asarray(rand(1, 12, 12, 1))
    c = jnp.asarray((RNG.random((1, 12, 12, 1)) > 0.5).astype(np.float32))
    kernel = jnp.asarray(rand(5, 5, 1, 4))
    bias = jnp.asarray(rand(4))

    out, cout = ops.nconv2d(d, c, kernel, bias, padding=2, pos_fn="softplus")

    w = POS_FNS["softplus"](kernel)
    denom = ops.conv2d(c, w, padding=2)
    nomin = ops.conv2d(d * c, w, padding=2)
    expect = nomin / (denom + 1e-7) + bias.reshape(1, 1, 1, -1)
    expect_c = denom / jnp.sum(w, axis=(0, 1, 2)).reshape(1, 1, 1, -1)

    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cout), np.asarray(expect_c), rtol=1e-5, atol=1e-6)


def test_nconv_confidence_in_unit_interval():
    """With binary input confidence and positive kernels, propagated
    confidence is a weighted average of inputs, so it stays in [0, 1]."""
    d = jnp.asarray(rand(2, 16, 16, 1))
    c = jnp.asarray((RNG.random((2, 16, 16, 1)) > 0.7).astype(np.float32))
    kernel = jnp.asarray(rand(5, 5, 1, 8))
    _, cout = ops.nconv2d(d, c, kernel, padding=2, pos_fn="softplus")
    assert float(jnp.min(cout)) >= 0.0
    assert float(jnp.max(cout)) <= 1.0 + 1e-6


def test_nconv_constant_signal_preserved():
    """NConv of a constant signal with full confidence returns the constant
    (plus bias): the normalization makes it an averaging filter."""
    d = jnp.full((1, 10, 10, 1), 3.25, jnp.float32)
    c = jnp.ones((1, 10, 10, 1), jnp.float32)
    kernel = jnp.asarray(rand(3, 3, 1, 1))
    out, cout = ops.nconv2d(d, c, kernel, padding=0, pos_fn="softplus")
    # eps=1e-7 in the denominator biases the result by ~eps/sum(w)
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(cout), 1.0, rtol=1e-5)


def test_nconv_zero_confidence_gives_bias_only():
    d = jnp.asarray(rand(1, 8, 8, 1))
    c = jnp.zeros((1, 8, 8, 1), jnp.float32)
    bias = jnp.asarray(np.full(2, 0.01, np.float32))
    out, cout = ops.nconv2d(d, c, jnp.asarray(rand(3, 3, 1, 2)), bias, padding=1)
    np.testing.assert_allclose(np.asarray(out), 0.01, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cout), 0.0, atol=1e-7)


def test_softplus_beta10_matches_torch():
    torch = pytest.importorskip("torch")
    x = rand(64)
    ref = torch.nn.functional.softplus(torch.tensor(x), beta=10).numpy()
    got = np.asarray(POS_FNS["softplus"](jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_softplus10_inverse_roundtrip():
    y = np.concatenate([np.geomspace(1e-6, 50.0, 64), [0.01, 0.0693]]).astype(np.float32)
    raw = softplus10_inverse(y)
    back = np.asarray(POS_FNS["softplus"](jnp.asarray(raw)))
    np.testing.assert_allclose(back, y, rtol=1e-4, atol=1e-6)


def test_poisson_kernel_matches_reference_construction():
    scipy_signal = pytest.importorskip("scipy.signal")
    from scipy.stats import poisson

    for k in (3, 5):
        mu = k / 2
        y = np.expand_dims(poisson(mu).pmf(np.arange(k)), 1)
        ref = scipy_signal.convolve2d(y, y.transpose(), "full")
        np.testing.assert_allclose(ops.poisson_kernel_pmf(k), ref, rtol=1e-12)


def test_poisson_init_shape_and_range():
    w = ops.poisson_init(jax.random.key(0), (5, 5, 2, 8))
    assert w.shape == (5, 5, 2, 8)
    base = ops.poisson_kernel_pmf(5)
    assert float(jnp.min(w)) >= float(base.min())  # pmf + U[0,1) noise
    assert float(jnp.max(w)) <= float(base.max()) + 1.0


def test_softmax_pos_fn_normalizes_per_cout_cin_pair():
    """Reference EnforcePos softmaxes the kh*kw taps of each (cout, cin)
    pair (step1.py:199-203: p.view(cout, cin, -1), softmax(-1))."""
    w_hwio = rand(3, 3, 2, 4)
    s = POS_FNS["softmax"](jnp.asarray(w_hwio))
    # spatial sums are 1 for every (cin, cout) pair
    np.testing.assert_allclose(np.asarray(jnp.sum(s, axis=(0, 1))), 1.0, rtol=1e-5)

    import torch

    w_oihw = torch.tensor(np.transpose(w_hwio, (3, 2, 0, 1)))
    ref = torch.nn.functional.softmax(w_oihw.view(4, 2, -1), -1).view(4, 2, 3, 3)
    np.testing.assert_allclose(
        np.asarray(s), np.transpose(ref.numpy(), (2, 3, 1, 0)), rtol=1e-5
    )


def test_nconv_gradients_flow():
    """The reparameterized kernel must be differentiable end-to-end (the
    reference's in-place hook breaks this; ours must not)."""
    d = jnp.asarray(rand(1, 8, 8, 1))
    c = jnp.ones_like(d)

    def loss(kernel):
        out, _ = ops.nconv2d(d, c, kernel, padding=1)
        return jnp.mean(out**2)

    g = jax.grad(loss)(jnp.asarray(rand(3, 3, 1, 2)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_pallas_backend_matches_xla_interpret():
    """NConv2d(backend='pallas') == backend='xla' in interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from nconv_tpu.models import NConv2d

    d = jnp.asarray(RNG.standard_normal((1, 24, 32, 8)).astype(np.float32))
    c = jnp.asarray((RNG.random((1, 24, 32, 8)) > 0.5).astype(np.float32))
    m_x = NConv2d(8, 5, 2, backend="xla")
    m_p = NConv2d(8, 5, 2, backend="pallas")
    v = m_x.init(jax.random.key(0), d, c)
    ox, cx = m_x.apply(v, d, c)
    with pltpu.force_tpu_interpret_mode():
        op, cp = m_p.apply(v, d, c)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), rtol=1e-5, atol=1e-6)


def test_pallas_unguided_unet_matches_xla_interpret():
    """Full NConvUNet with the pallas backend == xla backend."""
    from jax.experimental.pallas import tpu as pltpu

    from nconv_tpu.models import NConvUNet

    d = jnp.asarray(
        (RNG.random((1, 48, 64, 1)) * (RNG.random((1, 48, 64, 1)) < 0.1)).astype(
            np.float32
        )
    )
    m_x = NConvUNet(backend="xla")
    m_p = NConvUNet(backend="pallas")
    v = m_x.init(jax.random.key(0), d)
    ox, cx = m_x.apply(v, d)
    with pltpu.force_tpu_interpret_mode():
        op, cp = m_p.apply(v, d)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_nconv_grads_match_xla():
    """backend='pallas' is trainable: custom_vjp gives the same gradients as
    the XLA formulation (reference training loop, train_step1.py:61-65)."""
    from jax.experimental.pallas import tpu as pltpu

    from nconv_tpu.models import NConvUNet

    rng = np.random.default_rng(3)
    h, w = 24, 32
    truth = np.fromfunction(
        lambda n, i, j, c: 2 + np.sin(i / 5) + np.cos(j / 6), (1, h, w, 1)
    ).astype(np.float32)
    d = jnp.asarray(truth * (rng.random((1, h, w, 1)) < 0.2))
    gt = jnp.asarray(truth)

    m_x = NConvUNet(backend="xla")
    m_p = NConvUNet(backend="pallas")
    v = m_x.init(jax.random.key(0), d)

    def loss(model, params):
        pred, _ = model.apply(params, d)
        return jnp.mean((pred - gt) ** 2)

    g_x = jax.grad(lambda p: loss(m_x, p))(v)
    with pltpu.force_tpu_interpret_mode():
        g_p = jax.grad(lambda p: loss(m_p, p))(v)
    flat_x, _ = jax.tree.flatten(g_x)
    flat_p, _ = jax.tree.flatten(g_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_pallas_conv_grads_match_xla():
    from jax.experimental.pallas import tpu as pltpu

    from nconv_tpu.ops import conv2d
    from nconv_tpu.ops.pallas_conv import conv2d_pallas_bhcw

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 16, 10, 24)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 10, 6)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))

    def loss_p(x, k, b):
        return jnp.sum(conv2d_pallas_bhcw(x, k, b, padding=1, relu=True) ** 2)

    def loss_x(x, k, b):
        out = jax.nn.relu(
            conv2d(jnp.transpose(x, (0, 1, 3, 2)), k, b, padding=1)
        )
        return jnp.sum(out**2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, k, b)
    for a, c in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4, rtol=1e-4)
