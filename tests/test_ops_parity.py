"""Golden-value parity of NHWC primitives against torch CPU semantics.

The reference is a torch stack; these tests pin our NHWC ops to the exact
torch conventions the reference relies on (SURVEY.md §7 'hard parts')."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from nconv_tpu import ops  # noqa: E402

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("stride,padding,k", [(1, 2, 5), (1, 1, 3), (2, 1, 3), (1, 0, 3), (1, 2, 1)])
def test_conv2d_matches_torch(stride, padding, k):
    x = rand(2, 16, 20, 3)
    w_torch = rand(5, 3, k, k)  # (out, in, kh, kw)
    b = rand(5)
    ref = F.conv2d(nchw(x), torch.tensor(w_torch), torch.tensor(b), stride, padding)
    got = ops.conv2d(
        jnp.asarray(x),
        ops.torch_conv_kernel_to_hwio(w_torch),
        jnp.asarray(b),
        stride=stride,
        padding=padding,
    )
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-5, atol=1e-5)


def test_conv_transpose2d_matches_torch():
    # the decoder's 4x4 stride-2 pad-1 transpose conv (models/step2.py:205)
    x = rand(2, 12, 14, 6)
    w_torch = rand(6, 4, 4, 4)  # torch layout (in, out, kh, kw)
    b = rand(4)
    ref = F.conv_transpose2d(nchw(x), torch.tensor(w_torch), torch.tensor(b), stride=2, padding=1)
    got = ops.conv_transpose2d(
        jnp.asarray(x),
        ops.torch_convtranspose_kernel_to_hwio(w_torch),
        jnp.asarray(b),
        stride=2,
        padding=1,
    )
    assert got.shape == (2, 24, 28, 4)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_max_pool2d_matches_torch():
    x = rand(2, 17, 21, 4)  # odd sizes: floor mode drops the remainder
    ref = F.max_pool2d(nchw(x), 2, 2)
    got = ops.max_pool2d(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-6, atol=1e-6)


def test_max_pool_pair_matches_separate_pools():
    x, c = rand(1, 16, 16, 8), rand(1, 16, 16, 8)
    px, pc = ops.max_pool_pair(jnp.asarray(x), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(px), np.asarray(ops.max_pool2d(jnp.asarray(x))))
    np.testing.assert_allclose(np.asarray(pc), np.asarray(ops.max_pool2d(jnp.asarray(c))))


@pytest.mark.parametrize("in_hw,out_hw", [((15, 20), (30, 40)), ((7, 9), (15, 20)), ((8, 8), (11, 13))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = rand(2, *in_hw, 3)
    ref = F.interpolate(nchw(x), size=out_hw, mode="nearest")
    got = ops.resize_nearest(jnp.asarray(x), out_hw)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [((60, 80), (480, 640)), ((16, 24), (9, 13)), ((31, 17), (62, 34))])
def test_resize_bilinear_matches_torch(align, in_hw, out_hw):
    x = rand(2, *in_hw, 3)
    ref = F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align)
    got = ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_downscale_bilinear_matches_torch_scale_factor(factor):
    # fuse stages downsample step-1 depth by 1/f with align_corners=True
    # (models/step2.py:252,271)
    x = rand(1, 480, 640, 1)
    ref = F.interpolate(nchw(x), scale_factor=1 / factor, mode="bilinear", align_corners=True)
    got = ops.downscale_bilinear(jnp.asarray(x), factor)
    assert got.shape[1:3] == tuple(ref.shape[2:])
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), rtol=1e-4, atol=1e-5)


def test_sobel_matches_torch_loss_convention():
    x = rand(1, 32, 32, 1)
    kx = torch.tensor([[[[1.0, 0, -1], [2, 0, -2], [1, 0, -1]]]])
    ky = torch.tensor([[[[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]]])
    ref_x = F.conv2d(nchw(x), kx, padding=1)
    ref_y = F.conv2d(nchw(x), ky, padding=1)
    gx, gy = ops.sobel_xy(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx), to_nhwc(ref_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), to_nhwc(ref_y), rtol=1e-5, atol=1e-5)


def test_conv_transpose2d_phased_matches_dilated():
    """The phase decomposition (4 stride-1 convs + interleave) must equal
    the input-dilated lowering for the 4x4/s2/p1 decoder config."""
    x = rand(2, 12, 14, 6)
    w_torch = rand(6, 4, 4, 4)
    b = rand(4)
    k = ops.torch_convtranspose_kernel_to_hwio(w_torch)
    ref = ops.conv_transpose2d(jnp.asarray(x), k, jnp.asarray(b), stride=2, padding=1)
    got = ops.conv_transpose2d(
        jnp.asarray(x), k, jnp.asarray(b), stride=2, padding=1, method="phased"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestStride2Machinery:
    """space-to-depth / phase-kernel transforms (ops/convops.py) that let the
    stride-1 Pallas row-matmul kernel run the guided net's strided convs."""

    def setup_method(self):
        self.rng = np.random.default_rng(7)

    def _rand(self, *shape):
        return jnp.asarray(self.rng.standard_normal(shape).astype(np.float32))

    def test_s2d_conv_matches_strided_conv(self):
        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.convops import conv_kernel_s2d, space_to_depth_bhcw

        x = self._rand(2, 16, 24, 5)
        k = self._rand(3, 3, 5, 7)
        ref = conv2d(x, k, stride=2, padding=1)
        s2d = space_to_depth_bhcw(jnp.transpose(x, (0, 1, 3, 2)), pad=1)
        got = conv2d(
            jnp.transpose(s2d, (0, 1, 3, 2)), conv_kernel_s2d(k),
            stride=1, padding=0,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_s2d_shortcut_matches_1x1_stride2(self):
        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.convops import shortcut_kernel_s2d, space_to_depth_bhcw

        x = self._rand(1, 16, 24, 5)
        k1 = self._rand(1, 1, 5, 7)
        ref = conv2d(x, k1, stride=2, padding=0)
        s2d = space_to_depth_bhcw(jnp.transpose(x, (0, 1, 3, 2)), pad=1)
        ks = shortcut_kernel_s2d(k1, pad=1)
        # embed in the main conv's 2x2 tap grid: geometry then matches
        ks2 = jnp.zeros((2, 2) + ks.shape[2:]).at[0, 0].set(ks[0, 0])
        got = conv2d(jnp.transpose(s2d, (0, 1, 3, 2)), ks2, stride=1, padding=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_convtranspose_phase_form_matches(self):
        from nconv_tpu.ops import conv2d, conv_transpose2d
        from nconv_tpu.ops.convops import (
            convtranspose_kernel_phases,
            depth_to_space_bhcw,
        )

        x = self._rand(2, 10, 14, 6)
        k4 = self._rand(4, 4, 6, 9)
        ref = conv_transpose2d(x, k4, stride=2, padding=1)
        ph = conv2d(x, convtranspose_kernel_phases(k4), stride=1, padding=1)
        out = depth_to_space_bhcw(jnp.transpose(ph, (0, 1, 3, 2)), 9)
        got = jnp.transpose(out, (0, 1, 3, 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_residual_dual_conv_kernel(self):
        from jax.experimental.pallas import tpu as pltpu

        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.pallas_conv import conv2d_pallas_bhcw

        x = self._rand(1, 24, 40, 6)
        km = self._rand(3, 3, 6, 10)
        ks1 = self._rand(1, 1, 6, 10)
        bias = self._rand(10)
        import jax

        ref = jax.nn.relu(conv2d(x, km, bias, padding=1)) + conv2d(
            x, ks1, padding=0
        )
        ks3 = jnp.zeros((3, 3, 6, 10)).at[1, 1].set(ks1[0, 0])
        kcat = jnp.concatenate([km, ks3], -1)
        with pltpu.force_tpu_interpret_mode():
            got = conv2d_pallas_bhcw(
                jnp.transpose(x, (0, 1, 3, 2)), kcat, bias, padding=1,
                residual_channels=10,
            )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 1, 3, 2))), np.asarray(ref),
            atol=1e-4,
        )

    def test_residual_dual_conv_grads_match_reference(self):
        """The fused-residual custom VJP (mask recovered from out - short,
        one stacked transposed conv + filter grad — no main-conv recompute)
        must match grads of the unfused XLA formulation."""
        import jax
        from jax.experimental.pallas import tpu as pltpu

        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.pallas_conv import conv2d_pallas_bhcw

        x = self._rand(1, 16, 24, 6)
        km = self._rand(3, 3, 6, 8)
        ks1 = self._rand(1, 1, 6, 8)
        bias = self._rand(8)
        ks3 = jnp.zeros((3, 3, 6, 8)).at[1, 1].set(ks1[0, 0])
        kcat = jnp.concatenate([km, ks3], -1)
        x_b = jnp.transpose(x, (0, 1, 3, 2))

        def loss_ref(x, kcat, bias):
            o = jax.nn.relu(conv2d(x, kcat[..., :8], bias, padding=1)) + conv2d(
                x, kcat[..., 8:], padding=1
            )
            return jnp.sum(o * jnp.cos(o))

        def loss_pallas(x_b, kcat, bias):
            o = conv2d_pallas_bhcw(
                x_b, kcat, bias, padding=1, residual_channels=8
            )
            return jnp.sum(o * jnp.cos(o))

        gx_r, gk_r, gb_r = jax.grad(loss_ref, (0, 1, 2))(x, kcat, bias)
        with pltpu.force_tpu_interpret_mode():
            gx_p, gk_p, gb_p = jax.grad(loss_pallas, (0, 1, 2))(x_b, kcat, bias)
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(gx_p, (0, 1, 3, 2))), np.asarray(gx_r),
            rtol=2e-4, atol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(gk_p), np.asarray(gk_r), rtol=2e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(gb_p), np.asarray(gb_r), rtol=2e-4, atol=1e-3
        )


class TestMultiPartConv:
    """conv2d_pallas_bhcw_cat: a logical channel concat fed to the kernel as
    separate HBM operands (the training graph's concat-free UpCat /
    NewFusionBlock joins, reference `models/step2.py:169-174,229`)."""

    def setup_method(self):
        self.rng = np.random.default_rng(11)

    def _rand(self, *shape):
        return jnp.asarray(self.rng.standard_normal(shape).astype(np.float32))

    def _check_fwd(self, part_cs, h, w, cout, padding=1, relu=False):
        import jax
        from jax.experimental.pallas import tpu as pltpu

        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.pallas_conv import conv2d_pallas_bhcw_cat

        parts_nhwc = [self._rand(2, h, w, c) for c in part_cs]
        cin = sum(part_cs)
        k = self._rand(3, 3, cin, cout)
        bias = self._rand(cout)
        ref = conv2d(
            jnp.concatenate(parts_nhwc, -1), k, bias, padding=padding
        )
        if relu:
            ref = jax.nn.relu(ref)
        parts = [jnp.transpose(p, (0, 1, 3, 2)) for p in parts_nhwc]
        with pltpu.force_tpu_interpret_mode():
            got = conv2d_pallas_bhcw_cat(
                parts, k, bias, padding=padding, relu=relu
            )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 1, 3, 2))), np.asarray(ref),
            atol=1e-4,
        )

    def test_granular_parts(self):
        self._check_fwd([8, 16], 12, 40, 8)

    def test_subgranule_part_first(self):
        # 1-channel depth FIRST (UpCat's [depth ‖ fusion] order): binds via
        # expand_kernel_channels, not an HBM concat
        self._check_fwd([1, 16], 10, 24, 8)

    def test_subgranule_both_with_relu(self):
        self._check_fwd([3, 5], 9, 30, 6, relu=True)

    def test_grads_match_concat_reference(self):
        import jax
        from jax.experimental.pallas import tpu as pltpu

        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.pallas_conv import conv2d_pallas_bhcw_cat

        h, w, cout = 10, 24, 8
        part_cs = [1, 16]
        parts_nhwc = [self._rand(2, h, w, c) for c in part_cs]
        k = self._rand(3, 3, sum(part_cs), cout)
        bias = self._rand(cout)

        def loss_ref(p0, p1, k, bias):
            o = jax.nn.relu(
                conv2d(jnp.concatenate([p0, p1], -1), k, bias, padding=1)
            )
            return jnp.sum(o * jnp.cos(o))

        def loss_pallas(p0, p1, k, bias):
            o = conv2d_pallas_bhcw_cat(
                [jnp.transpose(p0, (0, 1, 3, 2)),
                 jnp.transpose(p1, (0, 1, 3, 2))],
                k, bias, padding=1, relu=True,
            )
            return jnp.sum(
                jnp.transpose(o, (0, 1, 3, 2))
                * jnp.cos(jnp.transpose(o, (0, 1, 3, 2)))
            )

        grads_ref = jax.grad(loss_ref, (0, 1, 2, 3))(*parts_nhwc, k, bias)
        with pltpu.force_tpu_interpret_mode():
            grads_p = jax.grad(loss_pallas, (0, 1, 2, 3))(
                *parts_nhwc, k, bias
            )
        for gp, gr, name in zip(grads_p, grads_ref, "p0 p1 k bias".split()):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gr), rtol=2e-4, atol=1e-3,
                err_msg=name,
            )

    def test_no_bias(self):
        from jax.experimental.pallas import tpu as pltpu

        from nconv_tpu.ops import conv2d
        from nconv_tpu.ops.pallas_conv import conv2d_pallas_bhcw_cat

        parts_nhwc = [self._rand(1, 8, 16, 8), self._rand(1, 8, 16, 4)]
        k = self._rand(3, 3, 12, 8)
        ref = conv2d(jnp.concatenate(parts_nhwc, -1), k, padding=1)
        with pltpu.force_tpu_interpret_mode():
            got = conv2d_pallas_bhcw_cat(
                [jnp.transpose(p, (0, 1, 3, 2)) for p in parts_nhwc], k,
                padding=1,
            )
        np.testing.assert_allclose(
            np.asarray(jnp.transpose(got, (0, 1, 3, 2))), np.asarray(ref),
            atol=1e-4,
        )
