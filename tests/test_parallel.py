"""Multi-chip data parallelism on the 8-device virtual CPU mesh: sharded
batches, replicated params, gradient consistency vs single-device, and
sharded training steps (the reference's DataParallel equivalent, §2.7)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nconv_tpu import parallel
from nconv_tpu.models import NConvUNet
from nconv_tpu.training import OptimizerConfig, TrainConfig, Trainer, UnguidedTask

RNG = np.random.default_rng(0)
H, W = 48, 64


def synth_batch(b):
    truth = np.fromfunction(
        lambda n, i, j, c: 2 + np.sin(i / 10) + np.cos(j / 12), (b, H, W, 1)
    ).astype(np.float32)
    mask = (RNG.random((b, H, W, 1)) < 0.15).astype(np.float32)
    return {
        "rgb": RNG.random((b, H, W, 3)).astype(np.float32),
        "depth": truth * mask,
        "gt": truth,
    }


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    mesh = parallel.make_mesh()
    assert mesh.devices.shape == (8, 1)
    batch = synth_batch(16)
    sharded = parallel.shard_batch(batch, mesh)
    assert sharded["depth"].sharding.is_fully_replicated is False
    # each device holds 16/8 = 2 rows
    shard = sharded["depth"].addressable_shards[0]
    assert shard.data.shape == (2, H, W, 1)


def test_replicated_params():
    mesh = parallel.make_mesh()
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = parallel.replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_pad_batch_to():
    batch = {"x": np.ones((5, 3), np.float32)}
    padded, n = parallel.pad_batch_to(batch, 8)
    assert n == 5
    assert padded["x"].shape == (8, 3)
    assert (padded["x"][5:] == 0).all()


@pytest.mark.slow
def test_data_parallel_grads_match_single_device():
    """Loss + grads on an 8-way sharded batch must equal the single-device
    result (XLA inserts the psum; checkpoint stays replica-free)."""
    model = NConvUNet()
    batch = synth_batch(8)
    d, gt = jnp.asarray(batch["depth"]), jnp.asarray(batch["gt"])
    variables = model.init(jax.random.key(0), d)

    def loss_fn(params, d, gt):
        pred, _ = model.apply({"params": params}, d)
        return jnp.mean((jnp.where(gt == 0, 0.0, pred) - gt) ** 2)

    g_single = jax.grad(loss_fn)(variables["params"], d, gt)

    mesh = parallel.make_mesh()
    params_r = parallel.replicate(variables["params"], mesh)
    d_s = jax.device_put(d, parallel.batch_sharding(mesh))
    gt_s = jax.device_put(gt, parallel.batch_sharding(mesh))
    g_sharded = jax.jit(jax.grad(loss_fn))(params_r, d_s, gt_s)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_trainer_on_multi_device_mesh():
    """Full trainer epoch with batch=8 sharded over 8 devices."""
    mesh = parallel.make_mesh()
    cfg = TrainConfig(
        epochs=2,
        batch_size=8,
        optimizer=OptimizerConfig("adamw", 1e-2, 1e-7),
        log_every=0,
    )
    batches = [synth_batch(8) for _ in range(2)]
    trainer = Trainer(UnguidedTask(), cfg, mesh=mesh, log_fn=lambda m: None)
    result = trainer.fit(lambda: iter(batches), lambda: iter(batches[:1]), resume=False)
    assert np.isfinite(result.best_val_loss)
    assert result.history["train_loss"][-1] < result.history["train_loss"][0] * 1.5


def test_data_parallel_serving_matches_single_device():
    """DataParallelEngine: 8 two-stream rigs sharded over the 8-device mesh
    produce exactly the single-device outputs (weights replicated, batch
    parallel — the rack-scale serving mode)."""
    from nconv_tpu.models import GuidedDepthNet, fold_batchnorm_variables
    from nconv_tpu.parallel import DataParallelEngine, make_mesh

    rng = np.random.default_rng(0)
    h, w = 104, 128
    n = 8
    rgb0 = rng.random((n, h, w, 3)).astype(np.float32)
    rgb1 = rng.random((n, h, w, 3)).astype(np.float32)
    truth = np.fromfunction(
        lambda b, i, j, c: 2 + np.sin(i / 10) + np.cos(j / 12), (n, h, w, 1)
    ).astype(np.float32)
    d0 = (truth * (rng.random((n, h, w, 1)) < 0.15)).astype(np.float32)
    d1 = (truth * (rng.random((n, h, w, 1)) < 0.15)).astype(np.float32)

    model = GuidedDepthNet()
    v = model.init(jax.random.key(0), rgb0[:1], d0[:1], rgb0[:1], d0[:1])
    for _ in range(2):
        _, mut = model.apply(
            v, rgb0[:1], d0[:1], rgb0[:1], d0[:1], True, mutable=["batch_stats"]
        )
        v = {**v, "batch_stats": mut["batch_stats"]}

    mesh = make_mesh(n_data=8)
    engine = DataParallelEngine(v, height=h, width=w, mesh=mesh)
    out0, out1 = engine(rgb0, d0, rgb1, d1)

    # single-device reference, same folded graph, one rig at a time
    folded_model = GuidedDepthNet(fold_bn=True)
    fv = fold_batchnorm_variables(v)
    for i in range(n):
        r0, r1 = folded_model.apply(
            fv, rgb0[i : i + 1], d0[i : i + 1], rgb1[i : i + 1], d1[i : i + 1],
            method=GuidedDepthNet.export,
        )
        np.testing.assert_allclose(
            np.asarray(out0[i : i + 1]), np.asarray(r0), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out1[i : i + 1]), np.asarray(r1), atol=1e-5
        )


def test_data_parallel_serving_pads_ragged_batches():
    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.parallel import DataParallelEngine, make_mesh

    rng = np.random.default_rng(1)
    h, w = 104, 128
    rgb = rng.random((3, h, w, 3)).astype(np.float32)
    d = rng.random((3, h, w, 1)).astype(np.float32)
    v = GuidedDepthNet().init(jax.random.key(0), rgb[:1], d[:1], rgb[:1], d[:1])
    engine = DataParallelEngine(v, height=h, width=w, mesh=make_mesh(n_data=8))
    out0, out1 = engine(rgb, d, rgb, d)  # 3 rigs on an 8-wide mesh
    assert out0.shape == (3, h, w, 1) and out1.shape == (3, h, w, 1)


def test_spatial_partition_kitti_scale_matches_single_device():
    """H-sharded NConvUNet forward at KITTI test geometry (352x1216) on the
    8-device mesh == unsharded output (XLA SPMD inserts the conv halo
    exchanges)."""
    from nconv_tpu.models import NConvUNet
    from nconv_tpu.parallel import make_mesh, spatial_sharding

    rng = np.random.default_rng(2)
    h, w = 352, 1216
    truth = np.fromfunction(
        lambda b, i, j, c: 20 + 10 * np.sin(i / 40) + 10 * np.cos(j / 60),
        (1, h, w, 1),
    ).astype(np.float32)
    d = jnp.asarray(truth * (rng.random((1, h, w, 1)) < 0.06))

    model = NConvUNet()
    v = model.init(jax.random.key(0), d)
    ref, ref_c = jax.jit(model.apply)(v, d)

    mesh = make_mesh(n_data=1, n_model=8)
    d_sharded = jax.device_put(d, spatial_sharding(mesh))
    out, conf = jax.jit(model.apply)(v, d_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_c), atol=1e-5)


def test_spatial_partition_guided_kitti_scale_matches_single_device():
    """H-sharded GuidedDepthNet.export at KITTI test geometry (352x1216) on
    the 8-device mesh == unsharded output. The fusion pyramid (stride-2
    encoders, transpose-conv upsamplers, bilinear downscales, border mask)
    is where XLA SPMD halo logic actually gets exercised — the reference's
    deployed graph (`export_to_onnx.py:65-66`) at its production geometry."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.parallel import MODEL_AXIS, make_mesh

    rng = np.random.default_rng(3)
    h, w = 352, 1216
    truth = np.fromfunction(
        lambda b, i, j, c: 20 + 10 * np.sin(i / 40) + 10 * np.cos(j / 60),
        (1, h, w, 1),
    ).astype(np.float32)
    rgb = rng.random((1, h, w, 3)).astype(np.float32)
    d = (truth * (rng.random((1, h, w, 1)) < 0.05)).astype(np.float32)

    model = GuidedDepthNet()
    # params depend only on channel counts — init on a small geometry
    v = model.init(
        jax.random.key(0), rgb[:, :48, :64], d[:, :48, :64],
        rgb[:, :48, :64], d[:, :48, :64],
    )

    def export(v, r0, d0, r1, d1):
        return model.apply(v, r0, d0, r1, d1, method=GuidedDepthNet.export)

    ref0, ref1 = jax.jit(export)(v, rgb, d, rgb, d)

    mesh = make_mesh(n_data=1, n_model=8)
    h_spec = NamedSharding(mesh, P(None, MODEL_AXIS, None, None))
    args = [jax.device_put(a, h_spec) for a in (rgb, d, rgb, d)]
    out0, out1 = jax.jit(export)(v, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=1e-4)
