"""CLI smoke tests on the synthetic dataset (tiny geometry, CPU)."""
import json
import os

import numpy as np
import pytest

from nconv_tpu.cli import build_parser, main


def test_parser_requires_subcommand():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


@pytest.mark.slow
def test_train_step1_synthetic_and_export(tmp_path, capsys):
    ckdir = str(tmp_path / "ck")
    rc = main(
        [
            "train-step1",
            "--dataset", "synthetic",
            "--epochs", "1",
            "--batch-size", "2",
            "--height", "48", "--width", "64",
            "--limit", "4",
            "--checkpoint-dir", ckdir,
            "--name", "s1",
            "--num-workers", "0",
        ]
    )
    assert rc == 0
    assert os.path.isdir(os.path.join(ckdir, "s1"))

    # step-2 warm-started from the step-1 checkpoint
    rc = main(
        [
            "train-step2",
            "--dataset", "synthetic",
            "--epochs", "1",
            "--batch-size", "1",
            "--height", "48", "--width", "64",
            "--limit", "2",
            "--checkpoint-dir", ckdir,
            "--name", "s2",
            "--num-workers", "0",
            "--step1-checkpoint", os.path.join(ckdir, "s1"),
        ]
    )
    assert rc == 0

    out = str(tmp_path / "model.stablehlo")
    rc = main(
        [
            "export",
            "--checkpoint", os.path.join(ckdir, "s2"),
            "--out", out,
            "--height", "48", "--width", "64",
        ]
    )
    assert rc == 0
    assert os.path.getsize(out) > 1000

    # inference from the exported-checkpoint weights
    from nconv_tpu.runtime import load_exported

    fn = load_exported(out)
    rgb = np.zeros((1, 48, 64, 3), np.float32)
    d = np.zeros((1, 48, 64, 1), np.float32)
    out0, out1 = fn(rgb, d, rgb, d)
    assert np.asarray(out0).shape == (1, 48, 64, 1)

    # deployment-ONNX emission from the same trained checkpoint
    try:
        import torch  # noqa: F401
    except ImportError:
        return
    onnx_out = str(tmp_path / "model.onnx")
    rc = main(
        [
            "export",
            "--checkpoint", os.path.join(ckdir, "s2"),
            "--out", onnx_out,
            "--height", "48", "--width", "64",
            "--format", "onnx",
        ]
    )
    assert rc == 0
    from nconv_tpu.compat import read_onnx_summary

    s = read_onnx_summary(onnx_out)
    assert s["opset"] == 17
    assert s["inputs"] == ["rgb_0", "depth_0", "rgb_1", "depth_1"]
    assert s["outputs"] == ["output_depth_0", "output_depth_1"]


def test_bench_command_smoke(capsys):
    rc = main(
        ["bench", "--height", "48", "--width", "64", "--frames", "3"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["device"]["fps"] > 0


def test_eval_command(tmp_path, capsys):
    ckdir = str(tmp_path / "ck")
    rc = main(
        [
            "train-step1",
            "--dataset", "synthetic", "--epochs", "1", "--batch-size", "2",
            "--height", "48", "--width", "64", "--limit", "4",
            "--checkpoint-dir", ckdir, "--name", "s1", "--num-workers", "0",
        ]
    )
    assert rc == 0
    capsys.readouterr()
    rc = main(
        [
            "eval",
            "--dataset", "synthetic", "--height", "48", "--width", "64",
            "--limit", "2", "--checkpoint", os.path.join(ckdir, "s1"),
            "--model", "unguided", "--num-workers", "0", "--batch-size", "1",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(stats) >= {"rmse", "mae", "irmse", "imae", "delta1"}
    assert stats["rmse"] > 0


def test_infer_command(tmp_path, capsys):
    from PIL import Image

    from nconv_tpu.data import io as dio

    ckdir = str(tmp_path / "ck")
    rc = main(
        [
            "train-step2",
            "--dataset", "synthetic", "--epochs", "1", "--batch-size", "1",
            "--height", "96", "--width", "128", "--limit", "2",
            "--checkpoint-dir", ckdir, "--name", "g", "--num-workers", "0",
        ]
    )
    assert rc == 0
    rng = np.random.default_rng(0)
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(2):
        Image.fromarray((rng.random((96, 128, 3)) * 255).astype(np.uint8)).save(
            frames / f"{i}_rgb.png"
        )
        dio.save_depth_png16(
            str(frames / f"{i}_depth.png"),
            (rng.random((96, 128)) * 5 * (rng.random((96, 128)) < 0.1)).astype(
                np.float32
            ),
        )
    outdir = tmp_path / "out"
    rc = main(
        [
            "infer",
            "--checkpoint", os.path.join(ckdir, "g"),
            "--rgb-glob", str(frames / "*_rgb.png"),
            "--depth-glob", str(frames / "*_depth.png"),
            "--out-dir", str(outdir),
            "--height", "96", "--width", "128",
        ]
    )
    assert rc == 0
    outs = sorted(os.listdir(outdir))
    assert any(f.endswith("_depth.png") for f in outs)
    assert any(f.endswith("_vis.png") for f in outs)
    dense = dio.load_depth_png16(str(outdir / "0_rgb_depth.png"))
    assert dense.shape == (96, 128) and np.isfinite(dense).all()


@pytest.mark.slow
def test_bench_train_mode(capsys):
    from nconv_tpu.cli import main

    rc = main([
        "bench", "--train", "--height", "48", "--width", "64",
        "--backend", "xla",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["unguided_train_ms_per_batch"] > 0
    assert out["guided_train_ms_per_batch"] > 0


def test_convert_reverse_roundtrip(tmp_path):
    """convert --reverse writes a reference-format .pth.tar that the forward
    converter maps back to the original variables."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from nconv_tpu.compat import convert_guided_state_dict, load_pth_tar
    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.training import save_best

    rgb = jnp.zeros((1, 48, 64, 3), jnp.float32)
    d = jnp.zeros((1, 48, 64, 1), jnp.float32)
    variables = GuidedDepthNet().init(jax.random.key(0), rgb, d, rgb, d)
    ck = save_best(str(tmp_path), "g", variables)

    pth = str(tmp_path / "ours.pth.tar")
    rc = main(["convert", "--reverse", "--checkpoint", ck, "--pth", pth])
    assert rc == 0

    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"epoch", "state_dict", "stats"}
    assert all(k.startswith("module.") for k in ckpt["state_dict"])

    # forward conversion in softplus_inverse mode undoes the reverse export
    back = convert_guided_state_dict(
        load_pth_tar(pth), kernel_mode="softplus_inverse"
    )
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat_b[path], np.float32),
            atol=1e-6, err_msg=str(path),
        )
