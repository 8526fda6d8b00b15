"""Data layer tests: IO roundtrips, crop/intrinsics parity with the
reference conventions, sparsifier semantics, edge-inpainting parity with a
cv2 reimplementation of the reference, loaders and prefetching."""
import os

import numpy as np
import pytest

from nconv_tpu.data import (
    KITTIDataset,
    Loader,
    NYUDataset,
    VOIDDataset,
    collate,
    crop_top_center,
    io,
    prefetch_to_device,
    sparsify,
)

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def test_depth_png16_roundtrip(tmp_path):
    d = (RNG.random((20, 30)) * 80).astype(np.float32)
    p = str(tmp_path / "d.png")
    io.save_depth_png16(p, d)
    back = io.load_depth_png16(p)
    np.testing.assert_allclose(back, d, atol=1 / 256.0 + 1e-6)


def test_load_rgb_is_bgr_float(tmp_path):
    from PIL import Image

    arr = np.zeros((4, 6, 3), np.uint8)
    arr[..., 0] = 200  # red channel in RGB
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)
    out = io.load_rgb(p)  # BGR: red lands in channel 2
    assert out.dtype == np.float32
    assert out[0, 0, 2] == 200 and out[0, 0, 0] == 0


def test_read_calib_file(tmp_path):
    p = str(tmp_path / "calib_cam_to_cam.txt")
    with open(p, "w") as f:
        f.write("calib_time: 09-Jan-2012 13:57:47\n")
        f.write("P_rect_02: " + " ".join(str(float(i)) for i in range(12)) + "\n")
    calib = io.read_calib_file(p)
    assert "calib_time" not in calib
    k = io.kitti_intrinsics(calib, "image_02")
    assert k.shape == (3, 3)
    np.testing.assert_allclose(k[0], [0, 1, 2])
    with pytest.raises(ValueError, match="Unknown camera"):
        io.kitti_intrinsics(calib, "image_05")


def test_crop_top_center_shifts_intrinsics():
    img = RNG.random((20, 30, 3)).astype(np.float32)
    k = np.array([[100.0, 0, 15], [0, 100, 10], [0, 0, 1]], np.float32)
    (out,), k2 = crop_top_center([img], k, 16, 24)
    assert out.shape == (16, 24, 3)
    # tp = 4, lp = 3
    np.testing.assert_allclose(out, img[4:20, 3:27])
    assert k2[0, 2] == 15 - 3 and k2[1, 2] == 10 - 4
    assert k[0, 2] == 15  # input not mutated


# ---------------------------------------------------------------------------
# sparsifiers
# ---------------------------------------------------------------------------

def test_apply_mask_pool_and_resize():
    d = np.ones((8, 12), np.float32)
    mask = np.zeros((4, 6), np.uint8)
    mask[:, :3] = 1
    out = sparsify.apply_mask_pool(d, [mask], np.random.default_rng(0))
    assert out.shape == d.shape
    assert out[:, :6].all() and not out[:, 6:].any()


def test_drop_random_points_count():
    d = np.ones((10, 10), np.float32)
    out = sparsify.drop_random_points(d, 37, np.random.default_rng(0))
    assert int((out == 0).sum()) == 37


def test_multiplicative_noise_fraction_and_range():
    d = np.full((100, 100), 4.0, np.float32)
    out = sparsify.add_multiplicative_noise(d, np.random.default_rng(0))
    changed = out != 4.0
    assert abs(changed.mean() - 0.1) < 0.02
    assert np.abs(out / 4.0 - 1.0).max() <= 0.1 + 1e-6


def test_edge_inpaint_matches_cv2_reference():
    """Parity with the reference's cv2-based dilation inpainting
    (voidloader.py:116-126)."""
    cv2 = pytest.importorskip("cv2")
    depth = (RNG.random((32, 40)) * 3).astype(np.float32)
    depth[10:20, 10:20] += 5  # a sharp structure -> edges

    edges = sparsify.sobel_edge_map(depth, 0.5)

    # reference implementation
    mask = (edges * 255).astype(np.uint8)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    ref = depth.copy()
    for _ in range(5):
        ref[mask == 255] = cv2.dilate(ref, kernel)[mask == 255]

    ours = sparsify.inpaint_with_nearest(depth, edges)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_edge_map_matches_reference_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    depth = (RNG.random((24, 32)) * 4).astype(np.float32)
    kx = torch.tensor([[[[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]]]])
    ky = torch.tensor([[[[-1.0, -2, -1], [0, 0, 0], [1, 2, 1]]]])
    t = torch.tensor(depth)[None, None]
    gx = F.conv2d(t, kx, padding=1)
    gy = F.conv2d(t, ky, padding=1)
    ref = ((gx**2 + gy**2).sqrt().squeeze() > 0.5).float().numpy()
    ours = sparsify.sobel_edge_map(depth, 0.5)
    np.testing.assert_array_equal(ours, ref)


# ---------------------------------------------------------------------------
# dataset fixtures on disk
# ---------------------------------------------------------------------------

@pytest.fixture
def nyu_root(tmp_path):
    from PIL import Image

    root = tmp_path / "nyu"
    for sub in ["train/gt", "train/depth", "train/img", "mask"]:
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(3):
        gt = (rng.random((480, 640)) * 8).astype(np.float32)
        np.save(root / "train/gt" / f"{i:04d}.npy", gt)
        np.save(root / "train/depth" / f"{i:04d}.npy", gt * 0.5)
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train/img" / f"{i:04d}.png")
    mask = (rng.random((480, 640)) < 0.2).astype(np.float32)
    np.save(root / "mask" / "m0.npy", mask)
    return str(root)


def test_nyu_dataset(nyu_root):
    ds = NYUDataset(nyu_root, "train", use_mask=True, add_noise=False)
    assert len(ds) == 3
    s = ds[0]
    assert s["rgb"].shape == (480, 640, 3)
    assert s["depth"].shape == (480, 640, 1)
    assert s["gt"].shape == (480, 640, 1)
    assert s["k"].shape == (3, 3)
    # sparse input = gt * mask -> strictly fewer valid points than gt
    assert (s["depth"] > 0).sum() < (s["gt"] > 0).sum()


def test_nyu_dataset_drop_points_branch(nyu_root):
    ds = NYUDataset(nyu_root, "train", use_mask=False)
    s = ds[0]
    assert (s["depth"] == 0).sum() > 0


@pytest.fixture
def kitti_root(tmp_path):
    from PIL import Image

    root = tmp_path / "kitti"
    drive = "2011_09_26_drive_0001_sync"
    day = "2011_09_26"
    gt_dir = root / "data_depth_annotated/train" / drive / "proj_depth/groundtruth" / "image_02"
    li_dir = root / "data_depth_velodyne/train" / drive / "proj_depth/velodyne_raw" / "image_02"
    rgb_dir = root / "raw" / day / drive / "image_02" / "data"
    for d in [gt_dir, li_dir, rgb_dir]:
        d.mkdir(parents=True)
    rng = np.random.default_rng(2)
    for i in range(2):
        name = f"{i:010d}.png"
        depth = (rng.random((375, 1242)) * 60).astype(np.float32)
        io.save_depth_png16(str(gt_dir / name), depth)
        io.save_depth_png16(str(li_dir / name), depth * (rng.random((375, 1242)) < 0.07))
        img = (rng.random((375, 1242, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(rgb_dir / name)
    with open(root / "raw" / day / "calib_cam_to_cam.txt", "w") as f:
        p = [721.5, 0.0, 609.6, 44.9, 0.0, 721.5, 172.9, 0.2, 0.0, 0.0, 1.0, 0.003]
        f.write("P_rect_02: " + " ".join(map(str, p)) + "\n")
        f.write("P_rect_03: " + " ".join(map(str, p)) + "\n")
    return str(root)


def test_kitti_dataset(kitti_root):
    ds = KITTIDataset(kitti_root, "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (256, 1216, 3)
    assert s["depth"].shape == (256, 1216, 1)
    assert s["gt"].shape == (256, 1216, 1)
    # principal point shifted by the crop: tp = 375-256 = 119, lp = 13
    assert abs(s["k"][1, 2] - (172.9 - 119)) < 1e-4
    assert abs(s["k"][0, 2] - (609.6 - 13)) < 1e-4


@pytest.fixture
def void_root(tmp_path):
    from PIL import Image

    root = tmp_path / "void"
    base = root / "void_1500"
    data = base / "data" / "seq0"
    for sub in ["image", "sparse_depth", "ground_truth", "absolute_pose", "intrinsics"]:
        (data / sub).mkdir(parents=True)
    (base / "mask").mkdir(parents=True)
    rng = np.random.default_rng(3)
    manifests = {k: [] for k in ["image", "sparse_depth", "ground_truth", "absolute_pose", "intrinsics"]}
    for i in range(2):
        name = f"{i:04d}"
        img = (rng.random((480, 640, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(data / "image" / f"{name}.png")
        gt = (rng.random((480, 640)) * 5).astype(np.float32)
        io.save_depth_png16(str(data / "ground_truth" / f"{name}.png"), gt)
        io.save_depth_png16(
            str(data / "sparse_depth" / f"{name}.png"), gt * (rng.random((480, 640)) < 0.01)
        )
        np.savetxt(data / "absolute_pose" / f"{name}.txt", rng.random((4, 4)))
        np.savetxt(data / "intrinsics" / f"{name}.txt", rng.random((3, 3)))
        for k in manifests:
            ext = "txt" if k in ("absolute_pose", "intrinsics") else "png"
            manifests[k].append(f"void_1500/data/seq0/{k}/{name}.{ext}")
    for k, lines in manifests.items():
        with open(base / f"train_{k}.txt", "w") as f:
            f.write("\n".join(lines))
    np.save(base / "mask" / "m0.npy", (rng.random((480, 640)) < 0.3).astype(np.float32))
    return str(root)


def test_void_dataset(void_root):
    ds = VOIDDataset(void_root, "train", use_mask=True, edge_inpainting=True)
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (480, 640, 3)
    assert s["depth"].shape == (480, 640, 1)
    assert s["gt"].shape == (480, 640, 1)
    assert s["pose"].shape == (4, 4)
    assert s["k"].shape == (3, 3)


def test_void_dataset_real_sparse_branch(void_root):
    ds = VOIDDataset(void_root, "train", use_mask=False, edge_inpainting=False)
    s = ds[0]
    assert (s["depth"] > 0).mean() < 0.05  # real sparse files are ~1% dense


# ---------------------------------------------------------------------------
# loader + prefetch
# ---------------------------------------------------------------------------

class ToyDS:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((2, 2), float(i), np.float32)}


def test_loader_batching_and_shuffle():
    dl = Loader(ToyDS(), 4, shuffle=True, seed=0)
    assert len(dl) == 3
    b1 = [b["x"][:, 0, 0].tolist() for b in dl]
    b2 = [b["x"][:, 0, 0].tolist() for b in dl]  # next pass reshuffles
    assert sorted(sum(b1, [])) == sorted(sum(b2, [])) == list(map(float, range(10)))
    assert b1 != b2
    assert [len(x) for x in b1] == [4, 4, 2]


def test_loader_drop_last_and_workers():
    dl = Loader(ToyDS(), 4, drop_last=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    np.testing.assert_allclose(batches[0]["x"][:, 0, 0], [0, 1, 2, 3])


def test_collate_intersects_keys():
    out = collate([{"a": np.ones(2), "b": np.ones(2)}, {"a": np.zeros(2)}])
    assert set(out) == {"a"}
    assert out["a"].shape == (2, 2)


def test_prefetch_to_device_order_and_errors():
    items = [{"x": np.full(1, i)} for i in range(5)]
    got = list(prefetch_to_device(iter(items), lambda b: b["x"][0]))
    assert got == [0, 1, 2, 3, 4]

    def bad_iter():
        yield {"x": np.zeros(1)}
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad_iter(), lambda b: b))


def test_nyu_test_dataset(tmp_path):
    from PIL import Image

    from nconv_tpu.data import NYUTestDataset

    root = tmp_path / "nyu"
    for sub in ["test/depth", "test/img"]:
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(5)
    for i in range(2):
        np.save(root / "test/depth" / f"{i}.npy", rng.random((480, 640)).astype(np.float32))
        Image.fromarray((rng.random((480, 640, 3)) * 255).astype(np.uint8)).save(
            root / "test/img" / f"{i}.png"
        )
    ds = NYUTestDataset(str(root))
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (480, 640, 3)
    assert s["depth"].shape == (480, 640, 1)
    assert "gt" not in s


@pytest.fixture
def kitti_eval_root(tmp_path):
    """Synthetic val_selection_cropped + test_depth_completion_anonymous
    trees (the KITTI benchmark-submission layouts, kittiloader.py:97-211)."""
    from PIL import Image

    root = tmp_path / "kitti_eval"
    rng = np.random.default_rng(5)
    k_txt = "721.5 0.0 609.6 0.0 721.5 172.9 0.0 0.0 1.0"

    sel = root / "val_selection_cropped"
    for sub in ("groundtruth_depth", "velodyne_raw", "image", "intrinsics"):
        (sel / sub).mkdir(parents=True)
    for i in range(2):
        name = f"2011_09_26_drive_0002_sync_image_{i:010d}_image_02"
        depth = (rng.random((352, 1216)) * 60).astype(np.float32)
        io.save_depth_png16(str(sel / "groundtruth_depth" / f"{name}.png"), depth)
        io.save_depth_png16(
            str(sel / "velodyne_raw" / f"{name}.png"),
            depth * (rng.random((352, 1216)) < 0.07),
        )
        img = (rng.random((352, 1216, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(sel / "image" / f"{name}.png")
        (sel / "intrinsics" / f"{name}.txt").write_text(k_txt)

    test = root / "test_depth_completion_anonymous"
    for sub in ("velodyne_raw", "image", "intrinsics"):
        (test / sub).mkdir(parents=True)
    for i in range(2):
        name = f"{i:010d}"
        depth = (rng.random((352, 1216)) * 60).astype(np.float32)
        io.save_depth_png16(
            str(test / "velodyne_raw" / f"{name}.png"),
            depth * (rng.random((352, 1216)) < 0.07),
        )
        img = (rng.random((352, 1216, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(test / "image" / f"{name}.png")
        (test / "intrinsics" / f"{name}.txt").write_text(k_txt)
    return str(root)


def test_kitti_selval_dataset(kitti_eval_root):
    from nconv_tpu.data import KITTISelValDataset

    ds = KITTISelValDataset(kitti_eval_root)
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (256, 1216, 3)
    assert s["depth"].shape == (256, 1216, 1)
    assert s["gt"].shape == (256, 1216, 1)
    # bottom-crop 352->256 shifts cy by 96
    assert abs(s["k"][1, 2] - (172.9 - 96)) < 1e-4


def test_kitti_test_dataset_and_eval_cli(kitti_eval_root, tmp_path, capsys):
    from nconv_tpu.data import KITTITestDataset

    ds = KITTITestDataset(kitti_eval_root)
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (352, 1216, 3)
    assert s["depth"].shape == (352, 1216, 1)
    assert "gt" not in s

    # kitti_selval is reachable from the eval CLI (VERDICT round-1 item)
    import jax
    import json as _json

    from nconv_tpu.cli import main
    from nconv_tpu.models import NConvUNet
    from nconv_tpu.training import save_best

    v = NConvUNet().init(
        jax.random.key(0), np.zeros((1, 256, 1216, 1), np.float32)
    )
    ck = save_best(str(tmp_path), "s1", v)
    rc = main([
        "eval", "--checkpoint", ck, "--model", "unguided",
        "--dataset", "kitti_selval", "--root", kitti_eval_root,
        "--batch-size", "1", "--max-batches", "1",
    ])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "rmse" in out and np.isfinite(out["rmse"])


@pytest.mark.slow
def test_infer_cli_kitti_test_dataset(kitti_eval_root, tmp_path, capsys):
    """`infer --dataset kitti_test` densifies the gt-less submission split
    end-to-end (reference workflow: produce maps for the KITTI server from
    dataset/kittiloader.py:160-211's tree) and writes 16-bit PNGs."""
    import jax

    from nconv_tpu.cli import main
    from nconv_tpu.data import io as dio
    from nconv_tpu.models import GuidedDepthNet
    from nconv_tpu.training import save_best

    rgb = np.zeros((1, 352, 1216, 3), np.float32)
    d = np.zeros((1, 352, 1216, 1), np.float32)
    v = GuidedDepthNet().init(jax.random.key(0), rgb, d, rgb, d)
    ck = save_best(str(tmp_path), "s2", v)
    out_dir = tmp_path / "pred"
    rc = main([
        "infer", "--checkpoint", ck, "--dataset", "kitti_test",
        "--root", kitti_eval_root, "--limit", "1",
        "--out-dir", str(out_dir),
    ])
    assert rc == 0
    outs = sorted(out_dir.glob("*_depth.png"))
    assert len(outs) == 1
    dense = dio.load_depth_png16(str(outs[0]))
    assert dense.shape == (352, 1216) and np.isfinite(dense).all()
