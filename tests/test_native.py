"""Native C++ data path (native/depthio.cpp via ctypes): parity with the
PIL-based loaders and the sparsifier/wire-format kernels."""
import numpy as np
import pytest

from nconv_tpu.data import io, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native depthio not built (no toolchain?)"
)

RNG = np.random.default_rng(0)


@pytest.fixture
def depth_png(tmp_path):
    d = (RNG.random((375, 1242)) * 80).astype(np.float32)
    p = str(tmp_path / "d.png")
    io.save_depth_png16(p, d)
    return p, d


@pytest.fixture
def rgb_png(tmp_path):
    from PIL import Image

    arr = (RNG.random((240, 320, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(arr).save(p)
    return p, arr


def test_png_info(depth_png):
    p, d = depth_png
    w, h, bd, ch = native.png_info(p)
    assert (w, h, bd, ch) == (1242, 375, 16, 1)


def test_load_depth_matches_pil(depth_png):
    p, _ = depth_png
    np.testing.assert_array_equal(native.load_depth_png16(p), io.load_depth_png16(p))


def test_load_depth_wire_is_bit_exact(depth_png):
    p, _ = depth_png
    wire = native.load_depth_wire_u16(p)
    assert wire.dtype == np.uint16
    np.testing.assert_array_equal(
        wire.astype(np.float32) / 256.0, io.load_depth_png16(p)
    )


@pytest.mark.parametrize("bgr", [True, False])
def test_load_rgb_matches_pil(rgb_png, bgr):
    p, _ = rgb_png
    np.testing.assert_array_equal(
        native.load_rgb(p, bgr=bgr), io.load_rgb(p, bgr=bgr)
    )


def test_load_rgb_wire_u8(rgb_png):
    p, arr = rgb_png
    wire = native.load_rgb_wire_u8(p, bgr=False)
    assert wire.dtype == np.uint8
    np.testing.assert_array_equal(wire, arr)


def test_crop_top_center_matches_python():
    x = RNG.random((375, 1242, 3)).astype(np.float32)
    out = native.crop_top_center(x, 256, 1216)
    tp, lp = 375 - 256, (1242 - 1216) // 2
    np.testing.assert_array_equal(out, x[tp : tp + 256, lp : lp + 1216])


def test_apply_mask_and_wire_encode():
    d = (RNG.random((100, 100)) * 80).astype(np.float32)
    m = (RNG.random((100, 100)) < 0.1).astype(np.float32)
    out = native.apply_mask(d.copy(), m)
    np.testing.assert_array_equal(out, d * m)
    wire = native.encode_depth_wire(out)
    np.testing.assert_array_equal(
        wire, np.clip(out * 256.0, 0, 65535).astype(np.uint16)
    )


def test_missing_file_raises():
    with pytest.raises(IOError):
        native.png_info("/nonexistent/file.png")


def test_apply_mask_does_not_mutate_input():
    """apply_mask must return a fresh array even when the input is already
    float32 C-contiguous (the native kernel works in place on a copy)."""
    d = np.arange(12, dtype=np.float32).reshape(3, 4)
    d_orig = d.copy()
    m = np.zeros((3, 4), np.float32)
    out = native.apply_mask(d, m)
    np.testing.assert_array_equal(d, d_orig)
    np.testing.assert_array_equal(out, np.zeros_like(d))
    assert out is not d


def test_single_open_entries_present_and_match(depth_png, rgb_png):
    if not native.available():
        pytest.skip("native lib unavailable")
    dpath, _ = depth_png
    rpath, rarr = rgb_png
    lib = native._load()
    assert hasattr(lib, "depthio_read_depth_f32"), "rebuild native/libdepthio.so"
    d = native.load_depth_png16(dpath)
    r = native.load_rgb_wire_u8(rpath, bgr=False)
    assert d.ndim == 2 and r.shape[2] == 3
    np.testing.assert_allclose(d, io.load_depth_png16(dpath), atol=1e-6)
    np.testing.assert_array_equal(r, rarr)


def test_loader_thread_throughput(tmp_path):
    """Single-open decode must not collapse under threads (the old
    png_info+load double-open measured 4 threads = 0.5x on one core). On
    multi-core machines, require real scaling."""
    if not native.available():
        pytest.skip("native lib unavailable")
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        arr = (rng.random((352, 640)) * 20000).astype(np.uint16)
        p = str(tmp_path / f"d{i}.png")
        Image.fromarray(arr, mode="I;16").save(p)
        paths.append(p)

    def sweep(pool_size, n=48):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(pool_size) as ex:
            list(ex.map(native.load_depth_png16, (paths[i % 8] for i in range(n))))
        return n / (time.perf_counter() - t0)

    sweep(1, 8)  # warm page cache
    r1 = sweep(1)
    r4 = sweep(4)
    # never catastrophically worse under threads
    assert r4 > 0.6 * r1, (r1, r4)
    if (os.cpu_count() or 1) >= 4:
        assert r4 > 1.8 * r1, (r1, r4)
