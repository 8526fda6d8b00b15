"""ctypes bindings for the native data path (native/depthio.cpp).

The shared library is built on demand with g++ (cached next to the source);
every loader degrades gracefully to the PIL implementations in
:mod:`nconv_tpu.data.io` when the toolchain or libpng is unavailable.
ctypes foreign calls release the GIL, so these decoders parallelize across
the Loader's thread pool.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdepthio.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "depthio.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.isfile(_SO_PATH)
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        src = os.path.join(_NATIVE_DIR, "depthio.cpp")
        stale = os.path.isfile(_SO_PATH) and os.path.isfile(src) and (
            os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
        )
        if (not os.path.isfile(_SO_PATH) or stale) and not _build():
            # a stale .so may predate the current ctypes signatures (e.g. the
            # 3-arg encode_depth_wire ABI would silently drop `scale`), so a
            # failed rebuild means the numpy fallbacks, never the old binary
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        c = ctypes.c_char_p
        i = ctypes.c_int
        f = ctypes.c_float
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        lib.depthio_png_info.argtypes = [c] + [ctypes.POINTER(i)] * 4
        lib.depthio_load_depth_f32.argtypes = [c, f, fp, i, i]
        lib.depthio_load_depth_u16.argtypes = [c, u16p, i, i]
        lib.depthio_load_rgb_f32.argtypes = [c, i, fp, i, i]
        lib.depthio_load_rgb_u8.argtypes = [c, i, u8p, i, i]
        lib.depthio_crop_top_center.argtypes = [fp, i, i, i, i, i, fp]
        lib.depthio_apply_mask.argtypes = [fp, fp, ctypes.c_long]
        lib.depthio_encode_depth_wire.argtypes = [
            fp, u16p, ctypes.c_long, ctypes.c_float,
        ]
        # single-open entries (info + pixels in one open; older .so builds
        # may lack them — loaders fall back to the two-call pattern)
        ip = ctypes.POINTER(i)
        lg = ctypes.c_long
        for name, args in (
            ("depthio_read_depth_f32", [c, f, fp, lg, ip, ip]),
            ("depthio_read_depth_u16", [c, u16p, lg, ip, ip]),
            ("depthio_read_rgb_u8", [c, i, u8p, lg, ip, ip]),
            ("depthio_read_rgb_f32", [c, i, fp, lg, ip, ip]),
        ):
            if hasattr(lib, name):
                getattr(lib, name).argtypes = args
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        if hasattr(lib, "depthio_encode_depth_coo"):
            lib.depthio_encode_depth_coo.argtypes = [fp, lg, lg, f, i32p, u16p]
            lib.depthio_encode_depth_coo.restype = lg
        for nm in ("depthio_encode_yuv420", "depthio_encode_yuv422"):
            if hasattr(lib, nm):
                getattr(lib, nm).argtypes = [u8p, i, i, u8p, u8p, u8p]
        _lib = lib
        return _lib


# Per-thread reusable decode buffers (one open per file, one allocation per
# thread; sized for KITTI raw 376x1242 with headroom, grown on demand).
_tls = threading.local()
_DEFAULT_CAP = 1536 * 2560


def _tls_buf(kind: str, dtype, min_cap: int = 0):
    cap = max(_DEFAULT_CAP * (3 if "rgb" in kind else 1), min_cap)
    buf = getattr(_tls, kind, None)
    if buf is None or buf.size < cap:
        buf = np.empty(cap, dtype)
        setattr(_tls, kind, buf)
    return buf


def _read_single_open(fn_name: str, kind: str, dtype, path: str, *lead_args):
    """Call a single-open C decoder with the thread-local buffer, growing it
    once on a -20 (too small) return. Returns an (h, w[, c]) copy."""
    import ctypes as ct

    lib = _load()
    fn = getattr(lib, fn_name)
    h = ct.c_int()
    w = ct.c_int()
    buf = _tls_buf(kind, dtype)
    rc = fn(path.encode(), *lead_args, buf, buf.size, h, w)
    if rc == -20:
        ch = 3 if "rgb" in kind else 1
        buf = _tls_buf(kind, dtype, min_cap=h.value * w.value * ch)
        rc = fn(path.encode(), *lead_args, buf, buf.size, h, w)
    if rc:
        raise IOError(f"{fn_name}({path}) failed: {rc}")
    if "rgb" in kind:
        return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


def available() -> bool:
    return _load() is not None


def png_info(path: str) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, channels)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native depthio unavailable")
    w = ctypes.c_int()
    h = ctypes.c_int()
    bd = ctypes.c_int()
    ch = ctypes.c_int()
    rc = lib.depthio_png_info(path.encode(), w, h, bd, ch)
    if rc:
        raise IOError(f"depthio_png_info({path}) failed: {rc}")
    return w.value, h.value, bd.value, ch.value


def load_depth_png16(path: str, scale: float = 256.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        from . import io

        return io.load_depth_png16(path)
    import ctypes as ct

    if hasattr(lib, "depthio_read_depth_f32"):
        return _read_single_open(
            "depthio_read_depth_f32", "depth_f32", np.float32, path,
            ct.c_float(scale),
        )
    w, h, _, _ = png_info(path)
    out = np.empty((h, w), np.float32)
    rc = lib.depthio_load_depth_f32(path.encode(), scale, out, h, w)
    if rc:
        raise IOError(f"depthio_load_depth_f32({path}) failed: {rc}")
    return out


def load_depth_wire_u16(path: str) -> np.ndarray:
    """Bit-exact uint16 fixed-point depth (the streaming wire format)."""
    lib = _load()
    if lib is None:
        from . import io

        return np.clip(io.load_depth_png16(path) * 256.0, 0, 65535).astype(np.uint16)
    if hasattr(lib, "depthio_read_depth_u16"):
        return _read_single_open(
            "depthio_read_depth_u16", "depth_u16", np.uint16, path
        )
    w, h, _, _ = png_info(path)
    out = np.empty((h, w), np.uint16)
    rc = lib.depthio_load_depth_u16(path.encode(), out, h, w)
    if rc:
        raise IOError(f"depthio_load_depth_u16({path}) failed: {rc}")
    return out


def load_rgb(path: str, *, bgr: bool = True) -> np.ndarray:
    lib = _load()
    if lib is None:
        from . import io

        return io.load_rgb(path, bgr=bgr)
    import ctypes as ct

    if hasattr(lib, "depthio_read_rgb_f32"):
        return _read_single_open(
            "depthio_read_rgb_f32", "rgb_f32", np.float32, path, ct.c_int(int(bgr))
        )
    w, h, _, _ = png_info(path)
    out = np.empty((h, w, 3), np.float32)
    rc = lib.depthio_load_rgb_f32(path.encode(), int(bgr), out, h, w)
    if rc:
        raise IOError(f"depthio_load_rgb_f32({path}) failed: {rc}")
    return out


def load_rgb_wire_u8(path: str, *, bgr: bool = True) -> np.ndarray:
    lib = _load()
    if lib is None:
        return load_rgb(path, bgr=bgr).astype(np.uint8)
    import ctypes as ct

    if hasattr(lib, "depthio_read_rgb_u8"):
        return _read_single_open(
            "depthio_read_rgb_u8", "rgb_u8", np.uint8, path, ct.c_int(int(bgr))
        )
    w, h, _, _ = png_info(path)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.depthio_load_rgb_u8(path.encode(), int(bgr), out, h, w)
    if rc:
        raise IOError(f"depthio_load_rgb_u8({path}) failed: {rc}")
    return out


def crop_top_center(arr: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(arr, np.float32)
    h, w = a.shape[:2]
    c = 1 if a.ndim == 2 else a.shape[2]
    if lib is None:
        tp, lp = h - oh, (w - ow) // 2
        return a[tp : tp + oh, lp : lp + ow].copy()
    out = np.empty((oh, ow, c) if a.ndim == 3 else (oh, ow), np.float32)
    lib.depthio_crop_top_center(a.reshape(h, w, c), h, w, c, oh, ow, out.reshape(oh, ow, c))
    return out


def apply_mask(depth: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Returns a fresh array; never mutates the caller's ``depth``.

    (The native kernel works in place, so the input is always copied —
    ``ascontiguousarray`` would alias an already-contiguous float32 input
    and silently corrupt caller-held arrays.)"""
    lib = _load()
    d = np.array(depth, np.float32, copy=True, order="C")
    m = np.ascontiguousarray(mask, np.float32)
    if lib is None:
        return d * m
    lib.depthio_apply_mask(d, m, d.size)
    return d


def encode_depth_wire(depth: np.ndarray, scale: float = 256.0) -> np.ndarray:
    lib = _load()
    d = np.ascontiguousarray(depth, np.float32)
    if lib is None:
        return np.clip(d * scale, 0, 65535).astype(np.uint16)
    out = np.empty(d.shape, np.uint16)
    lib.depthio_encode_depth_wire(d, out, d.size, scale)
    return out


def encode_depth_coo(
    depth: np.ndarray,
    capacity: int,
    scale: float = 256.0,
    out: tuple[np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Single-pass COO encode of a sparse depth map for the streaming wire.

    Returns ``(idx, val, n_nonzero)`` where ``idx`` is ``(1, capacity)``
    int32 flat indices and ``val`` ``(1, capacity)`` uint16 fixed-point
    values (``d * scale`` clipped), padding entries zeroed. ``n_nonzero``
    is the TOTAL nonzero count — larger than ``capacity`` means points were
    dropped. Pass ``out=(idx, val)`` to reuse buffers across frames.
    """
    lib = _load()
    d = np.ascontiguousarray(depth, np.float32)
    if out is not None:
        idx, val = out
    else:
        idx = np.empty((1, capacity), np.int32)
        val = np.empty((1, capacity), np.uint16)
    if lib is not None and hasattr(lib, "depthio_encode_depth_coo"):
        n = lib.depthio_encode_depth_coo(
            d.ravel(), d.size, capacity, scale, idx.reshape(-1), val.reshape(-1)
        )
        return idx, val, int(n)
    flat = d.ravel()
    nz = np.flatnonzero(flat)
    n = int(nz.size)
    keep = nz[:capacity]
    idx[0, : keep.size] = keep
    idx[0, keep.size:] = 0
    # same truncation as the C encoder: clip in float, then narrow to u16
    # (np.clip with a u16 `out` raises UFuncTypeError on f32 input)
    val[0, : keep.size] = np.clip(flat[keep] * scale, 0, 65535).astype(np.uint16)
    val[0, keep.size:] = 0
    return idx, val, n


def encode_yuv420(
    rgb: np.ndarray, out: tuple[np.ndarray, ...] | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HWC uint8 RGB -> planar YUV420 (BT.601 full range, 2x2-mean chroma).

    Returns ``(y, u, v)`` with ``y`` of shape (h, w) and ``u``/``v`` of
    shape (h/2, w/2), all uint8. h and w must be even. Pass ``out`` to
    reuse buffers.
    """
    a = np.ascontiguousarray(rgb, np.uint8)
    h, w = a.shape[:2]
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    if out is not None:
        y, u, v = out
    else:
        y = np.empty((h, w), np.uint8)
        u = np.empty((h // 2, w // 2), np.uint8)
        v = np.empty((h // 2, w // 2), np.uint8)
    lib = _load()
    if lib is not None and hasattr(lib, "depthio_encode_yuv420"):
        lib.depthio_encode_yuv420(a, h, w, y, u, v)
        return y, u, v
    f = a.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    # luma goes into its own buffer: r/g/b are views of f, so writing the
    # luma back into f[..., 0] would corrupt r before the chroma means read it
    y[:] = np.clip(0.299 * r + 0.587 * g + 0.114 * b + 0.5, 0, 255).astype(
        np.uint8
    )
    # 2x2 block means, then one chroma conversion per block
    rm = r.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    gm = g.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    bm = b.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    u[:] = np.clip(
        -0.168736 * rm - 0.331264 * gm + 0.5 * bm + 128.5, 0, 255
    ).astype(np.uint8)
    v[:] = np.clip(
        0.5 * rm - 0.418688 * gm - 0.081312 * bm + 128.5, 0, 255
    ).astype(np.uint8)
    return y, u, v


def encode_yuv422(
    rgb: np.ndarray, out: tuple[np.ndarray, ...] | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HWC uint8 RGB -> planar YUV422 (BT.601 full range, CO-SITED chroma:
    sampled at even pixels — the decoder reconstructs those exactly and
    midpoint-interpolates odd ones). Returns ``(y, u, v)`` with ``y``
    (h, w) and ``u``/``v`` (h, w/2), all uint8. w must be even."""
    a = np.ascontiguousarray(rgb, np.uint8)
    h, w = a.shape[:2]
    assert w % 2 == 0, (h, w)
    if out is not None:
        y, u, v = out
    else:
        y = np.empty((h, w), np.uint8)
        u = np.empty((h, w // 2), np.uint8)
        v = np.empty((h, w // 2), np.uint8)
    lib = _load()
    if lib is not None and hasattr(lib, "depthio_encode_yuv422"):
        lib.depthio_encode_yuv422(a, h, w, y, u, v)
        return y, u, v
    f = a.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y[:] = np.clip(0.299 * r + 0.587 * g + 0.114 * b + 0.5, 0, 255).astype(
        np.uint8
    )
    rm, gm, bm = r[:, 0::2], g[:, 0::2], b[:, 0::2]
    u[:] = np.clip(
        -0.168736 * rm - 0.331264 * gm + 0.5 * bm + 128.5, 0, 255
    ).astype(np.uint8)
    v[:] = np.clip(
        0.5 * rm - 0.418688 * gm - 0.081312 * bm + 128.5, 0, 255
    ).astype(np.uint8)
    return y, u, v
