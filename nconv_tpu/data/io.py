"""File IO for depth-completion datasets.

Conventions reproduced from the reference data layer:
  * 16-bit PNG depth with /256 scaling (KITTI + VOID,
    `/root/reference/dataset/kittiloader.py:68`,
    `/root/reference/dataset/data_utils.py` — the latter vendored from Wong
    et al.'s VOID tooling);
  * RGB loaded as float32 in **BGR** channel order, range 0..255, because
    the reference feeds raw ``cv2.imread`` output to the network
    (`nyuloader.py:69`) and trained weights expect that;
  * ``.npy`` depth arrays (NYU);
  * KITTI ``calib_cam_to_cam.txt`` parsing;
  * VOID path-list manifests.
"""
from __future__ import annotations

import os

import numpy as np


def load_rgb(path: str, *, bgr: bool = True) -> np.ndarray:
    """(H, W, 3) float32, 0..255. BGR by default (reference parity)."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32)
    if bgr:
        arr = arr[:, :, ::-1]
    return np.ascontiguousarray(arr)


def load_depth_png16(path: str) -> np.ndarray:
    """(H, W) float32 depth from a 16-bit PNG, /256 scaling."""
    from PIL import Image

    arr = np.asarray(Image.open(path), np.float32)
    return arr / 256.0


def save_depth_png16(path: str, depth: np.ndarray) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(depth, np.float64) * 256.0, 0, 65535).astype(np.uint16)
    Image.fromarray(arr).save(path)


def load_validity_map_png16(path: str) -> np.ndarray:
    """VOID validity maps: 16-bit PNG, values {0, 256} -> {0, 1}
    (data_utils.py convention)."""
    from PIL import Image

    arr = np.asarray(Image.open(path), np.float32)
    return (arr > 0).astype(np.float32)


def load_npy_depth(path: str, shape: tuple[int, int] | None = None) -> np.ndarray:
    d = np.load(path).astype(np.float32)
    if shape is not None:
        d = d.reshape(shape)
    return d


def read_paths(data_dir: str, manifest_path: str) -> list[str]:
    """VOID-style manifest: one relative path per line
    (`data_utils.py:read_paths` behaviour)."""
    out = []
    with open(manifest_path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(os.path.join(data_dir, line))
    return out


def read_calib_file(path: str) -> dict[str, np.ndarray]:
    """KITTI calibration parser (`kittiloader.py:9-23`): 'key: floats' lines,
    non-numeric values skipped."""
    data: dict[str, np.ndarray] = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    return data


def kitti_intrinsics(calib: dict[str, np.ndarray], camera: str) -> np.ndarray:
    """K (3x3) for image_02 / image_03 from P_rect_0{2,3}
    (`kittiloader.py:79-94`)."""
    key = {"image_02": "P_rect_02", "image_03": "P_rect_03"}.get(camera)
    if key is None:
        raise ValueError(f"Unknown camera {camera!r}")
    return np.reshape(calib[key], (3, 4))[0:3, 0:3].astype(np.float32)
