"""Depth-map visualization dumps (the reference's eyeball-regression tool:
min-max normalize -> INFERNO colormap -> PNG, `/root/reference/utils.py:12-16`).

Uses matplotlib's inferno LUT + PIL instead of cv2 so the core package works
without OpenCV.
"""
from __future__ import annotations

import numpy as np


def depth_to_inferno(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8 inferno-colormapped image."""
    depth = np.asarray(depth, np.float32)
    lo, hi = float(depth.min()), float(depth.max())
    norm = (depth - lo) / (hi - lo) if hi > lo else np.zeros_like(depth)
    idx = (norm * 255).astype(np.uint8)
    from matplotlib import colormaps

    lut = (colormaps["inferno"](np.arange(256) / 255.0)[:, :3] * 255).astype(np.uint8)
    return lut[idx]


def save_depth(depth: np.ndarray, path: str) -> None:
    """Write a colormapped depth image (squeezes NHWC/CHW singleton axes)."""
    depth = np.asarray(depth)
    depth = depth.reshape([s for s in depth.shape if s != 1] or [1, 1])
    from PIL import Image

    Image.fromarray(depth_to_inferno(depth)).save(path)
