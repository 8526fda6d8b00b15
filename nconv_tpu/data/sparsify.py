"""Sparse-input synthesis and depth preprocessing (host-side numpy).

Rebuilds the reference's training-time depth degradation pipeline:
  * mask-pool sparsification with nearest resize of off-size masks
    (`/root/reference/dataset/nyuloader.py:83-124`);
  * random point-dropping matched to a mask's zero count (use_mask=False
    branch, `nyuloader.py:113-122`);
  * multiplicative +-10% noise on 10% of points (`nyuloader.py:96-107`);
  * VOID edge inpainting: Sobel magnitude > 0.5 -> 5 iterations of
    dilation-based nearest-neighbour fill (`voidloader.py:68-126`).

All functions are pure numpy (scipy.ndimage for morphology) and take an
explicit ``rng`` — no hidden global random state.
"""
from __future__ import annotations

import numpy as np

# cv2 MORPH_ELLIPSE (3,3): a 3x3 cross.
_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)

SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)


def resize_mask_nearest(mask: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize of a binary mask (PIL convention the
    reference uses, `nyuloader.py:89-94`)."""
    if mask.shape == shape:
        return mask
    from PIL import Image

    img = Image.fromarray(mask)
    img = img.resize((shape[1], shape[0]), Image.NEAREST)
    return np.array(img)


def apply_mask_pool(
    depth: np.ndarray, masks: list[np.ndarray] | np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Multiply by a random mask from the pool (resized if needed)."""
    if isinstance(masks, list):
        mask = masks[rng.integers(len(masks))]
    else:
        mask = masks
    mask = resize_mask_nearest(mask, depth.shape[-2:])
    return depth * mask.astype(depth.dtype)


def drop_random_points(
    depth: np.ndarray, n_zeros: int, rng: np.random.Generator
) -> np.ndarray:
    """Zero ``n_zeros`` random positions (the use_mask=False branch)."""
    flat = depth.reshape(-1).copy()
    n = min(n_zeros, flat.size)
    idx = rng.permutation(flat.size)[:n]
    flat[idx] = 0
    return flat.reshape(depth.shape)


def add_multiplicative_noise(
    depth: np.ndarray,
    rng: np.random.Generator,
    *,
    fraction: float = 0.1,
    amplitude: float = 0.1,
) -> np.ndarray:
    """x += x * U(-amp, amp) on a random ``fraction`` of points
    (`nyuloader.py:96-107`)."""
    flat = depth.reshape(-1).copy()
    n = int(flat.size * fraction)
    idx = rng.permutation(flat.size)[:n]
    noise = rng.uniform(-amplitude, amplitude, n).astype(flat.dtype)
    flat[idx] += flat[idx] * noise
    return flat.reshape(depth.shape)


def sobel_edge_map(depth: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """Binary edge map from Sobel gradient magnitude (zero-padded convs,
    matching the reference's F.conv2d(padding=1))."""
    from scipy.ndimage import convolve

    d = np.asarray(depth, np.float32)
    gx = convolve(d, SOBEL_X[::-1, ::-1], mode="constant")
    gy = convolve(d, SOBEL_Y[::-1, ::-1], mode="constant")
    mag = np.sqrt(gx * gx + gy * gy)
    return (mag > threshold).astype(np.float32)


def inpaint_with_nearest(
    depth: np.ndarray, mask: np.ndarray, iterations: int = 5
) -> np.ndarray:
    """Dilation-based nearest fill of masked pixels (`voidloader.py:116-126`):
    repeatedly replace masked pixels with the 3x3-cross grey dilation."""
    from scipy.ndimage import grey_dilation

    out = np.asarray(depth, np.float32).copy()
    hole = mask > 0
    for _ in range(iterations):
        dilated = grey_dilation(out, footprint=_CROSS, mode="nearest")
        out[hole] = dilated[hole]
    return out


def edge_inpaint(depth: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """VOID edge inpainting: detect Sobel edges, refill them from
    neighbours. Applied to both sparse input and GT by the reference
    (`voidloader.py:61`)."""
    edges = sobel_edge_map(depth, threshold)
    return inpaint_with_nearest(depth, edges)
