"""Host-side photometric / geometric augmentation (NumPy; no torch/cv2).

Covers the KITTI12 recipe (KITTI12/datasets/kitti_dataset.py:54-101): per-eye
brightness/gamma/contrast jitter, random crop, 20%-probability right-image
mean-fill occlusion patch; and the KITTI15/RAFT-style asymmetric color +
eraser transforms (KITTI15/core/utils/augmentor.py:60-183) in simplified form.
"""

from __future__ import annotations

import numpy as np


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """torchvision adjust_brightness: img * factor, clipped (uint8-range floats)."""
    return np.clip(img * factor, 0, 255)


def adjust_gamma(img: np.ndarray, gamma: float, gain: float = 1.0) -> np.ndarray:
    """torchvision adjust_gamma: 255 * gain * (img/255)^gamma."""
    return np.clip(255.0 * gain * (img / 255.0) ** gamma, 0, 255)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """torchvision adjust_contrast: blend with the mean of the grayscale image."""
    gray_mean = (img @ np.asarray([0.299, 0.587, 0.114], img.dtype)).mean()
    return np.clip(gray_mean + factor * (img - gray_mean), 0, 255)


def photometric_jitter(
    img: np.ndarray, rng: np.random.Generator,
    brightness=(0.5, 2.0), gamma=(0.8, 1.2), contrast=(0.8, 1.2),
) -> np.ndarray:
    """KITTI12 per-eye jitter chain (kitti_dataset.py:54-62)."""
    img = adjust_brightness(img, rng.uniform(*brightness))
    img = adjust_gamma(img, rng.uniform(*gamma))
    img = adjust_contrast(img, rng.uniform(*contrast))
    return img


def random_crop(
    arrays: list[np.ndarray], crop_hw: tuple[int, int], rng: np.random.Generator
) -> list[np.ndarray]:
    """Joint random crop (flow_transforms.RandomCrop)."""
    h, w = arrays[0].shape[:2]
    ch, cw = crop_hw
    y = int(rng.integers(0, h - ch + 1))
    x = int(rng.integers(0, w - cw + 1))
    return [a[y : y + ch, x : x + cw] for a in arrays]


def occlusion_patch(right: np.ndarray, rng: np.random.Generator, p: float = 0.2) -> np.ndarray:
    """Right-image mean-fill rectangle (kitti_dataset.py:96-101)."""
    if rng.uniform() >= p:
        return right
    sx = int(rng.uniform(35, 100))
    sy = int(rng.uniform(25, 75))
    if right.shape[0] <= 2 * sx or right.shape[1] <= 2 * sy:
        return right
    cx = int(rng.uniform(sx, right.shape[0] - sx))
    cy = int(rng.uniform(sy, right.shape[1] - sy))
    out = right.copy()
    out[cx - sx : cx + sx, cy - sy : cy + sy] = right.mean(axis=(0, 1), keepdims=True)
    return out


def eraser_transform(
    right: np.ndarray, rng: np.random.Generator, p: float = 0.5, max_boxes: int = 2,
    bounds: tuple[int, int] = (50, 100),
) -> np.ndarray:
    """RAFT eraser occlusion (augmentor.py:84-95): mean-color random boxes."""
    if rng.uniform() >= p:
        return right
    h, w = right.shape[:2]
    out = right.copy()
    mean_color = right.reshape(-1, right.shape[-1]).mean(0)
    for _ in range(int(rng.integers(1, max_boxes + 1))):
        x0 = int(rng.integers(0, w))
        y0 = int(rng.integers(0, h))
        dx = int(rng.integers(bounds[0], bounds[1]))
        dy = int(rng.integers(bounds[0], bounds[1]))
        out[y0 : y0 + dy, x0 : x0 + dx] = mean_color
    return out
