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


def scale_co_transform(
    left: np.ndarray, right: np.ndarray, disp: np.ndarray, ratio: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Joint rescale of a stereo pair and its disparity (×ratio).

    Reference: KITTI12/datasets/flow_transforms.py:24-47 (``Scale`` — dormant;
    commented out at every call site).  Disparity values scale with the ratio.
    """
    import cv2

    left = cv2.resize(left, None, fx=ratio, fy=ratio, interpolation=cv2.INTER_CUBIC)
    right = cv2.resize(right, None, fx=ratio, fy=ratio, interpolation=cv2.INTER_CUBIC)
    disp = cv2.resize(disp, None, fx=ratio, fy=ratio, interpolation=cv2.INTER_CUBIC) * ratio
    return left, right, disp


def random_vdisp(
    right: np.ndarray, rng: np.random.Generator, angle: float = 0.05, px: float = 1.0
) -> np.ndarray:
    """Vertical-disparity asymmetry: small random rotation + y-shift of the
    right image only.

    Reference: KITTI12/datasets/flow_transforms.py:73-93 (``RandomVdisp`` —
    dormant hook, kitti_dataset.py:79-90).
    """
    import cv2

    px2 = rng.uniform(-px, px)
    angle2 = rng.uniform(-angle, angle)
    center = (rng.uniform(0, right.shape[0]), rng.uniform(0, right.shape[1]))
    rot = cv2.getRotationMatrix2D(center, angle2, 1.0)
    out = cv2.warpAffine(right, rot, right.shape[1::-1], flags=cv2.INTER_LINEAR)
    trans = np.float32([[1, 0, 0], [0, 1, px2]])
    return cv2.warpAffine(out, trans, right.shape[1::-1], flags=cv2.INTER_LINEAR)


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


def _bilinear_resize_np(img: np.ndarray, fx: float, fy: float) -> np.ndarray:
    """cv2-free bilinear resize (align_corners=False half-pixel sampling)."""
    h, w = img.shape[:2]
    h1, w1 = int(round(h * fy)), int(round(w * fx))
    ys = np.clip((np.arange(h1) + 0.5) * (h / h1) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(w1) + 0.5) * (w / w1) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = img[..., None] if img.ndim == 2 else img
    out = (
        img[y0][:, x0] * (1 - wy) * (1 - wx)
        + img[y0][:, x1] * (1 - wy) * wx
        + img[y1][:, x0] * wy * (1 - wx)
        + img[y1][:, x1] * wy * wx
    )
    return out[..., 0] if out.shape[-1] == 1 else out


def resize_sparse_disparity(
    disp: np.ndarray, valid: np.ndarray, fx: float, fy: float
) -> tuple[np.ndarray, np.ndarray]:
    """Re-scatter valid sparse disparity points after scaling
    (KITTI15/core/utils/augmentor.py:224-256)."""
    h, w = disp.shape
    ys, xs = np.nonzero(valid >= 1)
    d0 = disp[ys, xs]
    h1, w1 = int(round(h * fy)), int(round(w * fx))
    xx = np.round(xs * fx).astype(np.int32)
    yy = np.round(ys * fy).astype(np.int32)
    d1 = d0 * fx
    keep = (xx > 0) & (xx < w1) & (yy > 0) & (yy < h1)
    out_d = np.zeros((h1, w1), np.float32)
    out_v = np.zeros((h1, w1), np.float32)
    out_d[yy[keep], xx[keep]] = d1[keep]
    out_v[yy[keep], xx[keep]] = 1.0
    return out_d, out_v


def sparse_spatial_transform(
    img1: np.ndarray, img2: np.ndarray, disp: np.ndarray, valid: np.ndarray,
    crop_size: tuple[int, int], rng: np.random.Generator,
    min_scale: float = -0.2, max_scale: float = 0.4,
    spatial_aug_prob: float = 0.8,
):
    """RAFT-style sparse spatial augmentation (augmentor.py:258-305 without
    flips, which the KITTI recipe disables): random 2^U(min,max) rescale with
    sparse disparity re-scatter, then margin-jittered crop."""
    ht, wd = img1.shape[:2]
    min_s = max((crop_size[0] + 1) / ht, (crop_size[1] + 1) / wd)
    scale = 2.0 ** rng.uniform(min_scale, max_scale)
    s = max(scale, min_s)
    if rng.uniform() < spatial_aug_prob or min_s > 1.0:
        img1 = _bilinear_resize_np(img1, s, s)
        img2 = _bilinear_resize_np(img2, s, s)
        disp, valid = resize_sparse_disparity(disp, valid, s, s)
    margin_y, margin_x = 20, 50
    y0 = int(rng.integers(0, img1.shape[0] - crop_size[0] + margin_y))
    x0 = int(rng.integers(-margin_x, img1.shape[1] - crop_size[1] + margin_x))
    y0 = int(np.clip(y0, 0, img1.shape[0] - crop_size[0]))
    x0 = int(np.clip(x0, 0, img1.shape[1] - crop_size[1]))
    sl = np.s_[y0 : y0 + crop_size[0], x0 : x0 + crop_size[1]]
    return img1[sl], img2[sl], disp[sl], valid[sl]


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
