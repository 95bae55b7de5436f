"""File readers: PFM disparity, KITTI PNG/256 disparity, images.

Reference: SceneFlow/datasets/data_io.py:6-66 (PFM), KITTI15/core/utils/
frame_utils.py:124-128 (PNG/256).  Pure NumPy/PIL — no torch, no cv2
dependency for the core paths.
"""

from __future__ import annotations

import re

import numpy as np
from PIL import Image


def read_pfm(path: str) -> tuple[np.ndarray, float]:
    """Read a PFM file → (float32 array flipped to row-major top-down, scale)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"Not a PFM file: {path}")
        dim_match = re.match(rb"^(\d+)\s(\d+)\s$", f.readline())
        if dim_match is None:
            raise ValueError(f"Malformed PFM header: {path}")
        width, height = map(int, dim_match.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.frombuffer(f.read(), endian + "f")
        shape = (height, width, 3) if color else (height, width)
        data = data.reshape(shape)
        return np.ascontiguousarray(np.flipud(data)).astype(np.float32), scale


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.flipud(image.astype(np.float32))
    color = image.ndim == 3 and image.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        f.write(image.tobytes())


def read_kitti_disparity(path: str) -> np.ndarray:
    """KITTI uint16 PNG disparity: value/256, 0 = invalid
    (frame_utils.py:124-128)."""
    disp = np.asarray(Image.open(path), dtype=np.float32) / 256.0
    return disp


def read_image(path: str) -> np.ndarray:
    """RGB uint8 image → float32 (H, W, 3) in [0, 255]."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32)


def read_all_lines(path: str) -> list[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]
