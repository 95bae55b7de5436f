"""Input padding to stride multiples (KITTI15/core/utils/utils.py:7-26)."""

from __future__ import annotations

import numpy as np


class InputPadder:
    """Pad (H, W) up to a multiple of ``divis_by`` (replicate), then unpad.

    The reference pads top/bottom symmetric-ish for 'sintel' mode and
    top-only otherwise; KITTI15 eval uses divis_by=32 (evaluate_stereo.py:85).
    Channels-last ``(B, H, W, C)`` arrays.
    """

    def __init__(self, shape, divis_by: int = 32, mode: str = "sintel"):
        self.ht, self.wd = shape[-3], shape[-2]
        pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
        pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        import jax.numpy as jnp

        l, r, t, b = self._pad
        return [
            jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge") for x in inputs
        ]

    def unpad(self, x):
        l, r, t, b = self._pad
        ht = x.shape[-3] if x.ndim >= 3 else x.shape[0]
        return x[..., t : x.shape[-3] - b if b else None, l : x.shape[-2] - r if r else None, :] \
            if x.ndim >= 4 else x[:, t : x.shape[1] - b if b else None, l : x.shape[2] - r if r else None]
