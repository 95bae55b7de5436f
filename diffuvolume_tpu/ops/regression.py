"""Disparity regression, uncertainty, and interpolation helpers.

All functions are pure, statically-shaped, and jit/shard-friendly.  Linear
resampling is expressed as a dense interpolation-matrix contraction (an MXU
matmul) rather than gathers — the TPU-idiomatic formulation, and the one that
lets XLA fuse upsample→softmax→expectation chains.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def disparity_regression(prob: jax.Array, max_disp: int) -> jax.Array:
    """Soft-argmin: expectation of disparity under a probability volume.

    Reference: SceneFlow/models/submodule.py:173-177.

    Args:
      prob: ``(B, D, H, W)`` softmax-normalized probabilities over disparity.
      max_disp: ``D``.

    Returns:
      ``(B, H, W)`` expected disparity.
    """
    d = jnp.arange(max_disp, dtype=prob.dtype)
    return jnp.einsum("bdhw,d->bhw", prob, d)


def disparity_uncertainty(prob: jax.Array, disp: jax.Array, max_disp: int) -> jax.Array:
    """Expected absolute deviation of the volume from a disparity estimate.

    The DDIM "renewal" confidence score: ``sum_d |d - disp| * prob[d]``
    (SceneFlow/models/acv_ddim.py:325-329).

    Args:
      prob: ``(B, D, H, W)`` probability volume.
      disp: ``(B, H, W)`` disparity estimate.
      max_disp: ``D``.

    Returns:
      ``(B, H, W)`` uncertainty (lower = more confident).
    """
    d = jnp.arange(max_disp, dtype=prob.dtype)
    diff = jnp.abs(disp[:, None] - d[None, :, None, None])
    return jnp.sum(diff * prob, axis=1)


def disparity_regression_nearby(
    similarity: jax.Array, disp_step: float = 1.0, half_support_window: int = 2
) -> jax.Array:
    """Windowed soft-argmin around the similarity maximum.

    Reference: KITTI12/models/submodule.py:40-84 — softmax only over
    ``±half_support_window`` bins around the argmax (edge-clamped indices,
    matching the reference's clamping which can duplicate edge bins).

    Args:
      similarity: ``(B, D, H, W)`` similarity volume (pre-softmax).
      disp_step: disparity difference between adjacent bins.
      half_support_window: window half-size in bins.

    Returns:
      ``(B, H, W)`` disparity.
    """
    idx_max = jnp.argmax(similarity, axis=1)  # (B, H, W)
    idx_limit = similarity.shape[1] - 1
    shifts = jnp.arange(-half_support_window, half_support_window + 1)
    idx = jnp.clip(idx_max[:, None] + shifts[None, :, None, None], 0, idx_limit)
    support = jnp.take_along_axis(similarity, idx, axis=1)
    prob = jax.nn.softmax(support, axis=1)
    return jnp.sum(prob * idx.astype(similarity.dtype) * disp_step, axis=1)


def disparity_variance_confidence(
    prob: jax.Array, disparity_samples: jax.Array, disp: jax.Array
) -> jax.Array:
    """Variance over explicit disparity samples (submodule.py:440-444)."""
    diff = (disp[:, None] - disparity_samples) ** 2
    return jnp.sum(prob * diff, axis=1)


def disparity_variance(prob: jax.Array, disp: jax.Array, max_disp: int) -> jax.Array:
    """Variance of the cost volume around a disparity estimate.

    Reference: SceneFlow/models/submodule.py:432-438.
    """
    d = jnp.arange(max_disp, dtype=prob.dtype)
    diff = (disp[:, None] - d[None, :, None, None]) ** 2
    return jnp.sum(diff * prob, axis=1)


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D linear interpolation matrix ``M`` with ``y = M @ x``.

    ``align_corners=False`` uses half-pixel centers (torch F.interpolate default,
    matching jax.image.resize); ``align_corners=True`` maps endpoints to
    endpoints (torch ``align_corners=True``, used by the KITTI12/15 paths).
    Out-of-range source coordinates are clamped (edge replication), matching
    torch.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(out)
        else:
            src = out * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (out + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float64)
    m[np.arange(out_size), lo] += 1.0 - w_hi
    m[np.arange(out_size), hi] += w_hi
    return m.astype(np.float32)


def resize_linear(
    x: jax.Array, out_size: int, axis: int, align_corners: bool = False
) -> jax.Array:
    """Linear resize along one axis via an interpolation-matrix contraction."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_interp_matrix(in_size, out_size, align_corners), dtype=x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum("...i,oi->...o", moved, m)
    return jnp.moveaxis(out, -1, axis)


def resize_bilinear(
    x: jax.Array,
    out_hw: tuple[int, int],
    h_axis: int,
    w_axis: int,
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear resize over two axes (separable composition of linear resizes)."""
    x = resize_linear(x, out_hw[0], h_axis, align_corners)
    x = resize_linear(x, out_hw[1], w_axis, align_corners)
    return x


def resize_volume_trilinear(
    cost: jax.Array, out_dhw: tuple[int, int, int], align_corners: bool = False
) -> jax.Array:
    """Trilinear resize of a ``(B, D, H, W)`` cost volume to ``out_dhw``.

    Matches torch ``F.upsample(mode='trilinear')`` on the squeezed single-channel
    volume (SceneFlow/models/acv_ddim.py:398; align_corners=True for the
    KITTI12/15 paths, pwcnet_ddim.py:480).
    """
    cost = resize_linear(cost, out_dhw[0], axis=1, align_corners=align_corners)
    cost = resize_linear(cost, out_dhw[1], axis=2, align_corners=align_corners)
    cost = resize_linear(cost, out_dhw[2], axis=3, align_corners=align_corners)
    return cost


def upsample_cost_and_regress(
    cost: jax.Array,
    max_disp: int,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Trilinear-upsample cost logits to full resolution, softmax, soft-argmin.

    The reference's per-head tail: ``F.upsample(cost, [maxdisp, H, W],
    'trilinear') → softmax(dim=D) → disparity_regression``
    (SceneFlow/models/acv_ddim.py:397-401).

    Args:
      cost: ``(B, D4, H4, W4)`` logits at quarter resolution (channel squeezed).
      max_disp: full-resolution disparity count (192).
      out_hw: full image ``(H, W)``.

    Returns:
      ``(pred, prob)``: ``(B, H, W)`` disparity and the ``(B, max_disp, H, W)``
      probability volume (needed by the renewal filter).
    """
    up = resize_volume_trilinear(cost, (max_disp, out_hw[0], out_hw[1]), align_corners)
    prob = jax.nn.softmax(up, axis=1)
    pred = disparity_regression(prob, max_disp)
    return pred, prob
