"""Training losses.

Reference: SceneFlow/models/loss.py (smooth-L1 over masked pixels, per-head
weights), KITTI12/models/loss.py, and the KITTI15 sequence loss
(KITTI15/train_stereo.py:33-62).  Boolean indexing becomes masked weighted
means so the losses jit and shard.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

SCENEFLOW_WEIGHTS = (0.5, 0.5, 0.7, 1.0)  # [pred_att, pred0, pred1, pred2]
SCENEFLOW_WEIGHTS_FREEZE_ATTN = (0.5, 0.7, 1.0)
SCENEFLOW_WEIGHTS_ATTN_ONLY = (1.0,)
KITTI12_WEIGHTS = (0.5, 0.5, 0.5, 0.7, 1.0, 1.3)


def smooth_l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise smooth-L1 (Huber with beta=1), matching F.smooth_l1_loss."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def multi_scale_loss(
    disp_ests: Sequence[jax.Array],
    disp_gt: jax.Array,
    mask: jax.Array,
    weights: Sequence[float] = SCENEFLOW_WEIGHTS,
) -> jax.Array:
    """Weighted smooth-L1 over prediction heads (loss.py:19-24)."""
    assert len(disp_ests) == len(weights), (len(disp_ests), len(weights))
    total = 0.0
    for est, w in zip(disp_ests, weights):
        total = total + w * _masked_mean(smooth_l1(est, disp_gt), mask)
    return total


def sequence_loss(
    disp_preds: Sequence[jax.Array] | jax.Array,
    init_disp: jax.Array,
    disp_gt: jax.Array,
    valid: jax.Array,
    loss_gamma: float = 0.9,
    max_disp: float = 192.0,
) -> jax.Array:
    """IGEV γ-discounted iterate loss (KITTI15/train_stereo.py:33-62).

    ``disp_preds``: stacked ``(N, B, H, W)`` GRU iterates (or a list);
    ``init_disp``: ``(B, H, W)`` initial soft-argmin disparity;
    ``valid``: ``(B, H, W)`` validity; combined with ``|gt| < max_disp``.
    """
    if not isinstance(disp_preds, jax.Array):
        disp_preds = jnp.stack(list(disp_preds), axis=0)
    n = disp_preds.shape[0]
    mask = (valid >= 0.5) & (jnp.abs(disp_gt) < max_disp)
    adjusted_gamma = loss_gamma ** (15.0 / max(n - 1, 1))
    total = _masked_mean(smooth_l1(init_disp, disp_gt), mask)
    for i in range(n):
        w = adjusted_gamma ** (n - i - 1)
        total = total + w * _masked_mean(jnp.abs(disp_preds[i] - disp_gt), mask)
    return total
