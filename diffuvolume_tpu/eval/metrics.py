"""Stereo evaluation metrics (EPE / D1 / Thres@k), masked & per-image.

Semantics follow SceneFlow/utils/metrics.py: per-image masked means, the D1
error is ``|e| > 3px AND |e|/|gt| > 5%``, and images whose valid-mask coverage
(relative to ``gt > 0`` pixels) is below 10% are skipped.  Implemented as
weighted reductions (no boolean indexing) so everything jits and shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array, axes) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axes) / jnp.maximum(jnp.sum(m, axis=axes), 1.0)


def epe_metric(d_est: jax.Array, d_gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-image mean absolute disparity error over ``mask``. Shapes (B,H,W)→(B,)."""
    return _masked_mean(jnp.abs(d_est - d_gt), mask, axes=(1, 2))


def d1_metric(d_est: jax.Array, d_gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-image KITTI D1: fraction of masked px with err>3 and err/|gt|>5%."""
    e = jnp.abs(d_est - d_gt)
    bad = (e > 3.0) & (e / jnp.maximum(jnp.abs(d_gt), 1e-12) > 0.05)
    return _masked_mean(bad.astype(d_est.dtype), mask, axes=(1, 2))


def thres_metric(
    d_est: jax.Array, d_gt: jax.Array, mask: jax.Array, thres: float
) -> jax.Array:
    """Per-image fraction of masked px with error above ``thres``."""
    bad = jnp.abs(d_est - d_gt) > thres
    return _masked_mean(bad.astype(d_est.dtype), mask, axes=(1, 2))


def metrics_batch(
    d_est: jax.Array, d_gt: jax.Array, mask: jax.Array
) -> dict[str, jax.Array]:
    """All standard metrics plus the per-image validity weight.

    Returns per-image arrays; average with ``weight`` to reproduce the
    reference's skip-low-coverage behavior (metrics.py:30-33: skip images where
    masked coverage / (gt>0) coverage < 10%).
    """
    coverage = jnp.mean(mask.astype(jnp.float32), axis=(1, 2))
    gt_pos = jnp.mean((d_gt > 0).astype(jnp.float32), axis=(1, 2))
    weight = (coverage / jnp.maximum(gt_pos, 1e-12) >= 0.1).astype(jnp.float32)
    return {
        "EPE": epe_metric(d_est, d_gt, mask),
        "D1": d1_metric(d_est, d_gt, mask),
        "Thres1": thres_metric(d_est, d_gt, mask, 1.0),
        "Thres2": thres_metric(d_est, d_gt, mask, 2.0),
        "Thres3": thres_metric(d_est, d_gt, mask, 3.0),
        "weight": weight,
    }
