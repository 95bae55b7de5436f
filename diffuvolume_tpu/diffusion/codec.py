"""Disparity ↔ bin-volume codec.

The reference encodes a quarter-resolution disparity map into a 48-bin soft
two-hot volume with an in-place ``scatter_`` pair plus special cases
(SceneFlow/models/acv_ddim.py:403-419, duplicated at :272-292 and :425-440 and
again per backbone).  On TPU the same semantics become a vectorized hat-kernel
weighting — ``relu(1 - |bins - d|)`` — which is scatter-free, differentiable,
and trivially shardable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_disparity_volume(
    disp: jax.Array,
    num_bins: int = 48,
    scale: float = 1.0,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """Encode disparity (in bin units) as a scaled soft two-hot volume.

    Semantics (equal to the reference scatter construction):
      * bin ``⌊d⌋`` gets weight ``⌊d⌋ - d + 1`` and bin ``⌊d⌋+1`` gets the rest
        — i.e. ``w_k = relu(1 - |k - d|)``;
      * pixels with ``⌊d⌋ == num_bins-1`` become a one-hot on the last bin
        (the reference's ``fuzhi`` override, acv_ddim.py:288-290);
      * pixels where ``valid_mask == 0`` become uniform ``1/num_bins``
        (acv_ddim.py:415-417);
      * affine map to ``[-scale, scale]``: ``(x*2 - 1) * scale``.

    Args:
      disp: ``(B, H, W)`` disparity in bin units (typically full-res disparity
        / 4, clamped upstream to ``[0, 4*num_bins-1]/4``).
      num_bins: number of bins ``D`` (48).
      scale: diffusion signal scale (1.0 in all reference configs).
      valid_mask: optional ``(B, H, W)``; 0 marks invalid pixels.

    Returns:
      ``(B, D, H, W)`` volume in ``[-scale, scale]``.
    """
    bins = jnp.arange(num_bins, dtype=disp.dtype)
    w = jax.nn.relu(1.0 - jnp.abs(bins[None, :, None, None] - disp[:, None]))
    last_bin = jnp.floor(disp) == (num_bins - 1)
    one_hot_last = jnp.zeros_like(w).at[:, -1].set(1.0)
    vol = jnp.where(last_bin[:, None], one_hot_last, w)
    if valid_mask is not None:
        uniform = jnp.full_like(vol, 1.0 / num_bins)
        vol = jnp.where(valid_mask[:, None] == 0, uniform, vol)
    return (vol * 2.0 - 1.0) * scale
