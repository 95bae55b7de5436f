"""Stereo cost-volume builders (channels-last, TPU-friendly).

Semantics match the reference builders (cited per function) but the layout and
construction are TPU-native: features are ``(B, H, W, C)`` and volumes are
``(B, D, H, W, C)`` (channels last so 3D convolutions map onto the MXU), and
the per-shift Python loop writes of the reference become static unrolled slices
that XLA fuses into one kernel.  A Pallas kernel for the group-wise volume
lives in ``diffuvolume_tpu.ops.pallas`` and is used when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffuvolume_tpu.parallel.volume_sharding import constrain_volume


def groupwise_correlation(fea1: jax.Array, fea2: jax.Array, num_groups: int) -> jax.Array:
    """Per-group mean of the elementwise product of two feature maps.

    Reference semantics: SceneFlow/models/submodule.py:209-215.

    Args:
      fea1, fea2: ``(B, H, W, C)`` feature maps, ``C % num_groups == 0``.
      num_groups: number of correlation groups ``G``.

    Returns:
      ``(B, H, W, G)`` correlation.
    """
    b, h, w, c = fea1.shape
    assert c % num_groups == 0, (c, num_groups)
    cpg = c // num_groups
    f1 = fea1.reshape(b, h, w, num_groups, cpg)
    f2 = fea2.reshape(b, h, w, num_groups, cpg)
    return jnp.mean(f1 * f2, axis=-1)


def build_gwc_volume(
    left: jax.Array, right: jax.Array, max_disp: int, num_groups: int
) -> jax.Array:
    """Group-wise correlation 4D cost volume.

    ``volume[b, d, h, w, g] = mean_c_in_g(left[b,h,w,c] * right[b,h,w-d,c])`` for
    ``w >= d``; zero elsewhere.  Matches SceneFlow/models/submodule.py:228-238
    (there laid out ``(B, G, D, H, W)`` and built by in-place writes; here a
    static unrolled stack of shifted correlations, channels last).

    Args:
      left, right: ``(B, H, W, C)``.
      max_disp: number of disparity shifts ``D``.
      num_groups: correlation groups ``G``.

    Returns:
      ``(B, D, H, W, G)`` cost volume.
    """
    b, h, w, c = left.shape
    slices = []
    for d in range(max_disp):
        if d == 0:
            corr = groupwise_correlation(left, right, num_groups)
        elif d >= w:  # whole scanline out of range → zero plane
            corr = jnp.zeros((b, h, w, num_groups), left.dtype)
        else:
            corr = groupwise_correlation(left[:, :, d:, :], right[:, :, :-d, :], num_groups)
            corr = jnp.pad(corr, ((0, 0), (0, 0), (d, 0), (0, 0)))
        slices.append(corr)
    return constrain_volume(jnp.stack(slices, axis=1))


def build_concat_volume(left: jax.Array, right: jax.Array, max_disp: int) -> jax.Array:
    """Concatenation 4D cost volume.

    ``volume[b, d, h, w] = concat(left[b,h,w], right[b,h,w-d])`` with the right
    half zero where ``w < d``; the left half is filled at *every* ``(d, w)``
    (SceneFlow/KITTI15 behavior, SceneFlow/models/submodule.py:180-191 — note
    KITTI12's variant also masks the left half; see ``mask_ref=True``).

    Args:
      left, right: ``(B, H, W, C)``.
      max_disp: ``D``.

    Returns:
      ``(B, D, H, W, 2C)``.
    """
    b, h, w, c = left.shape
    right_slices = []
    for d in range(max_disp):
        if d == 0:
            r = right
        elif d >= w:
            r = jnp.zeros_like(right)
        else:
            r = jnp.pad(right[:, :, :-d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
        right_slices.append(r)
    right_vol = jnp.stack(right_slices, axis=1)  # (B, D, H, W, C)
    left_vol = jnp.broadcast_to(left[:, None], (b, max_disp, h, w, c))
    return constrain_volume(jnp.concatenate([left_vol, right_vol], axis=-1))


def build_signed_correlation_volume(
    left: jax.Array, right: jax.Array, max_offset: int
) -> jax.Array:
    """Single-group correlation over signed shifts ``-max_offset..max_offset``.

    Used by the PCWNet full-resolution refinement (KITTI12/models/submodule.py:121-135,
    ``build_corrleation_volume`` [sic]): ``volume[b, k, h, w] = mean_c(left[b,h,w,c] *
    right[b,h,w-d,c])`` for ``d = k - max_offset`` in ``[-max_offset, max_offset]``,
    zero where ``w-d`` is out of range.

    Args:
      left, right: ``(B, H, W, C)``.
      max_offset: maximum absolute shift.

    Returns:
      ``(B, 2*max_offset+1, H, W)``.
    """
    b, h, w, _ = left.shape
    slices = []
    for d in range(-max_offset, max_offset + 1):
        if abs(d) >= w:
            corr = jnp.zeros((b, h, w), left.dtype)
        elif d == 0:
            corr = jnp.mean(left * right, axis=-1)
        elif d > 0:
            corr = jnp.mean(left[:, :, d:, :] * right[:, :, :-d, :], axis=-1)
            corr = jnp.pad(corr, ((0, 0), (0, 0), (d, 0)))
        else:  # negative shift: right sampled to the right of w
            corr = jnp.mean(left[:, :, :d, :] * right[:, :, -d:, :], axis=-1)
            corr = jnp.pad(corr, ((0, 0), (0, 0), (0, -d)))
        slices.append(corr)
    return jnp.stack(slices, axis=1)
