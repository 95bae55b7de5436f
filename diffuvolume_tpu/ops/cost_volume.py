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


def build_concat_volume(
    left: jax.Array, right: jax.Array, max_disp: int, mask_ref: bool = False
) -> jax.Array:
    """Concatenation 4D cost volume.

    ``volume[b, d, h, w] = concat(left[b,h,w], right[b,h,w-d])`` with the right
    half zero where ``w < d``.  With ``mask_ref=False`` the left half is filled
    at *every* ``(d, w)`` (SceneFlow/KITTI15 behavior, SceneFlow/models/
    submodule.py:180-191); ``mask_ref=True`` zeroes the left half where
    ``w < d`` too (KITTI12's variant, KITTI12/models/submodule.py:86-97).

    Args:
      left, right: ``(B, H, W, C)``.
      max_disp: ``D``.

    Returns:
      ``(B, D, H, W, 2C)``.
    """
    b, h, w, c = left.shape
    right_slices, left_slices = [], []
    for d in range(max_disp):
        if d == 0:
            r, l = right, left
        elif d >= w:
            r = jnp.zeros_like(right)
            l = jnp.zeros_like(left)
        else:
            pad = ((0, 0), (0, 0), (d, 0), (0, 0))
            r = jnp.pad(right[:, :, :-d, :], pad)
            l = jnp.pad(left[:, :, d:, :], pad) if mask_ref else left
        right_slices.append(r)
        left_slices.append(l)
    right_vol = jnp.stack(right_slices, axis=1)  # (B, D, H, W, C)
    if mask_ref:
        left_vol = jnp.stack(left_slices, axis=1)
    else:
        left_vol = jnp.broadcast_to(left[:, None], (b, max_disp, h, w, c))
    return constrain_volume(jnp.concatenate([left_vol, right_vol], axis=-1))


def build_gwc_volume_norm(
    left: jax.Array, right: jax.Array, max_disp: int, num_groups: int,
    cosine: bool = False,
) -> jax.Array:
    """Normalized group-wise correlation volume.

    ``cosine=False``: per-group L2-normalized correlation
    (SceneFlow/models/submodule.py:240-250 via groupwise_correlation_norm);
    ``cosine=True``: whole-feature cosine normalization before the plain gwc
    (submodule.py:194-206, build_gwc_volume_cos).
    """

    def norm_group(f):
        b, h, w, c = f.shape
        g = f.reshape(b, h, w, num_groups, c // num_groups)
        n = jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5
        return (g / n).reshape(b, h, w, c)

    def norm_all(f):
        n = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True)) + 1e-5
        return f / n

    norm = norm_all if cosine else norm_group
    vol = build_gwc_volume(norm(left), norm(right), max_disp, num_groups)
    if not cosine:
        # groupwise_correlation_norm takes the group MEAN of unit-vector
        # products; build_gwc_volume already means over channels-per-group, so
        # the semantics match after per-group normalization.
        pass
    return vol


def groupwise_correlation_4d(fea1: jax.Array, fea2: jax.Array, num_groups: int) -> jax.Array:
    """Per-group mean correlation of two 4-D feature volumes.

    Reference: SceneFlow/models/submodule.py:534-540 (``groupwise_correlation_4D``,
    there ``(B, C, D, H, W)``; here channels last).

    Args:
      fea1, fea2: ``(B, D, H, W, C)``, ``C % num_groups == 0``.

    Returns:
      ``(B, D, H, W, G)``.
    """
    *lead, c = fea1.shape
    assert c % num_groups == 0, (c, num_groups)
    f1 = fea1.reshape(*lead, num_groups, c // num_groups)
    f2 = fea2.reshape(*lead, num_groups, c // num_groups)
    return jnp.mean(f1 * f2, axis=-1)


def build_gwc_volume_unfold(
    left: jax.Array, right: jax.Array, max_disp: int, num_groups: int
) -> jax.Array:
    """Unfold-style group-wise volume: per-group **sum** (not mean) reduction.

    Reference: SceneFlow/models/submodule.py:262-277 (``Build_gwc_volume_unfold``):
    zero-pads the target ``max_disp-1`` on the left, unfolds a ``(1, max_disp)``
    window and flips, which is exactly the shifted product summed over
    channels-per-group.  Identical to ``build_gwc_volume`` scaled by C/G.
    """
    cpg = left.shape[-1] // num_groups
    return build_gwc_volume(left, right, max_disp, num_groups) * cpg


def build_gwc_volume_v1(
    left: jax.Array, right: jax.Array, max_disp: int, num_groups: int
) -> jax.Array:
    """Double-stride variant: disparity plane ``d`` correlates at shift ``2d``.

    Reference: SceneFlow/models/submodule.py:281-293 (``build_gwc_volume_v1``):
    ``volume[b,d,h,w,g] = corr(left[...,w], right[...,w-2d])`` for ``w >= 2d``,
    zero elsewhere.
    """
    b, h, w, _ = left.shape
    slices = []
    for d in range(max_disp):
        s = 2 * d
        if s == 0:
            corr = groupwise_correlation(left, right, num_groups)
        elif s >= w:
            corr = jnp.zeros((b, h, w, num_groups), left.dtype)
        else:
            corr = groupwise_correlation(left[:, :, s:, :], right[:, :, :-s, :], num_groups)
            corr = jnp.pad(corr, ((0, 0), (0, 0), (s, 0), (0, 0)))
        slices.append(corr)
    return jnp.stack(slices, axis=1)


def build_correlation_volume_ones(
    left: jax.Array, right: jax.Array, max_disp: int, num_groups: int
) -> jax.Array:
    """Group-wise volume with a **ones** background for out-of-range pixels.

    Reference: SceneFlow/models/submodule.py:494-505 (``build_correlation_volume``):
    identical fill to ``build_gwc_volume`` but the buffer is initialized with
    ``new_ones`` so unmatched ``(d, w < d)`` entries stay 1 instead of 0.
    """
    vol = build_gwc_volume(left, right, max_disp, num_groups)
    w = left.shape[2]
    d_idx = jnp.arange(max_disp)[:, None]
    w_idx = jnp.arange(w)[None, :]
    background = (w_idx < d_idx)[None, :, None, :, None]  # (1, D, 1, W, 1)
    return jnp.where(background, jnp.ones_like(vol), vol)


def patch_aggregation(volume: jax.Array, patch_weight: jax.Array) -> jax.Array:
    """Weighted 3×3 spatial box-sum over a 4-D volume.

    Reference: SceneFlow/models/submodule.py:252-259 (``patch_aggregation``):
    unfolds the zero-padded 3×3 (H, W) neighborhood of every voxel, multiplies
    by a per-voxel weight broadcast over the 9 taps, and sums — i.e.
    ``out = patch_weight * boxsum_3x3(volume)``.

    Args:
      volume: ``(B, D, H, W, G)``.
      patch_weight: ``(B, D, H, W, G)`` per-voxel weights.

    Returns:
      ``(B, D, H, W, G)``.
    """
    b, d, h, w, g = volume.shape
    padded = jnp.pad(volume, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    box = sum(
        padded[:, :, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)
    )
    return patch_weight * box


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
