"""Samplers and warpers (gather-free where possible, stereo-specialized).

Stereo sampling only ever moves along the scanline (the reference asserts this,
KITTI15/core/utils/utils.py:68), so the general 2-D grid_sample of the
reference collapses to vectorized 1-D linear interpolation here — far cheaper
than a general gather on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def linear_sample_1d(values: jax.Array, coords: jax.Array, zero_pad: bool = True) -> jax.Array:
    """Linear interpolation of ``values`` along its second-to-last axis.

    Equivalent to the reference ``bilinear_sampler`` (KITTI15/core/utils/utils.py:59-77):
    pixel coordinates, align_corners=True normalization, zeros outside the range.

    Args:
      values: ``(..., W, C)``.
      coords: ``(..., N)`` pixel coordinates into the ``W`` axis (broadcastable
        against the leading dims of ``values``).
      zero_pad: if True, out-of-range samples are zero (grid_sample
        ``padding_mode='zeros'``); if False they clamp to the edge.

    Returns:
      ``(..., N, C)`` sampled values.
    """
    w = values.shape[-2]
    lo = jnp.floor(coords)
    frac = coords - lo
    lo_raw = lo.astype(jnp.int32)
    lo_i = jnp.clip(lo_raw, 0, w - 1)
    hi_i = jnp.clip(lo_raw + 1, 0, w - 1)
    v_lo = jnp.take_along_axis(values, lo_i[..., None], axis=-2)
    v_hi = jnp.take_along_axis(values, hi_i[..., None], axis=-2)
    out = v_lo * (1.0 - frac[..., None]) + v_hi * frac[..., None]
    if zero_pad:
        # grid_sample zero padding: contributions from taps outside [0, W-1]
        # vanish individually (so coords in (-1, 0) and (W-1, W) fade linearly).
        w_lo = jnp.where((lo >= 0) & (lo <= w - 1), 1.0 - frac, 0.0)
        w_hi = jnp.where((lo + 1 >= 0) & (lo + 1 <= w - 1), frac, 0.0)
        out = v_lo * w_lo[..., None] + v_hi * w_hi[..., None]
    return out


def hat_sample_last2(vol: jax.Array, x0: jax.Array) -> jax.Array:
    """Linear sampling along the second-to-last axis via a hat-weight einsum.

    Numerically identical to ``linear_sample_1d(vol, x0, zero_pad=True)`` —
    the hat kernel ``max(0, 1-|x-d|)`` reproduces the per-tap zero-padding at
    the edges — but expressed as a dense contraction instead of a gather.
    On TPU, per-pixel ``take_along_axis`` gathers run ~100× off the VPU rate
    (measured 27 ms/GRU-iteration in the IGEV lookup); the einsum form is a
    regular batched matmul XLA can tile.

    Args:
      vol: ``(B, H, W, D, C)``.
      x0: ``(B, H, W, J)`` sample positions in ``[0, D-1]`` (out of range → 0).

    Returns:
      ``(B, H, W, J, C)``.
    """
    import os

    d = vol.shape[-2]
    bins = jnp.arange(d, dtype=x0.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(x0[..., None] - bins))  # (B,H,W,J,D)
    if vol.dtype == jnp.bfloat16:
        # All-bf16 contraction: the hat row has only two nonzero taps, so bf16
        # accumulation adds no error (MXU paths f32-accumulate internally
        # regardless).  Requesting an f32 result here makes XLA materialize an
        # f32 COPY of the whole volume in HBM every GRU iteration (seen in the
        # device trace as convert fusions feeding the C=1 corr contraction) —
        # native bf16 in/out keeps the scan-resident arrays half-width.
        w = w.astype(jnp.bfloat16)
    else:
        vol = vol.astype(w.dtype)
    if vol.shape[-1] == 1 and os.environ.get("DIFFU_HAT_C1", "0") == "1":
        # A/B: the C=1 (corr band) case as mul+reduce instead of dot_general.
        # Measured r4: bench_igev 5.170 → 5.112 — WORSE; the dot form stays
        # the default (kept as a wired A/B).
        return jnp.einsum("bhwjd,bhwd->bhwj", w, vol[..., 0])[..., None]
    return jnp.einsum("bhwjd,bhwdc->bhwjc", w, vol)


def stereo_bilinear_sample(volume: jax.Array, x_coords: jax.Array) -> jax.Array:
    """Sample a per-pixel 1-D signal at fractional disparity coordinates.

    TPU-native equivalent of the reference's ``bilinear_sampler`` call in the
    geometry lookup (KITTI15/core/geometry_ddim.py:33-69): the volume has been
    reshaped so each pixel owns a length-``D`` vector; we linearly sample it at
    ``N`` query positions.

    Args:
      volume: ``(P, D, C)`` per-pixel vectors (``P`` = flattened B*H*W).
      x_coords: ``(P, N)`` fractional positions in ``[0, D-1]`` (out-of-range → 0).

    Returns:
      ``(P, N, C)``.
    """
    return linear_sample_1d(volume, x_coords, zero_pad=True)


def grid_sample_2d(
    img: jax.Array, x_pix: jax.Array, y_pix: jax.Array, zero_pad: bool = True
) -> jax.Array:
    """Bilinear 2-D sampling at pixel coordinates with zero padding.

    Args:
      img: ``(B, H, W, C)``.
      x_pix, y_pix: ``(B, Ho, Wo)`` source pixel coordinates.

    Returns:
      ``(B, Ho, Wo, C)``.
    """
    b, h, w, c = img.shape
    x0 = jnp.floor(x_pix)
    y0 = jnp.floor(y_pix)
    fx = x_pix - x0
    fy = y_pix - y0

    def tap(yi, xi, wy, wx):
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        flat = img.reshape(b, h * w, c)
        idx = yc * w + xc
        v = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1).reshape(*idx.shape, c)
        wgt = wy * wx
        if zero_pad:
            inside = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            wgt = jnp.where(inside, wgt, 0.0)
        return v * wgt[..., None]

    out = (
        tap(y0, x0, 1 - fy, 1 - fx)
        + tap(y0, x0 + 1, 1 - fy, fx)
        + tap(y0 + 1, x0, fy, 1 - fx)
        + tap(y0 + 1, x0 + 1, fy, fx)
    )
    return out


def warp_right_to_left(right: jax.Array, disp: jax.Array) -> jax.Array:
    """Warp the right image/features to the left view by a disparity map.

    Faithful to KITTI12/models/submodule.py:137-176 including its coordinate
    quirk: the grid is normalized with the align_corners=True convention but
    sampled by grid_sample's default align_corners=False, so the effective
    source coordinate is ``c * S/(S-1) - 0.5`` per axis.  A validity mask
    (warped ones < 0.999 → 0) multiplies the output.

    TPU path (r5): the quirk's y source coordinate depends only on the ROW
    INDEX — data-independent — so the 2-D bilinear decomposes exactly into
    a static two-row blend (trace-time weights) followed by ONE 1-D hat
    contraction along the scanline (hat_sample_last2, the gather-free MXU
    form), with the ones-warp mask computed analytically (the hat kernel's
    edge partial sums in closed form).  The take_along_axis form measured
    8 × 5.19 ms per PCW refine at 384×1248 (general 2-D gathers); this
    form is a ~38 GF batched matmul.  ``DIFFU_WARP_GATHER=1`` restores the
    gather path for A/B.

    Args:
      right: ``(B, H, W, C)``.
      disp: ``(B, H, W)`` left-view disparity.

    Returns:
      ``(B, H, W, C)`` warped-and-masked right features.
    """
    import os

    b, h, w, c = right.shape
    xx = jnp.arange(w, dtype=disp.dtype)[None, None, :]
    x_src = (xx - disp) * (w / max(w - 1, 1)) - 0.5
    if os.environ.get("DIFFU_WARP_GATHER", "0") == "1":
        yy = jnp.arange(h, dtype=disp.dtype)[None, :, None]
        y_src = jnp.broadcast_to(yy * (h / max(h - 1, 1)) - 0.5, disp.shape)
        out = grid_sample_2d(right, x_src, y_src, zero_pad=True)
        ones = jnp.ones_like(right)
        mask = grid_sample_2d(ones, x_src, y_src, zero_pad=True)
        mask = jnp.where(mask < 0.999, 0.0, 1.0)
        return out * mask

    # Static per-row y taps (numpy at trace time).
    y_src = np.arange(h, dtype=np.float64) * (h / max(h - 1, 1)) - 0.5
    y0 = np.floor(y_src).astype(np.int64)
    fy = (y_src - y0).astype(np.float32)
    in0 = (y0 >= 0) & (y0 <= h - 1)
    in1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    w0 = np.where(in0, 1.0 - fy, 0.0).astype(np.float32)
    w1 = np.where(in1, fy, 0.0).astype(np.float32)
    r0 = jnp.take(right, jnp.asarray(np.clip(y0, 0, h - 1)), axis=1)
    r1 = jnp.take(right, jnp.asarray(np.clip(y0 + 1, 0, h - 1)), axis=1)
    w0j = jnp.asarray(w0)[None, :, None, None].astype(right.dtype)
    w1j = jnp.asarray(w1)[None, :, None, None].astype(right.dtype)
    blended = r0 * w0j + r1 * w1j  # (B, H, W, C)

    out = hat_sample_last2(blended[:, :, None], x_src[:, :, None])[:, :, 0]

    # Analytic ones-warp: Σ_v hat(x − v) over v ∈ [0, W) is 1 inside,
    # 1+x / W−x on the half-open borders, 0 outside; times the y-tap sum.
    xs = x_src.astype(jnp.float32)
    hatsum_x = jnp.clip(
        jnp.minimum(xs + 1.0, jnp.asarray(float(w), jnp.float32) - xs),
        0.0, 1.0,
    )
    ysum = jnp.asarray(w0 + w1)[None, :, None]
    mask = jnp.where(hatsum_x * ysum < 0.999, 0.0, 1.0)
    return out * mask.astype(out.dtype)[..., None]


def coords_grid(batch: int, h: int, w: int) -> jax.Array:
    """(B, H, W, 2) pixel-coordinate grid in (x, y) order
    (KITTI15/core/utils/utils.py:80-83)."""
    x = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    y = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    return jnp.broadcast_to(jnp.stack([x, y], axis=-1)[None], (batch, h, w, 2))


def gauss_blur(x: jax.Array, n: int = 5, std: float = 1.0) -> jax.Array:
    """Per-channel Gaussian blur (KITTI15/core/utils/utils.py:89-97).

    Args:
      x: ``(B, H, W, C)``.
    """
    g = jnp.arange(n, dtype=jnp.float32) - n // 2
    gx, gy = jnp.meshgrid(g, g)
    k = jnp.exp(-(gx**2 + gy**2) / (2 * std**2))
    k = k / jnp.maximum(k.sum(), 1e-4)
    c = x.shape[-1]
    kernel = jnp.broadcast_to(k[:, :, None, None], (n, n, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(n // 2, n // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def spatial_transformer(
    left: jax.Array, right: jax.Array, disparity_samples: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Disparity-sample feature warping via nearest(-floor) gather.

    Reference: SceneFlow/models/submodule.py:447-500 (``SpatialTransformer``):
    for each disparity sample the right features are gathered at
    ``floor(clamp(w - d, 0, W-1))`` (torch ``.long()`` truncation) and zeroed
    where the unclamped coordinate leaves ``[0, W-1]``; the left features are
    broadcast over the sample axis.

    Args:
      left, right: ``(B, H, W, C)``.
      disparity_samples: ``(B, S, H, W)``.

    Returns:
      ``(warped_right, left_expanded)``, both ``(B, S, H, W, C)``.
    """
    b, h, w, c = right.shape
    s = disparity_samples.shape[1]
    coords = (
        jnp.arange(w, dtype=disparity_samples.dtype)[None, None, None, :]
        - disparity_samples
    )  # (B, S, H, W)
    idx = jnp.clip(coords, 0, w - 1).astype(jnp.int32)  # floor for >= 0
    right_e = jnp.broadcast_to(right[:, None], (b, s, h, w, c))
    warped = jnp.take_along_axis(right_e, idx[..., None], axis=3)
    valid = (coords >= 0) & (coords <= w - 1)
    warped = warped * valid[..., None].astype(warped.dtype)
    left_e = jnp.broadcast_to(left[:, None], (b, s, h, w, c))
    return warped, left_e


def spatial_transformer_grid(
    left: jax.Array, right: jax.Array, disp_range_samples: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Disparity-sample feature warping via bilinear sampling.

    Reference: SceneFlow/models/submodule.py:503-531 (``SpatialTransformer_grid``):
    grid_sample with align_corners=True at ``x = w - d`` (y unchanged, so the
    2-D bilinear collapses to 1-D linear along the scanline), zeros padding;
    the left features are broadcast over the sample axis.

    Args:
      left, right: ``(B, H, W, C)``.
      disp_range_samples: ``(B, S, H, W)``.

    Returns:
      ``(warped_right, left_expanded)``, both ``(B, S, H, W, C)``.
    """
    b, h, w, c = right.shape
    s = disp_range_samples.shape[1]
    coords = (
        jnp.arange(w, dtype=disp_range_samples.dtype)[None, None, None, :]
        - disp_range_samples
    )  # (B, S, H, W)
    warped = linear_sample_1d(right[:, None], coords, zero_pad=True)
    left_e = jnp.broadcast_to(left[:, None], (b, s, h, w, c))
    return warped, left_e


def forward_interpolate(flow: "object") -> "object":
    """Forward-splat a flow field and re-grid by nearest neighbor (host-side).

    Reference: KITTI15/core/utils/utils.py:28-56 — numpy/scipy utility used by
    RAFT-style warm-start (unused by the stereo recipes; kept for parity).

    Args:
      flow: ``(2, H, W)`` numpy array (dx, dy).

    Returns:
      ``(2, H, W)`` numpy array.
    """
    import numpy as np
    from scipy import interpolate

    flow = np.asarray(flow)
    dx, dy = flow[0], flow[1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    x1, y1, dxf, dyf = x1[valid], y1[valid], dxf[valid], dyf[valid]
    flow_x = interpolate.griddata(
        (x1, y1), dxf, (x0, y0), method="nearest", fill_value=0
    )
    flow_y = interpolate.griddata(
        (x1, y1), dyf, (x0, y0), method="nearest", fill_value=0
    )
    return np.stack([flow_x, flow_y], axis=0).astype(np.float32)


def context_upsample(disp_low: jax.Array, up_weights: jax.Array) -> jax.Array:
    """Superpixel (convex 3×3 combination) upsampling of a low-res disparity.

    Reference: KITTI15/core/submodule.py:241-252 — unfold the 3×3 neighborhood
    (zero padding), nearest-upsample ×4, blend with learned softmax weights.

    Args:
      disp_low: ``(B, H, W)`` quarter-resolution disparity.
      up_weights: ``(B, 9, 4H, 4W)`` softmax weights (unfold order: row-major
        over (dy, dx) ∈ {-1,0,1}²).

    Returns:
      ``(B, 4H, 4W)``.
    """
    b, h, w = disp_low.shape
    padded = jnp.pad(disp_low, ((0, 0), (1, 1), (1, 1)))
    shifts = [padded[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    unfold = jnp.stack(shifts, axis=1)  # (B, 9, H, W)
    up = jnp.repeat(jnp.repeat(unfold, 4, axis=2), 4, axis=3)  # nearest ×4
    return jnp.sum(up * up_weights, axis=1)
