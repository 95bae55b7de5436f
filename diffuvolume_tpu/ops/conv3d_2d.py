"""3-D convolution decomposed into per-depth-tap 2-D convolutions.

Why: XLA's TPU lowering of a true ``conv3d`` materializes im2col patches in
HBM — at the DiffuVolume aggregation shapes (C=32 3x3x3 over a
(B, 48, H/4, W/4) cost volume, reference SceneFlow/models/acv_ddim.py:452-455)
that is ~2.5 GB of traffic per conv and runs ~12x off MXU speed-of-light on
v5e.  The same contraction expressed as ``KD`` 2-D convolutions over the
depth-merged batch ``(B*D, H, W, C)`` hits XLA's streaming 2-D conv emitter:
each tap reads the input once and the shifted-add along D is a cheap
elementwise epilogue.

Semantics are identical to ``lax.conv_general_dilated`` with NDHWC layout
(stride / padding / dilation per axis, feature groups), verified in
tests/test_conv3d_2d.py against the XLA conv3d on randomized configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _take_d(y: jax.Array, start: int, stride: int, dout: int) -> jax.Array:
    """Rows ``start + stride*i`` (i < dout) along axis 1, zero out-of-range.

    ``y`` is (B, D, H', W', Co); indices may start negative or run past D.
    """
    d = y.shape[1]
    lo = max(0, -start)                       # first valid output index
    first = start + lo * stride               # first valid source row
    n_valid = max(0, min(dout - lo, (d - first + stride - 1) // stride if first < d else 0))
    if n_valid <= 0:
        return jnp.zeros((y.shape[0], dout, *y.shape[2:]), y.dtype)
    sl = y[:, first : first + (n_valid - 1) * stride + 1 : stride]
    pads = [(0, 0)] * y.ndim
    pads[1] = (lo, dout - lo - n_valid)
    return jnp.pad(sl, pads) if pads[1] != (0, 0) else sl


def conv3d_via_2d(
    x: jax.Array,
    k: jax.Array,
    stride=(1, 1, 1),
    padding=(1, 1, 1),
    dilation=(1, 1, 1),
    groups: int = 1,
) -> jax.Array:
    """NDHWC 3-D conv as ``KD`` NHWC 2-D convs + shifted-add over depth.

    Args:
      x: ``(B, D, H, W, C)``.
      k: ``(KD, KH, KW, C // groups, Co)``.
      stride/padding/dilation: per-axis ints ``(d, h, w)``.
      groups: feature group count.

    Returns:
      ``(B, Do, Ho, Wo, Co)`` — numerically identical to XLA's conv3d.
    """
    b, d, h, w, c = x.shape
    kd = k.shape[0]
    sd, sh, sw = stride
    pd, ph, pw = padding
    dd, dh, dw = dilation
    dout = (d + 2 * pd - dd * (kd - 1) - 1) // sd + 1

    x2 = x.reshape(b * d, h, w, c)
    out = None
    for i in range(kd):
        y = lax.conv_general_dilated(
            x2,
            k[i],
            (sh, sw),
            [(ph, ph), (pw, pw)],
            rhs_dilation=(dh, dw),
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(b, d, *y.shape[1:])
        contrib = _take_d(y, i * dd - pd, sd, dout)
        out = contrib if out is None else out + contrib
    return out
