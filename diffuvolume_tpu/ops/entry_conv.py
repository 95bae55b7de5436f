"""Image-entry convolutions (C_in ≤ 4) as unfold + matmul.

XLA's TPU conv emitter runs ~25× off peak on the 3-channel entry convs
(K=3 of 128 MXU lanes; IGEV cnet conv1 7×7: 1.5 ms/model, conv_stem ~1 ms
at 384×1248).  With ≤4 input channels the full k·k·C patch fits in ≤196
lanes, so the conv is better spent as ONE matmul over slice-unfolded
patches:

* stride 1: k² shifted views of the padded image, lane-concatenated →
  ``(B, H, W, k²·C) @ (k²·C, Co)``.
* stride 2: the k taps per dim span 2 positions of each parity sub-grid;
  the strided subsample is a window-1 stride-2 ``reduce_window`` (the one
  strided primitive this backend lowers well — strided *slices* lower as
  multi-ms gathers, measured).

Exact (same accumulation order class; bf16 matmul == conv MXU path);
oracle-tested against lax.conv_general_dilated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _subsample2(x: jax.Array) -> jax.Array:
    """(B, H', W', C) → every-other row/col via window-1 reduce_window."""
    return jax.lax.reduce_window(
        x, 0.0 if x.dtype == jnp.float32 else jnp.zeros((), x.dtype),
        jax.lax.add, (1, 1, 1, 1), (1, 2, 2, 1), "VALID"
    )


def unfold_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    stride: int = 1,
    padding: int = 0,
    bias: jax.Array | None = None,
) -> jax.Array:
    """k×k conv over ``(B, H, W, C≤4)`` as unfold + one matmul.

    Args:
      kernel: ``(k, k, C, Co)`` HWIO.
      stride: 1 or 2.
    """
    kh, kw, ci, co = kernel.shape
    b, h, w, _ = x.shape
    assert x.shape[-1] == ci and stride in (1, 2), (x.shape, kernel.shape, stride)
    xp = jnp.pad(x, ((0, 0), (padding,) * 2, (padding,) * 2, (0, 0)))
    ho = (h + 2 * padding - kh) // stride + 1
    wo = (w + 2 * padding - kw) // stride + 1
    if stride == 1:
        views = [
            xp[:, ky : ky + ho, kx : kx + wo]
            for ky in range(kh)
            for kx in range(kw)
        ]
    else:
        views = [
            _subsample2(xp[:, ky : ky + 2 * ho - 1, kx : kx + 2 * wo - 1])
            for ky in range(kh)
            for kx in range(kw)
        ]
    cols = jnp.concatenate(views, axis=-1)  # (B, ho, wo, k²·C)
    out = jnp.einsum(
        "bhwk,ko->bhwo", cols, kernel.reshape(kh * kw * ci, co),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def s2d_conv2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """k=3 stride-2 pad-1 conv via space-to-depth — exact.

    ``in (B,H,W,C) → blocks (B,H/2,W/2,4C)`` (2×2 pixel blocks in lanes),
    then ONE k=2 stride-1 conv with top/left-only padding whose kernel
    scatters the original taps by parity: output y reads input rows
    {2y-1, 2y, 2y+1} = block rows {y-1 (parity 1), y (parity 0 and 1)}, so
    tap ``dy`` maps to ``(du, py) ∈ {0:(0,1), 1:(1,0), 2:(1,1)}`` (same for
    x).  The contraction grows 3·3·C → 2·2·4C (27 → 48 useful lanes for RGB)
    and the conv input is C=4·C-channel — both relieve the K=3 MXU waste of
    the raw entry conv (measured ~25× off peak).  H, W must be even.
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    assert kernel.shape[:2] == (3, 3), kernel.shape
    co = kernel.shape[-1]
    xb = (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )
    pm = {(0, 1): 0, (1, 0): 1, (1, 1): 2}  # (block offset, parity) → tap
    k2 = jnp.zeros((2, 2, 4, c, co), kernel.dtype)
    for du in (0, 1):
        for py in (0, 1):
            dy = pm.get((du, py))
            if dy is None:
                continue
            for dv in (0, 1):
                for px in (0, 1):
                    dx = pm.get((dv, px))
                    if dx is None:
                        continue
                    k2 = k2.at[du, dv, py * 2 + px].set(kernel[dy, dx])
    k2 = k2.reshape(2, 2, 4 * c, co)
    y = jax.lax.conv_general_dilated(
        xb, k2.astype(xb.dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
