"""Pallas TPU 3×3 (optionally dilated) 2-D convolution, NHWC, stride 1.

Why: XLA's conv emitter runs the full-resolution refinement convs of the
PCW pipeline (RefineNetV3, KITTI12/models/pwcnet_ddim.py:251-306) at
~3.5 ms standalone / 5.4 ms in-program for 141 GFLOP whose MXU
speed-of-light is ~0.72 ms (v5e, 384×1248×128, bf16) — ~5-7× off peak,
independent of dilation (measured d ∈ {1, 2, 4, 16} all ≈ 3.5 ms).

Design: the fold-kernel flat-shift discipline in 2-D, on PLAIN NHWC
arrays — no lane packing, no pack/unpack boundary, so no custom-call
adjacency for XLA conv strategies to trip over:

  * the (rows+2d, W+2d, C) window is built from 2·ceil(d/th)+1 row-tile
    refs (dilation-d taps need d-row halos) + a zero column pad;
  * each (dy, dx) tap is ONE contiguous flat slice at offset
    ``(dy·d)·(W+2d) + dx·d`` — dilation only changes the shift, so d=16
    costs the same as d=1;
  * C_in pads to a 128 multiple for the 9 (M, C)·(C, Co) MXU dots; the f32
    accumulator adds bias in-kernel; BN/activation stay with XLA (cheap
    elementwise, freely fusible).

Out-of-range halo tiles are zeroed wholesale (their window rows coincide
exactly with the conv's zero padding).  Requires ``H % tile_h == 0`` and
``padding == dilation`` (the reference's 'same' dilated convs).

MEASURED VERDICT (r4, v5e, 384×1248×128 bf16, chained host-fetch timing):
3.99 ms (th=8; 5.27 at th=4, OOM at th=16, 5.51 with an arbitrary last
grid dim) vs XLA's 3.5 — NOT integrated.  Unlike the 3-D volumes, the
full-res 2-D conv leaves XLA only ~5× off MXU SOL and this formulation
pays ~50 µs/tile of unattributed per-grid-step overhead (the r3 "42 µs"
ghost), erasing the dot-level win.  Kept as an oracle-tested experiment;
the PCW refinement convs stay on XLA.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024,
    dimension_semantics=("parallel", "parallel"),
)


@functools.partial(
    jax.jit, static_argnames=("dilation", "tile_h", "interpret")
)
def conv2d_flat(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    dilation: int = 1,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """3×3 stride-1 pad-d dilation-d conv over ``(B, H, W, C)``.

    Numerically equal to ``lax.conv_general_dilated(x, kernel, (1, 1),
    [(d, d)] * 2, rhs_dilation=(d, d))`` (+ bias) with an f32 accumulator.
    """
    b, h, w, c = x.shape
    kh, kw, kc, co = kernel.shape
    assert (kh, kw, kc) == (3, 3, c), (kernel.shape, c)
    d = dilation
    th = tile_h
    assert h % th == 0, (h, th)
    n_tiles = h // th
    n_halo = -(-d // th)  # halo tiles per side
    wt = w + 2 * d
    c_pad = -(-c // 128) * 128
    m = th * wt

    kp = kernel.astype(x.dtype)
    if c_pad != c:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b2 = bias.astype(jnp.float32)[None]

    grid = (b, n_tiles)
    n_refs = 2 * n_halo + 1

    def tile_spec(dh):
        return pl.BlockSpec(
            (1, th, w, c),
            functools.partial(
                lambda bi, hi, dh: (
                    bi, jnp.clip(hi + dh, 0, n_tiles - 1), 0, 0
                ),
                dh=dh,
            ),
        )

    in_specs = [tile_spec(dh) for dh in range(-n_halo, n_halo + 1)]
    in_specs.append(pl.BlockSpec((3, 3, c_pad, co), lambda bi, hi: (0,) * 4))
    in_specs.append(pl.BlockSpec((1, co), lambda bi, hi: (0, 0)))

    def body(*args):
        *xs, w_ref, b_ref, o_ref = args
        hi = pl.program_id(1)

        rows = []
        for i, dh in enumerate(range(-n_halo, n_halo + 1)):
            r = xs[i][0]  # (th, w, c)
            if dh == 0:
                rows.append(r)
                continue
            # Zero out-of-range halo tiles — identical to the conv's zero
            # row padding (their taps read only pad rows).
            valid = ((hi + dh >= 0) & (hi + dh < n_tiles)).astype(r.dtype)
            rows.append(r * valid)
        win = jnp.concatenate(rows, axis=0)
        # Keep rows [n_halo·th − d, n_halo·th + th + d) of the stack.
        r0 = n_halo * th - d
        win = win[r0 : r0 + th + 2 * d]
        win = jnp.pad(win, ((0, 0), (d, d), (0, c_pad - c)))
        # +2d flat rows: the max tap shift (2d·wt + 2d) overruns the window
        # by 2d rows; the overrun feeds only cropped cols (x ≥ w).
        flat = jnp.pad(
            win.reshape((th + 2 * d) * wt, c_pad), ((0, 2 * d), (0, 0))
        )

        acc = jnp.zeros((m, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sh = dy * d * wt + dx * d
                acc += jnp.dot(
                    jax.lax.slice(flat, (sh, 0), (sh + m, c_pad)),
                    w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                )
        acc += b_ref[0]
        out = acc.reshape(th, wt, co)[:, :w]
        o_ref[0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, w, co), lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        interpret=interpret,
        compiler_params=_VMEM,
    )(*([x] * n_refs), kp, b2)
