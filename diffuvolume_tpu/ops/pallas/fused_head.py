"""Pallas TPU kernel: fused trilinear-upsample → softmax → soft-argmin head.

The reference's per-head tail (SceneFlow/models/acv_ddim.py:266-270) upsamples
quarter-resolution cost logits ``(B, 48, H/4, W/4)`` to a full ``(B, 192, H, W)``
volume, softmaxes over disparity, and reduces to an expected disparity — runs
once per DDIM step and materializes ~750 MB of HBM traffic per pass at
512×960.  This kernel never materializes the full volume: per output row it
blends the two source rows (VPU), lifts W and D with two small matmuls (MXU),
softmaxes in VMEM, and emits only the ``(B, H, W)`` disparity and the renewal
uncertainty ``Σ|d-d̂|·p`` (acv_ddim.py:325-329) — ~100× less HBM traffic.

Mosaic constraints shaped the design: every tensor op in the kernel body is
strictly 2-D (Mosaic cannot lower reshapes that merge a non-128-aligned lane
dim, which 3-D dot_generals require), and iota must be integer-typed.

Numerics match ops.regression.upsample_cost_and_regress +
ops.regression.disparity_uncertainty (same interpolation matrices, f32
softmax); parity-tested in tests/test_pallas_head.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffuvolume_tpu.ops.regression import _interp_matrix


_ROWS_PER_TILE = 8


def _make_kernel(h4: int, h: int, align_corners: bool, d_full: int):
    def kernel(cost_ref, mw_ref, md_ref, disp_ref, unc_ref):
        # cost: (1, D4, H4, W4); mw: (W4, W); md: (D, D4); outs: (1, 8, W)
        tile = pl.program_id(1)
        dvals = jax.lax.broadcasted_iota(jnp.int32, (d_full, 1), 0).astype(jnp.float32)
        for r in range(_ROWS_PER_TILE):  # static unroll; every op is 2-D
            y = tile * _ROWS_PER_TILE + r
            yf = y.astype(jnp.float32)
            if align_corners:
                src = yf * ((h4 - 1) / max(h - 1, 1))
            else:
                src = (yf + 0.5) * (h4 / h) - 0.5
            src = jnp.clip(src, 0.0, h4 - 1.0)
            h0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, max(h4 - 2, 0))
            wh = src - h0.astype(jnp.float32)

            top = cost_ref[0, :, h0, :]          # (D4, W4)
            bot = cost_ref[0, :, jnp.minimum(h0 + 1, h4 - 1), :]
            c48q = top * (1.0 - wh) + bot * wh   # (D4, W4)

            c48 = jax.lax.dot_general(            # W-interp on the MXU
                c48q, mw_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (D4, W)
            c_full = jax.lax.dot_general(         # D-interp on the MXU
                md_ref[:], c48,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (D, W)

            m = jnp.max(c_full, axis=0, keepdims=True)
            e = jnp.exp(c_full - m)
            z = jnp.sum(e, axis=0, keepdims=True)  # (1, W)
            disp = jnp.sum(e * dvals, axis=0, keepdims=True) / z  # (1, W)
            unc = jnp.sum(e * jnp.abs(dvals - disp), axis=0, keepdims=True) / z
            disp_ref[0, r, :] = disp[0]
            unc_ref[0, r, :] = unc[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_disp", "out_hw", "align_corners", "interpret")
)
def fused_upsample_softargmin(
    cost: jax.Array,
    max_disp: int,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused trilinear-upsample + softmax + expectation + uncertainty.

    Args:
      cost: ``(B, D4, H4, W4)`` quarter-resolution logits (channel squeezed).
      max_disp: full-resolution disparity count (D = 192).
      out_hw: output ``(H, W)``.
      align_corners: interpolation convention (False for SceneFlow, True for
        KITTI12/15 heads).
      interpret: force Pallas interpreter mode (defaults to True off-TPU so
        tests run on CPU).

    Returns:
      ``(disp (B, H, W), uncertainty (B, H, W))``, both f32.
    """
    b, d4, h4, w4 = cost.shape
    h, w = out_hw
    if interpret is None:
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        interpret = not is_tpu_lowering()

    mw = jnp.asarray(_interp_matrix(w4, w, align_corners)).T      # (W4, W)
    md = jnp.asarray(_interp_matrix(d4, max_disp, align_corners))  # (D, D4)

    tr = _ROWS_PER_TILE
    assert h % tr == 0, (h, tr)
    grid = (b, h // tr)
    kernel = _make_kernel(h4, h, align_corners, max_disp)

    disp, unc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d4, h4, w4), lambda bi, y: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w4, w), lambda bi, y: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max_disp, d4), lambda bi, y: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr, w), lambda bi, y: (bi, y, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, w), lambda bi, y: (bi, y, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (d4 * w4 * w + max_disp * d4 * w),
            bytes_accessed=b * (d4 * h4 * w4 * 4 + 2 * h * w * 4),
            transcendentals=b * h * w * max_disp,
        ),
        interpret=interpret,
    )(cost, mw, md)
    return disp, unc


def _make_unc_kernel(h4: int, h: int, align_corners: bool, d_full: int):
    def kernel(cost_ref, mw_ref, md_ref, q_ref, unc_ref):
        # cost: (1, D4, H4, W4); q: (1, 8, W) query disparity; out: (1, 8, W)
        tile = pl.program_id(1)
        dvals = jax.lax.broadcasted_iota(jnp.int32, (d_full, 1), 0).astype(jnp.float32)
        for r in range(_ROWS_PER_TILE):
            y = tile * _ROWS_PER_TILE + r
            yf = y.astype(jnp.float32)
            if align_corners:
                src = yf * ((h4 - 1) / max(h - 1, 1))
            else:
                src = (yf + 0.5) * (h4 / h) - 0.5
            src = jnp.clip(src, 0.0, h4 - 1.0)
            h0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, max(h4 - 2, 0))
            wh = src - h0.astype(jnp.float32)

            top = cost_ref[0, :, h0, :]
            bot = cost_ref[0, :, jnp.minimum(h0 + 1, h4 - 1), :]
            c48q = top * (1.0 - wh) + bot * wh

            c48 = jax.lax.dot_general(
                c48q, mw_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            c_full = jax.lax.dot_general(
                md_ref[:], c48,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

            m = jnp.max(c_full, axis=0, keepdims=True)
            e = jnp.exp(c_full - m)
            z = jnp.sum(e, axis=0, keepdims=True)
            q = q_ref[0, r, :][None]  # (1, W)
            unc = jnp.sum(e * jnp.abs(dvals - q), axis=0, keepdims=True) / z
            unc_ref[0, r, :] = unc[0]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_disp", "out_hw", "align_corners", "interpret")
)
def fused_uncertainty_at(
    cost: jax.Array,
    query: jax.Array,
    max_disp: int,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Renewal uncertainty ``Σ p(d)·|d − q|`` of the upsampled softmax volume
    evaluated at an ARBITRARY query disparity field ``q``.

    The reference's KITTI12 renewal scores uncertainty against the REFINED
    disparity (``score = |disp_finetune − d|·pred3_volume``,
    KITTI12/models/pwcnet_ddim.py:554-559), which is only available after the
    refinement net has consumed the head's pred3 — so it cannot be fused into
    the first head pass.  This second pass re-runs the same
    upsample+softmax pipeline (never materializing the full volume) with the
    query read per row.

    Args:
      cost: ``(B, D4, H4, W4)`` quarter-resolution logits.
      query: ``(B, H, W)`` disparity to score against (e.g. disp_finetune).
      max_disp / out_hw / align_corners: as fused_upsample_softargmin.

    Returns:
      ``(B, H, W)`` f32 uncertainty.
    """
    b, d4, h4, w4 = cost.shape
    h, w = out_hw
    if interpret is None:
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        interpret = not is_tpu_lowering()

    mw = jnp.asarray(_interp_matrix(w4, w, align_corners)).T
    md = jnp.asarray(_interp_matrix(d4, max_disp, align_corners))

    tr = _ROWS_PER_TILE
    assert h % tr == 0, (h, tr)
    grid = (b, h // tr)
    kernel = _make_unc_kernel(h4, h, align_corners, max_disp)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d4, h4, w4), lambda bi, y: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w4, w), lambda bi, y: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max_disp, d4), lambda bi, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, w), lambda bi, y: (bi, y, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w), lambda bi, y: (bi, y, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (d4 * w4 * w + max_disp * d4 * w),
            bytes_accessed=b * (d4 * h4 * w4 * 4 + 2 * h * w * 4),
            transcendentals=b * h * w * max_disp,
        ),
        interpret=interpret,
    )(cost.astype(jnp.float32), mw, md, query.astype(jnp.float32))
