"""Pallas TPU kernel: group-wise correlation cost-volume builder.

The XLA path (ops.cost_volume.build_gwc_volume) emits 48 shifted slice+pad+
stack ops; this kernel builds each (b, h) scanline's full (D, W, G) slab in
one VMEM-resident pass: per shift d the right row is rolled (VPU), multiplied
into the left row, and group-meaned via a block-diagonal (C, G) matmul (MXU) —
one HBM write of exactly the output volume.

Mosaic constraints: all 2-D ops; the (W, C)·(C, G) group-mean matmul keeps
lanes aligned; rolls along the sublane (W) axis.

Parity-tested against the XLA builder in tests/test_pallas_gwc.py (exact,
2e-7 on real TPU).  MEASUREMENT (v5e, 1×128×240×320, D=48, G=40): this kernel
runs 7.2 ms vs XLA's 4.2 ms — the G=40 output lane dim pads to 128 (3.2×
VMEM/store waste) and caps the per-cell tile at one scanline, so the XLA
builder remains the default in ops.cost_volume; the op is ~1% of pipeline
time either way.  Kept as the reference Pallas formulation (roll + block-
diagonal matmul) for shapes with lane-aligned group counts, where it wins.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Output block per grid cell is (D, ROWS, W, G) floats, double-buffered, and
# the G=40 lane dim pads to 128 — ROWS=1 is the largest that fits VMEM at the
# SceneFlow eval shape (48×1×240×128pad×4 B ≈ 5.9 MB ×2).
_ROWS = 1


def _make_kernel(max_disp: int, w: int, rows: int):
    def kernel(left_ref, right_ref, pmat_ref, out_ref):
        # left/right: (1, ROWS, W, C); pmat: (C, G); out: (1, D, ROWS, W, G)
        c = left_ref.shape[-1]
        l = left_ref[0].reshape(rows * w, c)   # sublane-merge (contiguous)
        r = right_ref[0].reshape(rows * w, c)
        # per-position scanline index (w coordinate within each row)
        widx = jax.lax.broadcasted_iota(jnp.int32, (rows * w, 1), 0) % w
        for d in range(max_disp):  # static unroll
            # roll across the stacked rows: within-row shift is correct for
            # w >= d; the cross-row contamination lands exactly in the
            # masked w < d region.
            shifted = pltpu.roll(r, shift=d, axis=0) if d else r
            prod = l * shifted
            corr = jax.lax.dot_general(  # group mean on the MXU
                prod, pmat_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (ROWS*W, G)
            corr = jnp.where(widx >= d, corr, 0.0)
            out_ref[0, d] = corr.reshape(rows, w, -1).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_disp", "num_groups", "interpret")
)
def gwc_volume_pallas(
    left: jax.Array,
    right: jax.Array,
    max_disp: int,
    num_groups: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Group-wise correlation volume ``(B, D, H, W, G)`` (channels-last).

    Semantics identical to ops.cost_volume.build_gwc_volume
    (SceneFlow/models/submodule.py:228-238).

    Args:
      left, right: ``(B, H, W, C)`` feature maps.
      max_disp: shifts ``D``.
      num_groups: correlation groups ``G``.
    """
    b, h, w, c = left.shape
    assert c % num_groups == 0
    cpg = c // num_groups
    if interpret is None:
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        interpret = not is_tpu_lowering()

    # Block-diagonal group-mean projection (C, G).
    p = np.zeros((c, num_groups), np.float32)
    for g in range(num_groups):
        p[g * cpg : (g + 1) * cpg, g] = 1.0 / cpg
    pmat = jnp.asarray(p)

    rows = _ROWS if h % _ROWS == 0 else 1
    kernel = _make_kernel(max_disp, w, rows)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, rows, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, max_disp, rows, w, num_groups), lambda bi, hi: (bi, 0, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, max_disp, h, w, num_groups), left.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * max_disp * w * c,
            bytes_accessed=b * h * w * c * 4 * 2
            + b * max_disp * h * w * num_groups * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(left, right, pmat)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("max_disp", "num_groups", "tile_h", "interpret", "c_slot",
                     "mask_ref"),
)
def gwc_volume_packed(
    left: jax.Array,
    right: jax.Array,
    max_disp: int,
    num_groups: int,
    tile_h: int = 8,
    interpret: bool = False,
    c_slot: int | None = None,
    cat_l: jax.Array | None = None,
    cat_r: jax.Array | None = None,
    mask_ref: bool = False,
) -> jax.Array:
    """Group-wise correlation volume built DIRECTLY in the packed-padded
    lane geometry (r4, for the IGEV packed GEV tower).

    Output: ``(B, cells+2, (n_tiles+2)·th, wp, 128)`` with lanes = p phases
    × G groups (``p = 128 // G``) — exactly ``pack_padded_k(build_gwc_volume
    (l, r, D, G), th)``, without ever materializing the (B, D, H, W, G)
    volume in HBM or running its 48 shifted slice/pad/stack XLA ops
    (2.5 ms at IGEV's 384×1248 encode, G=8 lanes 16× padded).

    The grid runs 8-row sub-programs writing into the th-tiled output
    (``tile_h`` may exceed the program row count: the first attempt ran one
    program per 16-row tile and blew scoped VMEM at 73.9 MB — the D
    shifted-product temporaries scale with program rows).  Shifts are
    static slice-concats (Mosaic's rotate op rejects non-32-bit data);
    per-shift group-mean via a block-diagonal (C, G) matmul.
    """
    b, h, w, c = left.shape
    g = num_groups
    # c_slot (r5): place G real channels in c_slot-lane slots, zero-filling
    # the pad lanes — the ACV attention branch packs its G=40 gwc volume
    # into 64-lane slots (p=2) so the packed patch/x2 chain consumes it
    # directly (the XLA gwc build + separate c_slot pack measured
    # 20.2 + 3.3 ms/prep once layout-poisoned by the custom-call consumer).
    # cat_l/cat_r (r5, PCW): fuse the concat-volume halves into the slot —
    # lanes per phase = [gwc G | cat_l cc | cat_r(shifted) cc | zero pad],
    # matching jnp.concatenate([gwc, build_concat_volume(cat_l, cat_r,
    # mask_ref=...)], -1) (models/pcw.py::build_cost_volume's v1..v3).
    cc = 0 if cat_l is None else cat_l.shape[-1]
    slot = g if c_slot is None else c_slot
    p = 128 // slot
    assert slot * p == 128 and max_disp % p == 0 and slot >= g + 2 * cc, (
        g, cc, slot)
    cells = max_disp // p
    th = tile_h
    # Wide-C inputs (ACV: C=320) blow the scoped-VMEM stack at hk=8 rows
    # (74.3 MB measured vs the 64 MB limit — the 48 shifted (m, C)
    # temporaries scale with program rows); halve the sub-program rows.
    hk = min(th, 8 if c <= 128 else 4)
    s_split = th // hk
    assert h % th == 0 and th % hk == 0, (h, th)
    n_tiles = h // th
    wp = -(-(w + 2) // 8) * 8
    cpg = c // g
    assert cpg * g == c, (c, g)

    corr_w = slot if cc == 0 else g
    pm = np.zeros((c, corr_w), np.float32)
    for gi in range(g):
        pm[gi * cpg : (gi + 1) * cpg, gi] = 1.0 / cpg
    pmat = jnp.asarray(pm, left.dtype)

    n_hk = h // hk
    grid = (b, (n_tiles + 2) * s_split)

    def io_spec(ch):
        return pl.BlockSpec(
            (1, hk, w, ch),
            lambda bi, gi: (bi, jnp.clip(gi - s_split, 0, n_hk - 1), 0, 0),
        )

    inputs = [left, right, pmat]
    in_specs = [
        io_spec(c), io_spec(c),
        pl.BlockSpec((c, corr_w), lambda bi, gi: (0, 0)),
    ]
    if cc:
        inputs += [cat_l, cat_r]
        in_specs += [io_spec(cc), io_spec(cc)]

    def body(*args):
        if cc:
            l_ref, r_ref, p_ref, kl_ref, kr_ref, o_ref = args
        else:
            l_ref, r_ref, p_ref, o_ref = args
        gi = pl.program_id(1)
        interior = (gi >= s_split) & (gi < s_split + n_hk)
        m = hk * w
        l = l_ref[0].reshape(m, c)
        r = r_ref[0].reshape(m, c)
        if cc:
            kl = kl_ref[0].reshape(m, cc)
            kr = kr_ref[0].reshape(m, cc)
        colv = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w
        scale = jnp.where(interior, 1.0, 0.0)
        for cell in range(cells):
            pieces = []
            for phi in range(p):
                d = cell * p + phi
                # Static slice-concat shift along the flattened (row, col)
                # axis: within-row shift is correct for col >= d; the
                # cross-row wrap lands in the masked col < d region.
                shifted = (
                    jnp.concatenate([r[m - d :], r[: m - d]], axis=0)
                    if d
                    else r
                )
                corr = jax.lax.dot_general(
                    l * shifted, p_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (m, corr_w)
                piece = jnp.where(colv >= d, corr, 0.0).astype(o_ref.dtype)
                if cc:
                    krs = (
                        jnp.concatenate([kr[m - d :], kr[: m - d]], axis=0)
                        if d
                        else kr
                    )
                    krs = jnp.where(colv >= d, krs, 0.0)
                    klm = jnp.where(colv >= d, kl, 0.0) if mask_ref else kl
                    piece = jnp.concatenate(
                        [piece, klm.astype(piece.dtype),
                         krs.astype(piece.dtype)], axis=-1)
                    if slot > g + 2 * cc:
                        piece = jnp.pad(
                            piece, ((0, 0), (0, slot - g - 2 * cc)))
                pieces.append(piece)
            tile = jnp.concatenate(pieces, axis=-1).reshape(hk, w, 128)
            tile = jnp.pad(tile, ((0, 0), (1, wp - w - 1), (0, 0)))
            o_ref[0, cell + 1] = tile * scale.astype(o_ref.dtype)
        zero = jnp.zeros((hk, wp, 128), o_ref.dtype)
        o_ref[0, 0] = zero
        o_ref[0, cells + 1] = zero

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, cells + 2, hk, wp, 128), lambda bi, gi: (bi, 0, gi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells + 2, (n_tiles + 2) * th, wp, 128), left.dtype
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # 80 MB: the PCW v1 shape (96,312,320 + 12-ch cat refs, hk=4)
            # measured a 65.6 MB stack — 1.6 MB over the family's 64 MB.
            vmem_limit_bytes=80 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*inputs)
