"""Pallas packed 3×3×3 convolution for small-channel 4D cost volumes.

Why: XLA's TPU lowering of ``conv3d`` materializes the im2col patches in HBM
(measured ~2.5 GB traffic and ~2 TF/s for a C=32 conv at (48,128,240) on
v5e — ~18× off speed-of-light), and a C=32 contraction uses 32/128 MXU lanes
on both operands.  These convolutions are the dominant cost of the DiffuVolume
aggregation networks (SceneFlow/models/acv_ddim.py:452-455 hourglasses run
once per DDIM step).

Design (TPU-first, not a translation):
  * **Lane packing**: the volume is repacked ``(B, D, H, W, C) →
    (B, D/P, H, W, P·C=128)`` with ``P = 128//C`` so both matmul operand minor
    dims are full 128 lanes.
  * **D-halos without overlapping blocks**: each program reads the packed
    cells ``d-1, d, d+1`` (three BlockSpecs over the same array).  The 27
    conv taps fold into a **block-banded weight matrix** per relative cell:
    for output phase ``φo`` and tap ``dz``, the providing (cell ``a``, phase
    ``φi``) satisfies ``P·a + φi = φo + dz - 1``; all other weight blocks are
    zero.  No lane slicing, no shifted copies of the input.
  * **Flat-shift taps**: H and W carry +1 halos and outputs are computed in
    *padded* coordinates, so every (dy, dx) tap is a contiguous row-offset
    slice ``flat[dy·Wp + dx :][:M]`` of one flattened ``(rows, 128)`` window —
    no per-tap reshapes.  Row wrap-around only contaminates the padded output
    columns, which are dropped on the host.
  * **Fused epilogue**: bias-add (tiled across phases) and activation
    (ReLU / LeakyReLU / Mish) run on the f32 accumulator in VMEM; inference
    BatchNorm is folded by the caller; an optional ``post_mul`` operand
    applies a broadcast-over-D attention map (tile_packed_mul).

Round-4 device measurements (v5e, per call at the 512×960 ACV bench shapes
unless noted; full-program DDIM-scan trace, ÷5 steps):

  * conv3d_fold_p (48,128,240,32) th=8: 1.79 ms — at its r3 standalone
    number INSIDE lax.scan (no in-loop serialization; the r3 "42 µs/tile"
    was the strided-gather cost below, not scheduling).
  * conv3d_fold_s2 full-res: 9.53 → 1.47 ms after the lane-merge rewrite —
    the original per-tap parity views ``[.., 2, lw][:, :, 0]`` were
    sublane-STRIDED gathers (~1.8 MB strided copies/tile).  The rewrite
    pads the band to a 128-multiple, merges column pairs into lanes
    (aligned reshape), and taps become flat-row shifts + aligned lane
    slices.
  * conv3d_fold_up half→full: 1.58 → 1.02 ms with the same flat-shift
    discipline + lane-concat column interleave + outer-dim row interleave.
  * conv3d_fold_x2: 3.24 ms (matched budget from day one).
  * pack_padded_k with the fused noise multiply: 1.14 ms, replacing the
    0.85 pack + 1.15 XLA broadcast-multiply pair.
  * Whole packed ACV denoise step: 56 → 31.7 ms measured (module path 49);
    flagship bench 2.59 → 3.45 pairs/s.

Mosaic constraints learned (all device-compile-only failures — local
``.lower()`` does NOT catch them): no zero-size vectors; ``[..., None]``
minor-dim inserts only on 32-bit types; rotate only on 32-bit; reshapes
merging a non-128-multiple lane dim need 8-aligned sublane counts (pad the
band); output-block lane dims must be ≥128 or full; default scoped-VMEM
budget is 16 MB (vmem_limit_bytes pins 64 MB here — fold_s2 th=8 measured
16.18M and compiled-or-OOMed depending on scheduling noise).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The packed-family kernels at tile_h=8 sit right at Mosaic's default 16 MB
# scoped-VMEM budget (conv3d_fold_s2 measured 16.18 M — the bench compiled,
# the byte-identical trace program OOMed; compile-to-compile marginal).
# v5e has 128 MB of VMEM; raise the per-kernel budget well clear of the edge.
#
# dimension_semantics: every kernel in this file writes each output tile
# exactly once from its own (b, cell, h-tile) program — no cross-iteration
# carry — so all grid dims are "parallel".  Without the declaration Mosaic
# schedules the grid as a strict sequence ("arbitrary"), which matches the
# r3 in-loop observation of ~42 µs/grid-step wall vs ~5 µs compute+DMA
# bounds (per-step serialization).
_VMEM_LIMIT = pltpu.CompilerParams(
    vmem_limit_bytes=64 * 1024 * 1024,
    dimension_semantics=("parallel", "parallel", "parallel"),
)


def _apply_act(acc, relu, leaky, mish):
    """Fold-kernel activation epilogue on the f32 accumulator.

    mish(x) = x·tanh(softplus(x)) via the (1+eˣ)² identity — one exp
    instead of exp+log1p+tanh on the VPU; x>20 passes through (tanh
    saturated), which also guards the exp overflow.
    """
    if relu:
        return jnp.maximum(acc, 0.0)
    if mish:
        z = jnp.exp(jnp.minimum(acc, 20.0))
        t = (1.0 + z) * (1.0 + z)
        return jnp.where(acc > 20.0, acc, acc * (t - 1.0) / (t + 1.0))
    if leaky is not None:
        return jnp.where(acc > 0.0, acc, leaky * acc)
    return acc


def _pack(x: jax.Array, p: int) -> jax.Array:
    """(B, D, H, W, C) → (B, D/p, H, W, p·C)."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d // p, p, h, w, c).transpose(0, 1, 3, 4, 2, 5).reshape(
        b, d // p, h, w, p * c
    )


def _banded_weights(k3: jax.Array, p: int) -> jax.Array:
    """(3,3,3,C,Co) → (3 cells, 3, 3, p·C, p·Co) block-banded matrix.

    ``out[a, dy, dx, φi·C+ci, φo·Co+co] = k3[dz, dy, dx, ci, co]`` where
    ``φo + dz - 1 = p·(a-1) + φi``.
    """
    c, co = k3.shape[3], k3.shape[4]
    out = jnp.zeros((3, 3, 3, p * c, p * co), k3.dtype)
    for phi_o in range(p):
        for dz in range(3):
            rel = phi_o + dz - 1
            a, phi_i = (0, p - 1) if rel == -1 else (2, 0) if rel == p else (1, rel)
            out = out.at[
                a, :, :, phi_i * c : (phi_i + 1) * c, phi_o * co : (phi_o + 1) * co
            ].add(k3[dz])
    return out


@functools.partial(jax.jit, static_argnames=("relu", "tile_h", "interpret"))
def conv3d_packed(
    x: jax.Array,
    k3: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """3×3×3 stride-1 pad-1 conv over ``(B, D, H, W, C)``, channels-last.

    Numerically equal to ``lax.conv_general_dilated(..., NDHWC)`` with an f32
    accumulator; optional fused bias + ReLU.

    Requirements: ``C ∈ {8, 16, 32, 64, 128}``, ``D % (128//C) == 0``.
    """
    b, d, h, w, c = x.shape
    co = k3.shape[-1]
    assert k3.shape[:4] == (3, 3, 3, c), k3.shape
    p = 128 // c
    assert c * p == 128 and d % p == 0, (c, d)
    n_lanes = p * co
    th = tile_h
    n_tiles = -(-h // th)
    wp = w + 2
    cells = d // p

    pk = _pack(x, p)
    # D: +1 pad cell each side (the conv's zero slices); H: one zero tile each
    # side (halo rows for the first/last output tiles) + round up to tiles;
    # W: +1 halo column each side.
    pk = jnp.pad(
        pk,
        ((0, 0), (1, 1), (th, th + n_tiles * th - h), (1, 1), (0, 0)),
    )

    wb = _banded_weights(k3, p).astype(x.dtype)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (p,))[None]  # (1, p·Co)

    grid = (b, cells, n_tiles)
    # Each program needs a (th+2)-row window, which spans two adjacent th-row
    # blocks; Pallas blocks cannot overlap, so the same array is passed 9×
    # (3 relative cells × 3 relative h-tiles) and the window is concatenated
    # in-kernel from 1 + th + 1 rows.  Output tile hi lives at padded tile
    # hi+1, so its h-tile refs are padded tiles hi, hi+1, hi+2.
    def cell_spec(dc, dh):
        return pl.BlockSpec(
            (1, 1, th, wp, 128),
            functools.partial(
                lambda bi, di, hi, dc, dh: (bi, di + dc, hi + dh, 0, 0), dc=dc, dh=dh
            ),
        )

    in_specs = [cell_spec(dc, dh) for dc in range(3) for dh in range(3)]
    in_specs.append(pl.BlockSpec((3, 3, 3, 128, n_lanes), lambda bi, di, hi: (0,) * 5))
    in_specs.append(pl.BlockSpec((1, n_lanes), lambda bi, di, hi: (0, 0)))

    def body(*args):
        *xs, w_ref, b_ref, o_ref = args
        _kernel3(xs, w_ref, b_ref, o_ref, th=th, wp=wp, n_lanes=n_lanes, relu=relu)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, n_lanes), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells, n_tiles * th, wp, n_lanes), x.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*[pk] * 9, wb, b_tiled)

    # Out (y, x) is the conv centered at padded (y+1, x+1): cols 0..w-1 are the
    # real output; cols w, w+1 absorbed the flat-shift wrap-around — drop them.
    out = out[:, :, :h, :w]
    # unpack (B, D/p, H, W, p·Co) → (B, D, H, W, Co)
    return (
        out.reshape(b, cells, h, w, p, co)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b, d, h, w, co)
    )


def _kernel3(xs, w_ref, b_ref, o_ref, *, th, wp, n_lanes, relu):
    """xs = 9 refs: (cell −1,0,+1) × (h-tile −1, 0, +1), blocks (1,1,th,wp,128).

    The (th+2)-row window for (cell a, output tile) is the last row of the
    previous h-tile block, the current block, and the first row of the next —
    one concat per cell, then 9 contiguous flat-shift matmuls.
    """
    m = th * wp
    acc = jnp.zeros((m, n_lanes), jnp.float32)
    for a in range(3):
        prev, cur, nxt = xs[3 * a], xs[3 * a + 1], xs[3 * a + 2]
        # th+3 rows: 1 halo above, th rows, 2 below (the extra row feeds the
        # flat-shift wrap of the two dropped output columns).
        win = jnp.concatenate(
            [prev[0, 0, th - 1 : th], cur[0, 0], nxt[0, 0, 0:2]], axis=0
        )  # (th+3, wp, 128)
        flat = win.reshape((th + 3) * wp, win.shape[-1])
        for dy in range(3):
            for dx in range(3):
                shift = dy * wp + dx
                acc += jnp.dot(
                    flat[shift : shift + m],
                    w_ref[a, dy, dx],
                    preferred_element_type=jnp.float32,
                )
    acc += b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0, 0] = acc.reshape(th, wp, n_lanes).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# v2 "fold" kernel: phase-halo lanes + aligned row strides
# ---------------------------------------------------------------------------
#
# The v1 kernel above is VPU-bound: its 27 flat-shift operands are unaligned
# row slices (wp = w+2 is not a sublane multiple), each materialized as a
# rotated copy, and its block-banded weights are only 25%-dense for C=32
# (4x wasted MXU work).  v2 restructures the contraction:
#
#   * The packed-phase axis is widened IN LANES with a 1-phase halo from the
#     neighbor cells: window lanes = (P+2)*C.  The dz taps then fold into a
#     *dense-banded* (3*(P+2)*C, P*Co) weight whose density is 3P/(3(P+2)) =
#     50% for C=32 (2x waste, half of v1), 75% for C=64, 100% for C=128.
#   * W is padded so wp % 8 == 0: the dy taps become *aligned* row offsets of
#     the flattened window -- free views, no rotate.
#   * Only the dx in {1,2} taps are genuinely unaligned; they are built once
#     per tile by lane-concatenating 3 row-shifted flats into one (M, 3*LW)
#     operand (fold_dx=True, 3 dots/tile) or left as 9 K=(P+2)*C dots
#     (fold_dx=False; Mosaic materializes the rotated operands).
#
# Measured at (48,128,240) C=32 bf16 on v5e (in-fori_loop; see CLAUDE.md on
# why standalone timings inflate): XLA conv 33 ms, v2 5.1 ms — but the
# in-PROGRAM XLA conv is ~5 ms, so v2 stays opt-in at C=32 (see
# layers._pallas_conv3d_version).  At C=8/16 v2 wins 10-30× in-program
# (IGEV corr_stem 2.9 → 0.3 ms/model) and is the default there.
# fold_dx=True hits a Mosaic limit on real TPUs (non-128-multiple lane
# concat: "result/input offset mismatch on non-concat dimension") and is
# interpret-only; tile_h > 8 exceeds the 16 MB VMEM scoped limit.


def _banded_weights_fold(k3: jax.Array, p: int) -> jax.Array:
    """(3,3,3,C,Co) → (3 dy, 3 dx, (p+2)·C, p·Co) dense-banded weights.

    ``out[dy, dx, (δ+1)·C+ci, φ·Co+co] = k3[δ-φ+1, dy, dx, ci, co]`` for
    ``0 ≤ δ-φ+1 < 3`` (δ ∈ [-1, p] is the phase offset within the lane-haloed
    window; φ is the output phase).
    """
    c, co = k3.shape[3], k3.shape[4]
    out = jnp.zeros((3, 3, (p + 2) * c, p * co), k3.dtype)
    for phi in range(p):
        for dz in range(3):
            delta = phi + dz - 1
            out = out.at[
                :, :, (delta + 1) * c : (delta + 2) * c, phi * co : (phi + 1) * co
            ].add(k3[dz])
    return out


@functools.partial(
    jax.jit, static_argnames=("relu", "tile_h", "interpret", "fold_dx",
                              "hoist_dx")
)
def conv3d_fold(
    x: jax.Array,
    k3: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    tile_h: int = 8,
    interpret: bool = False,
    fold_dx: bool = False,
    hoist_dx: bool = False,
) -> jax.Array:
    """3×3×3 stride-1 pad-1 conv over ``(B, D, H, W, C)`` — v2 fold kernel.

    Numerically equal to ``lax.conv_general_dilated(..., NDHWC)`` with an f32
    accumulator; optional fused bias + ReLU.  Requirements: ``C ∈ {8, 16, 32,
    64, 128}``, ``D % (128//C) == 0``.
    """
    b, d, h, w, c = x.shape
    co = k3.shape[-1]
    assert k3.shape[:4] == (3, 3, 3, c), k3.shape
    p = 128 // c
    assert c * p == 128 and d % p == 0, (c, d)
    if co < c:
        # Pad the output channels so the matmul N dim stays ≥128 lanes (e.g.
        # the IGEV classifier's 8→1 head); sliced off after the unpack.
        k3 = jnp.pad(k3, ((0, 0),) * 4 + ((0, c - co),))
        if bias is not None:
            bias = jnp.pad(bias, (0, c - co))
        co_real, co = co, c
    else:
        co_real = co
    lw = (p + 2) * c          # window lanes (phase halo)
    n_lanes = p * co
    th = tile_h
    n_tiles = -(-h // th)
    wp = -(-(w + 2) // 8) * 8  # halo + round to sublane multiple (aligned dy)
    cells = d // p

    pk = _pack(x, p)
    pk = jnp.pad(
        pk,
        ((0, 0), (1, 1), (th, th + n_tiles * th - h), (1, wp - w - 1), (0, 0)),
    )

    wb = _banded_weights_fold(k3, p).astype(x.dtype)
    if fold_dx:
        # (dy, dx, lw, n) → (dy, dx·lw, n): lane order matches the
        # dx-concatenated operand built in-kernel.
        wb = wb.reshape(3, 3 * lw, n_lanes)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (p,))[None]  # (1, p·Co)

    grid = (b, cells, n_tiles)

    def cell_spec(dc, dh):
        return pl.BlockSpec(
            (1, 1, th, wp, 128),
            functools.partial(
                lambda bi, di, hi, dc, dh: (bi, di + dc, hi + dh, 0, 0), dc=dc, dh=dh
            ),
        )

    in_specs = [cell_spec(dc, dh) for dc in range(3) for dh in range(3)]
    in_specs.append(
        pl.BlockSpec(
            (3, 3 * lw, n_lanes) if fold_dx else (3, 3, lw, n_lanes),
            (lambda bi, di, hi: (0,) * 3) if fold_dx else (lambda bi, di, hi: (0,) * 4),
        )
    )
    in_specs.append(pl.BlockSpec((1, n_lanes), lambda bi, di, hi: (0, 0)))

    def body(*args):
        *xs, w_ref, b_ref, o_ref = args
        m = th * wp

        def rows(prev, cur, nxt):
            # (th+3, wp, 128): 1 halo row above, th rows, 2 below (the extra
            # row feeds the flat-shift wrap of the dropped output columns).
            return jnp.concatenate(
                [prev[0, 0, th - 1 : th], cur[0, 0], nxt[0, 0, 0:2]], axis=0
            )

        wm1 = rows(xs[0], xs[1], xs[2])[..., 128 - c :]
        w0 = rows(xs[3], xs[4], xs[5])
        wp1 = rows(xs[6], xs[7], xs[8])[..., :c]
        win = jnp.concatenate([wm1, w0, wp1], axis=-1)  # (th+3, wp, lw)
        flat = win.reshape((th + 3) * wp, lw)

        acc = jnp.zeros((m, n_lanes), jnp.float32)
        if fold_dx:
            m2 = (th + 2) * wp  # rows reachable by dy·wp + m (dy ≤ 2)
            a = jnp.concatenate(
                [flat[0:m2], flat[1 : m2 + 1], flat[2 : m2 + 2]], axis=1
            )  # (m2, 3·lw)
            for dy in range(3):
                acc += jnp.dot(
                    a[dy * wp : dy * wp + m],
                    w_ref[dy],
                    preferred_element_type=jnp.float32,
                )
        elif hoist_dx:
            # Materialize the two unaligned dx-rotations ONCE ((th+2)·wp rows
            # each) instead of once per dy (the v2 form rotated 6 of its 9
            # operands); the dy offsets (dy·wp, wp % 8 == 0) are then aligned
            # free views into the rotated buffers.
            m2 = (th + 2) * wp
            shifted = [flat[dx : dx + m2] for dx in range(3)]
            for dy in range(3):
                for dx in range(3):
                    acc += jnp.dot(
                        shifted[dx][dy * wp : dy * wp + m],
                        w_ref[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
        else:
            for dy in range(3):
                for dx in range(3):
                    shift = dy * wp + dx
                    acc += jnp.dot(
                        flat[shift : shift + m],
                        w_ref[dy, dx],
                        preferred_element_type=jnp.float32,
                    )
        acc += b_ref[0].astype(jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        o_ref[0, 0] = acc.reshape(th, wp, n_lanes).astype(o_ref.dtype)

    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, n_lanes), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells, n_tiles * th, wp, n_lanes), x.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*[pk] * 9, wb, b_tiled)

    # Out (y, x) is the conv centered at padded (y+1, x+1): cols 0..w-1 are
    # real; cols ≥ w absorbed the halo/flat-shift wrap — drop them.
    out = out[:, :, :h, :w]
    out = (
        out.reshape(b, cells, h, w, p, co)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b, d, h, w, co)
    )
    return out[..., :co_real]


# ---------------------------------------------------------------------------
# v3 "chain" kernel: packed-persistent, self-padding
# ---------------------------------------------------------------------------
#
# Device-trace finding (r3): the v2 fold kernel's custom-call costs 1.24 ms at
# (48,128,240,32) — 2× faster than the in-program XLA conv (2.5 ms) — but the
# per-call wrapper (lane pack 8-D transposes + host-side pads + unpack) costs
# another ~4 ms, which is why forcing v2 inside the model REGRESSED.  v3 keeps
# the volume in the packed+padded geometry ACROSS consecutive convolutions:
#   * `pack_padded` runs ONCE per tower: (B,D,H,W,C) →
#     (B, cells+2, (tiles+2)·th, wp, 128) with zero halo cells/tiles/columns.
#   * `conv3d_fold_p` consumes AND produces that geometry: border blocks are
#     written as zeros in-kernel and interior outputs are masked outside the
#     real (h, w) region, so NO host-side re-pad is needed between convs.
#   * optional residual input (same geometry) and fused bias/BN-scale + ReLU
#     epilogue; co < C pads the output channels with zero weights (classifier
#     heads) — slice after `unpack_padded`.


def pack_padded(x: jax.Array, tile_h: int = 8) -> jax.Array:
    """(B, D, H, W, C) → self-padded packed volume (see header)."""
    b, d, h, w, c = x.shape
    p = 128 // c
    assert c * p == 128 and d % p == 0, (c, d)
    th = tile_h
    n_tiles = -(-h // th)
    wp = -(-(w + 2) // 8) * 8
    pk = _pack(x, p)
    return jnp.pad(
        pk, ((0, 0), (1, 1), (th, th + n_tiles * th - h), (1, wp - w - 1), (0, 0))
    )


def unpack_padded(pk: jax.Array, d: int, h: int, w: int, co: int,
                  tile_h: int = 8) -> jax.Array:
    """Inverse of pack_padded (+ channel slice for padded-co heads)."""
    b, cells_p = pk.shape[0], pk.shape[1]
    cells = cells_p - 2
    p = d // cells
    inner = pk[:, 1:-1, tile_h : tile_h + h, 1 : 1 + w, :]
    c_pad = pk.shape[-1] // p
    out = (
        inner.reshape(b, cells, h, w, p, c_pad)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b, d, h, w, c_pad)
    )
    return out[..., :co]


@functools.partial(
    jax.jit,
    static_argnames=("relu", "leaky", "mish", "w_real", "h_real",
                     "tile_h", "interpret"),
)
def conv3d_fold_p(
    pk: jax.Array,
    k3: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    residual: jax.Array | None = None,
    *,
    w_real: int,
    h_real: int,
    tile_h: int = 8,
    interpret: bool = False,
    leaky: float | None = None,
    mish: bool = False,
    post_mul: jax.Array | None = None,
) -> jax.Array:
    """3×3×3 stride-1 pad-1 conv, packed-padded in → packed-padded out.

    Numerically equal to conv → (+bias) → (+residual) → (ReLU | LeakyReLU)
    → (× post_mul) on the unpacked volume.  ``residual``/``post_mul`` must
    share pk's OUTPUT tile geometry (post_mul: ``(B, rows_p, wp, 128)``, the
    broadcast-over-D attention multiplier pre-tiled across phases — see
    tile_packed_mul).  ``C_out ≤ C`` (smaller co is zero-padded in lanes).
    """
    b, cells_p, rows_p, wp, _ = pk.shape
    th = tile_h
    cells = cells_p - 2
    n_tiles = rows_p // th - 2
    c, co = k3.shape[3], k3.shape[4]
    p = 128 // c
    assert c * p == 128, c
    assert co <= c, (co, c)
    if co < c:
        k3 = jnp.pad(k3, ((0, 0),) * 4 + ((0, c - co),))
        if bias is not None:
            bias = jnp.pad(bias, (0, c - co))
        co = c
    lw = (p + 2) * c
    n_lanes = 128

    wb = _banded_weights_fold(k3, p).astype(pk.dtype)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (p,))[None]

    grid = (b, cells_p, n_tiles + 2)

    def cell_spec(dc, dh):
        # Clamped halo indices: border blocks read garbage but write zeros.
        return pl.BlockSpec(
            (1, 1, th, wp, 128),
            functools.partial(
                lambda bi, di, hi, dc, dh: (
                    bi,
                    jnp.clip(di + dc - 1, 0, cells_p - 1),
                    jnp.clip(hi + dh - 1, 0, n_tiles + 1),
                    0,
                    0,
                ),
                dc=dc,
                dh=dh,
            ),
        )

    in_specs = [cell_spec(dc, dh) for dc in range(3) for dh in range(3)]
    in_specs.append(
        pl.BlockSpec((3, 3, lw, n_lanes), lambda bi, di, hi: (0,) * 4)
    )
    in_specs.append(pl.BlockSpec((1, n_lanes), lambda bi, di, hi: (0, 0)))
    n_fixed = len(in_specs)
    inputs = [*[pk] * 9, wb, b_tiled]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0))
        )
        inputs.append(residual)
    if post_mul is not None:
        in_specs.append(
            pl.BlockSpec((1, th, wp, 128), lambda bi, di, hi: (bi, hi, 0, 0))
        )
        inputs.append(post_mul)

    def body(*args):
        # Argument order: 9 cell refs, weights, bias, [residual], [post_mul],
        # then the OUTPUT ref last.
        m_ref = None
        if post_mul is not None:
            *args, m_ref, o_ref = args
            args = (*args, o_ref)
        if residual is not None:
            *xs, w_ref, b_ref, r_ref, o_ref = args
        else:
            *xs, w_ref, b_ref, o_ref = args
            r_ref = None
        m = th * wp
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (
            (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)
        )

        def rows(prev, cur, nxt):
            # th+4 rows: 2 halo rows above (the extra one absorbs the -1 flat
            # offset of the (dy=0, dx=0) tap), th rows, 2 below.
            return jnp.concatenate(
                [prev[0, 0, th - 2 :], cur[0, 0], nxt[0, 0, 0:2]], axis=0
            )

        wm1 = rows(xs[0], xs[1], xs[2])[..., 128 - c :]
        w0 = rows(xs[3], xs[4], xs[5])
        wp1 = rows(xs[6], xs[7], xs[8])[..., :c]
        win = jnp.concatenate([wm1, w0, wp1], axis=-1)  # (th+4, wp, lw)
        flat = win.reshape((th + 4) * wp, lw)

        acc = jnp.zeros((m, n_lanes), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                # Output padded (r, x) = conv centered at padded (r, x), i.e.
                # real (r-1, x-1): tap (dy, dx) reads padded row r-1+dy =
                # window row r+1+dy, col x-1+dx.
                shift = (dy + 1) * wp + dx - 1
                acc += jnp.dot(
                    flat[shift : shift + m],
                    w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                )
        acc += b_ref[0].astype(jnp.float32)
        if r_ref is not None:
            acc += r_ref[0, 0].reshape(m, n_lanes).astype(jnp.float32)
        acc = _apply_act(acc, relu, leaky, mish)
        if m_ref is not None:
            acc = acc * m_ref[0].reshape(m, n_lanes).astype(jnp.float32)
        # Zero everything outside the real region: border blocks entirely,
        # cols outside [1, w], rows ≥ h within the last interior tile.
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col = ridx % wp
        row = ridx // wp
        ok = (
            (col >= 1)
            & (col <= w_real)
            & ((hi - 1) * th + row < h_real)
            & interior
        )
        acc = jnp.where(ok, acc, 0.0)
        o_ref[0, 0] = acc.reshape(th, wp, n_lanes).astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, n_lanes), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(pk.shape, pk.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*inputs)


# Pallas pack/unpack: the XLA 8-D transposes that implement _pack/unpack are
# not just slow themselves (~0.7-1.0 ms at 94 MB) — as CONSUMERS they poison
# the layout/strategy choice of adjacent XLA convolutions (measured: the
# 64→32 dres0_0 conv went 2.5 → 39.5 ms/step when its output fed
# pack_padded).  Custom-calls pin standard operand layouts, so doing the
# repack inside Pallas isolates the neighbors.


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret", "c_slot"))
def pack_padded_k(x: jax.Array, tile_h: int = 8,
                  interpret: bool = False,
                  noise: jax.Array | None = None,
                  c_slot: int | None = None) -> jax.Array:
    """Pallas-kernel version of pack_padded (same output, no XLA transpose).

    Requires ``H % tile_h == 0`` (true at the aggregation shapes).

    ``noise``: optional ``(B, D, H, W)`` multiplier broadcast over C — packs
    ``x * noise[..., None]`` without materializing the product in HBM (the
    DDIM denoise entry multiply was a 1.15 ms/step XLA fusion over the 190 MB
    volume; fused here it rides the pack's existing read).

    ``c_slot``: pack C real channels into ``c_slot``-lane slots, zero-filling
    lanes ``C..c_slot`` (r5: the 40-ch patch volume enters the 64→32 x2
    kernel without the 2.2 ms/model XLA pad that a host-side 40→64
    materialization cost — the consumer's kernel is zero-padded to match).
    """
    b, d, h, w, c = x.shape
    if c_slot is None:
        c_slot = c
    assert c <= c_slot, (c, c_slot)
    p = 128 // c_slot
    assert c_slot * p == 128 and d % p == 0, (c_slot, d)
    th = tile_h
    assert h % th == 0, (h, th)
    n_tiles = h // th
    wp = -(-(w + 2) // 8) * 8
    cells = d // p
    grid = (b, cells + 2, n_tiles + 2)

    def phi_spec(phi):
        return pl.BlockSpec(
            (1, 1, th, w, c),
            functools.partial(
                lambda bi, di, hi, phi: (
                    bi,
                    jnp.clip((di - 1) * p + phi, 0, d - 1),
                    jnp.clip(hi - 1, 0, n_tiles - 1),
                    0,
                    0,
                ),
                phi=phi,
            ),
        )

    def noise_spec(phi):
        return pl.BlockSpec(
            (1, 1, th, w),
            functools.partial(
                lambda bi, di, hi, phi: (
                    bi,
                    jnp.clip((di - 1) * p + phi, 0, d - 1),
                    jnp.clip(hi - 1, 0, n_tiles - 1),
                    0,
                ),
                phi=phi,
            ),
        )

    in_specs = [phi_spec(phi) for phi in range(p)]
    inputs: list = [x] * p
    if noise is not None:
        assert noise.shape == (b, d, h, w), (noise.shape, x.shape)
        in_specs += [noise_spec(phi) for phi in range(p)]
        inputs += [noise] * p

    def slot(t):
        # c → c_slot lane slot (zero-fill the pad lanes).
        return t if c == c_slot else jnp.pad(t, ((0, 0), (0, 0), (0, c_slot - c)))

    def body(*args):
        if noise is not None:
            xs, ns = args[:p], args[p:-1]
            o_ref = args[-1]
            # f32 multiply: Mosaic only supports non-no-op minor-dim inserts
            # ([..., None]) for 32-bit types — cast up, multiply, cast back.
            lanes = jnp.concatenate(
                [
                    slot(
                        (
                            r[0, 0].astype(jnp.float32)
                            * n[0, 0].astype(jnp.float32)[..., None]
                        ).astype(r.dtype)
                    )
                    for r, n in zip(xs, ns)
                ],
                axis=-1,
            )  # (th, w, 128)
        else:
            *xs, o_ref = args
            lanes = jnp.concatenate([slot(r[0, 0]) for r in xs], axis=-1)
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)
        tile = jnp.pad(lanes, ((0, 0), (1, wp - w - 1), (0, 0)))
        scale = jnp.where(interior, 1.0, 0.0).astype(tile.dtype)
        o_ref[0, 0] = tile * scale

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells + 2, (n_tiles + 2) * th, wp, 128), x.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("dils", "w_real", "h_real", "tile_h", "interpret")
)
def depthwise_hw_p(
    pk: jax.Array,
    w_by_dil: jax.Array,
    dils: tuple[int, ...],
    *,
    w_real: int,
    h_real: int,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Per-lane dilated (1,3,3) depthwise conv, packed-padded in → out.

    The ACV "patch" convs (acv_ddim.py:181-188: grouped (1,3,3) convs with
    per-slice dilation 1/2/3) are pure per-channel H×W stencils — no D
    coupling, no channel mixing — so in the packed geometry they are 9
    flat-shift multiply-accumulates per dilation on the VPU.  r5 motivation:
    once their consumer became a Pallas custom-call, XLA's depthwise lowering
    collapsed (8.5 → 27.6 ms/prep measured); this kernel replaces it.

    Args:
      pk: packed-padded volume (pack_padded_k output, any c_slot layout).
      w_by_dil: ``(len(dils), 3, 3, 128)`` f32 per-lane tap weights, already
        laid out on packed lanes (zero for lanes not in that dilation group).
      dils: static per-group dilations (e.g. ``(1,)`` or ``(1, 2, 3)``).

    Requires ``wp - w_real - 1 >= max(dils)`` zero columns on the right (the
    flat-shift wraparound must land in the zero pad) and ``tile_h >= 4``.
    """
    b, cells_p, rows_p, wp, _ = pk.shape
    th = tile_h
    n_tiles = rows_p // th - 2
    md = max(dils)
    assert wp - w_real - 1 >= md and th >= 4, (wp, w_real, md, th)
    grid = (b, cells_p, n_tiles + 2)

    # Per-tap weights as DIAGONAL (128, 128) matrices: the shifted window
    # slices then feed MXU dots exactly like conv3d_fold_p's (Mosaic streams
    # a slice into a matmul operand), instead of materializing 27 full-size
    # shifted copies for VPU FMAs — measured 17.9 → 5.5 ms across the 4
    # prep calls.  The MXU doesn't care that the matrix is diagonal.
    w_diag = jnp.zeros((len(dils), 3, 3, 128, 128), jnp.float32)
    ar = jnp.arange(128)
    w_diag = w_diag.at[:, :, :, ar, ar].set(w_by_dil)
    w_diag = w_diag.astype(pk.dtype)

    def tile_spec(dh):
        return pl.BlockSpec(
            (1, 1, th, wp, 128),
            functools.partial(
                lambda bi, di, hi, dh: (
                    bi, di, jnp.clip(hi + dh - 1, 0, n_tiles + 1), 0, 0,
                ),
                dh=dh,
            ),
        )

    in_specs = [tile_spec(dh) for dh in range(3)]
    in_specs.append(
        pl.BlockSpec((len(dils), 3, 3, 128, 128), lambda bi, di, hi: (0,) * 5)
    )

    def body(prev, cur, nxt, w_ref, o_ref):
        di = pl.program_id(1)
        hi = pl.program_id(2)
        cells = cells_p - 2
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)
        # 4 halo rows above (absorb the -(3·wp+3) max negative flat offset),
        # 4 below.
        win = jnp.concatenate(
            [prev[0, 0, th - 4 :], cur[0, 0], nxt[0, 0, :4]], axis=0
        )  # (th+8, wp, 128)
        flat = win.reshape((th + 8) * wp, 128)
        m = th * wp
        acc = jnp.zeros((m, 128), jnp.float32)
        for gi, d in enumerate(dils):
            for dy in range(3):
                for dx in range(3):
                    shift = (4 + (dy - 1) * d) * wp + (dx - 1) * d
                    acc += jnp.dot(
                        flat[shift : shift + m],
                        w_ref[gi, dy, dx],
                        preferred_element_type=jnp.float32,
                    )
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col = ridx % wp
        row = ridx // wp
        ok = (
            (col >= 1)
            & (col <= w_real)
            & ((hi - 1) * th + row < h_real)
            & interior
        )
        acc = jnp.where(ok, acc, 0.0)
        o_ref[0, 0] = acc.reshape(th, wp, 128).astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(pk.shape, pk.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(pk, pk, pk, w_diag)


@functools.partial(
    jax.jit, static_argnames=("max_disp", "tile_h", "interpret")
)
def pack_concat_k(
    cl: jax.Array,
    cr: jax.Array,
    att: jax.Array,
    noise: jax.Array | None = None,
    *,
    max_disp: int,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused concat-volume build + attention (+noise) multiply + pack.

    Produces exactly ``pack_padded_k(att[..., None] * (noise[..., None] *)
    build_concat_volume(cl, cr, D))`` without EVER materializing the
    (B, D, H, W, 2C) concat volume (94 MB at the flagship shape) or the
    attention-filtered product in HBM: each packed tile shifts the right
    features in-kernel (dynamic sublane slice of a D-prepadded row — the
    shift d is the grid's cell×phase index) and multiplies the per-phase
    attention rows on the fly.

    r5 motivation: the XLA concat build + softmax-att multiply cost
    ~10 ms/prep-model once Pallas custom-calls were adjacent (layout
    poisoning of the stack/pad/multiply fusions), and the DDIM scan re-read
    the premultiplied volume every step anyway — with this kernel the prep
    hands the scan (cl, cr, att) and each denoise step packs directly from
    features (att ⊙ step-noise fused here, replacing pack_padded_k's noise
    path).  Reference semantics: SceneFlow/models/submodule.py:180-191
    (left half filled at every d) + acv_ddim.py:390 (softmax ⊙ concat).

    Args:
      cl, cr: ``(B, H, W, C)`` concat features (C=32 in ACV).
      att: ``(B, D, H, W)`` softmaxed attention weights.
      noise: optional ``(B, D, H, W)`` extra multiplier (DDIM step noise).
      max_disp: D (bins).

    Returns:
      packed-padded ``(B, cells+2, (tiles+2)·th, wp, 128)`` volume, p·2C=128.
    """
    b, h, w, c = cl.shape
    d = max_disp
    p = 128 // (2 * c)
    assert 2 * c * p == 128 and d % p == 0, (c, d)
    th = tile_h
    assert h % th == 0, (h, th)
    n_tiles = h // th
    wp = -(-(w + 2) // 8) * 8
    cells = d // p
    grid = (b, cells + 2, n_tiles + 2)
    # Right features pre-padded with D zero columns on the left: the shifted
    # row r[x - dval] is then a contiguous slice starting at D - dval, and
    # the w < dval region reads the zero pad (no mask needed).
    crp = jnp.pad(cr, ((0, 0), (0, 0), (d, 0), (0, 0)))

    def row_spec(src_w):
        return pl.BlockSpec(
            (1, th, src_w, c),
            lambda bi, di, hi: (bi, jnp.clip(hi - 1, 0, n_tiles - 1), 0, 0),
        )

    def att_spec(phi):
        return pl.BlockSpec(
            (1, 1, th, w),
            functools.partial(
                lambda bi, di, hi, phi: (
                    bi,
                    jnp.clip((di - 1) * p + phi, 0, d - 1),
                    jnp.clip(hi - 1, 0, n_tiles - 1),
                    0,
                ),
                phi=phi,
            ),
        )

    in_specs = [row_spec(w), row_spec(w + d)]
    inputs: list = [cl, crp]
    n_att = 0
    if att is not None:
        in_specs += [att_spec(phi) for phi in range(p)]
        inputs += [att] * p
        n_att = p
    if noise is not None:
        assert noise.shape == (b, d, h, w), noise.shape
        in_specs += [att_spec(phi) for phi in range(p)]
        inputs += [noise] * p

    def body(*args):
        cl_ref, cr_ref = args[0], args[1]
        atts = args[2 : 2 + n_att] if att is not None else None
        ns = (args[2 + n_att : 2 + n_att + p]
              if noise is not None else None)
        o_ref = args[-1]
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)
        l_row = cl_ref[0].astype(jnp.float32)  # (th, w, c)
        # The per-phase shift is grid-dynamic; Mosaic rejects unaligned
        # dynamic sublane slices ("index in dimension 2 must be a multiple
        # of 8") and per-row one-hot matmuls measured 36 ms/call (7.5k tiny
        # MXU dots), so the shifted row is a dynamic ROLL of the flattened
        # (th·(w+D), C) rows — rotate is 32-bit-only, hence the f32 cast —
        # followed by a static per-row crop.  x+δ ≤ w−1+D < w+D keeps every
        # crop inside its own row, so the roll's wraparound never leaks.
        flat_r = cr_ref[0].astype(jnp.float32).reshape(th * (w + d), c)
        parts = []
        for phi in range(p):
            dval = jnp.clip((di - 1) * p + phi, 0, d - 1)
            a = None
            if atts is not None:
                a = atts[phi][0, 0].astype(jnp.float32)  # (th, w)
            if ns is not None:
                n_row = ns[phi][0, 0].astype(jnp.float32)
                a = n_row if a is None else a * n_row
            # Positive-equivalent shift: negative DYNAMIC rolls produced
            # wrong values on device (interpret mode accepted them).
            rolled = pltpu.roll(flat_r, th * (w + d) + dval - d, axis=0)
            r_row = rolled.reshape(th, w + d, c)[:, :w]  # (th, w, c) f32
            if a is None:
                parts.append(l_row)
                parts.append(r_row)
            else:
                parts.append(l_row * a[..., None])
                parts.append(r_row * a[..., None])
        lanes = jnp.concatenate(parts, axis=-1).astype(o_ref.dtype)
        tile = jnp.pad(lanes, ((0, 0), (1, wp - w - 1), (0, 0)))
        scale = jnp.where(interior, 1.0, 0.0).astype(tile.dtype)
        o_ref[0, 0] = tile * scale

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells + 2, (n_tiles + 2) * th, wp, 128), cl.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("c_slot", "max_disp", "tile_h", "interpret")
)
def packed_dhw_mul_k(
    pk: jax.Array,
    m1: jax.Array,
    m2: jax.Array | None = None,
    *,
    c_slot: int,
    max_disp: int,
    tile_h: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Multiply a packed volume by per-(d,h,w) maps broadcast over channels.

    ``out ≡ pack(unpack(pk) * (m1 ⊙ m2)[..., None])`` — the DDIM step's
    attention×noise conditioning applied to an already-packed concat volume
    (r5: cl/cr/att are scan-invariant, so the prep packs the concat volume
    ONCE via pack_concat_k(att=None) and each step pays only this ~1.2 ms
    elementwise pass instead of the 2.61 ms roll-shifting rebuild).

    Args:
      pk: packed-padded volume, lanes = p phases × c_slot.
      m1, m2: ``(B, D, H, W)`` multipliers (m2 optional).
    """
    b, cells_p, rows_p, wp, _ = pk.shape
    d, th = max_disp, tile_h
    p = 128 // c_slot
    cells = cells_p - 2
    n_tiles = rows_p // th - 2
    h, w = n_tiles * th, None
    grid = (b, cells_p, n_tiles + 2)

    def m_spec(phi):
        return pl.BlockSpec(
            (1, 1, th, m1.shape[3]),
            functools.partial(
                lambda bi, di, hi, phi: (
                    bi,
                    jnp.clip((di - 1) * p + phi, 0, d - 1),
                    jnp.clip(hi - 1, 0, n_tiles - 1),
                    0,
                ),
                phi=phi,
            ),
        )

    in_specs = [
        pl.BlockSpec((1, 1, th, wp, 128),
                     lambda bi, di, hi: (bi, di, hi, 0, 0))
    ]
    inputs: list = [pk]
    for m in (m1, m2):
        if m is not None:
            in_specs += [m_spec(phi) for phi in range(p)]
            inputs += [m] * p
    w_real = m1.shape[3]

    def body(*args):
        pk_ref = args[0]
        refs = args[1:-1]
        o_ref = args[-1]
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)
        mparts = []
        for phi in range(p):
            mm = refs[phi][0, 0].astype(jnp.float32)
            if m2 is not None:
                mm = mm * refs[p + phi][0, 0].astype(jnp.float32)
            mm = jnp.pad(mm, ((0, 0), (1, wp - w_real - 1)))
            mparts.append(
                jnp.broadcast_to(mm[..., None], (th, wp, c_slot))
            )
        mul = jnp.concatenate(mparts, axis=-1)  # (th, wp, 128)
        scale = jnp.where(interior, 1.0, 0.0)
        out = pk_ref[0, 0].astype(jnp.float32) * mul * scale
        o_ref[0, 0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(pk.shape, pk.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("d", "h", "w", "co", "tile_h", "interpret")
)
def unpack_padded_k(pk: jax.Array, d: int, h: int, w: int, co: int,
                    tile_h: int = 8, interpret: bool = False) -> jax.Array:
    """Pallas-kernel version of unpack_padded."""
    b, cells_p = pk.shape[0], pk.shape[1]
    cells = cells_p - 2
    p = d // cells
    c_pad = pk.shape[-1] // p
    th = tile_h
    assert h % th == 0, (h, th)
    n_tiles = h // th
    grid = (b, cells, n_tiles)

    def body(x_ref, o_ref):
        tile = x_ref[0, 0]  # (th, wp, 128)
        for phi in range(p):
            o_ref[0, phi] = tile[:, 1 : 1 + w, phi * c_pad : phi * c_pad + co]

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, th, pk.shape[3], 128),
                lambda bi, di, hi: (bi, di + 1, hi + 1, 0, 0),
            )
        ],
        out_specs=pl.BlockSpec(
            (1, p, th, w, co), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, co), pk.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(pk)


@functools.partial(
    jax.jit, static_argnames=("d", "h", "w", "co", "tile_h", "interpret")
)
def unpack_hwdc_k(pk: jax.Array, d: int, h: int, w: int, co: int,
                  tile_h: int = 8, interpret: bool = False) -> jax.Array:
    """Packed-padded → ``(B, H, W, D·co)`` channels-minor unpack.

    The (B, D, H, W, co) unpack at tile_h=16 allocates its output block with
    co lanes padded to 128 — 41.5 MB of scoped VMEM for a 2.8 MB result
    (r4 OOM).  This layout puts (D·co) in lanes (384 for the GEV, 48 for the
    classifier cost): per (b, cell, h-chunk) program the tile's 128 lanes
    (p phases × c_pad channels) map to out lanes [cell·p·co, (cell+1)·p·co)
    in the SAME order when co == c_pad (pure slice-copy), else via one
    (128, p·co) 0/1-matmul on the MXU (no strided lane gathers).

    Consumers win too: the GEV's next stop is ``moveaxis(gev, 1, 3)`` into
    exactly this layout (geometry.py:159) — the 8-D transpose disappears.

    Requires ``w % 8 == 0`` (out block sublane dim).
    """
    b, cells_p = pk.shape[0], pk.shape[1]
    cells = cells_p - 2
    p = d // cells
    c_pad = pk.shape[-1] // p
    assert co <= c_pad and w % 8 == 0, (co, c_pad, w)
    th = tile_h
    hk = min(th, 8)
    s_off = th // hk
    assert h % hk == 0, (h, hk)
    n_hk = h // hk
    wp = pk.shape[3]
    grid = (b, cells, n_hk)
    ident = co == c_pad

    e = np.zeros((128, p * co), np.float32)
    for phi in range(p):
        for ch in range(co):
            e[phi * c_pad + ch, phi * co + ch] = 1.0
    emat = jnp.asarray(e, pk.dtype)

    if ident:
        # Per-(cell, h-chunk) program; out lanes p·co = 128 per cell block.
        def body(x_ref, e_ref, o_ref):
            o_ref[0] = x_ref[0, 0][:, 1 : 1 + w]

        return pl.pallas_call(
            body,
            grid=(b, cells, n_hk),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, hk, wp, 128),
                    lambda bi, di, gi: (bi, di + 1, gi + s_off, 0, 0),
                ),
                pl.BlockSpec((128, p * co), lambda bi, di, gi: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, hk, w, p * co), lambda bi, di, gi: (bi, gi, 0, di)
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, w, d * co), pk.dtype),
            interpret=interpret,
            compiler_params=_VMEM_LIMIT,
        )(pk, emat)

    # co < c_pad (the classifier cost): p·co per cell is below Mosaic's
    # 128-lane block minimum — one program per h-chunk reads ALL cells
    # (static refs) and writes the full d·co lane row.
    def cell_ref(ci):
        return pl.BlockSpec(
            (1, 1, hk, wp, 128),
            functools.partial(
                lambda bi, gi, ci: (bi, ci + 1, gi + s_off, 0, 0), ci=ci
            ),
        )

    def body(*args):
        *xs, e_ref, o_ref = args
        outs = []
        for x_ref in xs:
            t = x_ref[0, 0][:, 1 : 1 + w].reshape(hk * w, 128)
            outs.append(
                jax.lax.dot_general(
                    t, e_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        out = jnp.concatenate(outs, axis=-1)  # (hk·w, cells·p·co)
        o_ref[0] = out.reshape(hk, w, d * co).astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b, n_hk),
        in_specs=[cell_ref(ci) for ci in range(cells)]
        + [pl.BlockSpec((128, p * co), lambda bi, gi: (0, 0))],
        out_specs=pl.BlockSpec(
            (1, hk, w, d * co), lambda bi, gi: (bi, gi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d * co), pk.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*([pk] * cells), emat)


def _banded_weights_x2(k3: jax.Array) -> jax.Array:
    """(3,3,3,64,32) → (3 dy, 3 dx, 512, 128) cross-packing banded weights.

    Input lanes: 4 input cells (the p_in=2 packing, cells ``2r-1..2r+2``
    around out cell ``r``) × 2 phases × 64 ch; output lanes: 4 phases × 32 ch.
    ``d_in = d_out + dz - 1`` ⇒ ``dz = 2a + φ2 - φ4 - 1``.
    """
    c, co = k3.shape[3], k3.shape[4]
    assert (c, co) == (64, 32), (c, co)
    out = jnp.zeros((3, 3, 512, 128), k3.dtype)
    for a in range(4):
        for phi2 in range(2):
            for phi4 in range(4):
                dz = 2 * a + phi2 - phi4 - 1
                if 0 <= dz < 3:
                    li = a * 128 + phi2 * 64
                    lo = phi4 * 32
                    out = out.at[:, :, li : li + 64, lo : lo + 32].add(k3[dz])
    return out


@functools.partial(
    jax.jit,
    static_argnames=("relu", "leaky", "mish", "w_real", "h_real", "tile_h",
                     "interpret"),
)
def conv3d_fold_x2(
    pk64: jax.Array,
    k3: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    *,
    w_real: int,
    h_real: int,
    tile_h: int = 8,
    interpret: bool = False,
    leaky: float | None = None,
    mish: bool = False,
) -> jax.Array:
    """3×3×3 conv, 64-ch packed-padded in → 32-ch packed-padded out.

    The ACV aggregation entry (dres0_0, 64→32): XLA's conv here chose a
    39.5 ms strategy once its consumer became a custom-call (device trace
    r3); this kernel keeps the whole denoise step packed instead.  Exact.
    """
    b, cells24_p, rows_p, wp, _ = pk64.shape
    th = tile_h
    cells24 = cells24_p - 2
    cells12 = cells24 // 2
    n_tiles = rows_p // th - 2
    assert k3.shape == (3, 3, 3, 64, 32), k3.shape

    wb = _banded_weights_x2(k3).astype(pk64.dtype)
    if bias is None:
        bias = jnp.zeros((32,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (4,))[None]  # (1, 128)

    grid = (b, cells12 + 2, n_tiles + 2)

    def cell_spec(a, dh):
        return pl.BlockSpec(
            (1, 1, th, wp, 128),
            functools.partial(
                lambda bi, di, hi, a, dh: (
                    bi,
                    jnp.clip(2 * di - 2 + a, 0, cells24_p - 1),
                    jnp.clip(hi + dh - 1, 0, n_tiles + 1),
                    0,
                    0,
                ),
                a=a,
                dh=dh,
            ),
        )

    in_specs = [cell_spec(a, dh) for a in range(4) for dh in range(3)]
    in_specs.append(pl.BlockSpec((3, 3, 512, 128), lambda bi, di, hi: (0,) * 4))
    in_specs.append(pl.BlockSpec((1, 128), lambda bi, di, hi: (0, 0)))

    def body(*args):
        *xs, w_ref, b_ref, o_ref = args
        m = th * wp
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells12) & (hi >= 1) & (hi <= n_tiles)

        def rows(prev, cur, nxt):
            return jnp.concatenate(
                [prev[0, 0, th - 2 :], cur[0, 0], nxt[0, 0, 0:2]], axis=0
            )

        wins = [rows(xs[3 * a], xs[3 * a + 1], xs[3 * a + 2]) for a in range(4)]
        win = jnp.concatenate(wins, axis=-1)  # (th+4, wp, 512)
        flat = win.reshape((th + 4) * wp, 512)

        acc = jnp.zeros((m, 128), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                shift = (dy + 1) * wp + dx - 1
                acc += jnp.dot(
                    flat[shift : shift + m],
                    w_ref[dy, dx],
                    preferred_element_type=jnp.float32,
                )
        acc += b_ref[0].astype(jnp.float32)
        acc = _apply_act(acc, relu, leaky, mish)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col = ridx % wp
        row = ridx // wp
        ok = (
            (col >= 1)
            & (col <= w_real)
            & ((hi - 1) * th + row < h_real)
            & interior
        )
        acc = jnp.where(ok, acc, 0.0)
        o_ref[0, 0] = acc.reshape(th, wp, 128).astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells12 + 2, rows_p, wp, 128), pk64.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*[pk64] * 12, wb, b_tiled)


def _banded_weights_s2(k3: jax.Array, p_in: int) -> jax.Array:
    """Stride-2-in-D banded weights: (3,3,3,C,2C) → (3,3,(p_in+2)·C, 128).

    With ``c_out = 2·c_in`` the cell count is preserved (p_out = p_in/2) and
    ``d_in = 2·d_out + dz - 1`` gives window phase offset ``δ = 2φo + dz - 1``
    — the same ``δ ∈ [-1, p_in]`` halo window as the stride-1 fold kernel.
    """
    c, co = k3.shape[3], k3.shape[4]
    p_out = 128 // co
    assert p_in == 2 * p_out and c * p_in == 128, (c, co, p_in)
    out = jnp.zeros((3, 3, (p_in + 2) * c, 128), k3.dtype)
    for phi_o in range(p_out):
        for dz in range(3):
            delta = 2 * phi_o + dz - 1
            out = out.at[
                :, :, (delta + 1) * c : (delta + 2) * c,
                phi_o * co : (phi_o + 1) * co,
            ].add(k3[dz])
    return out


@functools.partial(
    jax.jit, static_argnames=("relu", "leaky", "mish", "w_real", "h_real",
                              "tile_h", "interpret")
)
def conv3d_fold_s2(
    pk: jax.Array,
    k3: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    *,
    w_real: int,
    h_real: int,
    tile_h: int = 4,
    interpret: bool = False,
    leaky: float | None = None,
    mish: bool = False,
    post_mul: jax.Array | None = None,
) -> jax.Array:
    """3×3×3 STRIDE-2 pad-1 conv, packed-padded in → packed-padded out at
    half resolution (``c_out = 2·c_in``, cells preserved).

    The missing piece of the all-Pallas aggregation tower: XLA's stride-2
    conv3ds join the strategy-poisoning whack-a-mole next to custom-calls
    (CLAUDE.md r3).  Column stride-2 access comes from merging column PAIRS
    into the (128-aligned, padded) lane dim — taps are then contiguous
    flat-row shifts + aligned lane slices; row stride-2 is an outer-dim slab
    select.  No sublane-strided gathers (the r4 rewrite: the original
    per-tap parity views ran 5× over budget).

    ``w_real``/``h_real`` are the INPUT real sizes (output = halves).
    ``tile_h`` is the INPUT tile height (output tiles are tile_h // 2).
    """
    b, cells_p, rows_p, wp, _ = pk.shape
    th = tile_h
    assert th % 2 == 0, th
    th_o = th // 2
    cells = cells_p - 2
    n_tiles = rows_p // th - 2
    c, co = k3.shape[3], k3.shape[4]
    p_in = 128 // c
    assert co == 2 * c, (c, co)
    h_o, w_o = h_real // 2, w_real // 2
    wp_o = -(-(w_o + 2) // 8) * 8
    lw = (p_in + 2) * c
    # The parity-select column views read up to 2 + 2·wp_o + 2 window cols.
    # Round-4 restructure: the original per-tap parity views
    # ``win[...].reshape(..., 2, lw)[:, :, 0]`` are SUBLANE-strided gathers —
    # ~1.8 MB of strided copies per tile that ran the full-res call at
    # 9.5 ms vs conv3d_fold_p's 1.8 (r4 device trace).  Instead: pad the
    # banded width to a 128-multiple, merge each column PAIR into the lane
    # dim (legal 128-aligned reshape, free), and every (dy, dx) tap becomes
    # one contiguous flat-row shift + one 128-aligned lane slice — the same
    # flat-shift discipline as conv3d_fold_p, with wrap contamination landing
    # only in masked pad columns.
    lw_pad = -(-lw // 128) * 128
    w_t = 2 * wp_o  # target window width; window col j' = 2x + dx
    m_o = th_o * wp_o

    wb = _banded_weights_s2(k3, p_in).astype(pk.dtype)
    if lw_pad != lw:
        wb = jnp.pad(wb, ((0, 0), (0, 0), (0, lw_pad - lw), (0, 0)))
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (128 // co,))[None]

    grid = (b, cells_p, n_tiles + 2)

    def cell_spec(dc, dh):
        return pl.BlockSpec(
            (1, 1, th, wp, 128),
            functools.partial(
                lambda bi, di, hi, dc, dh: (
                    bi,
                    jnp.clip(di + dc - 1, 0, cells_p - 1),
                    jnp.clip(hi + dh - 1, 0, n_tiles + 1),
                    0,
                    0,
                ),
                dc=dc,
                dh=dh,
            ),
        )

    in_specs = [cell_spec(dc, dh) for dc in range(3) for dh in range(3)]
    in_specs.append(
        pl.BlockSpec((3, 3, lw_pad, 128), lambda bi, di, hi: (0,) * 4)
    )
    in_specs.append(pl.BlockSpec((1, 128), lambda bi, di, hi: (0, 0)))
    extra_inputs = []
    if post_mul is not None:
        # Output-geometry attention multiplier (see tile_packed_mul).
        in_specs.append(
            pl.BlockSpec((1, th_o, wp_o, 128), lambda bi, di, hi: (bi, hi, 0, 0))
        )
        extra_inputs.append(post_mul)

    def body(*args):
        m_ref = None
        if post_mul is not None:
            *args, m_ref, o_ref = args
            args = (*args, o_ref)
        *xs, w_ref, b_ref, o_ref = args
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)

        def rows(prev, cur, nxt):
            # th+3 rows starting at in_pad row (2·t·th_o − 2): prev[-2:] +
            # cur + nxt[:1].
            return jnp.concatenate(
                [prev[0, 0, th - 2 :], cur[0, 0], nxt[0, 0, 0:1]], axis=0
            )

        wm1 = rows(xs[0], xs[1], xs[2])[..., 128 - c :]
        w0 = rows(xs[3], xs[4], xs[5])
        wp1 = rows(xs[6], xs[7], xs[8])[..., :c]
        win = jnp.concatenate([wm1, w0, wp1], axis=-1)  # (th+3, wp, lw)
        # Window col j' = 2x + dx (2-col zero prepend absorbs the −2 origin);
        # cols ≥ w_t and the one cropped-off tail serve only masked outputs
        # (wp_o ≥ w_o + 2 ⇒ real taps end at 2·w_o + 2 < w_t).
        w_keep = min(wp, w_t - 2)
        win = win[:, :w_keep]
        win = jnp.pad(
            win, ((0, 0), (2, w_t - 2 - w_keep), (0, lw_pad - lw))
        )  # (th+3, w_t, lw_pad)
        # Merge column pairs into lanes: pair q = cols (2q | 2q+1).
        wv = win.reshape(th + 3, wp_o, 2 * lw_pad)
        acc = jnp.zeros((m_o, 128), jnp.float32)
        for dy in range(3):
            # Out row r reads window row 2r + dy + 1: outer-dim slab select
            # (no sublane strides), then one full contiguous flatten.
            sel = wv[dy + 1 : dy + 1 + 2 * th_o].reshape(
                th_o, 2, wp_o, 2 * lw_pad
            )[:, 0]
            flat = jnp.pad(sel.reshape(m_o, 2 * lw_pad), ((0, 1), (0, 0)))
            for dx in range(3):
                pc, cs = dx % 2, dx // 2
                a = jax.lax.slice(
                    flat, (cs, pc * lw_pad), (cs + m_o, (pc + 1) * lw_pad)
                )
                acc += jnp.dot(
                    a, w_ref[dy, dx], preferred_element_type=jnp.float32
                )
        acc += b_ref[0].astype(jnp.float32)
        acc = _apply_act(acc, relu, leaky, mish)
        if m_ref is not None:
            acc = acc * m_ref[0].reshape(m_o, 128).astype(jnp.float32)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m_o, 1), 0)
        col = ridx % wp_o
        row = ridx // wp_o
        ok = (
            (col >= 1)
            & (col <= w_o)
            & ((hi - 1) * th_o + row < h_o)
            & interior
        )
        acc = jnp.where(ok, acc, 0.0)
        o_ref[0, 0] = acc.reshape(th_o, wp_o, 128).astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th_o, wp_o, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells_p, (n_tiles + 2) * th_o, wp_o, 128), pk.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*[pk] * 9, wb, b_tiled, *extra_inputs)


def _banded_weights_up(k3: jax.Array, p_in: int) -> jax.Array:
    """Stride-2 DECONV banded weights: (k,k,k,C,C/2) → (k,k,(p_in+2)·C, 128).

    ``k3`` is the pre-flipped ConvTranspose kernel (conv orientation, as
    stored by ConvTransposeBN).  With ``co = c/2`` (p_out = 2·p_in, cells
    preserved, d_out = 2·d_in): input phase ``φi = (φo + dz - (k-2))/2``
    when integer — k=3 is the (p=1, op=1) hourglass deconv, k=4 the
    (p=1, op=0) IGEV deconv; both give the same (p_in+2)-cell band.
    """
    k = k3.shape[0]
    c, co = k3.shape[3], k3.shape[4]
    p_out = 2 * p_in
    assert co * 2 == c and c * p_in == 128, (c, co, p_in)
    assert k in (3, 4), k
    out = jnp.zeros((k, k, (p_in + 2) * c, 128), k3.dtype)
    for phi_o in range(p_out):
        for dz in range(k):
            num = phi_o + dz - (k - 2)
            if num % 2:
                continue
            phi_i = num // 2
            out = out.at[
                :, :, (phi_i + 1) * c : (phi_i + 2) * c,
                phi_o * co : (phi_o + 1) * co,
            ].add(k3[dz])
    return out


@functools.partial(
    jax.jit, static_argnames=("relu", "leaky", "mish", "w_real", "h_real",
                              "tile_h", "interpret")
)
def conv3d_fold_up(
    pk: jax.Array,
    k3: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    residual: jax.Array | None = None,
    *,
    w_real: int,
    h_real: int,
    tile_h: int = 2,
    interpret: bool = False,
    leaky: float | None = None,
    mish: bool = False,
    post_mul: jax.Array | None = None,
) -> jax.Array:
    """ConvTranspose3d ``(k=3, s=2, p=1, op=1)`` or ``(k=4, s=2, p=1,
    op=0)`` — kernel size inferred from ``k3`` — packed-padded in → packed-
    padded out at DOUBLE resolution (``c_out = c/2``, cells preserved).

    Each (row, col) output parity pair selects ≤2 taps per spatial dim whose
    input indices are DENSE (no strided access at all); the four parity
    sub-tiles are interleaved with free non-lane reshapes.  The optional
    ``residual`` (e.g. the redir 1×1 branch) is added before ReLU —
    reproducing the hourglass ``relu(deconv(x) + redir(skip))`` fusion.

    ``w_real``/``h_real`` are the INPUT real sizes (output = doubles);
    ``tile_h`` is the INPUT tile height (output tiles are 2·tile_h).
    """
    b, cells_p, rows_p, wp_in, _ = pk.shape
    th_i = tile_h
    th_o = 2 * th_i
    cells = cells_p - 2
    n_tiles = rows_p // th_i - 2
    kk = k3.shape[0]
    c, co = k3.shape[3], k3.shape[4]
    p_in = 128 // c
    assert co * 2 == c, (c, co)
    h_o, w_o = 2 * h_real, 2 * w_real
    wp_o = -(-(w_o + 2) // 8) * 8
    lw = (p_in + 2) * c
    u_n, v_n = th_i, wp_o // 2
    # Window col-pair count: v_n when the flat-shift wrap (coff=1 at the
    # last pair) lands in masked pad cols (wp_o ≥ w_o + 3 — every w_o ≢ 6
    # mod 8), else v_n + 1 with the contaminated tail pair dropped by the
    # [:, :wp_o] slice (at w_o ≡ 6 mod 8, wp_o = w_o + 2 and a v_n window
    # would contaminate real col w_o).  Conditional because the widening
    # costs ~3% on the ACV flagship shapes that don't need it.
    v2 = v_n if wp_o >= w_o + 3 else v_n + 1
    # Pad the band to a 128-multiple: Mosaic rejects the window shape casts
    # at lw = 192/160 ("infer-vector-layout: unsupported shape cast",
    # device-probed r4 — lw = 256/384 configs compile).
    lw_pad = -(-lw // 128) * 128

    wb = _banded_weights_up(k3, p_in).astype(pk.dtype)
    if lw_pad != lw:
        wb = jnp.pad(wb, ((0, 0), (0, 0), (0, lw_pad - lw), (0, 0)))
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (128 // co,))[None]

    grid = (b, cells_p, n_tiles + 2)

    def cell_spec(dc, dh):
        return pl.BlockSpec(
            (1, 1, th_i, wp_in, 128),
            functools.partial(
                lambda bi, di, hi, dc, dh: (
                    bi,
                    jnp.clip(di + dc - 1, 0, cells_p - 1),
                    jnp.clip(hi + dh - 1, 0, n_tiles + 1),
                    0,
                    0,
                ),
                dc=dc,
                dh=dh,
            ),
        )

    in_specs = [cell_spec(dc, dh) for dc in range(3) for dh in range(3)]
    in_specs.append(
        pl.BlockSpec((kk, kk, lw_pad, 128), lambda bi, di, hi: (0,) * 4)
    )
    in_specs.append(pl.BlockSpec((1, 128), lambda bi, di, hi: (0, 0)))
    inputs = [*[pk] * 9, wb, b_tiled]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, th_o, wp_o, 128),
                         lambda bi, di, hi: (bi, di, hi, 0, 0))
        )
        inputs.append(residual)
    if post_mul is not None:
        in_specs.append(
            pl.BlockSpec((1, th_o, wp_o, 128),
                         lambda bi, di, hi: (bi, hi, 0, 0))
        )
        inputs.append(post_mul)

    # (parity → valid taps with their dense window offsets), derived from
    # lhs-dilated-conv index algebra: rows w_r = u + (p_r+dy-(kk-2))//2 + 1
    # for (p_r+dy-(kk-2)) even; cols w_c = v + (p_x+dx-(kk-2)-1)//2 + 1 for
    # (p_x+dx-(kk-2)-1) even (the −1 is the packed left pad col).
    row_taps = {
        pr: [(dy, (pr + dy - (kk - 2)) // 2 + 1) for dy in range(kk)
             if (pr + dy - (kk - 2)) % 2 == 0]
        for pr in (0, 1)
    }
    col_taps = {
        px: [(dx, (px + dx - (kk - 2) - 1) // 2 + 1) for dx in range(kk)
             if (px + dx - (kk - 2) - 1) % 2 == 0]
        for px in (0, 1)
    }

    def body(*args):
        m_ref = None
        if post_mul is not None:
            *args, m_ref, o_ref = args
            args = (*args, o_ref)
        if residual is not None:
            *xs, w_ref, b_ref, r_ref, o_ref = args
        else:
            *xs, w_ref, b_ref, o_ref = args
            r_ref = None
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)

        def rows(prev, cur, nxt):
            # th_i + 2 rows: in_pad rows [t·th_i − 1, (t+1)·th_i].
            return jnp.concatenate(
                [prev[0, 0, th_i - 1 :], cur[0, 0], nxt[0, 0, 0:1]], axis=0
            )

        wm1 = rows(xs[0], xs[1], xs[2])[..., 128 - c :]
        w0 = rows(xs[3], xs[4], xs[5])
        wp1 = rows(xs[6], xs[7], xs[8])[..., :c]
        parts = [wm1, w0, wp1]
        if lw_pad != lw:
            parts.append(
                jnp.zeros((*wm1.shape[:-1], lw_pad - lw), wm1.dtype)
            )
        win = jnp.concatenate(parts, axis=-1)  # (th_i+2, wp_in, lw_pad)
        # r4 flat-shift rewrite: window width EXACTLY v_n, so (u, v) merges
        # to one contiguous flatten and every tap is a flat-row shift — no
        # per-tap non-contiguous copies.  The coff=1 wrap contaminates only
        # out cols ≥ wp_o-2, masked because wp_o ≥ w_o+3 (w_o ≡ 0 mod 8
        # everywhere in this pipeline — asserted at function scope).
        if wp_in >= v2:
            win = win[:, :v2]
        else:
            win = jnp.pad(win, ((0, 0), (0, v2 - wp_in), (0, 0)))
        flat = jnp.pad(
            win.reshape((th_i + 2) * v2, lw_pad), ((0, 1), (0, 0))
        )

        subs = []
        for p_r in (0, 1):
            row_subs = []
            for p_x in (0, 1):
                acc = jnp.zeros((u_n * v2, 128), jnp.float32)
                for dy, roff in row_taps[p_r]:
                    for dx, coff in col_taps[p_x]:
                        sh = roff * v2 + coff
                        acc += jnp.dot(
                            jax.lax.slice(
                                flat, (sh, 0), (sh + u_n * v2, lw_pad)
                            ),
                            w_ref[dy, dx],
                            preferred_element_type=jnp.float32,
                        )
                row_subs.append(acc.reshape(u_n, v2, 128))
            # interleave cols via lanes: (u,v2,128)+(u,v2,128) → (u,v2,256)
            # → 128-aligned lane→sublane split → (u, 2·v2, 128) → drop the
            # wrap-contaminated tail pair with a contiguous prefix slice.
            pair = jnp.concatenate(row_subs, axis=-1)
            subs.append(pair.reshape(u_n, 1, 2 * v2, 128)[:, :, :wp_o])
        # interleave rows: outer-dim merge (free): (u, 2, wp_o, 128) →
        # (th_o, wp_o, 128); out row = 2u + p_r.
        out = jnp.concatenate(subs, axis=1).reshape(th_o, wp_o, 128)
        out = out + b_ref[0].astype(jnp.float32)
        if r_ref is not None:
            out = out + r_ref[0, 0].astype(jnp.float32)
        out = _apply_act(out, relu, leaky, mish)
        if m_ref is not None:
            out = out * m_ref[0].astype(jnp.float32)
        m_o = th_o * wp_o
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m_o, 1), 0)
        col = ridx % wp_o
        row = ridx // wp_o
        ok = (
            (col >= 1)
            & (col <= w_o)
            & ((hi - 1) * th_o + row < h_o)
            & interior
        )
        out = jnp.where(ok, out.reshape(m_o, 128), 0.0).reshape(
            th_o, wp_o, 128
        )
        o_ref[0, 0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th_o, wp_o, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, cells_p, (n_tiles + 2) * th_o, wp_o, 128), pk.dtype
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(*inputs)


def tile_packed_mul(att: jax.Array, p: int, tile_h: int,
                    dtype=None) -> jax.Array:
    """Broadcast-over-D multiplier → packed OUTPUT tile geometry.

    ``att (B, H, W, C)`` (e.g. a sigmoid feature-attention map) tiled ``p``×
    across lanes and padded to the packed layout ``(B, (n_tiles+2)·th, wp,
    128)``, for the fold kernels' ``post_mul`` operand.  Pure elementwise
    XLA (tile + pad) — ~26 MB at the IGEV quarter-res shape, no conv in
    sight, so no strategy-poison surface.
    """
    b, h, w, c = att.shape
    assert c * p == 128, (c, p)
    th = tile_h
    assert h % th == 0, (h, th)
    n_tiles = h // th
    wp = -(-(w + 2) // 8) * 8
    x = jnp.tile(att.astype(dtype or att.dtype), (1, 1, 1, p))
    return jnp.pad(x, ((0, 0), (th, th), (1, wp - w - 1), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("relu", "leaky", "mish", "w_real", "h_real",
                              "tile_h", "interpret")
)
def conv1x1_fold_p(
    pk: jax.Array,
    k1: jax.Array,
    bias: jax.Array | None = None,
    relu: bool = False,
    *,
    w_real: int,
    h_real: int,
    tile_h: int,
    interpret: bool = False,
    leaky: float | None = None,
    mish: bool = False,
) -> jax.Array:
    """1×1×1 conv in the packed-padded geometry (same channel count).

    One block-diagonal (128, 128) lane matmul per tile — the hourglass
    redir branches (ConvBN(c, 1, 1, 0)), BN folded by the caller.
    """
    b, cells_p, rows_p, wp, _ = pk.shape
    th = tile_h
    cells = cells_p - 2
    n_tiles = rows_p // th - 2
    c, co = k1.shape[-2], k1.shape[-1]
    assert c == co and 128 % c == 0, (c, co)
    p = 128 // c
    wdiag = jnp.zeros((128, 128), k1.dtype)
    k1 = k1.reshape(c, co)
    for phi in range(p):
        wdiag = wdiag.at[phi * c : (phi + 1) * c, phi * c : (phi + 1) * c].set(k1)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    b_tiled = jnp.tile(bias.astype(jnp.float32), (p,))[None]

    grid = (b, cells_p, n_tiles + 2)

    def body(x_ref, w_ref, b_ref, o_ref):
        di = pl.program_id(1)
        hi = pl.program_id(2)
        interior = (di >= 1) & (di <= cells) & (hi >= 1) & (hi <= n_tiles)
        m = th * wp
        acc = jnp.dot(
            x_ref[0, 0].reshape(m, 128), w_ref[...],
            preferred_element_type=jnp.float32,
        ) + b_ref[0].astype(jnp.float32)
        acc = _apply_act(acc, relu, leaky, mish)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col = ridx % wp
        row = ridx // wp
        ok = ((col >= 1) & (col <= w_real)
              & ((hi - 1) * th + row < h_real) & interior)
        o_ref[0, 0] = jnp.where(ok, acc, 0.0).reshape(th, wp, 128).astype(
            o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, th, wp, 128),
                         lambda bi, di, hi: (bi, di, hi, 0, 0)),
            pl.BlockSpec((128, 128), lambda bi, di, hi: (0, 0)),
            pl.BlockSpec((1, 128), lambda bi, di, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128), lambda bi, di, hi: (bi, di, hi, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(pk.shape, pk.dtype),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
    )(pk, wdiag, b_tiled)
