"""IGEV ConvGRU multi-level update block (KITTI15/core/update.py:6-142)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffuvolume_tpu.ops.regression import resize_bilinear


def _conv(f, k=3, name=None, dtype=jnp.float32):
    if isinstance(k, int):
        k = (k, k)
    pad = [(ki // 2, ki // 2) for ki in k]
    return nn.Conv(f, k, padding=pad, use_bias=True, dtype=dtype, name=name)


def pool2x(x: jax.Array) -> jax.Array:
    """avg_pool2d(3, stride 2, pad 1) with count_include_pad=True (update.py:96)."""
    return nn.avg_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)], count_include_pad=True)


def interp_to(x: jax.Array, ref: jax.Array) -> jax.Array:
    """Bilinear align_corners=True resize to ref's spatial dims (update.py:102-104)."""
    return resize_bilinear(x, (ref.shape[1], ref.shape[2]), 1, 2, align_corners=True)


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's {kernel, bias} tree."""

    features: int
    k: tuple = (3, 3)

    @nn.compact
    def __call__(self, c_in: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (*self.k, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


def _gru_conv_mode() -> str:
    """How the update block's 3×3 convolutions are emitted.

    "conv" (default): ``lax.conv_general_dilated`` per piece.  XLA's TPU conv
    strategy space-partitions (1,96,312,C) into (96,1,8,40,C) and bounces
    between the conv layout {3,1,2,0} and the elementwise layout {3,2,1,0} —
    the band-mode device trace attributes ~240 µs/GRU-iteration to these
    relayout copies (copy/concat/copy-done at 384×1248).

    "dot" (DIFFU_GRU_DOTCONV=1): each 3×3 conv as 9 pad/slice-shifted
    ``dot_general``s with f32 accumulation — numerically identical (same
    per-tap MXU contractions), but every operand stays in the native
    channels-minor layout, so no conv-specific relayouts exist to begin with.
    """
    import os

    return "dot" if os.environ.get("DIFFU_GRU_DOTCONV", "0") == "1" else "conv"


def _conv3x3_tap_dots(x, kernel, dt, acc=None):
    """3×3 pad-1 conv of ``x`` as 9 shifted K=C matmuls; returns the f32
    accumulator (caller casts).  ``kernel`` is ``(3, 3, C, Co)``."""
    b, h, w, c = x.shape
    xp = jnp.pad(x.astype(dt), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            y = jax.lax.dot_general(
                xp[:, dy : dy + h, dx : dx + w, :],
                kernel[dy, dx].astype(dt),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc


def _apply3x3(x, kernel, bias, dt):
    """One 3×3 pad-1 conv under the _gru_conv_mode dispatch (bias fused).

    Parameter-tree-compatible replacement for the block's ``nn.Conv`` layers:
    callers hold the weights in a ``_ConvParams`` submodule with the same
    ``{kernel, bias}`` leaves and names."""
    if _gru_conv_mode() == "dot":
        acc = _conv3x3_tap_dots(x, kernel, dt)
        if bias is not None:
            acc = acc + bias.astype(jnp.float32)
        return acc.astype(dt)
    y = jax.lax.conv_general_dilated(
        x.astype(dt), kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dt) if bias is not None else y


def _conv_over_pieces(kernel, pieces, dt):
    """conv(concat(pieces), kernel) as Σᵢ conv(pieceᵢ, kernel-sliceᵢ).

    Exact by linearity of convolution in the input channels.  Each piece
    arrives in the layout its producing conv/fusion emitted; feeding it to a
    conv directly avoids the data-formatting copy XLA inserts to realize the
    channel concat (device trace: ~140 µs/GRU-iter of `copy` ops at 384×1248,
    all on concat-fed conv inputs).

    The cross-piece sum accumulates in f32 (``preferred_element_type``) and is
    cast to the compute dtype once at the end, so bf16 results match the
    single fused conv (whose MXU accumulator is f32) instead of rounding each
    partial output to bf16 before the add."""
    off, acc = 0, None
    mode = _gru_conv_mode()
    for p in pieces:
        c = p.shape[-1]
        ks = kernel[:, :, off : off + c].astype(dt)
        if mode == "dot":
            acc = _conv3x3_tap_dots(p, ks, dt, acc)
        else:
            y = jax.lax.conv_general_dilated(
                p.astype(dt), ks, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
        off += c
    assert off == kernel.shape[2], (off, kernel.shape)
    return acc.astype(dt)


class ConvGRU(nn.Module):
    """Gated conv recurrence with context biases (update.py:26-42).

    The z and r gates consume the identical ``[h, x]`` input, so their two
    convolutions run as ONE conv with output-concatenated kernels — the input
    window is read once instead of twice and the MXU sees 2×hidden output
    lanes per pass.  The ``[h, x]`` / ``[r·h, x]`` channel concats are never
    materialized: the conv is applied per concat piece with the matching
    kernel slice (``_conv_over_pieces``).  The parameter tree stays
    nn.Conv-compatible (``convz/{kernel,bias}``, ``convr/{kernel,bias}``,
    ``convq/{kernel,bias}``) for the torch converter.
    """

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, cz, cr, cq, *x_list):
        hd, dt = self.hidden_dim, self.dtype
        c_in = h.shape[-1] + sum(x.shape[-1] for x in x_list)
        kz, bz = _ConvParams(hd, name="convz")(c_in)
        kr, br = _ConvParams(hd, name="convr")(c_in)
        kq, bq = _ConvParams(hd, name="convq")(c_in)
        kzr = jnp.concatenate([kz, kr], axis=-1)
        bzr = jnp.concatenate([bz, br], axis=-1).astype(dt)
        zr = _conv_over_pieces(kzr, [h, *x_list], dt) + bzr
        z = jax.nn.sigmoid(zr[..., :hd] + cz)
        r = jax.nn.sigmoid(zr[..., hd:] + cr)
        q = jnp.tanh(
            _conv_over_pieces(kq, [r * h, *x_list], dt) + bq.astype(dt) + cq
        )
        return (1 - z) * h + z * q


class DispHead(nn.Module):
    """Δdisparity head (update.py:16-24).

    ``conv2`` (3×3, hidden→1) is a 1-output-lane conv — MXU-hostile (1/128
    lane utilization, measured 94 µs/GRU-iter at 384×1248).  It is applied
    instead as a 1×1 matmul to 9 per-tap channels followed by 9 shift-adds of
    the scalar maps: out[y,x] = Σ_{ky,kx} tmp[y+ky-1, x+kx-1, 3ky+kx] — exact
    (the conv is linear; zero padding of tmp reproduces input zero padding).
    The parameter tree stays nn.Conv-compatible.
    """

    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        k1, b1 = _ConvParams(self.hidden_dim, (3, 3), name="conv1")(x.shape[-1])
        y = jax.nn.relu(_apply3x3(x, k1, b1, dt))
        k2, b2 = _ConvParams(1, (3, 3), name="conv2")(self.hidden_dim)
        ktap = k2[..., 0].reshape(9, self.hidden_dim).T.astype(dt)  # (hd, 9)
        tmp = jnp.einsum("bhwc,co->bhwo", y.astype(dt), ktap)
        b, hh, ww, _ = tmp.shape
        tp = jnp.pad(tmp, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = sum(
            tp[:, ky : ky + hh, kx : kx + ww, 3 * ky + kx]
            for ky in range(3)
            for kx in range(3)
        )
        return out[..., None] + b2.astype(dt)


class BasicMotionEncoder(nn.Module):
    """corr+disp → 128-ch motion feature (update.py:75-93).

    ``corr`` is either the concatenated ``(B, H, W, corr_planes)`` lookup
    feature or the tuple of raw ``(B, H, W, J, C)`` pieces from
    ``geo_lookup(..., concat=False)``.  In pieces form the 1×1 ``convc1`` is
    applied as per-piece (J, C) contractions against row-blocks of its kernel
    — numerically identical to conv-after-concat, but each hat-sampling
    einsum output feeds an MXU matmul in its native taps/channels-minor
    layout with no relayout copy.  Parameter tree matches nn.Conv.
    """

    corr_planes: int  # corr_levels * (2*radius+1) * (8+1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, corr):
        dt = self.dtype
        kc1, bc1 = _ConvParams(64, (1, 1), name="convc1")(self.corr_planes)
        if not isinstance(corr, (tuple, list)):
            corr = (corr.reshape(*corr.shape[:-1], 1, corr.shape[-1]),)
        off, total, acc = 0, 0, None
        for piece in corr:
            # A piece is either a bare (B,H,W,J,C) array (sequential kernel
            # rows) or an (array, rows) pair carrying the static row indices
            # of its channels in the canonical concat order (geo_lookup's
            # pieces form keeps the multi-level geo block whole).
            rows = None
            if isinstance(piece, (tuple, list)):
                piece, rows = piece
            j, c = piece.shape[-2:]
            if rows is None:
                blk = kc1[0, 0, off : off + j * c]
                off += j * c
            else:
                assert len(rows) == j * c, (len(rows), j, c)
                blk = kc1[0, 0, jnp.asarray(rows)]
            blk = blk.reshape(j, c, 64).astype(dt)
            y = jnp.einsum(
                "bhwjc,jco->bhwo", piece.astype(dt), blk,
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
            total += j * c
        assert total == self.corr_planes, (total, self.corr_planes)
        cor = jax.nn.relu(acc.astype(dt) + bc1.astype(dt))
        kc2, bc2 = _ConvParams(64, (3, 3), name="convc2")(64)
        cor = jax.nn.relu(_apply3x3(cor, kc2, bc2, dt))
        # convd1 (7×7, 1→64): a 1-input-channel conv wastes 127/128 MXU input
        # lanes (measured 53 µs/GRU-iter).  Unfold the scalar disparity into
        # its 49 taps (cheap VPU shifts) and apply the kernel as a 1×1 matmul
        # 49→64 — exact, same parameters.
        kd, bd = _ConvParams(64, (7, 7), name="convd1")(disp.shape[-1])
        assert disp.shape[-1] == 1, disp.shape
        b, hh, ww, _ = disp.shape
        dp = jnp.pad(disp.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        cols = jnp.concatenate(
            [dp[:, ky : ky + hh, kx : kx + ww, :] for ky in range(7) for kx in range(7)],
            axis=-1,
        )  # (B, H, W, 49)
        dsp = jax.nn.relu(
            jnp.einsum("bhwk,ko->bhwo", cols, kd.reshape(49, 64).astype(dt))
            + bd.astype(dt)
        )
        kd2, bd2 = _ConvParams(64, (3, 3), name="convd2")(64)
        dsp = jax.nn.relu(_apply3x3(dsp, kd2, bd2, dt))
        ko, bo = _ConvParams(127, (3, 3), name="conv")(128)
        out = jax.nn.relu(
            _conv_over_pieces(ko, [cor, dsp], self.dtype) + bo.astype(self.dtype)
        )
        return jnp.concatenate([out, disp], axis=-1)


class BasicMultiUpdateBlock(nn.Module):
    """3-level GRU cascade with cross-scale pooling/interp (update.py:106-142).

    ``net`` is [net04, net08, net16] hidden states (channels-last);
    ``inp`` is [(cz, cr, cq)] per level.
    """

    hidden_dims: Sequence[int] = (128, 128, 128)  # [dim16, dim08, dim04]
    n_gru_layers: int = 3
    corr_levels: int = 2
    corr_radius: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr=None, disp=None,
                 iter04=True, iter08=True, iter16=True, update=True):
        dt = self.dtype
        hd = self.hidden_dims
        import os

        # The zr and q convs consume identical non-hidden operands; with
        # merge on, [motion, interp] (and [pool, interp] at 1/8) concatenate
        # ONCE so each gate pass runs 2 piece-convs instead of 3 (one less
        # cross-piece f32 add per gate).  Measured a WASH on v5e at 384×1248
        # (46.07 vs 46.33 ms/31-iter scan): the concat-fed conv pays a
        # relayout fusion (~193 µs/iter) that cancels the saved adds — kept
        # off by default as a documented A/B.
        merge = os.environ.get("DIFFU_GRU_MERGE", "0") == "1"

        def xs(*pieces):
            if merge and len(pieces) > 1:
                return (jnp.concatenate(pieces, axis=-1),)
            return pieces

        net = list(net)
        if iter16:
            net[2] = ConvGRU(hd[0], dt, name="gru16")(
                net[2], *inp[2], pool2x(net[1])
            )
        if iter08:
            if self.n_gru_layers > 2:
                net[1] = ConvGRU(hd[1], dt, name="gru08")(
                    net[1], *inp[1],
                    *xs(pool2x(net[0]), interp_to(net[2], net[1])),
                )
            else:
                net[1] = ConvGRU(hd[1], dt, name="gru08")(
                    net[1], *inp[1], pool2x(net[0])
                )
        if iter04:
            corr_planes = self.corr_levels * (2 * self.corr_radius + 1) * 9
            motion = BasicMotionEncoder(corr_planes, dt, name="encoder")(disp, corr)
            if self.n_gru_layers > 1:
                net[0] = ConvGRU(hd[2], dt, name="gru04")(
                    net[0], *inp[0],
                    *xs(motion, interp_to(net[1], net[0])),
                )
            else:
                net[0] = ConvGRU(hd[2], dt, name="gru04")(net[0], *inp[0], motion)

        if not update:
            return net

        delta_disp = DispHead(256, dt, name="disp_head")(net[0])
        km, bm = _ConvParams(32, (3, 3), name="mask_feat_4")(net[0].shape[-1])
        mask_feat_4 = jax.nn.relu(_apply3x3(net[0], km, bm, dt))
        return net, mask_feat_4, delta_disp
