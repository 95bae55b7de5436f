"""Combined Geometry Encoding Volume lookup (IGEV), TPU-native.

Re-design of KITTI15/core/geometry_ddim.py:6-80: precompute a 2-level pyramid
of (a) the 8-channel Geometry Encoding Volume and (b) the all-pairs scanline
correlation, then per GRU iteration sample a ±radius window around the current
disparity.  The reference reshapes to ``(B*H*W, C, 1, D)`` and calls
grid_sample; here the volumes stay ``(B, H, W, D, C)`` and sampling is a
vectorized 1-D linear interpolation (stereo-only; zero outside range,
align_corners=True pixel coordinates — identical to the reference's
bilinear_sampler contract, KITTI15/core/utils/utils.py:59-77).

Noise injection: the diffusion latent multiplies the GEV before sampling
(geometry_ddim.py:56).  NOTE a deliberate fidelity deviation: the reference's
``noisy.reshape(batch*h1*w1, 1, 1, -1)`` on a ``(B, 48, H, W)`` tensor
scrambles the (pixel, bin) grouping (C-order reshape mixes bins across
pixels); here the paper's intent — per-pixel, per-bin alignment — is
implemented instead.  For checkpoint-parity evaluation against released
reference weights, ``fold_reference_noise`` + ``geo_lookup(noise_eff=...)``
reproduce the reference semantics bit-faithfully (the scramble AND the
pool-then-multiply order; see fold_reference_noise).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from diffuvolume_tpu.ops.sampling import hat_sample_last2


class GeoPyramid(NamedTuple):
    """Precomputed lookup pyramids (levels along the disparity axis).

    Three interchangeable correlation representations (equal outputs within
    their documented domains):

    * ``corr_levels`` holds the materialized all-pairs correlation per level
      (dense VPU hat-contraction over the full scanline at lookup time).
    * ``match_l``/``match_r_levels`` hold the raw descriptors
      (``corr_mode="rsamp"``): the lookup hat-samples the pooled right
      descriptors (an MXU matmul over the scanline) and dots with the left
      descriptor — avg-pooling correlation over v equals correlating with the
      avg-pooled right descriptors, by linearity.
    * ``band_levels`` holds a **diagonal band** of the correlation
      (``corr_mode="band"``, the fast default for inference): the lookup
      position is ``(w - disp)·2⁻ⁱ + dx``, i.e. at most ``maxdisp·2⁻ⁱ + r + 1``
      columns left of the anchor ``⌊w·2⁻ⁱ⌋``, so only a ~58-wide diagonal
      band of the (W, W/2ⁱ) correlation matrix is ever sampled.  Extracting
      it (pure pad+reshape stride tricks — no gather) shrinks the per-GRU-
      iteration hat contraction from W/2ⁱ to ``band`` lanes (measured
      260 → ~65 µs/iter at 384×1248 on v5e).
    """

    geo_levels: tuple[jax.Array, ...]   # (level 0 only) (B, H, W, D, C)
    corr_levels: tuple[jax.Array, ...]  # each (B, H, W, W2/2^i, 1); () in rsamp mode
    match_l: jax.Array | None = None          # (B, H, W, C) [rsamp mode]
    match_r_levels: tuple[jax.Array, ...] = ()  # each (B, H, W2/2^i, C) [rsamp mode]
    band_levels: tuple[jax.Array, ...] = ()  # each (B, H, W, band) [band mode]
    band_offs: tuple[int, ...] = ()          # per-level band offset
    band_mode: str = "diag"  # "diag" (anchored at ⌊w·2⁻ⁱ⌋) | "low" (absolute)


def all_pairs_correlation(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """Scanline all-pairs correlation (geometry_ddim.py:73-80, no scaling).

    Args:
      fmap1, fmap2: ``(B, H, W, C)`` match descriptors.

    Returns:
      ``(B, H, W1, W2)``.
    """
    return jnp.einsum("bhwc,bhvc->bhwv", fmap1, fmap2)


def _avgpool_last2(x: jax.Array) -> jax.Array:
    """Average-pool pairs along the second-to-last axis (D), matching
    F.avg_pool2d(kernel=[1,2]) on the reference's (P, C, 1, D) layout."""
    d = x.shape[-2] // 2
    return x[..., : 2 * d, :].reshape(*x.shape[:-2], d, 2, x.shape[-1]).mean(-2)


def _extract_diag_band(corr: jax.Array, level: int, band: int, off: int) -> jax.Array:
    """Diagonal band of a pyramid-level correlation, without any gather.

    ``out[b,h,w,k] = corr[b,h,w, (w >> level) + k - off]`` (zero outside
    ``[0, V)``), built from pure pad/reshape/slice ops: flattening the (W, V)
    matrix row-major, the anchored element ``(w, (w>>i)+c)`` with
    ``w = 2ⁱ·u + r`` sits at flat index ``u·(2ⁱ·V + 1) + r·V + c`` — i.e.
    rows of a reshape to ``(W/2ⁱ, 2ⁱ·V + 1)`` hold the bands of the 2ⁱ
    residues at static column offsets.

    Args:
      corr: ``(B, H, W, V, 1)`` level-``level`` correlation (V = W >> level).
      band: band width K (lanes of the per-iteration hat contraction).
      off: anchor offset — band column k holds diagonal offset ``k - off``.

    Returns:
      ``(B, H, W, band)``.
    """
    b, h, w, v, _ = corr.shape
    step = 1 << level
    assert w % step == 0 and band <= v + 1, (w, v, band)
    u = w // step
    stride = step * v + 1
    flat = corr.reshape(b, h, w * v)
    # pad left so k - off indexes become k, right up to u·stride rows.
    pad_r = u * stride - off - w * v
    assert pad_r >= 0, (u, stride, off)
    p = jnp.pad(flat, ((0, 0), (0, 0), (off, pad_r))).reshape(b, h, u, stride)
    parts = [p[:, :, :, r * v : r * v + band] for r in range(step)]
    out = jnp.stack(parts, axis=3).reshape(b, h, w, band)
    # Columns whose corr index (w>>level)+k-off falls outside [0, v) read the
    # flat pad (zero, correct) on the left but the NEXT row's data on the
    # right — mask both to reproduce dense zero padding exactly.
    idx = (jnp.arange(w)[:, None] >> level) + jnp.arange(band)[None, :] - off
    return out * ((idx >= 0) & (idx < v)).astype(out.dtype)


def build_geo_pyramid(
    match_left: jax.Array,
    match_right: jax.Array,
    geo_volume: jax.Array,
    num_levels: int = 2,
    corr_mode: str | None = None,
    band: int = 64,
    geo_pool: bool | None = None,
    hwdc: bool = False,
) -> GeoPyramid:
    """Precompute the GEV + correlation pyramids (geometry_ddim.py:7-31).

    The geo "pyramid" holds only the level-0 volume: pooled-level samples are
    re-expressed at lookup time as coarsened hat weights on the level-0 bin
    axis (see ``geo_lookup``), so the avg-pooled geo copies are never built.
    The correlation pyramid is still materialized per level (its axis is the
    full image width; one dense pass per level is cheaper than widening the
    level-0 contraction).

    Args:
      match_left/right: ``(B, H, W, C)`` descriptors.
      geo_volume: ``(B, D, H, W, C=8)`` geometry encoding volume.
      num_levels: pyramid depth (2 in the reference).
      corr_mode: "volume" (dense, exact for any disparity), "band" (diagonal
        band, exact for quarter-res disparities in ``[-1, band-7-5]`` — 52 px
        for the default 64 band, vs the 48-bin disparity range; out-of-band
        positions read 0 like the reference's out-of-image zero padding), or
        "rsamp" (descriptor resampling).  ``None`` → ``$DIFFU_CORR_MODE`` or
        "volume".
      band: band width for "band" mode (lane count of the per-iter contraction).
      geo_pool: materialize the avg-pooled geo levels so level i contracts
        J·D/2ⁱ·C per iteration instead of J·D·C via coarsened level-0 hats
        (exact either way, by linearity of pooling).  ``None`` →
        ``$DIFFU_GEO_POOL1`` (default off — MEASURED WORSE on v5e at
        384×1248: 2.35 → 2.87 ms/GRU-iter; the pooled (…,24,8) volume's
        lane-padded layout makes the level-1 einsum cost as much as the
        full 48-bin one, 204 µs each vs 194 combined).
    """
    # hwdc=True: the volume already arrives (B, H, W, D, C) — the packed
    # GEV tower unpacks channels-minor, killing this 8-D transpose.
    geo = geo_volume if hwdc else jnp.moveaxis(geo_volume, 1, 3)
    if geo_pool is None:
        geo_pool = os.environ.get("DIFFU_GEO_POOL1", "0") == "1"
    geo_levels = [geo]
    if geo_pool:
        for _ in range(num_levels - 1):
            geo_levels.append(_avgpool_last2(geo_levels[-1]))
    geo_levels = tuple(geo_levels)
    if corr_mode is None:
        corr_mode = os.environ.get(
            "DIFFU_CORR_MODE", "rsamp" if os.environ.get("DIFFU_CORR_RSAMP") else "volume"
        )
    if corr_mode == "lowband":
        # Absolute low-column band (r5, for the reference-faithful "quirk"
        # eval): the quirk rollout samples the correlation at the CONSTANT
        # position init_disp·2⁻ⁱ + dx (coords1 − flow = init_disp,
        # igev_stereo_ddim.py:243-247), so every sample lands in columns
        # [−5, maxdisp/4 + r + 1] ⊂ [0, band) — only the first `band`
        # columns of the all-pairs matrix are ever touched.  Build just
        # those with a narrow einsum (W×band instead of W×W2) and sample
        # with absolute positions (band_mode="low"); exact-equivalence to
        # volume mode whenever positions ≤ band − 2 (47·2⁻ⁱ + 5 ≤ 54 here).
        vmax = match_right.shape[2]
        bw = min(band, vmax)
        corr = jnp.einsum(
            "bhwc,bhvc->bhwv", match_left, match_right[:, :, :bw]
        )
        levels = [corr]
        for _ in range(num_levels - 1):
            prev = levels[-1]
            v2 = prev.shape[-1] // 2
            levels.append(
                prev[..., : 2 * v2].reshape(*prev.shape[:-1], v2, 2).mean(-1)
            )
        return GeoPyramid(
            geo_levels=geo_levels,
            corr_levels=(),
            band_levels=tuple(levels),
            band_offs=(0,) * num_levels,
            band_mode="low",
        )
    if corr_mode == "rsamp":
        r_levels = [match_right]
        for _ in range(num_levels - 1):
            r = r_levels[-1]
            v = r.shape[2] // 2
            r_levels.append(
                r[:, :, : 2 * v].reshape(r.shape[0], r.shape[1], v, 2, r.shape[3]).mean(3)
            )
        return GeoPyramid(
            geo_levels=geo_levels,
            corr_levels=(),
            match_l=match_left,
            match_r_levels=tuple(r_levels),
        )
    corr = all_pairs_correlation(match_left, match_right)[..., None]  # (B,H,W,W2,1)
    corr_levels = [corr]
    for _ in range(num_levels - 1):
        corr_levels.append(_avgpool_last2(corr_levels[-1]))
    if corr_mode == "band":
        # Per-level width clamp (a pooled level can be narrower than `band`);
        # the coverage bound is then min_i 2^i·(band_i - 12) quarter-res px.
        bands = [min(band, cl.shape[-2] + 1) for cl in corr_levels]
        offs = [bi - 7 for bi in bands]
        return GeoPyramid(
            geo_levels=geo_levels,
            corr_levels=(),
            band_levels=tuple(
                _extract_diag_band(cl, i, bi, oi)
                for i, (cl, bi, oi) in enumerate(zip(corr_levels, bands, offs))
            ),
            band_offs=tuple(offs),
        )
    assert corr_mode == "volume", corr_mode
    return GeoPyramid(
        geo_levels=geo_levels,
        corr_levels=tuple(corr_levels),
    )


def fold_reference_noise(
    noise_mod: jax.Array, num_levels: int = 2
) -> jax.Array:
    """Reference-faithful noise weights, expressed on level-0 bins.

    Reproduces TWO reference behaviors our default path deliberately cleans
    up (geometry_ddim.py:37-58):

    1. **The reshape scramble**: ``noisy.reshape(batch*h1*w1, 1, 1, -1)`` on a
       C-contiguous ``(B, D, H, W)`` tensor assigns pixel ``p = h*W + w`` the
       D consecutive elements ``flat[p*D : (p+1)*D]`` of the flattened
       ``(D, H, W)`` block — mixing bins across pixels.
    2. **Pool-then-multiply**: the level-i sample is
       ``Σ_k hat_i(k)·pool_i(geo)[k]·pool_i(noise)[k]`` — the noise pyramid is
       pooled SEPARATELY from the geo pyramid, which differs from multiplying
       at level 0 and pooling the product (cross terms
       ``geo[2k]·noise[2k+1]``).  Because pooling is linear, the level-i term
       rewrites exactly onto level-0 bins:
       ``Σ_d geo[d] · hat_i(d>>i)/2^i · pool_i(noise)[d>>i]`` — so the pooled
       noise folds into the coarsened hat weights ``geo_lookup`` already uses.

    Args:
      noise_mod: ``(B, D, H, W)`` time-embedded [0,1] noise volume.
      num_levels: pyramid depth (2 in the reference).

    Returns:
      ``(B, H, W, L, D)`` per-level multiplicative weights on level-0 bins,
      to be passed as ``geo_lookup(..., noise_eff=...)`` (with CLEAN geo).
    """
    b, d, h, w = noise_mod.shape
    # (1) the scramble: row p of the (D·H·W)-flat block.
    n0 = noise_mod.reshape(b, d * h * w).reshape(b, h, w, d)
    levels = [n0]
    for _ in range(num_levels - 1):
        prev = levels[-1]
        d2 = prev.shape[-1] // 2
        levels.append(
            prev[..., : 2 * d2].reshape(b, h, w, d2, 2).mean(-1)
        )
    # (2) express pooled noise on level-0 bins: eff_i[d] = pool_i(n)[d >> i].
    eff = [jnp.repeat(lv, 2 ** i, axis=-1)[..., :d] for i, lv in enumerate(levels)]
    return jnp.stack(eff, axis=-2)  # (B, H, W, L, D)


def geo_lookup(
    pyramid: GeoPyramid,
    disp: jax.Array,
    coords: jax.Array,
    noisy: jax.Array | None = None,
    radius: int = 4,
    concat: bool = True,
    noise_eff: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, ...]:
    """Sample geometry + correlation features around the current disparity.

    Reference: geometry_ddim.py:33-69 (DDIM variant multiplies the noise
    volume into the GEV before sampling; pass ``noisy=None`` for the plain
    geometry.py:6-69 behavior).

    Args:
      pyramid: precomputed pyramids.
      disp: ``(B, H, W)`` current disparity (in 1/4-res pixel units).
      coords: ``(B, H, W)`` x-coordinate grid.
      noisy: optional ``(B, D, H, W)`` [0,1] noise volume.
      radius: window radius r (4 → 9 taps).
      concat: flatten+concatenate the pieces into one channels-last feature.
        ``False`` returns the raw ``(B, H, W, 2r+1, C)`` pieces in concat
        order — consumers that contract the (tap, channel) dims directly
        (BasicMotionEncoder's 1×1 conv) avoid the relayout copies XLA inserts
        to feed a channels-minor concat from the matmul-native
        taps/channels-minor einsum outputs (~0.2 ms/GRU-iter on v5e).
      noise_eff: optional ``(B, H, W, L, D)`` reference-faithful per-level
        noise weights from ``fold_reference_noise`` — multiplied into the hat
        weights (pass with CLEAN geo, mutually exclusive with ``noisy``).

    Returns:
      ``(B, H, W, num_levels*(C+1)*(2r+1))`` lookup features (162 ch for the
      reference config), channels-last; or the tuple of pieces.
    """
    b, h, w = disp.shape
    num_levels = (
        len(pyramid.corr_levels)
        or len(pyramid.match_r_levels)
        or len(pyramid.band_levels)
    )
    j = 2 * radius + 1
    dx = jnp.arange(-radius, radius + 1, dtype=disp.dtype)

    geo = pyramid.geo_levels[0]  # (B, H, W, D, C)
    if noisy is not None:
        geo = geo * jnp.moveaxis(noisy, 1, 3)[..., None]
    d = geo.shape[-2]
    assert d % (2 ** (num_levels - 1)) == 0, (d, num_levels)
    bins = jnp.arange(d, dtype=disp.dtype)

    if len(pyramid.geo_levels) > 1 and noise_eff is None:
        # Materialized-pyramid mode: each level contracts against its own
        # (pooled) volume — level i costs J·D/2ⁱ·C instead of J·D·C, cutting
        # the per-iteration VPU work ~25% for 2 levels.  Outputs stay one
        # block per level (never concatenated — see the layout note below).
        g_levels = [geo]
        for i in range(1, num_levels):
            g_levels.append(
                _avgpool_last2(g_levels[-1])
                if noisy is not None
                else pyramid.geo_levels[i]
            )
        geo_parts = []
        for i, gl in enumerate(g_levels):
            di = gl.shape[-2]
            binsi = jnp.arange(di, dtype=disp.dtype)
            x0 = disp[..., None] * (2.0 ** -i) + dx
            wgt_i = jnp.maximum(0.0, 1.0 - jnp.abs(x0[..., None] - binsi))
            if gl.dtype == jnp.bfloat16:
                wgt_i = wgt_i.astype(jnp.bfloat16)
            else:
                gl = gl.astype(wgt_i.dtype)
            geo_parts.append(jnp.einsum("bhwjd,bhwdc->bhwjc", wgt_i, gl))
        geo_out = None
    else:
        geo_parts = None

    # All pyramid levels as ONE contraction over the level-0 volume: sampling
    # the 2^i-avg-pooled volume at x_i = disp/2^i + dx is, by linearity of the
    # pooling, identical to contracting the level-0 bins with the coarsened
    # hat  max(0, 1 - |x_i - floor(d/2^i)|) / 2^i.  One pass over the volume
    # instead of one per level, and the pooled copies (whose D=24 minor dim
    # lane-pads 128/24 = 5.3x on TPU) never exist.
    #
    # The weights MUST stay one elementwise expression of `disp` (constants
    # broadcast per (level, tap)) — a jnp.concatenate of per-level parts
    # defeats XLA's operand fusion into the dot and materializes the
    # (B,H,W,L*J,D) tensor in HBM (measured +330 us/GRU-iter at 384x1248).
    if geo_parts is None:
        scale_vec = jnp.repeat(
            2.0 ** -jnp.arange(num_levels, dtype=disp.dtype), j
        )  # (L*J,)
        dx_all = jnp.tile(dx, num_levels)  # (L*J,)
        x0_all = disp[..., None] * scale_vec + dx_all  # (B, H, W, L*J)
        bins_all = jnp.floor(bins[None, :] * scale_vec[:, None])  # (L*J, D)
        wgt = (
            jnp.maximum(0.0, 1.0 - jnp.abs(x0_all[..., None] - bins_all))
            * scale_vec[:, None]
        )
        if noise_eff is not None:
            assert noisy is None, "noise_eff and noisy are mutually exclusive"
            # (B,H,W,L,D) → broadcast each level over its J taps.
            wgt = wgt * jnp.repeat(noise_eff.astype(wgt.dtype), j, axis=-2)
        if geo.dtype == jnp.bfloat16:
            # Two nonzero taps per row: bf16 accumulation adds no error (see
            # ops/sampling.py::hat_sample_last2 for the layout rationale).
            wgt = wgt.astype(jnp.bfloat16)
        else:
            geo = geo.astype(wgt.dtype)
        geo_out = jnp.einsum("bhwjd,bhwdc->bhwjc", wgt, geo)  # (B,H,W,L*J,C)

    corr_out = []
    if pyramid.band_levels and pyramid.band_mode == "low":
        # Absolute low-column band (quirk eval): positions are the plain
        # volume-mode coordinates, which provably stay inside the band.
        for i, bnd in enumerate(pyramid.band_levels):
            scale = 1.0 / (2 ** i)
            p = (coords[..., None] - disp[..., None]) * scale + dx
            corr_out.append(hat_sample_last2(bnd[..., None], p))  # (B,H,W,J,1)
    elif pyramid.band_levels:
        # Band mode: positions relative to the per-level anchor ⌊w·2⁻ⁱ⌋.  The
        # w-term collapses to the residue fraction (w·s − ⌊w·s⌋), so the hat
        # contraction runs over `band` lanes instead of the full scanline.
        for i, (bnd, off) in enumerate(zip(pyramid.band_levels, pyramid.band_offs)):
            scale = 1.0 / (2 ** i)
            cs = coords * scale
            anchor = jnp.floor(cs)
            p = (cs - anchor - disp * scale)[..., None] + dx + float(off)
            corr_out.append(hat_sample_last2(bnd[..., None], p))  # (B,H,W,J,1)
    elif pyramid.corr_levels:
        for i, corr in enumerate(pyramid.corr_levels):
            scale = 1.0 / (2 ** i)
            cx0 = (coords[..., None] - disp[..., None]) * scale + dx
            corr_out.append(hat_sample_last2(corr, cx0))  # (B, H, W, 2r+1, 1)
    else:
        # rsamp mode: corr[p, v] = <L[p], R[b, h, v]> is never materialized.
        # Hat-sample the (pooled) right descriptors along the scanline — a
        # per-row MXU matmul (M=W·J, K=W2/2^i, N=C) whose hat operand XLA
        # generates inside the dot fusion — then dot with the left descriptor.
        ml = pyramid.match_l
        for i, r2 in enumerate(pyramid.match_r_levels):
            scale = 1.0 / (2 ** i)
            cx0 = (coords[..., None] - disp[..., None]) * scale + dx  # (B,H,W,J)
            v = r2.shape[2]
            binsv = jnp.arange(v, dtype=cx0.dtype)
            wv = jnp.maximum(0.0, 1.0 - jnp.abs(cx0[..., None] - binsv))
            if r2.dtype == jnp.bfloat16:
                wv = wv.astype(jnp.bfloat16)
            else:
                r2 = r2.astype(wv.dtype)
            rs = jnp.einsum("bhwjv,bhvc->bhwjc", wv, r2)
            cr = jnp.einsum("bhwjc,bhwc->bhwj", rs, ml.astype(rs.dtype))
            corr_out.append(cr[..., None])  # (B, H, W, J, 1)

    if concat:
        # Canonical 162-channel order: [geo_0, corr_0, geo_1, corr_1].
        out = []
        for i, cr in enumerate(corr_out):
            g_i = geo_parts[i] if geo_parts else geo_out[..., i * j : (i + 1) * j, :]
            out.append(g_i)
            out.append(cr)
        return jnp.concatenate([o.reshape(b, h, w, -1) for o in out], axis=-1)

    # Pieces form: each geo block stays WHOLE — slicing it per level makes XLA
    # materialize the slices at the loop boundary (measured +170 us/GRU-iter);
    # instead each piece carries the static kernel-row indices it corresponds
    # to in the canonical concat order, and BasicMotionEncoder contracts the
    # block against the row-gathered kernel in one einsum.
    c_ = (geo_parts[0] if geo_parts else geo_out).shape[-1]
    jc = j * (c_ + 1)  # channels per level in canonical order
    if geo_parts:
        pieces = [
            (g_i, tuple(range(i * jc, i * jc + j * c_)))
            for i, g_i in enumerate(geo_parts)
        ]
    else:
        geo_rows = np.concatenate(
            [np.arange(i * jc, i * jc + j * c_) for i in range(num_levels)]
        )
        pieces = [(geo_out, tuple(geo_rows.tolist()))]
    for i, cr in enumerate(corr_out):
        rows = np.arange(i * jc + j * c_, (i + 1) * jc)
        pieces.append((cr, tuple(rows.tolist())))
    return tuple(pieces)
