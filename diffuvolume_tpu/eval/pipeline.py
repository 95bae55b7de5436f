"""Two-model DDIM inference pipeline.

The reference's inference contract (SceneFlow/test_sceneflow_ddim.py:101-108):
pass 1 runs the *frozen pretrained baseline* for an initial disparity, pass 2
feeds it to the DiffuVolume model as conditioning and runs the short DDIM loop.

The pipeline is compiled as two cached XLA programs — (a) baseline pass +
volume construction + conditioning encode, (b) the DDIM scan.  A single
fused program is numerically fragile here: XLA's global fusion of the
baseline pass into the scan body has been observed to manufacture NaNs
(valid per-stage outputs, NaN composite output; see tests/test_pipeline.py),
and two programs lose nothing — the scan dominates runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffuvolume_tpu.diffusion import DDIMConfig, ddim_sample, make_schedule
from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
from diffuvolume_tpu.models.acv import ACVNet
from diffuvolume_tpu.ops.regression import resize_bilinear


def _acv_packed_flag() -> bool:
    """Packed all-Pallas ACV denoise path (acv_denoise_fast).

    DEFAULT ON since r4: 3.46 pairs/s vs 2.59 on the module path at the
    512×960 bench (the fold_s2/fold_up flat-shift rewrites closed the r3
    gap).  ``DIFFU_ACV_PACKED=0`` restores the module path.

    Read ONCE per inference call and passed into the stage cache as part of
    its key (flipping ``DIFFU_ACV_PACKED`` between calls takes effect — same
    pattern as ``DIFFU_CORR_MODE``; a trace-time read inside the cached
    stage would silently pin the first value seen).
    """
    import os

    return os.environ.get("DIFFU_ACV_PACKED", "1") == "1"


def _acv_prep_fn(baseline_model: ACVNet, ddim_model: ACVNet, cfg: DDIMConfig,
                 sample_packed: bool = True):
    """The pass-1/prep body (uncompiled): baseline forward + conditioning
    encode + the DDIM model's volume build.  Shared by _stages and
    tools/trace_prep; the packed dispatch (DIFFU_ACV_PREP_PACKED) lives here.

    With the packed prep, "ac_volume" in the return is the ``(cl, cr, att)``
    feature triple (the packed sampler consumes it via pack_concat_k and the
    94 MB volume never exists); when the SAMPLE stage runs the module path
    (``sample_packed=False``) the volume is reconstructed here instead.
    """

    def prep(baseline_vars, ddim_vars, left, right):
        from diffuvolume_tpu.models.acv import acv_prep_fast
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        h4, w4 = left.shape[1] // 4, left.shape[2] // 4
        fast = (
            _acv_prep_packed_flag()
            and is_tpu_lowering()
            and "batch_stats" in ddim_vars
            and "batch_stats" in baseline_vars
            and h4 % 8 == 0
            and w4 % 4 == 0
        )
        if fast:
            baseline_disp, ac_volume = acv_prep_fast(
                baseline_model, ddim_model, baseline_vars, ddim_vars,
                left, right,
            )
            cl, cr, att = ac_volume
            if sample_packed:
                # Pack the scan-invariant concat volume ONCE; each DDIM step
                # pays only the att⊙noise multiply (packed_dhw_mul_k).
                from diffuvolume_tpu.models.acv import PackedConcat, _acv_tile_h
                from diffuvolume_tpu.ops.pallas.conv3d import pack_concat_k

                pk_cat = pack_concat_k(
                    cl, cr, None, None, max_disp=cfg.num_bins,
                    tile_h=_acv_tile_h(h4),
                )
                ac_volume = PackedConcat(pk_cat, att)
            else:
                from diffuvolume_tpu.ops.cost_volume import build_concat_volume

                ac_volume = att[..., None] * build_concat_volume(
                    cl, cr, cfg.num_bins)
        else:
            baseline_disp = baseline_model.apply(
                baseline_vars, left, right, train=False
            )[-1]
            ac_volume, _ = ddim_model.apply(
                ddim_vars, left, right, train=False,
                method=ACVNet.build_cost_volume,
            )
        # Conditioning: clamp → bilinear ↓4 → /4 (test_sceneflow_ddim.py:103-106).
        disp_q = (
            resize_bilinear(
                jnp.clip(baseline_disp, 0.0, cfg.max_disp - 1), (h4, w4), 1, 2
            )
            / 4.0
        )
        baseline_latent = encode_disparity_volume(disp_q, cfg.num_bins, cfg.scale)
        return baseline_disp, baseline_latent, ac_volume

    return prep


def _acv_prep_packed_flag() -> bool:
    """Packed pass-1/prep (acv_prep_fast) — trace-time read; _stages keys the
    jit cache on it via _acv_packed_flag-style plumbing in the caller."""
    import os

    return os.environ.get("DIFFU_ACV_PREP_PACKED", "1") == "1"


@functools.cache
def _stages(baseline_model: ACVNet, ddim_model: ACVNet, cfg: DDIMConfig,
            packed: bool = False, prep_packed: bool = False):
    sched = make_schedule(1000)

    prep = jax.jit(_acv_prep_fn(baseline_model, ddim_model, cfg,
                                sample_packed=packed))

    @jax.jit
    def sample(ddim_vars, ac_volume, baseline_disp, baseline_latent, rng):
        from diffuvolume_tpu.models.acv import acv_denoise_fast
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        h, w = baseline_disp.shape[1], baseline_disp.shape[2]
        h4, w4 = h // 4, w // 4
        # TPU eval A/B: all-Pallas packed aggregation (acv_denoise_fast —
        # numerically equal, parity-tested).  Shape guard: the packed
        # geometry needs the hourglass retile (h4 % 8) and the deconv
        # residual geometry (w4 % 4); unusual crops fall back to the module
        # path rather than die on an opaque Pallas spec mismatch.
        fast = (
            packed
            and is_tpu_lowering()
            and "batch_stats" in ddim_vars
            and h4 % 8 == 0
            and w4 % 4 == 0
        )

        def denoise_fn(latent, t):
            if fast:
                return acv_denoise_fast(
                    ddim_model, ddim_vars, ac_volume, latent, t, (h, w)
                )
            return ddim_model.apply(
                ddim_vars, ac_volume, latent, t, (h, w), method=ACVNet.denoise
            )

        final, _ = ddim_sample(
            sched, cfg, denoise_fn, baseline_disp, baseline_latent, rng
        )
        return final

    return prep, sample


def acv_ddim_inference(
    baseline_model: ACVNet,
    ddim_model: ACVNet,
    baseline_vars,
    ddim_vars,
    left: jax.Array,
    right: jax.Array,
    rng: jax.Array,
    cfg: DDIMConfig = DDIMConfig(),
) -> tuple[jax.Array, jax.Array]:
    """Full two-pass DiffuVolume inference for the ACVNet backbone.

    Args:
      baseline_model / ddim_model: module definitions (hashable, cached on).
      baseline_vars / ddim_vars: their parameter/batch-stats pytrees.
      left, right: ``(B, H, W, 3)`` normalized stereo pair (H, W multiples of 32
        in the reference's crops; any multiple of 16 works here).
      rng: PRNG key for the DDIM stochasticity.

    Returns:
      ``(final_disp (B,H,W), baseline_disp (B,H,W))``.
    """
    prep, sample = _stages(baseline_model, ddim_model, cfg, _acv_packed_flag(),
                           _acv_prep_packed_flag())
    baseline_disp, baseline_latent, ac_volume = prep(
        baseline_vars, ddim_vars, left, right
    )
    final = sample(ddim_vars, ac_volume, baseline_disp, baseline_latent, rng)
    return final, baseline_disp


def _pcw_packed_flag() -> bool:
    """All-Pallas packed PCW denoise (pcw_denoise_fast) — same cache-key
    pattern as the ACV flag.  Default ON since r4 (bench_pcw 2.047 → 2.125
    pairs/s); DIFFU_PCW_PACKED=0 restores the module path."""
    import os

    return os.environ.get("DIFFU_PCW_PACKED", "1") == "1"


def _pcw_prep_packed_flag() -> bool:
    """Packed PCW pass-1/prep (pcw_prep_fast) — r5, same cache-key pattern."""
    import os

    return os.environ.get("DIFFU_PCW_PREP_PACKED", "1") == "1"


@functools.cache
def _pcw_stages(baseline_model, ddim_model, cfg: DDIMConfig,
                packed: bool = False, prep_packed: bool = False):
    from diffuvolume_tpu.models.pcw import PCWNet

    sched = make_schedule(1000)

    @jax.jit
    def prep(baseline_vars, ddim_vars, left, right):
        from diffuvolume_tpu.models.pcw import pcw_prep_fast
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        h4, w4 = left.shape[1] // 4, left.shape[2] // 4
        fast = (
            prep_packed
            and is_tpu_lowering()
            and "batch_stats" in ddim_vars
            and "batch_stats" in baseline_vars
            and h4 % 8 == 0
            and w4 % 4 == 0
        )
        if fast:
            baseline_disp, combine, fl, fr = pcw_prep_fast(
                baseline_model, ddim_model, baseline_vars, ddim_vars,
                left, right,
            )
            if not packed:
                # Module-path sampler needs the dense combine volume.
                from diffuvolume_tpu.ops.pallas.conv3d import unpack_padded_k

                combine = unpack_padded_k(
                    combine.pk, cfg.num_bins, h4, w4, 32, tile_h=8)
        else:
            baseline_disp = baseline_model.apply(
                baseline_vars, left, right, train=False
            )[0][0]
            combine, _, fl, fr = ddim_model.apply(
                ddim_vars, left, right, train=False,
                method=PCWNet.build_cost_volume,
            )
        disp_q = (
            resize_bilinear(
                jnp.clip(baseline_disp, 0.0, cfg.max_disp - 1), (h4, w4), 1, 2
            )
            / 4.0
        )
        baseline_latent = encode_disparity_volume(disp_q, cfg.num_bins, cfg.scale)
        return baseline_disp, baseline_latent, combine, fl, fr

    @jax.jit
    def sample(ddim_vars, combine, fl, fr, baseline_disp, baseline_latent, rng):
        from diffuvolume_tpu.models.pcw import pcw_denoise_fast
        from diffuvolume_tpu.utils.platform import is_tpu_lowering

        h, w = baseline_disp.shape[1], baseline_disp.shape[2]
        # Packed Mish-hourglass denoise (r4): geometry guard mirrors the ACV
        # dispatch — unusual crops fall back to the module path.
        fast = (
            packed
            and is_tpu_lowering()
            and "batch_stats" in ddim_vars
            and (h // 4) % 8 == 0
            and (w // 4) % 4 == 0
        )

        def denoise_fn(latent, t):
            if fast:
                return pcw_denoise_fast(
                    ddim_model, ddim_vars, combine, fl, fr, latent, t, (h, w)
                )
            return ddim_model.apply(
                ddim_vars, combine, fl, fr, latent, t, (h, w),
                method=PCWNet.denoise,
            )

        final, _ = ddim_sample(
            sched, cfg, denoise_fn, baseline_disp, baseline_latent, rng
        )
        return final

    return prep, sample


def pcw_ddim_inference(
    baseline_model,
    ddim_model,
    baseline_vars,
    ddim_vars,
    left: jax.Array,
    right: jax.Array,
    rng: jax.Array,
    cfg: DDIMConfig | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Two-pass DiffuVolume inference for the PCWNet backbone.

    Reference contract: KITTI12/test.py:86-92 — frozen PCWNet ('gwcnet-gc')
    pass, then PWCNet_ddim DDIM-3 with the KITTI12 sampler variant.
    """
    from diffuvolume_tpu.diffusion.ddim import KITTI12_DDIM

    cfg = KITTI12_DDIM if cfg is None else cfg
    prep, sample = _pcw_stages(baseline_model, ddim_model, cfg,
                               _pcw_packed_flag(), _pcw_prep_packed_flag())
    baseline_disp, baseline_latent, combine, fl, fr = prep(
        baseline_vars, ddim_vars, left, right
    )
    final = sample(
        ddim_vars, combine, fl, fr, baseline_disp, baseline_latent, rng
    )
    return final, baseline_disp


def _eval_corr_mode() -> str:
    """IGEV eval correlation representation: the diagonal-band lookup by
    default (exact for quarter-res disparities in [-1, 52] — the full 48-bin
    range; see geometry.GeoPyramid), env-overridable for A/B measurement.

    Read ONCE per inference call (not at trace time inside cached stages), so
    flipping ``DIFFU_CORR_MODE`` between calls takes effect: the mode is part
    of the stage cache key.
    """
    import os

    return os.environ.get("DIFFU_CORR_MODE", "band")


@functools.cache
def _igev_stages(baseline_model, ddim_model, cfg: DDIMConfig, iters: int,
                 quirk: bool = False, corr_mode: str = "band",
                 packed: bool = False):
    # `packed` is a pure cache key: IGEVStereo.encode reads the
    # DIFFU_IGEV_PACKED env at trace time; keying here guarantees a flip
    # between calls retraces instead of serving the stale cached program.
    del packed
    from diffuvolume_tpu.models.igev.model import IGEVStereo, igev_forward

    sched = make_schedule(1000)

    @jax.jit
    def baseline_pass(baseline_vars, left, right):
        return igev_forward(
            baseline_model, baseline_vars, left, right, iters=iters,
            test_mode=True, corr_mode=corr_mode,
        )

    @jax.jit
    def sample(ddim_vars, left, right, baseline_disp, rng):
        from diffuvolume_tpu.models.igev.model import (
            igev_encode, igev_rollout, igev_rollout_ref_eval,
        )

        h4, w4 = left.shape[1] // 4, left.shape[2] // 4
        disp_q = (
            resize_bilinear(
                jnp.clip(baseline_disp, 0.0, cfg.max_disp - 1), (h4, w4), 1, 2
            )
            / 4.0
        )
        baseline_latent = encode_disparity_volume(disp_q, cfg.num_bins, cfg.scale)

        # Encode ONCE; each DDIM step re-runs only the GRU rollout with the
        # new latent (the reference re-uses its precomputed geo_fn the same
        # way, igev_stereo_ddim.py:401-427).
        # Quirk mode carries coords1 seeded with init_disp (a disparity
        # field, not the pixel-index grid) across DDIM steps; the diagonal
        # band's anchor assumes pixel-index coords, but the quirk's sample
        # positions are the CONSTANT init_disp·2⁻ⁱ + dx ∈ [0, 52] — the
        # "lowband" representation (first 64 correlation columns, absolute
        # positions) is exact there and replaces the r2-r4 all-pairs
        # "volume" fallback (equivalence-tested in test_igev_model.py).
        enc, pyramid = igev_encode(
            ddim_model, ddim_vars, left, right, train=False,
            corr_mode="lowband" if quirk else corr_mode,
        )

        def embed(latent, t):
            # The reference inverts noise from the transformed volume
            # (igev_stereo_ddim.py:228-231→290); same embed as inside the
            # rollout, so XLA CSEs the duplicate.
            return ddim_model.apply(
                ddim_vars, latent, t, method=IGEVStereo.embed_noise
            )

        if quirk:
            # Reference-faithful eval: residual-coords GRU state carried
            # across DDIM steps, scrambled noise, re-encode offset by
            # init_disp (igev_stereo_ddim.py:226-292,313).
            init_disp = enc["init_disp"]

            def denoise_fn(latent, t, coords1):
                resid_up, c1 = igev_rollout_ref_eval(
                    ddim_model, ddim_vars, enc, pyramid, iters, coords1,
                    latent, t,
                )
                return resid_up, jnp.zeros_like(resid_up), embed(latent, t), c1

            def reencode_fn(disp):
                # clamp full-res residual to [0,47] px → ↓4 bilinear → /4 →
                # + init_disp → clamp [0,47] (igev_stereo_ddim.py:266-276).
                d = jnp.clip(disp, 0.0, 47.0)
                dq = resize_bilinear(d, (h4, w4), h_axis=1, w_axis=2) / 4.0
                return jnp.clip(dq + init_disp, 0.0, 47.0)

            final, _ = ddim_sample(
                sched, cfg, denoise_fn, baseline_disp, baseline_latent, rng,
                reencode_fn=reencode_fn, denoise_aux_init=init_disp,
            )
            return final

        def denoise_fn(latent, t):
            disp_ups = igev_rollout(
                ddim_model, ddim_vars, enc, pyramid, iters, noisy=latent, t=t,
                test_mode=True,
            )
            disp = disp_ups[-1]
            # KITTI15 renewal has no uncertainty term (use_uncertainty=False).
            return disp, jnp.zeros_like(disp), embed(latent, t)

        final, _ = ddim_sample(
            sched, cfg, denoise_fn, baseline_disp, baseline_latent, rng
        )
        return final

    return baseline_pass, sample


def igev_ddim_inference(
    baseline_model,
    ddim_model,
    baseline_vars,
    ddim_vars,
    left: jax.Array,
    right: jax.Array,
    rng: jax.Array,
    cfg: DDIMConfig | None = None,
    iters: int = 32,
    quirk: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Two-pass DiffuVolume inference for the IGEV backbone.

    Reference contract: KITTI15/evaluate_stereo.py:88-99 — frozen IGEVStereo
    (32 iters) pass, then IGEVStereo_ddim DDIM-2 with the KITTI15 sampler
    variant (no uncertainty term, hard clamp to baseline, fresh q_sample
    replacement).  Inputs are RAW [0,255] images.

    ``quirk=True`` evaluates with the reference's exact quirks (residual
    coords, noise scramble — see igev_rollout_ref_eval) for released-
    checkpoint parity; default is our cleaned-up absolute-disparity rollout.
    """
    from diffuvolume_tpu.diffusion.ddim import KITTI15_DDIM

    cfg = KITTI15_DDIM if cfg is None else cfg
    from diffuvolume_tpu.models.igev.model import _igev_packed_flag

    baseline_pass, sample = _igev_stages(
        baseline_model, ddim_model, cfg, iters, quirk, _eval_corr_mode(),
        _igev_packed_flag(),
    )
    baseline_disp = baseline_pass(baseline_vars, left, right)
    final = sample(ddim_vars, left, right, baseline_disp, rng)
    return final, baseline_disp


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _baseline_forward(model, variables, inputs, iters, corr_mode="band",
                      packed=False):
    del packed  # jit-cache key only (encode reads the env at trace time)
    left, right = inputs
    if iters is not None:  # IGEV path
        from diffuvolume_tpu.models.igev.model import igev_forward

        return igev_forward(model, variables, left, right, iters=iters,
                            test_mode=True, corr_mode=corr_mode)
    out = model.apply(variables, left, right, train=False)
    # ACV eval returns [pred]; PCW eval returns ([disp_finetune], [prob3]).
    disp = out[0]
    while isinstance(disp, (list, tuple)):
        disp = disp[0]
    return disp


def baseline_inference(model, variables, left, right, iters: int | None = None):
    """Frozen-baseline single-pass disparity (no diffusion).

    The reference's baseline-only evaluation (KITTI15/evaluate_stereo_origin.py;
    SceneFlow/KITTI12 get the same by evaluating model_origin alone).

    Args:
      iters: GRU iterations for the IGEV backbone; None for ACV/PCW.

    Returns:
      ``(B, H, W)`` disparity.
    """
    from diffuvolume_tpu.models.igev.model import _igev_packed_flag

    return _baseline_forward(model, variables, (left, right), iters,
                             _eval_corr_mode(), _igev_packed_flag())
