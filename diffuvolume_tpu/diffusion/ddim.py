"""Generic DDIM sampler with renewal confidence filtering and step ensembling.

One `lax.scan`-based implementation covering all three reference variants
(SceneFlow/models/acv_ddim.py:298-370, KITTI12/models/pwcnet_ddim.py:530-602,
KITTI15/core/igev_stereo_ddim.py:294-359), parameterized by `DDIMConfig` —
see the presets at the bottom.

The backbone enters only through ``denoise_fn(latent, t) -> (disp, unc,
transformed_latent)``:
run the full aggregation/regression head with the noise volume multiplied into
the cost volume, and return the full-resolution disparity plus the
full-resolution probability volume (needed for the uncertainty score; pass
zeros when ``use_uncertainty=False``).  The DDIM algebra, disparity
re-encoding, renewal masking, latent replacement, and ensembling are shared
and fully jittable (static step count, no Python control flow on traced
values).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from diffuvolume_tpu.diffusion import schedule as sched_lib
from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
from diffuvolume_tpu.ops.regression import resize_bilinear


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    """Per-backbone DDIM sampling configuration.

    Defaults are the SceneFlow/ACVNet values (acv_ddim.py:130-145,320-338,367);
    see SCENEFLOW_DDIM / KITTI12_DDIM / KITTI15_DDIM below.
    """

    sampling_steps: int = 5
    eta: float = 1.0
    scale: float = 1.0
    renewal: bool = True
    use_ensemble: bool = True
    # Initial latent: the encoded baseline volume (SceneFlow, acv_ddim.py:311)
    # or pure Gaussian noise (KITTI12/15, pwcnet_ddim.py:541).
    init_mode: str = "baseline"  # "baseline" | "noise"
    # Renewal thresholds: |pred - baseline| < consistency_tau AND
    # uncertainty < uncertainty_tau (uncertainty term disabled for KITTI15,
    # igev_stereo_ddim.py:316-319).
    consistency_tau: float = 1.0
    uncertainty_tau: float = 3.0
    use_uncertainty: bool = True
    # KITTI12 computes but never uses a final-step mask and skips the mask
    # accumulation on the last step (pwcnet_ddim.py:560-574).
    skip_mask_update_on_last: bool = False
    # KITTI15 additionally hard-clamps each step's prediction to the baseline
    # where |disp - baseline| >= hard_clamp_tau BEFORE ensembling
    # (igev_stereo_ddim.py:322-326).
    hard_clamp_tau: float | None = None
    # Latent replacement for untrusted pixels: SceneFlow uses uniform noise
    # (acv_ddim.py:360-362), KITTI15 re-noises the baseline volume fresh each
    # step ("qsample", igev_stereo_ddim.py:343-346), KITTI12 re-noises a
    # RUNNING latent that compounds q_sample applications across steps
    # ("qsample_compound", pwcnet_ddim.py:590-593 reassigns asd).
    replace_mode: str = "uniform"  # "uniform" | "qsample" | "qsample_compound"
    # Ensemble weights over [baseline, step_1, ..., step_N].
    ensemble_weights: Sequence[float] = (0.5, 0.0, 0.0, 0.0, 0.2, 0.3)
    max_disp: int = 192
    num_bins: int = 48
    # Disparity clamp ceiling for the x_start re-encode: max_disp-1 for
    # SceneFlow/KITTI12 (acv_ddim.py:272), num_bins-1 for KITTI15's variant
    # (igev_stereo_ddim.py:268).
    reencode_clip_max: float | None = None
    # Which x_t the noise inversion uses.  The reference shadows its ``noise``
    # variable inside model_predictions: the latent is time-embedded, clamped
    # to ±scale, and rescaled to [0,1] BEFORE predict_noise_from_start sees it
    # (acv_ddim.py:256-258→295, pwcnet_ddim.py:468-470→... , igev_stereo_ddim.py
    # :228-231→290) — all three variants, and the released checkpoints were
    # trained/evaluated under it.  "transformed" reproduces that (default;
    # requires denoise_fn to return the transformed volume as a 3rd output);
    # "latent" is the textbook DDIM inversion from the raw latent.
    invert_from: str = "transformed"  # "transformed" | "latent"


def ddim_sample(
    sched: sched_lib.DiffusionSchedule,
    cfg: DDIMConfig,
    denoise_fn: Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]],
    baseline_disp: jax.Array,
    baseline_latent: jax.Array,
    rng: jax.Array,
    reencode_fn: Callable[[jax.Array], jax.Array] | None = None,
    denoise_aux_init=None,
    noise_source: dict | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Run the short DDIM trajectory and return the ensembled disparity.

    Args:
      sched: precomputed diffusion schedule.
      cfg: sampler configuration.
      denoise_fn: ``(latent (B,D,H4,W4), t (B,)) -> (disp (B,H,W), unc (B,H,W)
        [, transformed (B,D,H4,W4)])`` — one full aggregation pass of the
        backbone with noise injection; ``unc`` is the renewal uncertainty
        ``Σ|d-d̂|·p(d)`` (zeros when ``use_uncertainty=False``);
        ``transformed`` is the time-embedded [0,1]-rescaled volume the
        backbone multiplied into its cost volume (required when
        ``cfg.invert_from == 'transformed'``, the reference-faithful default).
      baseline_disp: ``(B, H, W)`` full-resolution prediction of the frozen
        baseline network (the conditioning / `used` input).
      baseline_latent: ``(B, D, H4, W4)`` encoded baseline volume in
        ``[-scale, scale]`` — the q_sample replacement source (and the initial
        latent when ``init_mode='baseline'``).
      rng: PRNG key.
      reencode_fn: optional override mapping the step disparity ``(B,H,W)`` to
        the quarter-res bin-unit disparity used for the x_start re-encode
        (KITTI15 adds its init-disp offset here); default = clamp → ↓4 → /4.
      denoise_aux_init: optional pytree of backbone state threaded THROUGH the
        DDIM steps.  When given, ``denoise_fn`` is called as
        ``denoise_fn(latent, t, aux) -> (disp, unc, transformed, new_aux)``.
        The reference's KITTI15 eval carries its GRU coordinate state
        (``coords1``) across DDIM steps this way (igev_stereo_ddim.py:313).
      noise_source: optional deterministic noise injection (whole-loop parity
        testing against the reference's torch RNG stream).  Keys, all
        optional: ``"init"`` ``(B,D,H4,W4)`` — the initial latent draw when
        ``init_mode='noise'``; ``"z"`` ``(steps,B,D,H4,W4)`` — the per-step
        DDIM sigma noise; ``"replace"`` ``(steps,B,D,H4,W4)`` — the per-step
        replacement draw (the uniform sample itself for
        ``replace_mode='uniform'``, the q_sample Gaussian eps otherwise).
        Missing keys fall back to the PRNG.

    Returns:
      ``(final_disp (B,H,W), step_disps (steps, B, H, W))``.
    """
    # The diffusion algebra runs in f32 regardless of the backbone dtype; a
    # bf16 backbone otherwise makes the scan carry dtype-mismatch against the
    # f32 denoise outputs.
    baseline_disp = baseline_disp.astype(jnp.float32)
    baseline_latent = baseline_latent.astype(jnp.float32)
    b, d, h4, w4 = baseline_latent.shape
    coefs = sched_lib.ddim_step_coefficients(
        sched.num_timesteps, cfg.sampling_steps, cfg.eta
    )
    pairs = jnp.asarray(coefs["pairs"])
    sigmas = jnp.asarray(coefs["sigma"])
    cs = jnp.asarray(coefs["c"])
    sqrt_alpha_nexts = jnp.asarray(coefs["sqrt_alpha_next"])
    rng, k_init = jax.random.split(rng)
    step_keys = jax.random.split(rng, cfg.sampling_steps)

    noise_source = noise_source or {}
    if cfg.init_mode == "baseline":
        init_latent = baseline_latent
    elif cfg.init_mode == "noise":
        if "init" in noise_source:
            init_latent = jnp.asarray(noise_source["init"], baseline_latent.dtype)
        else:
            init_latent = jax.random.normal(
                k_init, baseline_latent.shape, baseline_latent.dtype
            )
    else:
        raise ValueError(cfg.init_mode)

    if reencode_fn is None:
        clip_max = (
            cfg.reencode_clip_max
            if cfg.reencode_clip_max is not None
            else cfg.max_disp - 1
        )

        def reencode_fn(disp):
            # clamp → bilinear ↓4 (align_corners=False) → /4 (acv_ddim.py:272-274)
            disp_c = jnp.clip(disp, 0.0, clip_max)
            return resize_bilinear(disp_c, (h4, w4), h_axis=1, w_axis=2) / 4.0

    inj_z = noise_source.get("z")
    inj_replace = noise_source.get("replace")

    def step(carry, xs):
        latent, mask, replace_src, aux = carry
        (time, time_next), sigma, c, sqrt_alpha_next, key, step_idx, z_inj, r_inj = xs
        k_z, k_replace = jax.random.split(key)
        t_vec = jnp.full((b,), time, dtype=jnp.int32)

        if denoise_aux_init is not None:
            out = denoise_fn(latent, t_vec, aux)
            aux = out[3]
        else:
            out = denoise_fn(latent, t_vec)
        disp, unc = out[0], out[1]

        x_start = encode_disparity_volume(reencode_fn(disp), cfg.num_bins, cfg.scale)
        x_start = jnp.clip(x_start, -cfg.scale, cfg.scale)

        if cfg.invert_from == "transformed":
            if len(out) < 3:
                raise ValueError(
                    "invert_from='transformed' needs denoise_fn to return the "
                    "time-embedded [0,1]-rescaled volume as a 3rd output"
                )
            x_t = out[2].astype(jnp.float32)
        elif cfg.invert_from == "latent":
            x_t = latent
        else:
            raise ValueError(cfg.invert_from)
        pred_noise = sched_lib.predict_noise_from_start(sched, x_t, t_vec, x_start)

        if cfg.renewal:
            dif = jnp.abs(disp - baseline_disp)
            m = jnp.where(dif < cfg.consistency_tau, 1.0, 0.0)
            if cfg.use_uncertainty:
                m = m * jnp.where(unc < cfg.uncertainty_tau, 1.0, 0.0)
            m = resize_bilinear(m, (h4, w4), h_axis=1, w_axis=2)
            new_mask = jnp.clip(mask + m, 0.0, 1.0)
            if cfg.skip_mask_update_on_last:
                is_last = step_idx == cfg.sampling_steps - 1
                new_mask = jnp.where(is_last, mask, new_mask)
            mask = new_mask

        if cfg.hard_clamp_tau is not None:
            near = jnp.abs(disp - baseline_disp) < cfg.hard_clamp_tau
            disp = jnp.where(near, disp, baseline_disp)

        # DDIM update (acv_ddim.py:344-362) with host-precomputed float64
        # coefficients (see ddim_step_coefficients), guarded for the final
        # step where time_next < 0 → latent := x_start with no replacement.
        if z_inj is not None:
            z = z_inj
        else:
            z = jax.random.normal(k_z, latent.shape, latent.dtype)
        updated = x_start * sqrt_alpha_next + c * pred_noise + sigma * z

        if cfg.replace_mode == "uniform":
            if r_inj is not None:
                replacement = r_inj
            else:
                replacement = jax.random.uniform(
                    k_replace, latent.shape, latent.dtype
                )
        elif cfg.replace_mode in ("qsample", "qsample_compound"):
            if r_inj is not None:
                eps = r_inj
            else:
                eps = jax.random.normal(k_replace, latent.shape, latent.dtype)
            replacement = sched_lib.q_sample(sched, replace_src, t_vec, eps)
            if cfg.replace_mode == "qsample_compound":
                # KITTI12 reassigns its replacement source each step
                # (pwcnet_ddim.py:591: asd = self.q_sample(asd, t)); guard the
                # final step, which never reaches the reassignment.
                replace_src = jnp.where(time_next < 0, replace_src, replacement)
        else:
            raise ValueError(cfg.replace_mode)
        if cfg.renewal:
            updated = jnp.where(mask[:, None] == 0, replacement, updated)

        new_latent = jnp.where(time_next < 0, x_start, updated)
        return (new_latent, mask, replace_src, aux), disp

    init_mask = jnp.zeros((b, h4, w4), dtype=baseline_latent.dtype)
    _, step_disps = jax.lax.scan(
        step,
        (init_latent, init_mask, baseline_latent, denoise_aux_init),
        (pairs, sigmas, cs, sqrt_alpha_nexts, step_keys,
         jnp.arange(cfg.sampling_steps),
         None if inj_z is None else jnp.asarray(inj_z, jnp.float32),
         None if inj_replace is None else jnp.asarray(inj_replace, jnp.float32)),
    )

    if cfg.use_ensemble:
        w = np.asarray(cfg.ensemble_weights, dtype=np.float32)
        assert w.shape[0] == cfg.sampling_steps + 1, (
            "ensemble weights cover [baseline, step_1..step_N]"
        )
        stacked = jnp.concatenate([baseline_disp[None], step_disps], axis=0)
        final = jnp.einsum("s...,s->...", stacked, jnp.asarray(w, stacked.dtype))
        return final, step_disps
    return step_disps[-1], step_disps


# Reference presets (buffers cited in DDIMConfig field comments).
SCENEFLOW_DDIM = DDIMConfig()  # acv_ddim.py: 5 steps, uniform replace

KITTI12_DDIM = DDIMConfig(
    sampling_steps=3,
    init_mode="noise",
    consistency_tau=1.0,
    uncertainty_tau=1.0,
    skip_mask_update_on_last=True,
    replace_mode="qsample_compound",
    ensemble_weights=(0.9, 0.0, 0.0, 0.1),
)

KITTI15_DDIM = DDIMConfig(
    sampling_steps=2,
    init_mode="noise",
    consistency_tau=5.0,
    use_uncertainty=False,
    hard_clamp_tau=3.0,
    replace_mode="qsample",
    ensemble_weights=(0.6, 0.1, 0.3),
    # The reference clips its re-encode input to 47 full-res pixels
    # (igev_stereo_ddim.py:268) because its eval loop tracks a RESIDUAL
    # disparity (coords0 = init_disp quirk); our loop is absolute, so the
    # default clamp→↓4→/4 re-encode applies.
)
