"""Generic DDIM sampler with renewal confidence filtering and step ensembling.

One `lax.scan`-based implementation covering all three reference variants
(SceneFlow/models/acv_ddim.py:298-370, KITTI12/models/pwcnet_ddim.py:530-602,
KITTI15/core/igev_stereo_ddim.py:294-359), parameterized by `DDIMConfig`.

The backbone enters only through ``denoise_fn(latent, t) -> (disp, prob)``:
run the full aggregation/regression head with the noise volume multiplied into
the cost volume, and return the full-resolution disparity plus the
full-resolution probability volume (needed for the uncertainty score).  The
DDIM algebra, disparity re-encoding, renewal masking, latent replacement, and
ensembling are shared and fully jittable (static step count, no Python control
flow on traced values).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from diffuvolume_tpu.diffusion import schedule as sched_lib
from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
from diffuvolume_tpu.ops.regression import disparity_uncertainty, resize_bilinear


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    """Per-backbone DDIM sampling configuration.

    Defaults are the SceneFlow/ACVNet values (acv_ddim.py:130-145,320-338,367).
    """

    sampling_steps: int = 5
    eta: float = 1.0
    scale: float = 1.0
    renewal: bool = True
    use_ensemble: bool = True
    # Renewal thresholds: |pred - baseline| < consistency_tau AND
    # uncertainty < uncertainty_tau.  KITTI12 uses a different uncertainty
    # threshold on the final step (pwcnet_ddim.py:560-567).
    consistency_tau: float = 1.0
    uncertainty_tau: float = 3.0
    uncertainty_tau_last: float | None = None
    # Latent replacement for untrusted pixels: SceneFlow uses uniform noise
    # (acv_ddim.py:360-362), KITTI12/15 re-noise the baseline volume with
    # q_sample (pwcnet_ddim.py:590-593).
    replace_mode: str = "uniform"  # "uniform" | "qsample"
    # Ensemble weights over [baseline, step_1, ..., step_N].
    ensemble_weights: Sequence[float] = (0.5, 0.0, 0.0, 0.0, 0.2, 0.3)
    max_disp: int = 192
    num_bins: int = 48


def ddim_sample(
    sched: sched_lib.DiffusionSchedule,
    cfg: DDIMConfig,
    denoise_fn: Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]],
    baseline_disp: jax.Array,
    baseline_latent: jax.Array,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Run the short DDIM trajectory and return the ensembled disparity.

    Args:
      sched: precomputed diffusion schedule.
      cfg: sampler configuration.
      denoise_fn: ``(latent (B,D,H4,W4), t (B,)) -> (disp (B,H,W), prob (B,192,H,W))``
        — one full aggregation pass of the backbone with noise injection.
      baseline_disp: ``(B, H, W)`` full-resolution prediction of the frozen
        baseline network (the conditioning / `used` input).
      baseline_latent: ``(B, D, H4, W4)`` encoded baseline volume in
        ``[-scale, scale]`` — both the initial latent (acv_ddim.py:311) and the
        q_sample replacement source.
      rng: PRNG key.

    Returns:
      ``(final_disp (B,H,W), step_disps (steps, B, H, W))``.
    """
    b, d, h4, w4 = baseline_latent.shape
    coefs = sched_lib.ddim_step_coefficients(
        sched.num_timesteps, cfg.sampling_steps, cfg.eta
    )
    pairs = jnp.asarray(coefs["pairs"])
    sigmas = jnp.asarray(coefs["sigma"])
    cs = jnp.asarray(coefs["c"])
    sqrt_alpha_nexts = jnp.asarray(coefs["sqrt_alpha_next"])
    step_keys = jax.random.split(rng, cfg.sampling_steps)

    def step(carry, xs):
        latent, mask = carry
        (time, time_next), sigma, c, sqrt_alpha_next, key, step_idx = xs
        k_z, k_replace = jax.random.split(key)
        t_vec = jnp.full((b,), time, dtype=jnp.int32)

        disp, prob = denoise_fn(latent, t_vec)

        # Re-encode the prediction as x_start (acv_ddim.py:272-292):
        # clamp, bilinear ↓4 (align_corners=False), /4, codec, clamp.
        disp_net = jnp.clip(disp, 0.0, cfg.max_disp - 1)
        disp_q = resize_bilinear(disp_net, (h4, w4), h_axis=1, w_axis=2) / 4.0
        x_start = encode_disparity_volume(disp_q, cfg.num_bins, cfg.scale)
        x_start = jnp.clip(x_start, -cfg.scale, cfg.scale)

        pred_noise = sched_lib.predict_noise_from_start(sched, latent, t_vec, x_start)

        if cfg.renewal:
            is_last = step_idx == cfg.sampling_steps - 1
            u_tau = (
                jnp.where(is_last, cfg.uncertainty_tau_last, cfg.uncertainty_tau)
                if cfg.uncertainty_tau_last is not None
                else cfg.uncertainty_tau
            )
            dif = jnp.abs(disp - baseline_disp)
            m1 = jnp.where(dif < cfg.consistency_tau, 1.0, 0.0)
            unc = disparity_uncertainty(prob, disp, cfg.max_disp)
            m2 = jnp.where(unc < u_tau, 1.0, 0.0)
            m = resize_bilinear(m1 * m2, (h4, w4), h_axis=1, w_axis=2)
            mask = jnp.clip(mask + m, 0.0, 1.0)

        # DDIM update (acv_ddim.py:344-362) with host-precomputed float64
        # coefficients (see ddim_step_coefficients), guarded for the final
        # step where time_next < 0 → latent := x_start with no replacement.
        z = jax.random.normal(k_z, latent.shape, latent.dtype)
        updated = x_start * sqrt_alpha_next + c * pred_noise + sigma * z

        if cfg.replace_mode == "uniform":
            replacement = jax.random.uniform(k_replace, latent.shape, latent.dtype)
        elif cfg.replace_mode == "qsample":
            eps = jax.random.normal(k_replace, latent.shape, latent.dtype)
            replacement = sched_lib.q_sample(sched, baseline_latent, t_vec, eps)
        else:
            raise ValueError(cfg.replace_mode)
        if cfg.renewal:
            updated = jnp.where(mask[:, None] == 0, replacement, updated)

        new_latent = jnp.where(time_next < 0, x_start, updated)
        return (new_latent, mask), disp

    init_mask = jnp.zeros((b, h4, w4), dtype=baseline_latent.dtype)
    (_, _), step_disps = jax.lax.scan(
        step,
        (baseline_latent, init_mask),
        (pairs, sigmas, cs, sqrt_alpha_nexts, step_keys,
         jnp.arange(cfg.sampling_steps)),
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
