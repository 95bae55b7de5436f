"""Diffusion schedule and forward/inverse process algebra.

One implementation shared by every backbone (the reference duplicates this
three times: SceneFlow/models/acv_ddim.py:106-172, KITTI12/models/
pwcnet_ddim.py:319-384, KITTI15/core/igev_stereo_ddim.py:103-157).

All schedule tensors are precomputed in float64 (matching the reference's
torch.float64 cosine schedule) and stored as a float32 NamedTuple of jnp
arrays — a pure pytree that jit/pjit treats as constants.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine beta schedule, clipped to [0, 0.999].

    Reference: SceneFlow/models/acv_ddim.py:113-119 (float64 arithmetic).
    """
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


class DiffusionSchedule(NamedTuple):
    """Precomputed diffusion buffers (reference: acv_ddim.py:130-172)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(timesteps: int = 1000, dtype=jnp.float32) -> DiffusionSchedule:
    betas = cosine_beta_schedule(timesteps)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    arrays = dict(
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1.0),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=np.log(np.clip(posterior_variance, 1e-20, None)),
        posterior_mean_coef1=betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        posterior_mean_coef2=(1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
    )
    return DiffusionSchedule(**{k: jnp.asarray(v, dtype=dtype) for k, v in arrays.items()})


def extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather schedule values at timesteps ``t`` (shape ``(B,)``), broadcastable
    to an ``ndim``-dimensional batch tensor.  Reference: acv_ddim.py:106-110."""
    out = a[t]
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


def q_sample(
    sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array
) -> jax.Array:
    """Forward diffusion: ``x_t = sqrt(ᾱ_t)·x_0 + sqrt(1-ᾱ_t)·ε``.

    Reference: acv_ddim.py:241-246.  ``t`` is ``(B,)`` int32 (the reference
    samples one t per batch; pass a broadcasted scalar for that behavior).
    """
    a = extract(sched.sqrt_alphas_cumprod, t, x_start.ndim)
    b = extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
    return a * x_start + b * noise


def predict_noise_from_start(
    sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, x0: jax.Array
) -> jax.Array:
    """Invert q_sample for the noise: ``ε̂ = (sqrt(1/ᾱ_t)·x_t − x̂_0) / sqrt(1/ᾱ_t − 1)``.

    Reference: acv_ddim.py:248-252.
    """
    recip = extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim)
    recipm1 = extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)
    return (recip * x_t - x0) / recipm1


def ddim_time_pairs(total_timesteps: int, sampling_steps: int) -> np.ndarray:
    """The reversed (t, t_next) pairs of the DDIM trajectory.

    ``times = linspace(-1, T-1, steps+1)`` reversed → consecutive pairs
    (reference: acv_ddim.py:306-308).  Returned as an ``(steps, 2)`` int32
    array suitable as ``lax.scan`` xs.
    """
    times = np.linspace(-1, total_timesteps - 1, sampling_steps + 1)
    times = list(reversed(times.astype(np.int64).tolist()))
    pairs = list(zip(times[:-1], times[1:]))
    return np.asarray(pairs, dtype=np.int32)


def ddim_step_coefficients(
    total_timesteps: int, sampling_steps: int, eta: float = 1.0
) -> dict[str, np.ndarray]:
    """Per-step DDIM update scalars, precomputed in float64 on the host.

    The trajectory is static, so ``sigma = η·sqrt((1-ᾱ/ᾱ')·(1-ᾱ')/(1-ᾱ))``
    and ``c = sqrt(1-ᾱ'-σ²)`` (acv_ddim.py:348-352) are computed here in
    float64: near t=T-1 the term ``1-ᾱ'-σ²`` is ~2e-8 and float32 evaluation
    goes (slightly) negative → NaN.  The reference dodges this accidentally by
    keeping its schedule buffers in torch float64.
    """
    betas = cosine_beta_schedule(total_timesteps)
    acp = np.cumprod(1.0 - betas)
    pairs = ddim_time_pairs(total_timesteps, sampling_steps)
    alpha = acp[pairs[:, 0]]
    alpha_next = acp[np.maximum(pairs[:, 1], 0)]
    sigma = eta * np.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
    c = np.sqrt(np.maximum(1 - alpha_next - sigma**2, 0.0))
    return {
        "pairs": pairs,
        "sigma": sigma.astype(np.float32),
        "c": c.astype(np.float32),
        "sqrt_alpha_next": np.sqrt(alpha_next).astype(np.float32),
    }
