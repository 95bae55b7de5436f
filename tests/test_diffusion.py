"""Diffusion schedule / codec / DDIM algebra tests (NumPy + torch oracles)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.diffusion import (
    DDIMConfig,
    cosine_beta_schedule,
    ddim_sample,
    ddim_time_pairs,
    extract,
    make_schedule,
    predict_noise_from_start,
    q_sample,
)
from diffuvolume_tpu.diffusion.codec import encode_disparity_volume

RNG = np.random.default_rng(1)


def test_cosine_schedule_against_torch_reference():
    torch = pytest.importorskip("torch")
    import math

    # Reference formula (acv_ddim.py:113-119) recomputed in torch float64.
    T = 1000
    steps = T + 1
    x = torch.linspace(0, T, steps, dtype=torch.float64)
    ac = torch.cos(((x / T) + 0.008) / (1 + 0.008) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas_ref = torch.clip(1 - (ac[1:] / ac[:-1]), 0, 0.999).numpy()
    np.testing.assert_allclose(cosine_beta_schedule(T), betas_ref, rtol=1e-12)


def test_schedule_identities():
    sched = make_schedule(1000)
    # alpha_bar near 1 at t=0, near 0 at t=T-1
    assert float(sched.alphas_cumprod[0]) > 0.999
    assert float(sched.alphas_cumprod[-1]) < 1e-4
    # sqrt buffers consistent
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2,
        np.asarray(sched.alphas_cumprod),
        rtol=1e-5,
    )


def test_q_sample_and_inversion():
    sched = make_schedule(1000)
    x0 = jnp.asarray(RNG.standard_normal((2, 4, 3, 3)).astype(np.float32))
    eps = jnp.asarray(RNG.standard_normal((2, 4, 3, 3)).astype(np.float32))
    # t=0: x_t ≈ x0
    t0 = jnp.zeros((2,), jnp.int32)
    xt = q_sample(sched, x0, t0, eps)
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0), atol=5e-2)
    # inversion recovers eps at any t
    t = jnp.asarray([500, 123], jnp.int32)
    xt = q_sample(sched, x0, t, eps)
    eps_hat = predict_noise_from_start(sched, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), rtol=1e-3, atol=1e-3)


def test_extract_broadcast():
    a = jnp.arange(10.0)
    t = jnp.asarray([3, 7], jnp.int32)
    out = extract(a, t, 4)
    assert out.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [3.0, 7.0])


def test_ddim_time_pairs():
    pairs = ddim_time_pairs(1000, 5)
    np.testing.assert_array_equal(
        pairs, [[999, 799], [799, 599], [599, 399], [399, 199], [199, -1]]
    )


def _codec_oracle(disp, num_bins, valid=None):
    """Direct NumPy transcription of the reference scatter encode
    (acv_ddim.py:403-419)."""
    b, h, w = disp.shape
    vol = np.zeros((b, num_bins, h, w), np.float32)
    real = np.floor(disp).astype(np.int64)
    coff = real - disp + 1
    bidx = np.arange(b)[:, None, None]
    hidx = np.arange(h)[None, :, None]
    widx = np.arange(w)[None, None, :]
    vol[bidx, real, hidx, widx] = coff
    vol[bidx, np.clip(real + 1, 0, num_bins - 1), hidx, widx] = 1 - coff
    fuzhi = np.zeros_like(vol)
    fuzhi[:, -1] = 1
    vol = np.where((real == num_bins - 1)[:, None], fuzhi, vol)
    if valid is not None:
        vol = np.where(valid[:, None] == 0, np.full_like(vol, 1 / num_bins), vol)
    return vol * 2 - 1


def test_codec_matches_scatter_oracle():
    disp = RNG.uniform(0, 47.999, (2, 5, 6)).astype(np.float32)
    # include exact integers and the last-bin special case
    disp[0, 0, 0] = 47.0
    disp[0, 0, 1] = 47.9
    disp[0, 1, 0] = 0.0
    disp[0, 1, 1] = 12.0
    out = np.asarray(encode_disparity_volume(jnp.asarray(disp), 48, 1.0))
    np.testing.assert_allclose(out, _codec_oracle(disp, 48), rtol=1e-5, atol=1e-6)


def test_codec_valid_mask():
    disp = RNG.uniform(0, 40, (1, 4, 4)).astype(np.float32)
    valid = (RNG.uniform(size=(1, 4, 4)) > 0.5).astype(np.float32)
    out = np.asarray(encode_disparity_volume(jnp.asarray(disp), 48, 1.0, jnp.asarray(valid)))
    np.testing.assert_allclose(
        out, _codec_oracle(disp, 48, valid), rtol=1e-5, atol=1e-6
    )


def test_codec_sums_to_one():
    disp = RNG.uniform(0, 47.999, (1, 8, 8)).astype(np.float32)
    out = np.asarray(encode_disparity_volume(jnp.asarray(disp), 48, 1.0))
    x01 = (out + 1) / 2
    np.testing.assert_allclose(x01.sum(axis=1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("preset", ["kitti12", "kitti15"])
def test_ddim_variant_presets(preset):
    """KITTI12 (noise init, compounding q_sample replace, skip-last mask) and
    KITTI15 (hard clamp, no uncertainty) sampler variants run and ensemble."""
    from diffuvolume_tpu.diffusion import KITTI12_DDIM, KITTI15_DDIM
    import dataclasses

    cfg = {"kitti12": KITTI12_DDIM, "kitti15": KITTI15_DDIM}[preset]
    b, h, w = 1, 16, 16
    cfg = dataclasses.replace(cfg, max_disp=48, num_bins=12)
    sched = make_schedule(1000)

    const = jnp.full((b, h, w), 6.0)

    def denoise_fn(latent, t):
        disp = const + 0.1 * jnp.tanh(latent.mean())
        transformed = jnp.clip((latent + 1.0) / 2.0, 0.0, 1.0)
        return disp, jnp.zeros((b, h, w)), transformed

    baseline = jnp.full((b, h, w), 6.0)
    latent0 = encode_disparity_volume(jnp.full((b, h // 4, w // 4), 1.5), 12, 1.0)
    final, steps = ddim_sample(
        sched, cfg, denoise_fn, baseline, latent0, jax.random.PRNGKey(0)
    )
    assert final.shape == (b, h, w)
    assert steps.shape == (cfg.sampling_steps, b, h, w)
    assert np.isfinite(np.asarray(final)).all()
    # hard clamp (K15): every step disp within hard_clamp_tau of baseline
    if cfg.hard_clamp_tau is not None:
        assert float(jnp.abs(steps - baseline).max()) < cfg.hard_clamp_tau


def test_ddim_sample_shapes_and_ensemble():
    sched = make_schedule(1000)
    cfg = DDIMConfig(sampling_steps=5)
    b, h, w = 1, 16, 16
    h4, w4 = h // 4, w // 4
    const_disp = jnp.full((b, h, w), 10.0)

    def denoise_fn(latent, t):
        transformed = jnp.clip((latent + 1.0) / 2.0, 0.0, 1.0)
        return const_disp, jnp.zeros((b, h, w)), transformed  # zero unc: confident

    baseline = jnp.full((b, h, w), 10.0)
    latent0 = encode_disparity_volume(jnp.full((b, h4, w4), 2.5), 48, 1.0)
    final, steps = ddim_sample(
        sched, cfg, denoise_fn, baseline, latent0, jax.random.PRNGKey(0)
    )
    assert final.shape == (b, h, w)
    assert steps.shape == (5, b, h, w)
    # All step predictions equal the baseline → ensemble (weights sum to 1)
    # must return exactly the constant disparity.
    np.testing.assert_allclose(np.asarray(final), 10.0, rtol=1e-5)
