"""ACVNet model smoke tests (tiny shapes, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.diffusion import DDIMConfig
from diffuvolume_tpu.models.acv import ACVNet

pytestmark = pytest.mark.slow

# Smallest config exercising every layer: D4 = max_disp//4 = 16 so the
# hourglass bottleneck depth (4) matches the (4,4,4) attention block.
MAX_DISP = 64
H, W = 32, 64
B = 1


@pytest.fixture(scope="module")
def ddim_model_and_vars():
    model = ACVNet(max_disp=MAX_DISP, diffusion=True)
    left = jnp.zeros((B, H, W, 3))
    right = jnp.zeros((B, H, W, 3))
    disp_q = jnp.zeros((B, H // 4, W // 4))
    t = jnp.zeros((B,), jnp.int32)
    noise = jnp.zeros((B, MAX_DISP // 4, H // 4, W // 4))
    variables = model.init(
        jax.random.PRNGKey(0), left, right, disp_q, t, noise, train=True
    )
    return model, variables


def test_train_forward_shapes(ddim_model_and_vars):
    model, variables = ddim_model_and_vars
    rng = jax.random.PRNGKey(1)
    left = jax.random.normal(rng, (B, H, W, 3))
    right = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, W, 3))
    disp_q = jax.random.uniform(rng, (B, H // 4, W // 4), maxval=MAX_DISP / 4 - 1)
    t = jnp.full((B,), 500, jnp.int32)
    noise = jax.random.normal(rng, (B, MAX_DISP // 4, H // 4, W // 4))
    preds, updates = model.apply(
        variables, left, right, disp_q, t, noise, train=True,
        mutable=["batch_stats"],
    )
    assert len(preds) == 4
    for p in preds:
        assert p.shape == (B, H, W)
        assert np.isfinite(np.asarray(p)).all()
    assert "batch_stats" in updates


def test_eval_and_denoise(ddim_model_and_vars):
    model, variables = ddim_model_and_vars
    rng = jax.random.PRNGKey(2)
    left = jax.random.normal(rng, (B, H, W, 3))
    right = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, W, 3))

    ac_volume, att = model.apply(
        variables, left, right, train=False, method=ACVNet.build_cost_volume
    )
    assert ac_volume.shape == (B, MAX_DISP // 4, H // 4, W // 4, 64)
    assert att.shape == (B, MAX_DISP // 4, H // 4, W // 4, 1)

    latent = jax.random.normal(rng, (B, MAX_DISP // 4, H // 4, W // 4))
    t = jnp.full((B,), 999, jnp.int32)
    disp, unc, transformed = model.apply(
        variables, ac_volume, latent, t, (H, W), method=ACVNet.denoise
    )
    assert disp.shape == (B, H, W)
    assert unc.shape == (B, H, W)
    assert transformed.shape == latent.shape
    assert np.isfinite(np.asarray(disp)).all()
    assert (np.asarray(unc) >= 0).all()
    tr = np.asarray(transformed)
    assert tr.min() >= 0.0 and tr.max() <= 1.0


def test_full_ddim_pipeline_runs(ddim_model_and_vars):
    from diffuvolume_tpu.diffusion import ddim_sample, make_schedule
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume

    model, variables = ddim_model_and_vars
    rng = jax.random.PRNGKey(3)
    left = jax.random.normal(rng, (B, H, W, 3))
    right = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, W, 3))
    ac_volume, _ = model.apply(
        variables, left, right, train=False, method=ACVNet.build_cost_volume
    )

    def denoise_fn(latent, t):
        return model.apply(
            variables, ac_volume, latent, t, (H, W), method=ACVNet.denoise
        )

    cfg = DDIMConfig(
        sampling_steps=2, ensemble_weights=(0.6, 0.1, 0.3),
        max_disp=MAX_DISP, num_bins=MAX_DISP // 4,
    )
    baseline = jnp.full((B, H, W), 5.0)
    latent0 = encode_disparity_volume(
        jnp.full((B, H // 4, W // 4), 1.25), cfg.num_bins, cfg.scale
    )
    final, steps = ddim_sample(
        make_schedule(1000), cfg, denoise_fn, baseline, latent0, rng
    )
    assert final.shape == (B, H, W)
    assert steps.shape == (2, B, H, W)
    assert np.isfinite(np.asarray(final)).all()


def test_baseline_model_eval(ddim_model_and_vars):
    _, _ = ddim_model_and_vars  # unused; separate baseline init below
    model = ACVNet(max_disp=MAX_DISP, diffusion=False)
    left = jnp.zeros((B, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, train=False)
    preds = model.apply(variables, left, left, train=False)
    assert len(preds) == 1
    assert preds[0].shape == (B, H, W)
