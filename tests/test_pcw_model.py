"""PCWNet backbone smoke tests (tiny shapes, CPU).

max_disp=128 is the smallest exercising every scale: D/32 = 4 ≥ 1 at 1/32,
and the hourglassup path divides D/4=32 by 8.  Spatial 64×128 gives 2×4 at
1/32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.models.pcw import PCWNet

pytestmark = pytest.mark.slow

MAX_DISP = 128
H, W = 64, 128
B = 1


@pytest.fixture(scope="module")
def model_and_vars():
    model = PCWNet(max_disp=MAX_DISP, diffusion=True)
    left = jnp.zeros((B, H, W, 3))
    disp_q = jnp.zeros((B, H // 4, W // 4))
    t = jnp.zeros((B,), jnp.int32)
    noise = jnp.zeros((B, MAX_DISP // 4, H // 4, W // 4))
    variables = model.init(
        jax.random.PRNGKey(0), left, left, disp_q, t, noise, train=True
    )
    return model, variables


def test_train_forward_six_heads(model_and_vars):
    model, variables = model_and_vars
    key = jax.random.PRNGKey(1)
    left = jax.random.normal(key, (B, H, W, 3)) * 0.3
    right = jnp.roll(left, -2, axis=2)
    disp_q = jax.random.uniform(key, (B, H // 4, W // 4), maxval=MAX_DISP / 4 - 1)
    t = jnp.full((B,), 500, jnp.int32)
    noise = jax.random.normal(key, (B, MAX_DISP // 4, H // 4, W // 4))
    preds, updates = model.apply(
        variables, left, right, disp_q, t, noise, train=True,
        mutable=["batch_stats"],
    )
    # [pred0, combine, pred1, pred2, pred3, disp_finetune] (pwcnet_ddim.py:735)
    assert len(preds) == 6
    for p in preds:
        assert p.shape == (B, H, W)
        assert np.isfinite(np.asarray(p)).all()


def test_eval_ddim_pipeline(model_and_vars):
    from diffuvolume_tpu.diffusion import KITTI12_DDIM, ddim_sample, make_schedule
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
    import dataclasses

    model, variables = model_and_vars
    key = jax.random.PRNGKey(2)
    left = jax.random.normal(key, (B, H, W, 3)) * 0.3
    right = jnp.roll(left, -2, axis=2)
    combine, cost0, fl, fr = model.apply(
        variables, left, right, train=False, method=PCWNet.build_cost_volume
    )
    assert combine.shape == (B, MAX_DISP // 4, H // 4, W // 4, 32)

    def denoise_fn(latent, t):
        return model.apply(
            variables, combine, fl, fr, latent, t, (H, W), method=PCWNet.denoise
        )

    cfg = dataclasses.replace(
        KITTI12_DDIM, max_disp=MAX_DISP, num_bins=MAX_DISP // 4
    )
    baseline = jnp.full((B, H, W), 8.0)
    latent0 = encode_disparity_volume(
        jnp.full((B, H // 4, W // 4), 2.0), cfg.num_bins, cfg.scale
    )
    final, steps = ddim_sample(
        make_schedule(1000), cfg, denoise_fn, baseline, latent0, key
    )
    assert final.shape == (B, H, W)
    assert steps.shape == (3, B, H, W)
    assert np.isfinite(np.asarray(final)).all()


def test_baseline_eval(model_and_vars):
    _ = model_and_vars
    model = PCWNet(max_disp=MAX_DISP, diffusion=False)
    left = jnp.zeros((B, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, train=False)
    (preds, probs) = model.apply(variables, left, left, train=False)
    assert preds[0].shape == (B, H, W)
    assert probs[0].shape == (B, MAX_DISP, H, W)
