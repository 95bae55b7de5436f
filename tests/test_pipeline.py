"""End-to-end two-model DDIM inference pipeline test (tiny shapes, CPU).

Also the regression test for the XLA mega-fusion NaN: compiling the baseline
pass + volume build + DDIM scan as ONE program produced NaN outputs on CPU
XLA while every stage was finite (eager replay clean) — the pipeline is
therefore staged into two cached jits.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffuvolume_tpu.diffusion import DDIMConfig
from diffuvolume_tpu.eval.pipeline import acv_ddim_inference
from diffuvolume_tpu.models.acv import ACVNet
import pytest

pytestmark = pytest.mark.slow

H, W, MD = 32, 64, 64


def test_two_pass_pipeline_finite_and_stable():
    rng = jax.random.PRNGKey(0)
    bm = ACVNet(max_disp=MD, diffusion=False)
    dm = ACVNet(max_disp=MD, diffusion=True)
    left = jax.random.normal(rng, (1, H, W, 3)) * 0.3
    right = jnp.roll(left, -3, axis=2)
    bv = bm.init(rng, left, left, train=False)
    dv = dm.init(
        rng, left, left, jnp.zeros((1, H // 4, W // 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, MD // 4, H // 4, W // 4)), train=True,
    )
    cfg = DDIMConfig(max_disp=MD, num_bins=MD // 4)
    final, baseline = acv_ddim_inference(bm, dm, bv, dv, left, right, rng, cfg)
    assert final.shape == (1, H, W)
    assert baseline.shape == (1, H, W)
    assert np.isfinite(np.asarray(final)).all()
    assert np.isfinite(np.asarray(baseline)).all()
    # Determinism: same rng → same result (cached jit path).
    final2, _ = acv_ddim_inference(bm, dm, bv, dv, left, right, rng, cfg)
    np.testing.assert_allclose(np.asarray(final), np.asarray(final2), atol=0)


def test_baseline_only_inference():
    """baseline_inference = the reference's evaluate_stereo_origin.py mode."""
    from diffuvolume_tpu.eval.pipeline import baseline_inference

    rng = jax.random.PRNGKey(0)
    bm = ACVNet(max_disp=MD, diffusion=False)
    left = jax.random.normal(rng, (1, H, W, 3)) * 0.3
    right = jnp.roll(left, -3, axis=2)
    bv = bm.init(rng, left, left, train=False)
    disp = baseline_inference(bm, bv, left, right)
    assert disp.shape == (1, H, W)
    assert np.isfinite(np.asarray(disp)).all()
    # matches the two-pass pipeline's internal baseline pass
    dm = ACVNet(max_disp=MD, diffusion=True)
    dv = dm.init(
        rng, left, left, jnp.zeros((1, H // 4, W // 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, MD // 4, H // 4, W // 4)), train=True,
    )
    cfg = DDIMConfig(max_disp=MD, num_bins=MD // 4)
    _, baseline = acv_ddim_inference(bm, dm, bv, dv, left, right, rng, cfg)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(baseline), atol=1e-5)
