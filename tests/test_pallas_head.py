"""Parity test: Pallas fused head vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.ops.pallas.fused_head import fused_upsample_softargmin
from diffuvolume_tpu.ops.regression import (
    disparity_uncertainty,
    upsample_cost_and_regress,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("align_corners", [False, True])
def test_fused_head_matches_xla_path(align_corners):
    b, d4, h4, w4 = 1, 12, 4, 8
    max_disp, h, w = 48, 16, 32
    cost = jnp.asarray(RNG.standard_normal((b, d4, h4, w4)).astype(np.float32))

    ref_disp, ref_prob = upsample_cost_and_regress(
        cost, max_disp, (h, w), align_corners
    )
    ref_unc = disparity_uncertainty(ref_prob, ref_disp, max_disp)

    disp, unc = fused_upsample_softargmin(
        cost, max_disp, (h, w), align_corners, interpret=True
    )
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref_disp), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(unc), np.asarray(ref_unc), rtol=1e-4, atol=1e-4)


def test_fused_head_batch():
    b, d4, h4, w4 = 2, 12, 8, 8
    cost = jnp.asarray(RNG.standard_normal((b, d4, h4, w4)).astype(np.float32))
    disp, unc = fused_upsample_softargmin(cost, 48, (32, 32), interpret=True)
    ref_disp, ref_prob = upsample_cost_and_regress(cost, 48, (32, 32))
    np.testing.assert_allclose(np.asarray(disp), np.asarray(ref_disp), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("align_corners", [False, True])
def test_fused_uncertainty_at_matches_oracle(align_corners):
    """Query-point uncertainty == Σ p·|d−q| on the upsampled softmax volume
    (the reference's disp_finetune-scored renewal, pwcnet_ddim.py:554-559)."""
    from diffuvolume_tpu.ops.pallas.fused_head import fused_uncertainty_at

    b, d4, h4, w4 = 1, 12, 4, 8
    max_disp, h, w = 48, 16, 32
    cost = jnp.asarray(RNG.standard_normal((b, d4, h4, w4)).astype(np.float32))
    query = jnp.asarray(
        RNG.uniform(0.0, max_disp - 1, (b, h, w)).astype(np.float32)
    )

    _, ref_prob = upsample_cost_and_regress(cost, max_disp, (h, w), align_corners)
    ref_unc = disparity_uncertainty(ref_prob, query, max_disp)
    unc = fused_uncertainty_at(cost, query, max_disp, (h, w), align_corners,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(unc), np.asarray(ref_unc),
                               rtol=1e-4, atol=1e-4)
