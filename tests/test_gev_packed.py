"""Parity: the all-Pallas packed GEV tower == the flax module segment.

The packed tower (models/igev/gev_packed.py) re-implements
gwc → corr_stem → corr_feature_att → cost_agg → classifier with BN folded
and every op in the packed lane geometry; this pins it against the module
path (interpret mode, CPU, f32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_gev_tower_packed_matches_module():
    from diffuvolume_tpu.models.igev.model import IGEVStereo
    from diffuvolume_tpu.models.igev.gev_packed import gev_tower_packed
    from diffuvolume_tpu.models.layers import conv3x3x3
    from diffuvolume_tpu.ops.cost_volume import build_gwc_volume

    h, w = 64, 64  # h4 = 16 (the tower needs h4 % 16 == 0)
    model = IGEVStereo(max_disp=192, diffusion=False)
    rng = jax.random.PRNGKey(0)
    left = jax.random.uniform(rng, (1, h, w, 3), maxval=255.0)
    variables = model.init(jax.random.PRNGKey(1), left, left, train=True)

    h4, w4 = h // 4, w // 4
    r2 = jax.random.fold_in(rng, 2)
    match_l = jax.random.normal(r2, (1, h4, w4, 96)) * 0.5
    match_r = jax.random.normal(jax.random.fold_in(rng, 3), (1, h4, w4, 96)) * 0.5
    feat_l = [
        jax.random.normal(jax.random.fold_in(rng, 10 + i), (1, h4 >> i, w4 >> i, c)) * 0.5
        for i, c in enumerate((96, 64, 192, 160))
    ]

    m = model.bind(variables)
    gwc = build_gwc_volume(match_l, match_r, 48, 8)
    x = m.corr_stem(gwc, False)
    x = m.corr_feature_att(x, feat_l[0], False)
    gev_want = m.cost_agg(x, feat_l, False)
    cost_want = conv3x3x3(gev_want, m.classifier())[..., 0]

    gev_got, cost_got = gev_tower_packed(
        model, variables, match_l, match_r, feat_l, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(gev_got), np.asarray(gev_want), rtol=2e-3, atol=2e-3,
        err_msg="gev diverged")
    np.testing.assert_allclose(
        np.asarray(cost_got), np.asarray(cost_want), rtol=2e-3, atol=2e-3,
        err_msg="classifier cost diverged")
