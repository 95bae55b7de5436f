"""IGEV-Stereo backbone smoke tests (tiny shapes, CPU).

H, W must be multiples of 32 (1/32 pyramid).  max_disp=64 keeps the GEV small
(D4=16; hourglass bottleneck 2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.models.igev.geometry import (
    all_pairs_correlation,
    build_geo_pyramid,
    geo_lookup,
)
from diffuvolume_tpu.models.igev.model import IGEVStereo, igev_forward

pytestmark = pytest.mark.slow

MAX_DISP = 64
H, W = 64, 96
B = 1


def test_all_pairs_correlation_matches_reference_einsum():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((1, 3, 5, 8)).astype(np.float32)  # (B,H,W,C)
    f2 = rng.standard_normal((1, 3, 5, 8)).astype(np.float32)
    ours = np.asarray(all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2)))
    # reference: einsum('aijk,aijh->ajkh') on (B, C, H, W) (geometry_ddim.py:78)
    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(f2.transpose(0, 3, 1, 2))
    ref = torch.einsum("aijk,aijh->ajkh", t1, t2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_geo_lookup_shapes_and_window():
    rng = np.random.default_rng(1)
    b, h, w, d, c = 1, 4, 8, 8, 8
    ml = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    pyr = build_geo_pyramid(ml, mr, gev, num_levels=2)
    assert pyr.geo_levels == (pyr.geo_levels[0],)  # only level 0 materialized
    assert pyr.geo_levels[0].shape == (b, h, w, d, c)
    assert pyr.corr_levels[0].shape == (b, h, w, w, 1)
    assert pyr.corr_levels[1].shape == (b, h, w, w // 2, 1)

    disp = jnp.full((b, h, w), 2.0)
    coords = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))
    out = geo_lookup(pyr, disp, coords, noisy=None, radius=4)
    assert out.shape == (b, h, w, 2 * (c + 1) * 9)  # 162 channels
    assert np.isfinite(np.asarray(out)).all()

    # With noise: all-ones noise must equal the noise-free lookup.
    ones = jnp.ones((b, d, h, w))
    out2 = geo_lookup(pyr, disp, coords, noisy=ones, radius=4)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5)


def test_geo_lookup_combined_levels_match_pooled_reference():
    """The single level-0 contraction == pool-then-hat-sample per level."""
    from diffuvolume_tpu.models.igev.geometry import _avgpool_last2
    from diffuvolume_tpu.ops.sampling import hat_sample_last2

    rng = np.random.default_rng(7)
    b, h, w, d, c = 2, 4, 8, 16, 8
    radius = 4
    ml = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    noisy = jnp.asarray(rng.uniform(0.1, 1.0, (b, d, h, w)).astype(np.float32))
    pyr = build_geo_pyramid(ml, mr, gev, num_levels=2)
    # Disparities straddling bins, including out-of-range edges.
    disp = jnp.asarray(rng.uniform(-2.0, d + 1.0, (b, h, w)).astype(np.float32))
    coords = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))

    pieces = geo_lookup(pyr, disp, coords, noisy=noisy, radius=radius, concat=False)
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    geo0 = jnp.moveaxis(gev, 1, 3) * jnp.moveaxis(noisy, 1, 3)[..., None]
    want0 = hat_sample_last2(geo0, disp[..., None] + dx)
    want1 = hat_sample_last2(_avgpool_last2(geo0), disp[..., None] * 0.5 + dx)
    geo_block, geo_rows = pieces[0]
    jtap = 2 * radius + 1
    np.testing.assert_allclose(np.asarray(geo_block[..., :jtap, :]),
                               np.asarray(want0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(geo_block[..., jtap:, :]),
                               np.asarray(want1), rtol=1e-5, atol=1e-5)
    # Canonical order [geo_0 (J*C), corr_0 (J), geo_1 (J*C), corr_1 (J)]:
    jc = jtap * (c + 1)
    assert geo_rows == tuple(range(jtap * c)) + tuple(range(jc, jc + jtap * c))
    assert pieces[1][1] == tuple(range(jtap * c, jc))
    # The concat form interleaves identically to the flattened pieces.
    flat = geo_lookup(pyr, disp, coords, noisy=noisy, radius=radius, concat=True)
    b_, h_, w_ = disp.shape
    rebuilt = np.zeros((b_, h_, w_, 2 * jc), np.float32)
    for arr, rows in pieces:
        rebuilt[..., list(rows)] = np.asarray(arr).reshape(b_, h_, w_, -1)
    np.testing.assert_allclose(rebuilt, np.asarray(flat), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def igev_and_vars():
    model = IGEVStereo(max_disp=MAX_DISP, diffusion=True)
    left = jnp.zeros((B, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), left, left, train=True)
    return model, variables


def test_encode_shapes(igev_and_vars):
    model, variables = igev_and_vars
    key = jax.random.PRNGKey(1)
    left = jax.random.uniform(key, (B, H, W, 3), maxval=255.0)
    right = jnp.roll(left, -2, axis=2)
    enc = model.apply(variables, left, right, False, method=IGEVStereo.encode)
    assert enc["init_disp"].shape == (B, H // 4, W // 4)
    assert enc["gev"].shape == (B, MAX_DISP // 4, H // 4, W // 4, 8)
    assert enc["match_l"].shape == (B, H // 4, W // 4, 96)
    assert len(enc["net_list"]) == 3
    assert np.isfinite(np.asarray(enc["init_disp"])).all()


def test_igev_eval_forward(igev_and_vars):
    model, variables = igev_and_vars
    key = jax.random.PRNGKey(2)
    left = jax.random.uniform(key, (B, H, W, 3), maxval=255.0)
    right = jnp.roll(left, -2, axis=2)
    disp = igev_forward(model, variables, left, right, iters=2, test_mode=True)
    assert disp.shape == (B, H, W)
    assert np.isfinite(np.asarray(disp)).all()


def test_igev_train_forward_with_diffusion(igev_and_vars):
    model, variables = igev_and_vars
    key = jax.random.PRNGKey(3)
    left = jax.random.uniform(key, (B, H, W, 3), maxval=255.0)
    right = jnp.roll(left, -2, axis=2)
    noisy = jax.random.normal(key, (B, MAX_DISP // 4, H // 4, W // 4))
    t = jnp.full((B,), 500, jnp.int32)
    init_up, disp_ups, new_bs = igev_forward(
        model, variables, left, right, iters=2, noisy=noisy, t=t, train=True
    )
    assert init_up.shape == (B, H, W)
    assert disp_ups.shape == (2, B, H, W)
    assert new_bs is not None
    assert np.isfinite(np.asarray(disp_ups)).all()


def test_igev_train_step(igev_and_vars):
    import optax
    from diffuvolume_tpu.train.loop import TrainState, make_igev_train_step

    model, variables = igev_and_vars
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(2e-4))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    key = jax.random.PRNGKey(10)
    batch = {
        "left": jax.random.uniform(key, (B, H, W, 3), maxval=255.0),
        "right": jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W, 3), maxval=255.0),
        "disp_gt": jax.random.uniform(jax.random.fold_in(key, 2), (B, H, W), minval=1.0, maxval=60.0),
    }
    step = make_igev_train_step(model, opt, iters=2)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(11))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_igev_ddim_pipeline(igev_and_vars):
    import dataclasses
    from diffuvolume_tpu.diffusion import KITTI15_DDIM
    from diffuvolume_tpu.eval.pipeline import igev_ddim_inference

    model, variables = igev_and_vars
    baseline = IGEVStereo(max_disp=MAX_DISP, diffusion=False)
    left = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, 3), maxval=255.0)
    right = jnp.roll(left, -2, axis=2)
    bvars = baseline.init(jax.random.PRNGKey(5), left, left, train=True)
    cfg = dataclasses.replace(KITTI15_DDIM, max_disp=MAX_DISP, num_bins=MAX_DISP // 4)
    final, bd = igev_ddim_inference(
        baseline, model, bvars, variables, left, right, jax.random.PRNGKey(6),
        cfg=cfg, iters=2,
    )
    assert final.shape == (B, H, W)
    assert np.isfinite(np.asarray(final)).all()


def test_fold_reference_noise_matches_reference_semantics():
    """Quirk mode == the reference's exact noise treatment
    (geometry_ddim.py:37-58): (1) the C-order reshape scramble of the
    (B,D,H,W) noise into per-pixel rows, and (2) pooling the noise pyramid
    SEPARATELY from the geo pyramid before multiplying per level."""
    from diffuvolume_tpu.models.igev.geometry import (
        _avgpool_last2,
        fold_reference_noise,
    )
    from diffuvolume_tpu.ops.sampling import hat_sample_last2

    rng = np.random.default_rng(17)
    b, h, w, d, c = 2, 4, 8, 16, 8
    radius = 4
    ml = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    noisy = jnp.asarray(rng.uniform(0.1, 1.0, (b, d, h, w)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(-2.0, d + 1.0, (b, h, w)).astype(np.float32))
    coords = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))
    pyr = build_geo_pyramid(ml, mr, gev, num_levels=2)
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    jtap = 2 * radius + 1

    # Oracle: reference semantics built literally.
    n0 = noisy.reshape(b, d * h * w).reshape(b, h, w, d)  # the scramble
    n1 = n0.reshape(b, h, w, d // 2, 2).mean(-1)  # pooled noise (separate)
    geo_hwdc = jnp.moveaxis(gev, 1, 3)
    want0 = hat_sample_last2(geo_hwdc * n0[..., None], disp[..., None] + dx)
    want1 = hat_sample_last2(
        _avgpool_last2(geo_hwdc) * n1[..., None], disp[..., None] * 0.5 + dx
    )

    eff = fold_reference_noise(noisy, num_levels=2)
    assert eff.shape == (b, h, w, 2, d)
    pieces = geo_lookup(pyr, disp, coords, radius=radius, concat=False,
                        noise_eff=eff)
    geo_block, _ = pieces[0]
    np.testing.assert_allclose(np.asarray(geo_block[..., :jtap, :]),
                               np.asarray(want0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(geo_block[..., jtap:, :]),
                               np.asarray(want1), rtol=1e-5, atol=1e-5)
    # Pool-then-multiply ≠ multiply-then-pool: the quirk must NOT equal the
    # default per-pixel path fed the scrambled noise (cross terms differ).
    nb_scrambled = jnp.moveaxis(n0, -1, 1)  # (B, D, H, W) but scrambled rows
    default = geo_lookup(pyr, disp, coords, noisy=nb_scrambled, radius=radius,
                         concat=False)
    assert not np.allclose(np.asarray(default[0][0][..., jtap:, :]),
                           np.asarray(want1), atol=1e-4)


def test_igev_ddim_pipeline_quirk_mode(igev_and_vars):
    """Reference-faithful eval (residual coords + scrambled noise) runs and
    produces finite full-res output."""
    import dataclasses
    from diffuvolume_tpu.diffusion import KITTI15_DDIM
    from diffuvolume_tpu.eval.pipeline import igev_ddim_inference

    model, variables = igev_and_vars
    baseline = IGEVStereo(max_disp=MAX_DISP, diffusion=False)
    left = jax.random.uniform(jax.random.PRNGKey(7), (B, H, W, 3), maxval=255.0)
    right = jnp.roll(left, -2, axis=2)
    bvars = baseline.init(jax.random.PRNGKey(8), left, left, train=True)
    cfg = dataclasses.replace(KITTI15_DDIM, max_disp=MAX_DISP, num_bins=MAX_DISP // 4)
    final, bd = igev_ddim_inference(
        baseline, model, bvars, variables, left, right, jax.random.PRNGKey(9),
        cfg=cfg, iters=2, quirk=True,
    )
    assert final.shape == (B, H, W)
    assert np.isfinite(np.asarray(final)).all()


def test_geo_lookup_rsamp_matches_corr_volume():
    """Descriptor-resampling corr lookup == materialized-corr-volume lookup."""
    rng = np.random.default_rng(11)
    b, h, w, d, c = 2, 4, 10, 16, 8
    ml = jnp.asarray(rng.standard_normal((b, h, w, 12)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 12)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(0.0, w, (b, h, w)).astype(np.float32))
    coords = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))

    pyr_v = build_geo_pyramid(ml, mr, gev, num_levels=2, corr_mode="volume")
    pyr_r = build_geo_pyramid(ml, mr, gev, num_levels=2, corr_mode="rsamp")
    assert pyr_r.corr_levels == ()
    assert pyr_r.match_r_levels[1].shape == (b, h, w // 2, 12)
    out_v = geo_lookup(pyr_v, disp, coords, radius=4)
    out_r = geo_lookup(pyr_r, disp, coords, radius=4)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_v),
                               rtol=1e-4, atol=1e-4)


def test_geo_lookup_band_matches_corr_volume():
    """Diagonal-band corr lookup == dense lookup on its coverage domain.

    Coverage: quarter-res disparity in [-1, band-12] (52 for the production
    band=64).  Uses w=64 so band <= v+1 holds at level 1; disparities span
    [0, 48] including edge pixels, so both zero-padding edges (x < 0 at the
    left margin, x >= V at the right margin) are exercised.
    """
    rng = np.random.default_rng(13)
    b, h, w, d, c = 1, 4, 64, 16, 8
    ml = jnp.asarray(rng.standard_normal((b, h, w, 12)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 12)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    # Level-1 width v+1 = 33 clamps the band there; coverage is then
    # min(64-12, 2*(33-12)) = 42 quarter-res px.
    disp = jnp.asarray(rng.uniform(0.0, 42.0, (b, h, w)).astype(np.float32))
    coords = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))

    pyr_v = build_geo_pyramid(ml, mr, gev, num_levels=2, corr_mode="volume")
    pyr_b = build_geo_pyramid(ml, mr, gev, num_levels=2, corr_mode="band")
    assert pyr_b.corr_levels == ()
    assert pyr_b.band_levels[0].shape == (b, h, w, 64)
    assert pyr_b.band_levels[1].shape == (b, h, w, 33)
    out_v = geo_lookup(pyr_v, disp, coords, radius=4)
    out_b = geo_lookup(pyr_b, disp, coords, radius=4)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_v),
                               rtol=1e-4, atol=1e-4)


def test_geo_lookup_pooled_matches_coarsened():
    """Materialized-pooled-level lookup == coarsened level-0-hat lookup,
    in both concat and pieces form, with and without the noise multiply."""
    rng = np.random.default_rng(17)
    b, h, w, d, c = 1, 4, 16, 16, 8
    ml = jnp.asarray(rng.standard_normal((b, h, w, 12)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 12)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(0.0, d - 2.0, (b, h, w)).astype(np.float32))
    noisy = jnp.asarray(rng.uniform(0.0, 1.0, (b, d, h, w)).astype(np.float32))
    coords = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32), (b, h, w))

    pyr_a = build_geo_pyramid(ml, mr, gev, num_levels=2, geo_pool=False)
    pyr_p = build_geo_pyramid(ml, mr, gev, num_levels=2, geo_pool=True)
    assert len(pyr_p.geo_levels) == 2
    assert pyr_p.geo_levels[1].shape == (b, h, w, d // 2, c)
    for nz in (None, noisy):
        out_a = geo_lookup(pyr_a, disp, coords, noisy=nz, radius=4)
        out_p = geo_lookup(pyr_p, disp, coords, noisy=nz, radius=4)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_a),
                                   rtol=1e-4, atol=1e-5)
        pcs_a = geo_lookup(pyr_a, disp, coords, noisy=nz, radius=4, concat=False)
        pcs_p = geo_lookup(pyr_p, disp, coords, noisy=nz, radius=4, concat=False)
        # pieces differ in grouping; compare via canonical row order
        def canon(pieces):
            full = np.zeros((b, h, w, 2 * 9 * (c + 1)), np.float32)
            for arr, rows in pieces:
                flat = np.asarray(arr).reshape(b, h, w, -1)
                full[..., list(rows)] = flat
            return full
        np.testing.assert_allclose(canon(pcs_p), canon(pcs_a), rtol=1e-4, atol=1e-5)


def test_geo_lookup_lowband_matches_volume_in_quirk_regime():
    """Absolute low-column band == dense volume lookup for quirk-eval
    coordinates (corr positions = init_disp·2⁻ⁱ + dx, provably inside the
    band — see eval/pipeline.py quirk dispatch)."""
    rng = np.random.default_rng(21)
    b, h, w, d, c = 1, 4, 40, 16, 8
    ml = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    mr = jnp.asarray(rng.standard_normal((b, h, w, 16)).astype(np.float32))
    gev = jnp.asarray(rng.standard_normal((b, d, h, w, c)).astype(np.float32))
    pyr_v = build_geo_pyramid(ml, mr, gev, num_levels=2, corr_mode="volume")
    pyr_l = build_geo_pyramid(ml, mr, gev, num_levels=2, corr_mode="lowband",
                              band=32)
    assert pyr_l.band_mode == "low"
    # quirk regime: coords = carried coords1 (≈ init_disp + residual),
    # disp = the residual → coords − disp = init_disp ∈ [0, d).
    init_disp = jnp.asarray(rng.uniform(0.0, d - 1.0, (b, h, w)).astype(np.float32))
    resid = jnp.asarray(rng.uniform(-2.0, 2.0, (b, h, w)).astype(np.float32))
    coords = init_disp + resid
    out_v = geo_lookup(pyr_v, resid, coords, radius=4)
    out_l = geo_lookup(pyr_l, resid, coords, radius=4)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_v),
                               rtol=1e-5, atol=1e-5)
