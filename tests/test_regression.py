"""Regression / resize ops vs torch oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.ops.regression import (
    disparity_regression,
    disparity_uncertainty,
    resize_bilinear,
    resize_linear,
    resize_volume_trilinear,
    upsample_cost_and_regress,
)

RNG = np.random.default_rng(2)


def test_disparity_regression():
    prob = RNG.uniform(size=(2, 8, 3, 4)).astype(np.float32)
    prob /= prob.sum(axis=1, keepdims=True)
    out = np.asarray(disparity_regression(jnp.asarray(prob), 8))
    oracle = (prob * np.arange(8).reshape(1, 8, 1, 1)).sum(1)
    np.testing.assert_allclose(out, oracle, rtol=1e-5)


def test_disparity_uncertainty():
    prob = RNG.uniform(size=(1, 8, 3, 3)).astype(np.float32)
    prob /= prob.sum(axis=1, keepdims=True)
    disp = RNG.uniform(0, 7, (1, 3, 3)).astype(np.float32)
    out = np.asarray(disparity_uncertainty(jnp.asarray(prob), jnp.asarray(disp), 8))
    d = np.arange(8).reshape(1, 8, 1, 1)
    oracle = (np.abs(disp[:, None] - d) * prob).sum(1)
    np.testing.assert_allclose(out, oracle, rtol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("sizes", [(7, 20), (20, 7), (8, 32), (48, 192)])
def test_resize_linear_vs_torch(align_corners, sizes):
    torch = pytest.importorskip("torch")
    in_s, out_s = sizes
    x = RNG.standard_normal((2, 3, in_s)).astype(np.float32)
    ours = np.asarray(resize_linear(jnp.asarray(x), out_s, axis=2, align_corners=align_corners))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_s, mode="linear", align_corners=align_corners
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear_vs_torch(align_corners):
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((1, 2, 9, 13)).astype(np.float32)
    ours = np.asarray(
        resize_bilinear(jnp.asarray(x), (18, 26), h_axis=2, w_axis=3, align_corners=align_corners)
    )
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(18, 26), mode="bilinear", align_corners=align_corners
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_trilinear_vs_torch(align_corners):
    torch = pytest.importorskip("torch")
    x = RNG.standard_normal((1, 6, 4, 5)).astype(np.float32)
    ours = np.asarray(
        resize_volume_trilinear(jnp.asarray(x), (24, 16, 20), align_corners=align_corners)
    )
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x)[:, None],
            size=(24, 16, 20),
            mode="trilinear",
            align_corners=align_corners,
        )
        .squeeze(1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_upsample_cost_and_regress_matches_reference_tail():
    torch = pytest.importorskip("torch")
    cost = RNG.standard_normal((1, 12, 4, 6)).astype(np.float32)
    pred, prob = upsample_cost_and_regress(jnp.asarray(cost), 48, (16, 24))
    tc = torch.nn.functional.interpolate(
        torch.from_numpy(cost)[:, None], size=(48, 16, 24), mode="trilinear",
        align_corners=False,
    ).squeeze(1)
    tprob = torch.softmax(tc, dim=1)
    tpred = (tprob * torch.arange(48.0).view(1, 48, 1, 1)).sum(1)
    np.testing.assert_allclose(np.asarray(prob), tprob.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred), tpred.numpy(), rtol=1e-4, atol=1e-4)
