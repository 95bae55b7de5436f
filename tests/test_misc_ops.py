"""Tests for the auxiliary ops/utilities (nearby regression, variance,
error-map, logger, flops accounting)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.ops.regression import (
    disparity_regression_nearby,
    disparity_variance,
    disparity_variance_confidence,
)
from diffuvolume_tpu.utils.visualization import disp_error_image

RNG = np.random.default_rng(9)


def test_nearby_regression_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    sim = RNG.standard_normal((2, 12, 5, 6)).astype(np.float32)
    ours = np.asarray(disparity_regression_nearby(jnp.asarray(sim), 1.0, 2))

    # torch oracle transcribing KITTI12/models/submodule.py:40-84
    s = torch.from_numpy(sim)
    _, idx_max = torch.max(s, dim=1, keepdim=True)
    idx_limit = s.size(1) - 1
    sup = []
    for shift in range(-2, 3):
        i = idx_max + shift
        i = i.clamp(0, idx_limit)
        sup.append(i)
    sup = torch.cat(sup, dim=1)
    support = torch.gather(s, 1, sup.long())
    prob = F.softmax(support, dim=1)
    ref = torch.sum(prob * sup.float(), dim=1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_variance_confidence():
    prob = RNG.uniform(size=(1, 8, 3, 3)).astype(np.float32)
    samples = RNG.uniform(0, 7, (1, 8, 3, 3)).astype(np.float32)
    disp = RNG.uniform(0, 7, (1, 3, 3)).astype(np.float32)
    out = np.asarray(
        disparity_variance_confidence(jnp.asarray(prob), jnp.asarray(samples), jnp.asarray(disp))
    )
    oracle = ((disp[:, None] - samples) ** 2 * prob).sum(1)
    np.testing.assert_allclose(out, oracle, rtol=1e-5)


def test_error_image():
    gt = RNG.uniform(0, 50, (8, 8)).astype(np.float32)
    gt[0, 0] = 0  # invalid
    est = gt + RNG.standard_normal((8, 8)).astype(np.float32)
    img = disp_error_image(est, gt)
    assert img.shape == (8, 8, 3)
    assert (img[0, 0] == 0).all()  # invalid → black


def test_logger(tmp_path):
    from diffuvolume_tpu.utils.logger import Logger

    log = Logger(str(tmp_path), print_freq=2)
    log.push({"loss": 1.0})
    log.push({"loss": 3.0})
    log.write_dict({"epe": 0.5}, step=2)
    log.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    import json

    assert json.loads(lines[0])["loss"] == 2.0


def test_param_count():
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.tools.flops import trainable_param_report

    model = ACVNet(max_disp=64, diffusion=True)
    left = jnp.zeros((1, 32, 64, 3))
    variables = model.init(
        jax.random.PRNGKey(0), left, left,
        jnp.zeros((1, 8, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 8, 16)), train=True,
    )
    report = trainable_param_report(variables)
    assert report["TOTAL_M"] > 1.0  # several million params
    assert "feature_extraction" in report
