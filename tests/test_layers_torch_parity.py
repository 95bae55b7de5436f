"""flax layer parity vs torch CPU oracles (weight-copied, eval mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from diffuvolume_tpu.models.layers import (
    ConvBN,
    ConvTransposeBN,
    DynamicHead,
    SinusoidalTimeEmbed,
    mish,
)

RNG = np.random.default_rng(3)


def test_convbn2d_stride2_matches_torch():
    x = RNG.standard_normal((2, 3, 10, 12)).astype(np.float32)  # NCHW for torch
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(8).eval()
    tbn.running_mean.data = torch.randn(8) * 0.1
    tbn.running_var.data = torch.rand(8) + 0.5
    with torch.no_grad():
        ref = tbn(tconv(torch.from_numpy(x))).numpy()

    m = ConvBN(8, 3, 2, 1)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 12, 3)))
    params = {
        "conv": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "bn": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
    }
    batch_stats = {
        "bn": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        }
    }
    out = m.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_convbn3d_dilated_matches_torch():
    x = RNG.standard_normal((1, 4, 6, 8, 10)).astype(np.float32)  # NCDHW
    tconv = torch.nn.Conv3d(
        4, 4, (1, 3, 3), padding=(0, 2, 2), dilation=(1, 2, 2), groups=4, bias=False
    )
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    m = ConvBN(4, (1, 3, 3), 1, (0, 2, 2), (1, 2, 2), groups=4, use_bn=False, use_bias=False)
    params = {
        "conv": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0))}
    }
    out = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-4
    )


def test_conv_transpose3d_matches_torch():
    x = RNG.standard_normal((1, 4, 4, 6, 6)).astype(np.float32)  # NCDHW
    tconv = torch.nn.ConvTranspose3d(
        4, 8, 3, stride=2, padding=1, output_padding=1, bias=False
    )
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    m = ConvTransposeBN(8, 3, 2, 1, 1, use_bn=False)
    # torch weight (in, out, kd, kh, kw) → flip spatial → (kd, kh, kw, in, out)
    w = tconv.weight.detach().numpy()[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1)
    out = m.apply(
        {"params": {"kernel": jnp.asarray(np.ascontiguousarray(w))}},
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
    )
    assert out.shape == (1, 8, 12, 12, 8)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-4
    )


def test_mish_matches_torch():
    x = RNG.standard_normal((64,)).astype(np.float32)
    ref = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(mish(jnp.asarray(x))), ref, rtol=1e-5, atol=1e-6)


class _TorchDynamicHead(torch.nn.Module):
    """Transcription of SceneFlow/models/head.py:51-82 for the oracle."""

    def __init__(self, d):
        super().__init__()
        import math

        self.d = d

        class Sin(torch.nn.Module):
            def forward(self, t):
                half = d // 2
                emb = math.log(10000) / (half - 1)
                emb = torch.exp(torch.arange(half) * -emb)
                emb = t[:, None].float() * emb[None, :]
                return torch.cat((emb.sin(), emb.cos()), dim=-1)

        self.time_mlp = torch.nn.Sequential(
            Sin(), torch.nn.Linear(d, d * 4), torch.nn.GELU(), torch.nn.Linear(d * 4, d * 4)
        )
        self.block_time_mlp = torch.nn.Sequential(
            torch.nn.SiLU(), torch.nn.Linear(d * 4, d)
        )

    def forward(self, noisy, t):
        emb = self.time_mlp(t)
        ss = self.block_time_mlp(emb).unsqueeze(-1).unsqueeze(-1)
        return noisy + ss


def test_dynamic_head_matches_torch():
    d = 48
    tm = _TorchDynamicHead(d)
    noisy = RNG.standard_normal((2, d, 4, 5)).astype(np.float32)
    t = np.asarray([17, 900])
    with torch.no_grad():
        ref = tm(torch.from_numpy(noisy), torch.from_numpy(t)).numpy()

    m = DynamicHead(d_model=d)
    lin = lambda l: {
        "kernel": jnp.asarray(l.weight.detach().numpy().T),
        "bias": jnp.asarray(l.bias.detach().numpy()),
    }
    params = {
        "time1": lin(tm.time_mlp[1]),
        "time2": lin(tm.time_mlp[3]),
        "block": lin(tm.block_time_mlp[1]),
    }
    out = m.apply(
        {"params": params}, jnp.asarray(noisy), jnp.asarray(t, dtype=jnp.int32)
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sinusoidal_embedding_shape():
    emb = SinusoidalTimeEmbed(48)(jnp.asarray([0, 999], jnp.int32))
    assert emb.shape == (2, 48)
    assert np.isfinite(np.asarray(emb)).all()
