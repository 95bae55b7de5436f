"""Cost-volume builders vs NumPy oracles built from the reference semantics."""

import numpy as np
import jax.numpy as jnp

from diffuvolume_tpu.ops.cost_volume import (
    build_concat_volume,
    build_gwc_volume,
    build_signed_correlation_volume,
    groupwise_correlation,
)

RNG = np.random.default_rng(0)


def _gwc_oracle(left, right, max_disp, groups):
    # volume[b,g,d,h,w] = mean over group channels(L[...,w] * R[...,w-d]), 0 if w<d
    b, c, h, w = left.shape
    cpg = c // groups
    vol = np.zeros((b, groups, max_disp, h, w), np.float32)
    for d in range(max_disp):
        for wi in range(d, w):
            prod = left[:, :, :, wi] * right[:, :, :, wi - d]
            vol[:, :, d, :, wi] = prod.reshape(b, groups, cpg, h).mean(axis=2)
    return vol


def test_groupwise_correlation():
    l = RNG.standard_normal((2, 3, 5, 8), dtype=np.float32)
    r = RNG.standard_normal((2, 3, 5, 8), dtype=np.float32)
    # channels-last inputs
    out = groupwise_correlation(jnp.asarray(l), jnp.asarray(r), 4)
    oracle = (l * r).reshape(2, 3, 5, 4, 2).mean(-1)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5, atol=1e-6)


def test_build_gwc_volume_matches_reference_semantics():
    b, h, w, c, groups, d = 1, 4, 9, 8, 4, 5
    left = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    right = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    out = np.asarray(build_gwc_volume(jnp.asarray(left), jnp.asarray(right), d, groups))
    # oracle uses channels-first
    oracle = _gwc_oracle(
        left.transpose(0, 3, 1, 2), right.transpose(0, 3, 1, 2), d, groups
    )
    # ours: (B, D, H, W, G) -> compare to (B, G, D, H, W)
    np.testing.assert_allclose(
        out.transpose(0, 4, 1, 2, 3), oracle, rtol=1e-5, atol=1e-6
    )


def test_build_concat_volume():
    b, h, w, c, d = 2, 3, 7, 4, 4
    left = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    right = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    out = np.asarray(build_concat_volume(jnp.asarray(left), jnp.asarray(right), d))
    assert out.shape == (b, d, h, w, 2 * c)
    for di in range(d):
        # left half present at every (d, w) (submodule.py:185)
        np.testing.assert_allclose(out[:, di, :, :, :c], left, atol=0)
        # right half shifted, zero where w < d
        np.testing.assert_allclose(out[:, di, :, :di, c:], 0.0, atol=0)
        if di < w:
            np.testing.assert_allclose(
                out[:, di, :, di:, c:], right[:, :, : w - di], atol=0
            )


def test_concat_volume_mask_ref():
    from diffuvolume_tpu.ops.cost_volume import build_concat_volume as bcv

    b, h, w, c, d = 1, 3, 7, 4, 4
    left = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    right = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    out = np.asarray(bcv(jnp.asarray(left), jnp.asarray(right), d, mask_ref=True))
    for di in range(1, d):
        # KITTI12 variant zeroes the left half where w < d too
        np.testing.assert_allclose(out[:, di, :, :di, :c], 0.0, atol=0)
        np.testing.assert_allclose(out[:, di, :, di:, :c], left[:, :, di:], atol=0)


def test_gwc_volume_norm_variants():
    from diffuvolume_tpu.ops.cost_volume import build_gwc_volume_norm

    b, h, w, c, g, d = 1, 3, 8, 8, 4, 3
    left = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    right = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    for cosine in (False, True):
        out = np.asarray(
            build_gwc_volume_norm(jnp.asarray(left), jnp.asarray(right), d, g, cosine)
        )
        assert out.shape == (b, d, h, w, g)
        assert np.isfinite(out).all()
        # normalized correlations bounded (mean of products of unit-ish vecs)
        assert np.abs(out).max() <= 1.0 + 1e-4


def test_build_signed_correlation_volume():
    b, h, w, c, md = 1, 3, 8, 4, 2
    left = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    right = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    out = np.asarray(
        build_signed_correlation_volume(jnp.asarray(left), jnp.asarray(right), md)
    )
    assert out.shape == (b, 2 * md + 1, h, w)
    for k, d in enumerate(range(-md, md + 1)):
        for wi in range(w):
            src = wi - d
            if 0 <= src < w:
                expect = (left[:, :, wi] * right[:, :, src]).mean(-1)
            else:
                expect = np.zeros((b, h), np.float32)
            np.testing.assert_allclose(out[:, k, :, wi], expect, rtol=1e-5, atol=1e-6)
