"""Parity: Pallas gwc-volume kernel vs the XLA builder (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from diffuvolume_tpu.ops.cost_volume import build_gwc_volume
from diffuvolume_tpu.ops.pallas.gwc_volume import gwc_volume_pallas

RNG = np.random.default_rng(11)


def test_gwc_pallas_matches_xla():
    b, h, w, c, g, d = 1, 4, 16, 32, 4, 8
    left = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    right = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    ref = build_gwc_volume(left, right, d, g)
    out = gwc_volume_pallas(left, right, d, g, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_gwc_pallas_batch2():
    b, h, w, c, g, d = 2, 3, 12, 16, 2, 6
    left = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    right = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
    ref = build_gwc_volume(left, right, d, g)
    out = gwc_volume_pallas(left, right, d, g, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
