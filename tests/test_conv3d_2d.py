"""conv3d_via_2d vs XLA conv3d oracle on randomized configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from diffuvolume_tpu.ops.conv3d_2d import conv3d_via_2d


def _conv3d_ref(x, k, stride, padding, dilation, groups):
    return lax.conv_general_dilated(
        x, k, stride, [(p, p) for p in padding],
        rhs_dilation=dilation, feature_group_count=groups,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


CASES = [
    # (shape, kd/kh/kw, stride, padding, dilation, groups)
    ((1, 8, 6, 10, 8), (3, 3, 3), (1, 1, 1), (1, 1, 1), (1, 1, 1), 1),
    ((2, 8, 6, 10, 8), (3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1), 1),
    ((1, 9, 7, 11, 4), (3, 3, 3), (1, 2, 1), (1, 1, 1), (1, 1, 1), 1),
    ((1, 8, 6, 10, 8), (3, 3, 3), (1, 1, 1), (1, 1, 1), (1, 1, 1), 4),
    ((1, 8, 6, 10, 8), (3, 3, 3), (1, 1, 1), (2, 2, 2), (2, 2, 2), 1),
    ((1, 8, 6, 10, 8), (3, 3, 3), (1, 1, 1), (3, 3, 3), (3, 3, 3), 2),
    ((1, 8, 6, 10, 6), (1, 3, 3), (1, 1, 1), (0, 1, 1), (1, 1, 1), 1),
    ((1, 8, 6, 10, 6), (5, 3, 3), (1, 1, 1), (2, 1, 1), (1, 1, 1), 1),
    ((1, 4, 6, 10, 6), (3, 3, 3), (2, 1, 1), (0, 1, 1), (1, 1, 1), 1),
]


@pytest.mark.parametrize("shape,ks,stride,padding,dilation,groups", CASES)
def test_matches_xla_conv3d(shape, ks, stride, padding, dilation, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    cin = shape[-1]
    k = jnp.asarray(rng.randn(*ks, cin // groups, 8) * 0.1, jnp.float32)
    got = conv3d_via_2d(x, k, stride, padding, dilation, groups)
    want = _conv3d_ref(x, k, stride, padding, dilation, groups)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grad_matches():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 5, 7, 4), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 4) * 0.1, jnp.float32)

    def loss_a(x, k):
        return jnp.sum(conv3d_via_2d(x, k) ** 2)

    def loss_b(x, k):
        return jnp.sum(_conv3d_ref(x, k, (1, 1, 1), (1, 1, 1), (1, 1, 1), 1) ** 2)

    ga = jax.grad(loss_a, (0, 1))(x, k)
    gb = jax.grad(loss_b, (0, 1))(x, k)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_convbn_env_route_matches(monkeypatch):
    """ConvBN with DIFFU_CONV3D_2D=1 must equal the default XLA conv3d path
    for both the 3x3x3/s1/p1 hot shape and a strided aggregation shape."""
    from diffuvolume_tpu.models.layers import ConvBN

    rng = np.random.RandomState(2)
    for kwargs, shape in [
        (dict(features=8, kernel_size=3, stride=1, padding=1), (1, 8, 6, 10, 32)),
        (dict(features=8, kernel_size=3, stride=2, padding=1), (1, 8, 6, 10, 4)),
    ]:
        x = jnp.asarray(rng.randn(*shape), jnp.float32)
        m = ConvBN(use_bn=True, act="relu", **kwargs)
        monkeypatch.delenv("DIFFU_CONV3D_2D", raising=False)
        v = m.init(jax.random.PRNGKey(0), x)
        want = m.apply(v, x)
        monkeypatch.setenv("DIFFU_CONV3D_2D", "1")
        got = m.apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
