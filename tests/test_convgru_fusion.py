"""ConvGRU's fused z/r conv must equal the two-conv formulation exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from diffuvolume_tpu.models.igev.update import ConvGRU
import pytest

pytestmark = pytest.mark.slow


def _unfused_reference(params, h, cz, cr, cq, x):
    """The literal two-conv GRU (reference KITTI15/core/update.py:26-42)."""

    def conv(p, inp):
        y = jax.lax.conv_general_dilated(
            inp, p["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + p["bias"]

    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(conv(params["convz"], hx) + cz)
    r = jax.nn.sigmoid(conv(params["convr"], hx) + cr)
    q = jnp.tanh(conv(params["convq"], jnp.concatenate([r * h, x], axis=-1)) + cq)
    return (1 - z) * h + z * q


def test_fused_matches_unfused():
    rng = np.random.RandomState(0)
    b, hh, ww, hd = 2, 6, 10, 16
    h = jnp.asarray(rng.randn(b, hh, ww, hd), jnp.float32)
    cz, cr, cq = (jnp.asarray(rng.randn(b, hh, ww, hd), jnp.float32) for _ in range(3))
    x = jnp.asarray(rng.randn(b, hh, ww, 24), jnp.float32)

    gru = ConvGRU(hidden_dim=hd)
    variables = gru.init(jax.random.PRNGKey(0), h, cz, cr, cq, x)
    got = gru.apply(variables, h, cz, cr, cq, x)
    want = _unfused_reference(variables["params"], h, cz, cr, cq, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_param_tree_nnconv_compatible():
    gru = ConvGRU(hidden_dim=8)
    z = jnp.zeros((1, 4, 4, 8))
    x = jnp.zeros((1, 4, 4, 12))
    variables = gru.init(jax.random.PRNGKey(0), z, z, z, z, x)
    p = variables["params"]
    assert set(p) == {"convz", "convr", "convq"}
    for name in ("convz", "convr"):
        assert p[name]["kernel"].shape == (3, 3, 20, 8)
        assert p[name]["bias"].shape == (8,)
    assert p["convq"]["kernel"].shape == (3, 3, 20, 8)


def test_motion_encoder_pieces_match_concat():
    """Split (J,C)-contraction convc1 == 1x1 conv on the concatenated feature."""
    from diffuvolume_tpu.models.igev.update import BasicMotionEncoder

    rng = np.random.RandomState(2)
    b, hh, ww = 1, 5, 7
    pieces = tuple(
        jnp.asarray(rng.randn(b, hh, ww, j, c), jnp.float32)
        for j, c in ((9, 8), (9, 1), (9, 8), (9, 1))
    )
    planes = sum(p.shape[-2] * p.shape[-1] for p in pieces)
    disp = jnp.asarray(rng.randn(b, hh, ww, 1), jnp.float32)

    enc = BasicMotionEncoder(corr_planes=planes)
    variables = enc.init(jax.random.PRNGKey(0), disp, pieces)
    got = enc.apply(variables, disp, pieces)
    flat = jnp.concatenate([p.reshape(b, hh, ww, -1) for p in pieces], axis=-1)
    want = enc.apply(variables, disp, flat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_disp_head_tap_decomposition_matches_conv():
    """conv2 as (1x1 matmul -> 9 shift-adds) == the literal 3x3 conv 256->1."""
    from diffuvolume_tpu.models.igev.update import DispHead

    rng = np.random.RandomState(3)
    b, hh, ww, hd = 1, 6, 9, 16
    x = jnp.asarray(rng.randn(b, hh, ww, hd), jnp.float32)
    head = DispHead(hidden_dim=hd)
    variables = head.init(jax.random.PRNGKey(0), x)
    got = head.apply(variables, x)

    p = variables["params"]
    y = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, p["conv1"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["conv1"]["bias"]
    )
    want = (
        jax.lax.conv_general_dilated(
            y, p["conv2"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["conv2"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_motion_encoder_convd1_unfold_matches_conv():
    """convd1 as (unfold-49 -> 1x1 matmul) == the literal 7x7 conv 1->64."""
    from diffuvolume_tpu.models.igev.update import BasicMotionEncoder

    rng = np.random.RandomState(4)
    b, hh, ww = 1, 8, 11
    pieces = tuple(
        jnp.asarray(rng.randn(b, hh, ww, j, c), jnp.float32)
        for j, c in ((9, 8), (9, 1), (9, 8), (9, 1))
    )
    planes = sum(p.shape[-2] * p.shape[-1] for p in pieces)
    disp = jnp.asarray(rng.randn(b, hh, ww, 1), jnp.float32)
    enc = BasicMotionEncoder(corr_planes=planes)
    variables = enc.init(jax.random.PRNGKey(1), disp, pieces)
    got = enc.apply(variables, disp, pieces)

    # Oracle: recompute the whole encoder with convd1 as a literal conv.
    p = variables["params"]

    def conv(pp, inp, pad):
        return (
            jax.lax.conv_general_dilated(
                inp, pp["kernel"], (1, 1), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + pp["bias"]
        )

    flat = jnp.concatenate([q.reshape(b, hh, ww, -1) for q in pieces], axis=-1)
    cor = jax.nn.relu(conv(p["convc1"], flat, 0))
    cor = jax.nn.relu(conv(p["convc2"], cor, 1))
    dsp = jax.nn.relu(conv(p["convd1"], disp, 3))
    dsp = jax.nn.relu(conv(p["convd2"], dsp, 1))
    out = jax.nn.relu(conv(p["conv"], jnp.concatenate([cor, dsp], axis=-1), 1))
    want = jnp.concatenate([out, disp], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_split_pieces_match_unfused_multi_x():
    """conv-over-pieces (h + two x pieces) == concat+conv reference."""
    rng = np.random.RandomState(7)
    b, hh, ww, hd = 1, 6, 10, 16
    h = jnp.asarray(rng.randn(b, hh, ww, hd), jnp.float32)
    cz, cr, cq = (jnp.asarray(rng.randn(b, hh, ww, hd), jnp.float32) for _ in range(3))
    x1 = jnp.asarray(rng.randn(b, hh, ww, 24), jnp.float32)
    x2 = jnp.asarray(rng.randn(b, hh, ww, 16), jnp.float32)

    gru = ConvGRU(hidden_dim=hd)
    variables = gru.init(jax.random.PRNGKey(0), h, cz, cr, cq, x1, x2)
    got = gru.apply(variables, h, cz, cr, cq, x1, x2)
    want = _unfused_reference(
        variables["params"], h, cz, cr, cq, jnp.concatenate([x1, x2], axis=-1)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gru_merge_env_equivalence(monkeypatch):
    """DIFFU_GRU_MERGE=1 (pre-concatenated x pieces) == default pieces form."""
    from diffuvolume_tpu.models.igev.update import BasicMultiUpdateBlock

    rng = np.random.RandomState(11)
    b, h4, w4 = 1, 8, 12
    blk = BasicMultiUpdateBlock(hidden_dims=(16, 16, 16), corr_levels=2,
                                corr_radius=4)
    net = [jnp.asarray(rng.randn(b, h4 // 2**i, w4 // 2**i, 16), jnp.float32)
           for i in range(3)]
    inp = [tuple(jnp.asarray(rng.randn(b, h4 // 2**i, w4 // 2**i, 16), jnp.float32)
                 for _ in range(3)) for i in range(3)]
    corr = jnp.asarray(rng.randn(b, h4, w4, 2 * 9 * 9), jnp.float32)
    disp = jnp.asarray(rng.randn(b, h4, w4, 1), jnp.float32)

    variables = blk.init(jax.random.PRNGKey(1), net, inp, corr, disp)
    monkeypatch.delenv("DIFFU_GRU_MERGE", raising=False)
    net_a, mask_a, d_a = blk.apply(variables, net, inp, corr, disp)
    monkeypatch.setenv("DIFFU_GRU_MERGE", "1")
    net_b, mask_b, d_b = blk.apply(variables, net, inp, corr, disp)
    for a_, b_ in zip([*net_a, mask_a, d_a], [*net_b, mask_b, d_b]):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
