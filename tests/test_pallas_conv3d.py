"""Pallas packed conv3d: interpret-mode oracle tests (the TPU path is the
same kernel; on-device parity is asserted in the TPU bench harness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.ops.pallas.conv3d import (_banded_weights, conv3d_fold,
                                               conv3d_packed)

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(3)


def _oracle(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )
    return y + b


@pytest.mark.parametrize(
    "c,co,d,h,w",
    [
        (32, 32, 8, 16, 20),
        (64, 32, 8, 16, 20),
        (64, 64, 4, 16, 12),
        (128, 128, 2, 8, 12),
        (32, 32, 8, 13, 20),  # H not a tile multiple
        (32, 16, 4, 8, 12),  # Co < C
    ],
)
def test_conv3d_packed_matches_xla(c, co, d, h, w):
    x = jnp.asarray(RNG.standard_normal((2, d, h, w, c)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((3, 3, 3, c, co)).astype(np.float32)) * 0.05
    b = jnp.asarray(RNG.standard_normal((co,)).astype(np.float32))
    ref = np.asarray(_oracle(x, k, b))
    got = np.asarray(conv3d_packed(x, k, b, relu=False, tile_h=8, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    got_r = np.asarray(conv3d_packed(x, k, b, relu=True, tile_h=8, interpret=True))
    np.testing.assert_allclose(got_r, np.maximum(ref, 0), rtol=1e-4, atol=1e-4)


def test_banded_weights_total_mass():
    """Every tap lands in exactly one (cell, φi) block per output phase."""
    k = jnp.asarray(RNG.standard_normal((3, 3, 3, 32, 32)).astype(np.float32))
    wb = _banded_weights(k, 4)
    assert wb.shape == (3, 3, 3, 128, 128)
    # sum over cells and input phases recovers each output phase's 3 dz taps
    total = np.asarray(wb).sum(axis=(0,))  # (3,3,128,128)
    for phi_o in range(4):
        blk = total[:, :, :, phi_o * 32 : (phi_o + 1) * 32]  # (3,3,128,32)
        np.testing.assert_allclose(
            blk.reshape(3, 3, 4, 32, 32).sum(axis=2),
            np.asarray(k).sum(axis=0),
            atol=1e-5,
        )


def test_convbn_param_tree_unchanged_by_pallas_branch():
    """The _ConvKernel holder produces the same tree as nn.Conv, so eligible
    and ineligible convs checkpoint identically."""
    from diffuvolume_tpu.models.layers import ConvBN

    x3 = jnp.zeros((1, 8, 16, 16, 32))
    mod = ConvBN(32, 3, 1, 1)  # eligible → holder path
    v = mod.init(jax.random.PRNGKey(0), x3, train=False)
    assert set(v["params"]) == {"conv", "bn"}
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 3, 32, 32)
    x3b = jnp.zeros((1, 8, 16, 16, 48))  # C=48 → nn.Conv path
    mod2 = ConvBN(32, 3, 1, 1)
    v2 = mod2.init(jax.random.PRNGKey(0), x3b, train=False)
    assert set(v2["params"]) == {"conv", "bn"}
    assert v2["params"]["conv"]["kernel"].shape == (3, 3, 3, 48, 32)


@pytest.mark.parametrize("c,co,d,h,w", [(32, 32, 8, 11, 17), (64, 64, 4, 9, 10),
                                        (128, 128, 3, 8, 9), (32, 64, 8, 7, 12),
                                        (8, 8, 16, 7, 9), (8, 1, 16, 6, 9),
                                        (16, 8, 8, 6, 10)])
def test_conv3d_fold_matches_xla(c, co, d, h, w):  # noqa: F811
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, d, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, co)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want = np.asarray(_oracle(x, k, b))
    for fold in (False, True):
        got = np.asarray(
            conv3d_fold(x, k, b, relu=False, tile_h=4, interpret=True, fold_dx=fold)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
    got_r = np.asarray(conv3d_fold(x, k, b, relu=True, tile_h=4, interpret=True))
    np.testing.assert_allclose(got_r, np.maximum(want, 0.0), rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("c,d,h,w,th", [(32, 16, 8, 20, 4), (32, 16, 16, 12, 8),
                                        (64, 16, 8, 20, 4)])
def test_conv3d_fold_s2_matches_xla(c, d, h, w, th):
    """Packed stride-2 kernel (pack → fold_s2 → unpack) == XLA strided conv.

    Covers both channel configs the ACV hourglass uses (32→64, 64→128) and
    both window regimes (right-pad at wide W, crop at narrow W — the r4
    lane-merge rewrite)."""
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_s2, pack_padded_k, unpack_padded_k,
    )

    rng = np.random.default_rng(41)
    co = 2 * c
    x = jnp.asarray(rng.standard_normal((1, d, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, c, co)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    pk = pack_padded_k(x, tile_h=th, interpret=True)
    out = conv3d_fold_s2(pk, k, b, relu=False, w_real=w, h_real=h,
                         tile_h=th, interpret=True)
    got = unpack_padded_k(out, d // 2, h // 2, w // 2, co, tile_h=th // 2,
                          interpret=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("kk,op,c,d,h,w,th", [
    (3, 1, 64, 16, 8, 10, 4),   # ACV hourglass deconv shape class
    (4, 0, 64, 16, 8, 10, 4),   # IGEV deconv (k=4, op=0)
    (4, 0, 32, 16, 4, 7, 2),    # w_o = 14 ≡ 6 (mod 8): wrap-slice regime
])
def test_conv3d_fold_up_matches_xla(kk, op, c, d, h, w, th):
    """Packed stride-2 deconv == lhs-dilated conv oracle, k ∈ {3, 4}."""
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_up, pack_padded_k, unpack_padded_k,
    )

    rng = np.random.default_rng(59)
    co = c // 2
    x = jnp.asarray(rng.standard_normal((1, d, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((kk,) * 3 + (c, co)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    pl_ = kk - 2
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(pl_, pl_ + op)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    pk = pack_padded_k(x, tile_h=th, interpret=True)
    out = conv3d_fold_up(pk, k, b, relu=False, w_real=w, h_real=h,
                         tile_h=th, interpret=True)
    got = unpack_padded_k(out, 2 * d, 2 * h, 2 * w, co, tile_h=2 * th,
                          interpret=True)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("kk,op", [(4, 0), (3, 1)])
def test_deconv3d_phases_matches_dilated(kk, op):
    """Phase-decomposed stride-2 ConvTranspose3d == lhs-dilated conv oracle
    for both reference shapes: (k=4, p=1, op=0) and (k=3, p=1, op=1)."""
    from diffuvolume_tpu.models.layers import deconv3d_422_phases

    rng = np.random.default_rng(23)
    ci, co, d, h, w = 16, 8, 8, 6, 10
    pl = kk - 2
    x = jnp.asarray(rng.standard_normal((1, d, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((kk,) * 3 + (ci, co)).astype(np.float32)) * 0.1
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(pl, pl + op)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = deconv3d_422_phases(x, k, out_pad=op)  # CPU: XLA-conv fallback
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_stride2_equals_stride1_subsample():
    """BasicConvBN's stride-2 rewrite: strided conv == stride-1 conv [::2]."""
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 12, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 16)).astype(np.float32))
    s2 = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    s1 = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(s1[:, ::2, ::2, ::2]), np.asarray(s2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,s,p,ci,co,bias", [(7, 1, 3, 3, 64, True),
                                              (3, 2, 1, 3, 32, False),
                                              (7, 2, 3, 3, 64, True)])
def test_unfold_conv2d_matches_xla(k, s, p, ci, co, bias):
    from diffuvolume_tpu.ops.entry_conv import unfold_conv2d

    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((1, 20, 26, ci)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((k, k, ci, co)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32)) if bias else None
    want = jax.lax.conv_general_dilated(
        x, kern, (s, s), [(p, p)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        want = want + b
    got = unfold_conv2d(x, kern, stride=s, padding=p, bias=b)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c,co,d", [(128, 128, 1), (128, 96, 2), (96, 96, 8),
                                    (64, 64, 16), (146, 128, 1), (32, 1, 1)])
def test_conv2d_flat_matches_xla(c, co, d):
    """Flat-shift 2-D dilated conv kernel == XLA oracle (parked experiment —
    see ops/pallas/conv2d.py's measured verdict; parity locked anyway)."""
    from diffuvolume_tpu.ops.pallas.conv2d import conv2d_flat

    rng = np.random.default_rng(11)
    h, w = 16, 20
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, c, co)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((co,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(d, d)] * 2, rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv2d_flat(x, k, b, dilation=d, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ci,bias", [(1, False), (3, True), (4, True)])
def test_s2d_conv2d_matches_xla(ci, bias):
    """Space-to-depth entry conv (k=3 s=2 p=1) == XLA conv, C=1..4."""
    from diffuvolume_tpu.ops.entry_conv import s2d_conv2d

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 20, 26, ci)).astype(np.float32))
    kern = jnp.asarray(rng.standard_normal((3, 3, ci, 24)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((24,)).astype(np.float32)) if bias else None
    want = jax.lax.conv_general_dilated(
        x, kern, (2, 2), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        want = want + b
    got = s2d_conv2d(x, kern, bias=b)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pcw_denoise_fast_matches_module():
    """Packed Mish-hourglass PCW fast path == PCWNet.denoise (interpret).

    Covers the in-kernel Mish epilogue, the noise-fused pack, and the three
    chained hourglasses + classifier head; refine/uncertainty shared with
    the module path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.models.pcw import PCWNet, pcw_denoise_fast

    h, w, md = 64, 64, 192  # h4 = 16 (th=8 ladder needs th4 = 2)
    rng = jax.random.PRNGKey(0)
    m = PCWNet(max_disp=md, diffusion=True)
    left = jax.random.normal(rng, (1, h, w, 3)) * 0.3
    variables = m.init(
        jax.random.PRNGKey(1), left, left, jnp.zeros((1, h // 4, w // 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, md // 4, h // 4, w // 4)),
        train=True,
    )
    h4, w4 = h // 4, w // 4
    vol = jax.random.normal(jax.random.fold_in(rng, 2),
                            (1, md // 4, h4, w4, 32)) * 0.5
    fl = {"refine": jax.random.normal(jax.random.fold_in(rng, 4),
                                      (1, h4, w4, 32)) * 0.5}
    fr = {"refine": jax.random.normal(jax.random.fold_in(rng, 5),
                                      (1, h4, w4, 32)) * 0.5}
    latent = jax.random.normal(jax.random.fold_in(rng, 3), (1, md // 4, h4, w4))
    t = jnp.full((1,), 300, jnp.int32)

    want = m.apply(variables, vol, fl, fr, latent, t, (h, w),
                   method=PCWNet.denoise, mutable=False)
    got = pcw_denoise_fast(m, variables, vol, fl, fr, latent, t, (h, w),
                           interpret=True)
    for name, a, b in zip(("disp", "unc", "noise"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"pcw fast-path {name} diverged")


def test_acv_denoise_fast_matches_module(tmp_path):
    """Packed-chain TPU fast path == ACVNet.denoise (interpret mode, CPU).

    BN folding + fold-kernel chains vs the module's XLA path; also the guard
    that lets eval/pipeline dispatch to acv_denoise_fast on TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.models.acv import ACVNet, acv_denoise_fast

    h, w, md = 32, 64, 64
    rng = jax.random.PRNGKey(0)
    m = ACVNet(max_disp=md, diffusion=True)
    left = jax.random.normal(rng, (1, h, w, 3)) * 0.3
    variables = m.init(
        jax.random.PRNGKey(1), left, left, jnp.zeros((1, h // 4, w // 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, md // 4, h // 4, w // 4)),
        train=True,
    )
    vol = jax.random.normal(jax.random.fold_in(rng, 2),
                            (1, md // 4, h // 4, w // 4, 64)) * 0.5
    latent = jax.random.normal(jax.random.fold_in(rng, 3),
                               (1, md // 4, h // 4, w // 4))
    t = jnp.full((1,), 300, jnp.int32)

    want = m.apply(variables, vol, latent, t, (h, w), method=ACVNet.denoise,
                   mutable=False)
    got = acv_denoise_fast(m, variables, vol, latent, t, (h, w),
                           interpret=True)
    for name, a, b in zip(("disp", "unc", "noise"), got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"fast-path {name} diverged")


def test_acv_prep_fast_matches_module():
    """Packed pass-1/prep == baseline forward + build_cost_volume (interpret).

    r5: the whole prep (frozen baseline aggregation + BOTH models' attention
    volume builds) runs on the packed kernel family; parity covers the
    40→64-pad x2 entry, the packed attention hourglass, and the softmax ⊙
    concat epilogue."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.models.acv import ACVNet, acv_prep_fast

    h, w, md = 32, 64, 64
    rng = jax.random.PRNGKey(0)
    base = ACVNet(max_disp=md, diffusion=False)
    ddim = ACVNet(max_disp=md, diffusion=True)
    left = jax.random.normal(rng, (1, h, w, 3)) * 0.3
    right = jax.random.normal(jax.random.fold_in(rng, 1), (1, h, w, 3)) * 0.3
    base_vars = base.init(jax.random.PRNGKey(1), left, right, train=True)
    ddim_vars = ddim.init(
        jax.random.PRNGKey(2), left, right, jnp.zeros((1, h // 4, w // 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, md // 4, h // 4, w // 4)),
        train=True,
    )

    want_disp = base.apply(base_vars, left, right, train=False)[-1]
    want_vol, _ = ddim.apply(ddim_vars, left, right, train=False,
                             method=ACVNet.build_cost_volume)
    got_disp, (cl, cr, att) = acv_prep_fast(base, ddim, base_vars, ddim_vars,
                                            left, right, interpret=True)
    from diffuvolume_tpu.ops.cost_volume import build_concat_volume

    got_vol = att[..., None] * build_concat_volume(cl, cr, md // 4)
    np.testing.assert_allclose(np.asarray(got_disp), np.asarray(want_disp),
                               rtol=2e-3, atol=2e-3,
                               err_msg="prep fast baseline disp diverged")
    # The untrained init produces |volume| ~ 6e4; compare magnitude-
    # normalized (fp accumulation-order noise on near-cancelling elements
    # otherwise trips a raw rtol).
    gv, wv = np.asarray(got_vol), np.asarray(want_vol)
    assert np.max(np.abs(gv - wv)) / np.max(np.abs(wv)) < 1e-4, (
        "prep fast ac_volume diverged")


def test_pack_padded_k_c_slot():
    """c_slot packing == pack_padded of the channel-zero-padded volume."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.ops.pallas.conv3d import pack_padded, pack_padded_k

    rng = jax.random.PRNGKey(0)
    x40 = jax.random.normal(rng, (1, 16, 16, 22, 40))
    want = pack_padded(jnp.pad(x40, ((0, 0),) * 4 + ((0, 24),)), tile_h=8)
    got = pack_padded_k(x40, tile_h=8, interpret=True, c_slot=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pack_concat_k_matches_xla():
    """Fused concat-build+att(+noise)-multiply+pack == the XLA composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.ops.cost_volume import build_concat_volume
    from diffuvolume_tpu.ops.pallas.conv3d import pack_concat_k, pack_padded

    rng = jax.random.PRNGKey(0)
    b, d, h, w, c = 1, 16, 16, 22, 32
    cl = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, w, c))
    cr = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, w, c))
    att = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(rng, 3), (b, d, h, w)), axis=1)
    noise = jax.random.uniform(jax.random.fold_in(rng, 4), (b, d, h, w))
    vol = build_concat_volume(cl, cr, d)
    for ns in (None, noise):
        m = att if ns is None else att * ns
        want = pack_padded(vol * m[..., None], tile_h=8)
        got = pack_concat_k(cl, cr, att, ns, max_disp=d, tile_h=8,
                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_depthwise_hw_p_matches_xla():
    """Packed per-lane dilated depthwise (1,3,3) conv == XLA depthwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.ops.pallas.conv3d import (
        depthwise_hw_p, pack_padded_k, unpack_padded_k,
    )

    rng = jax.random.PRNGKey(0)
    b, d, h, w = 1, 8, 16, 20
    x = jax.random.normal(rng, (b, d, h, w, 40))
    pk = pack_padded_k(x, tile_h=8, interpret=True, c_slot=64)

    def dw(xs, k, dil):
        return jax.lax.conv_general_dilated(
            xs.reshape(b * d, h, w, xs.shape[-1]), k[:, :, None, :],
            (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=xs.shape[-1]).reshape(b, d, h, w, -1)

    ks = [jax.random.normal(jax.random.fold_in(rng, i), (3, 3, n))
          for i, n in ((1, 8), (2, 16), (3, 16))]
    want = jnp.concatenate(
        [dw(x[..., :8], ks[0], 1), dw(x[..., 8:24], ks[1], 2),
         dw(x[..., 24:40], ks[2], 3)], -1)
    wb = np.zeros((3, 3, 3, 128), np.float32)
    for gi, (lo, hi) in enumerate(((0, 8), (8, 24), (24, 40))):
        for phi in range(2):
            wb[gi, :, :, phi * 64 + lo : phi * 64 + hi] = np.asarray(ks[gi])
    got_pk = depthwise_hw_p(pk, jnp.asarray(wb), (1, 2, 3), w_real=w,
                            h_real=h, tile_h=8, interpret=True)
    got = unpack_padded_k(got_pk, d, h, w, 40, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pcw_prep_fast_matches_module():
    """Packed PCW pass-1/prep == the module baseline forward (interpret).

    The frozen baseline's aggregation (3 Mish hourglasses + classif3 head +
    warp refinement) runs on the packed kernel family; parity covers the
    noise-free pack entry and the flat-conv refinement."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.models.pcw import PCWNet, pcw_prep_fast

    h, w, md = 64, 64, 192
    rng = jax.random.PRNGKey(0)
    base = PCWNet(max_disp=md, diffusion=False)
    ddim = PCWNet(max_disp=md, diffusion=True)
    left = jax.random.normal(rng, (1, h, w, 3)) * 0.3
    right = jax.random.normal(jax.random.fold_in(rng, 1), (1, h, w, 3)) * 0.3
    base_vars = base.init(jax.random.PRNGKey(1), left, right, train=True)
    ddim_vars = ddim.init(
        jax.random.PRNGKey(2), left, right, jnp.zeros((1, h // 4, w // 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, md // 4, h // 4, w // 4)),
        train=True,
    )

    want_disp = base.apply(base_vars, left, right, train=False)[0][0]
    want_vol, _, _, _ = ddim.apply(ddim_vars, left, right, train=False,
                                   method=PCWNet.build_cost_volume)
    got_disp, got_pc, _, _ = pcw_prep_fast(base, ddim, base_vars, ddim_vars,
                                           left, right, interpret=True)
    from diffuvolume_tpu.ops.pallas.conv3d import unpack_padded_k

    got_vol = unpack_padded_k(got_pc.pk, md // 4, h // 4, w // 4, 32,
                              tile_h=8, interpret=True)
    # Random-init magnitudes are ~1e7-1e9 (BN-folded vs conv+BN order);
    # compare magnitude-normalized (raw rtol trips on fp accumulation noise).
    gd, wd = np.asarray(got_disp), np.asarray(want_disp)
    assert np.max(np.abs(gd - wd)) / np.max(np.abs(wd)) < 1e-2, (
        "pcw prep fast baseline disp diverged")
    gv, wv = np.asarray(got_vol), np.asarray(want_vol)
    assert np.max(np.abs(gv - wv)) / np.max(np.abs(wv)) < 1e-4, (
        "pcw packed build combine volume diverged")


def test_packed_dhw_mul_and_pkcat_entry():
    """packed_dhw_mul_k(pack_concat_k(att=None)) == pack of the multiplied
    volume, and the PackedConcat denoise entry == the triple entry."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.ops.cost_volume import build_concat_volume
    from diffuvolume_tpu.ops.pallas.conv3d import (
        pack_concat_k, pack_padded, packed_dhw_mul_k,
    )

    rng = jax.random.PRNGKey(0)
    b, d, h, w, c = 1, 16, 16, 22, 32
    cl = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, w, c))
    cr = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, w, c))
    att = jax.nn.softmax(
        jax.random.normal(jax.random.fold_in(rng, 3), (b, d, h, w)), axis=1)
    noise = jax.random.uniform(jax.random.fold_in(rng, 4), (b, d, h, w))
    vol = build_concat_volume(cl, cr, d)

    pk_cat = pack_concat_k(cl, cr, None, None, max_disp=d, tile_h=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(pk_cat),
                               np.asarray(pack_padded(vol, tile_h=8)),
                               atol=1e-5)
    got = packed_dhw_mul_k(pk_cat, att, noise, c_slot=64, max_disp=d,
                           tile_h=8, interpret=True)
    want = pack_padded(vol * (att * noise)[..., None], tile_h=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    got1 = packed_dhw_mul_k(pk_cat, att, None, c_slot=64, max_disp=d,
                            tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got1), np.asarray(pack_padded(vol * att[..., None], 8)),
        atol=1e-5)


def test_packed_dhw_mul_c_slot32():
    """packed_dhw_mul_k at c_slot=32 (p=4 — the PCW scan's noise multiply)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffuvolume_tpu.ops.pallas.conv3d import (
        pack_padded, pack_padded_k, packed_dhw_mul_k,
    )

    rng = jax.random.PRNGKey(0)
    b, d, h, w, c = 1, 16, 16, 22, 32
    x = jax.random.normal(rng, (b, d, h, w, c))
    noise = jax.random.uniform(jax.random.fold_in(rng, 1), (b, d, h, w))
    pk = pack_padded_k(x, tile_h=8, interpret=True)
    got = packed_dhw_mul_k(pk, noise, None, c_slot=32, max_disp=d, tile_h=8,
                           interpret=True)
    want = pack_padded(x * noise[..., None], tile_h=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
