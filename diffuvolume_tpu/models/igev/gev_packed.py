"""All-Pallas packed GEV tower for the IGEV encode (round 4).

TPU-native rebuild of the reference's cost-volume aggregation
(KITTI15/core/igev_stereo_ddim.py:366-387 calls; submodule ops at
igev_stereo_ddim.py:24-89 ``hourglass_att``): the gwc volume, corr_stem,
feature attentions, and the full attended 3D hourglass run in the
packed-padded lane geometry end-to-end — the same all-or-nothing strategy
that took the ACV denoise from 49 to 25 ms/step (partial-Pallas configs
poison neighboring XLA conv strategies; CLAUDE.md r3/r4).

Per the r3 encode trace, the XLA path spends ~8-9 ms of each ~25 ms encode
here: gwc build 2.5 ms (48 shifted slice/pad/stack at G=8 = 16× lane
padding), FeatureAtt broadcast relayout 1.4 ms, stride-2 conv1_0 1.3 ms,
plus the small-C hourglass convs.

Geometry: D=48 bins; channel ladder 8 → 16 → 32 → 48 (padded to 64) with
tile heights 16 → 8 → 4 → 2 (cells preserved at 3 throughout; the packed
phase count p = 128/C halves per stride-2 level).  The 1/32 level's
C=48 does not divide 128 — kernels/biases/attention are zero-padded to 64
(exact: padded lanes carry zeros through conv, leaky, and attention).

Eval-only (inference BatchNorm folded into the conv weights in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LEAKY = 0.01


def _fold_bcbn(p, bs, eps=1e-5):
    """BasicConvBN inference weights with BN folded → (kernel', bias')."""
    k = p["conv"]["kernel"].astype(jnp.float32)
    sc = p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bs["bn"]["var"].astype(jnp.float32) + eps
    )
    return k * sc, (
        p["bn"]["bias"].astype(jnp.float32)
        - bs["bn"]["mean"].astype(jnp.float32) * sc
    )


def _att_map(p, bs, feat):
    """FeatureAtt attention map: sigmoid(att1(leaky(bn(att0(feat))))).

    Both convs are 1×1 → two channel dots in f32 (tiny; submodule
    FeatureAtt, extractor feature_att shapes).  Returns (B, H, W, cv).
    """
    k0, b0 = _fold_bcbn(p["att0"], bs["att0"])
    x = feat.astype(jnp.float32)
    a = (
        jax.lax.dot_general(
            x, k0.reshape(k0.shape[-2], k0.shape[-1]),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        + b0
    )
    a = jnp.where(a > 0.0, a, LEAKY * a)
    k1 = p["att1"]["kernel"].astype(jnp.float32)
    a = (
        jax.lax.dot_general(
            a, k1.reshape(k1.shape[-2], k1.shape[-1]),
            (((a.ndim - 1,), (0,)), ((), ())),
        )
        + p["att1"]["bias"].astype(jnp.float32)
    )
    return jax.nn.sigmoid(a)


def _pad_ch(k, b_, ci_to=None, co_to=None):
    """Zero-pad a conv kernel's channel dims (and bias) — exact: padded
    input lanes are zero, padded output lanes produce zero."""
    pads = [(0, 0)] * k.ndim
    if ci_to is not None:
        pads[-2] = (0, ci_to - k.shape[-2])
    if co_to is not None:
        pads[-1] = (0, co_to - k.shape[-1])
        b_ = jnp.pad(b_, (0, co_to - k.shape[-1]))
    return jnp.pad(k, pads), b_


def gev_tower_packed(
    model,
    variables,
    match_l: jax.Array,
    match_r: jax.Array,
    feat_l: list[jax.Array],
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """gwc → corr_stem → attended hourglass → (gev, cost_head) — all packed.

    Args:
      match_l/match_r: ``(B, H4, W4, C)`` descriptors.
      feat_l: the 4-level feature pyramid (96, 64, 192, 160 ch).

    Returns:
      ``(gev (B, H4, W4, 48, 8), cost (B, H4, W4, 48))`` — channels-minor:
      gev in the geometry pyramid's native layout, cost with D in lanes
      (softmax/regression over the minor axis).  The classifier head runs
      packed too: XLA lowers the 1-lane-out conv3d catastrophically.
    """
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv1x1_fold_p,
        conv3d_fold_p,
        conv3d_fold_s2,
        conv3d_fold_up,
        tile_packed_mul,
        unpack_hwdc_k,
    )
    from diffuvolume_tpu.ops.pallas.gwc_volume import gwc_volume_packed

    dt = model.dtype
    prm, bst = variables["params"], variables["batch_stats"]
    ca, cab = prm["cost_agg"], bst["cost_agg"]
    b, h4, w4 = match_l.shape[0], match_l.shape[1], match_l.shape[2]
    d = model.max_disp // 4
    assert d == 48 and h4 % 16 == 0, (d, h4)
    th0, th1, th2, th3 = 16, 8, 4, 2
    h8, w8 = h4 // 2, w4 // 2
    h16, w16 = h4 // 4, w4 // 4
    h32, w32 = h4 // 8, w4 // 8
    L = LEAKY

    # Attention maps (1×1 convs — XLA dots, tiny) → packed multipliers.
    mul_cs = tile_packed_mul(
        _att_map(prm["corr_feature_att"], bst["corr_feature_att"], feat_l[0]),
        16, th0, dt)
    mul8 = tile_packed_mul(
        _att_map(ca["feature_att_8"], cab["feature_att_8"], feat_l[1]),
        8, th1, dt)
    mul16 = tile_packed_mul(
        _att_map(ca["feature_att_16"], cab["feature_att_16"], feat_l[2]),
        4, th2, dt)
    att32 = _att_map(ca["feature_att_32"], cab["feature_att_32"], feat_l[3])
    mul32 = tile_packed_mul(
        jnp.pad(att32, ((0, 0), (0, 0), (0, 0), (0, 16))), 2, th3, dt)
    mulu16 = tile_packed_mul(
        _att_map(ca["feature_att_up_16"], cab["feature_att_up_16"], feat_l[2]),
        4, th2, dt)
    mulu8 = tile_packed_mul(
        _att_map(ca["feature_att_up_8"], cab["feature_att_up_8"], feat_l[1]),
        8, th1, dt)

    pk = gwc_volume_packed(match_l.astype(dt), match_r.astype(dt), d, 8,
                           tile_h=th0, interpret=interpret)
    k, bb = _fold_bcbn(prm["corr_stem"], bst["corr_stem"])
    pk = conv3d_fold_p(pk, k.astype(dt), bb, w_real=w4, h_real=h4,
                       tile_h=th0, leaky=L, post_mul=mul_cs,
                       interpret=interpret)

    k, bb = _fold_bcbn(ca["conv1_0"], cab["conv1_0"])
    c1 = conv3d_fold_s2(pk, k.astype(dt), bb, w_real=w4, h_real=h4,
                        tile_h=th0, leaky=L, interpret=interpret)
    k, bb = _fold_bcbn(ca["conv1_1"], cab["conv1_1"])
    c1 = conv3d_fold_p(c1, k.astype(dt), bb, w_real=w8, h_real=h8,
                       tile_h=th1, leaky=L, post_mul=mul8,
                       interpret=interpret)

    k, bb = _fold_bcbn(ca["conv2_0"], cab["conv2_0"])
    c2 = conv3d_fold_s2(c1, k.astype(dt), bb, w_real=w8, h_real=h8,
                        tile_h=th1, leaky=L, interpret=interpret)
    k, bb = _fold_bcbn(ca["conv2_1"], cab["conv2_1"])
    c2 = conv3d_fold_p(c2, k.astype(dt), bb, w_real=w16, h_real=h16,
                       tile_h=th2, leaky=L, post_mul=mul16,
                       interpret=interpret)

    # 1/32 level: C=48 padded to 64.
    k, bb = _fold_bcbn(ca["conv3_0"], cab["conv3_0"])
    k, bb = _pad_ch(k, bb, co_to=64)
    c3 = conv3d_fold_s2(c2, k.astype(dt), bb, w_real=w16, h_real=h16,
                        tile_h=th2, leaky=L, interpret=interpret)
    k, bb = _fold_bcbn(ca["conv3_1"], cab["conv3_1"])
    k, bb = _pad_ch(k, bb, ci_to=64, co_to=64)
    c3 = conv3d_fold_p(c3, k.astype(dt), bb, w_real=w32, h_real=h32,
                       tile_h=th3, leaky=L, post_mul=mul32,
                       interpret=interpret)

    k, bb = _fold_bcbn(ca["conv3_up"], cab["conv3_up"])  # (4,4,4,48,32)
    k, _ = _pad_ch(k, bb, ci_to=64)
    c3u = conv3d_fold_up(c3, k.astype(dt), bb, w_real=w32, h_real=h32,
                         tile_h=th3, leaky=L, interpret=interpret)

    # agg0: 1×1 over concat(c3u, c2) = sum of two per-input 1×1s; leaky
    # applied AFTER the sum (XLA elementwise on the packed arrays — no conv,
    # no poison surface).
    k0 = ca["agg0_0"]["conv"]["kernel"]
    k0f, b0f = _fold_bcbn(ca["agg0_0"], cab["agg0_0"])
    ya = conv1x1_fold_p(c3u, k0f[..., :32, :].astype(dt), b0f,
                        w_real=w16, h_real=h16, tile_h=th2,
                        interpret=interpret)
    yb = conv1x1_fold_p(c2, k0f[..., 32:, :].astype(dt), None,
                        w_real=w16, h_real=h16, tile_h=th2,
                        interpret=interpret)
    y = ya + yb
    y = jnp.where(y > 0.0, y, L * y).astype(c2.dtype)
    k, bb = _fold_bcbn(ca["agg0_1"], cab["agg0_1"])
    y = conv3d_fold_p(y, k.astype(dt), bb, w_real=w16, h_real=h16,
                      tile_h=th2, leaky=L, interpret=interpret)
    k, bb = _fold_bcbn(ca["agg0_2"], cab["agg0_2"])
    y = conv3d_fold_p(y, k.astype(dt), bb, w_real=w16, h_real=h16,
                      tile_h=th2, leaky=L, post_mul=mulu16,
                      interpret=interpret)

    k, bb = _fold_bcbn(ca["conv2_up"], cab["conv2_up"])  # (4,4,4,32,16)
    c2u = conv3d_fold_up(y, k.astype(dt), bb, w_real=w16, h_real=h16,
                         tile_h=th2, leaky=L, interpret=interpret)

    k1f, b1f = _fold_bcbn(ca["agg1_0"], cab["agg1_0"])
    ya = conv1x1_fold_p(c2u, k1f[..., :16, :].astype(dt), b1f,
                        w_real=w8, h_real=h8, tile_h=th1,
                        interpret=interpret)
    yb = conv1x1_fold_p(c1, k1f[..., 16:, :].astype(dt), None,
                        w_real=w8, h_real=h8, tile_h=th1,
                        interpret=interpret)
    y = ya + yb
    y = jnp.where(y > 0.0, y, L * y).astype(c1.dtype)
    k, bb = _fold_bcbn(ca["agg1_1"], cab["agg1_1"])
    y = conv3d_fold_p(y, k.astype(dt), bb, w_real=w8, h_real=h8,
                      tile_h=th1, leaky=L, interpret=interpret)
    k, bb = _fold_bcbn(ca["agg1_2"], cab["agg1_2"])
    y = conv3d_fold_p(y, k.astype(dt), bb, w_real=w8, h_real=h8,
                      tile_h=th1, leaky=L, post_mul=mulu8,
                      interpret=interpret)

    # conv1_up: raw deconv, no bn / bias / activation (use_bn=False,
    # relu=False; ConvTransposeBN use_bias default False).
    kd = ca["conv1_up"]["conv"]["kernel"]
    pk_gev = conv3d_fold_up(y, kd.astype(dt), None, w_real=w8, h_real=h8,
                            tile_h=th1, interpret=interpret)

    # Classifier head (3,3,3,8,1) in packed space (co padded to 8 inside
    # fold_p) — the 1-lane-out XLA conv3d is the known pathology.
    k_cls = prm["classifier"]["kernel"]
    pk_cost = conv3d_fold_p(pk_gev, k_cls.astype(dt), None, w_real=w4,
                            h_real=h4, tile_h=th0, interpret=interpret)

    # Channels-minor unpacks: gev (B, H, W, D, 8) — the geometry pyramid's
    # native layout (kills the moveaxis 8-D transpose) — and the cost as
    # (B, H, W, D) with D in lanes.  The (B, D, H, W, co) unpack at th=16
    # OOMed scoped VMEM (co lanes pad to 128 → 41.5 MB blocks).
    gev = unpack_hwdc_k(pk_gev, d, h4, w4, 8, tile_h=th0,
                        interpret=interpret).reshape(b, h4, w4, d, 8)
    cost = unpack_hwdc_k(pk_cost, d, h4, w4, 1, tile_h=th0,
                         interpret=interpret)
    return gev, cost
