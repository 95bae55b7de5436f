"""PCWNet backbone (+ DiffuVolume diffusion variant) in flax.linen.

TPU-native re-design of the reference PWCNet_ddim / PWCNet pair
(KITTI12/models/pwcnet_ddim.py:12-758, KITTI12/models/pwcnet.py:310-515;
named "PWCNet" in code, PCWNet in the paper): Mish activations, a deeper
pyramid to 1/32 with per-scale group-wise volumes, a multi-scale
``hourglassup`` combine, five classifier heads, and a full-resolution
warp-correlation refinement network.  Same uniform interface as the ACV
backbone: ``build_cost_volume`` → ``denoise`` → ``__call__``.

All volumes are ``(B, D, H, W, C)`` channels-last; trilinear upsampling uses
align_corners=True throughout (pwcnet_ddim.py:480).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffuvolume_tpu.models.layers import (
    _ACTS,
    ConvBN,
    ConvTransposeBN,
    DynamicHead,
    HeadConv3D,
    torch_conv_init,
)
from diffuvolume_tpu.ops.cost_volume import (
    build_concat_volume,
    build_gwc_volume,
    build_signed_correlation_volume,
)
from diffuvolume_tpu.ops.regression import (
    resize_bilinear,
    upsample_cost_and_regress,
)
from diffuvolume_tpu.ops.sampling import warp_right_to_left


class BasicBlockMish(nn.Module):
    """KITTI12 residual block — Mish after conv1 (KITTI12/models/submodule.py:192-215)."""

    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    act: str = "mish"  # "relu" = the KITTI12/models/relu/ fork
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.dilation if self.dilation > 1 else 1
        out = ConvBN(self.features, 3, self.stride, pad, self.dilation,
                     act=self.act, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.features, 3, 1, pad, self.dilation,
                     dtype=self.dtype, name="conv2")(out, train)
        if self.downsample:
            x = ConvBN(self.features, 1, self.stride, 0, dtype=self.dtype,
                       name="downsample")(x, train)
        return out + x


class PCWFeatureExtractor(nn.Module):
    """Deep pyramid to 1/32 with per-scale gw projections.

    Reference: pwcnet_ddim.py:12-128.  Returns dict with gw1..gw4 (320 ch at
    1/4, 1/8, 1/16, 1/32), concat features (12 ch each), and the 32-ch
    refinement feature.
    """

    concat_channels: int = 12
    act: str = "mish"  # "relu" = the KITTI12/models/relu/ fork
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict[str, jax.Array]:
        dt = self.dtype

        def mish_head(cin_name, mid, cout, kernel=3):
            def apply(y):
                y = ConvBN(mid, kernel, 1, 1 if kernel == 3 else 0, act=self.act,
                           dtype=dt, name=f"{cin_name}_0")(y, train)
                return nn.Conv(cout, (1, 1), use_bias=False, dtype=dt,
                               kernel_init=torch_conv_init((1, 1)),
                               name=f"{cin_name}_1")(y)
            return apply

        for i in range(3):
            x = ConvBN(32, 3, 2 if i == 0 else 1, 1, act=self.act, dtype=dt,
                       name=f"firstconv{i}")(x, train)
        for i in range(3):
            x = BasicBlockMish(32, act=self.act, dtype=dt, name=f"layer1_{i}")(x, train)
        l2 = x
        for i in range(16):
            l2 = BasicBlockMish(64, stride=2 if i == 0 else 1, downsample=(i == 0),
                                act=self.act, dtype=dt, name=f"layer2_{i}")(l2, train)
        l3 = l2
        for i in range(3):
            l3 = BasicBlockMish(128, downsample=(i == 0), act=self.act, dtype=dt,
                                name=f"layer3_{i}")(l3, train)
        l4 = l3
        for i in range(3):
            l4 = BasicBlockMish(128, dilation=2, act=self.act, dtype=dt, name=f"layer4_{i}")(l4, train)
        l5 = l4
        for i in range(3):
            l5 = BasicBlockMish(192, stride=2 if i == 0 else 1, downsample=(i == 0),
                                act=self.act, dtype=dt, name=f"layer5_{i}")(l5, train)
        l6 = l5
        for i in range(3):
            l6 = BasicBlockMish(256, stride=2 if i == 0 else 1, downsample=(i == 0),
                                act=self.act, dtype=dt, name=f"layer7_{i}")(l6, train)
        l7 = l6
        for i in range(3):
            l7 = BasicBlockMish(512, stride=2 if i == 0 else 1, downsample=(i == 0),
                                act=self.act, dtype=dt, name=f"layer9_{i}")(l7, train)

        combine = jnp.concatenate([l2, l3, l4], axis=-1)  # 320 ch @ 1/4
        gw1 = mish_head("layer11", 320, 320)(combine)
        gw2 = mish_head("gw2", 320, 320)(l5)
        gw3 = mish_head("gw3", 320, 320)(l6)
        gw4 = mish_head("gw4", 320, 320)(l7)

        refine = ConvBN(128, 3, 1, 1, act=self.act, dtype=dt,
                        name="layer_refine_0")(combine, train)
        refine = ConvBN(32, 1, 1, 0, act=self.act, dtype=dt,
                        name="layer_refine_1")(refine, train)

        cc = self.concat_channels
        return {
            "gw1": gw1, "gw2": gw2, "gw3": gw3, "gw4": gw4,
            "concat1": mish_head("lastconv", 128, cc)(combine),
            "concat2": mish_head("concat2", 128, cc)(l5),
            "concat3": mish_head("concat3", 128, cc)(l6),
            "concat4": mish_head("concat4", 128, cc)(l7),
            "refine": refine,
        }


class HourglassUp(nn.Module):
    """Multi-scale combining hourglass (pwcnet_ddim.py:131-205): fuses the
    1/8, 1/16, 1/32 volumes into the 1/4 volume with strided 3D convs +
    concat combines, deconvs back with skips, FMish activations."""

    channels: int
    act: str = "mish"  # "relu" = the KITTI12/models/relu/ fork
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feature4, feature5, feature6, train: bool = False):
        ch, dt = self.channels, self.dtype
        conv1 = nn.Conv(ch * 2, (3,) * 3, (2,) * 3, [(1, 1)] * 3, use_bias=False,
                        kernel_init=torch_conv_init((3,) * 3), dtype=dt,
                        name="conv1")(x)
        conv1 = ConvBN(ch * 2, 3, 1, 1, act=self.act, dtype=dt, name="combine1")(
            jnp.concatenate([conv1, feature4], axis=-1), train)
        conv2 = ConvBN(ch * 2, 3, 1, 1, act=self.act, dtype=dt, name="conv2")(conv1, train)

        conv3 = nn.Conv(ch * 4, (3,) * 3, (2,) * 3, [(1, 1)] * 3, use_bias=False,
                        kernel_init=torch_conv_init((3,) * 3), dtype=dt,
                        name="conv3")(conv2)
        conv3 = ConvBN(ch * 4, 3, 1, 1, act=self.act, dtype=dt, name="combine2")(
            jnp.concatenate([conv3, feature5], axis=-1), train)
        conv4 = ConvBN(ch * 4, 3, 1, 1, act=self.act, dtype=dt, name="conv4")(conv3, train)

        conv5 = nn.Conv(ch * 4, (3,) * 3, (2,) * 3, [(1, 1)] * 3, use_bias=False,
                        kernel_init=torch_conv_init((3,) * 3), dtype=dt,
                        name="conv5")(conv4)
        conv5 = ConvBN(ch * 4, 3, 1, 1, act=self.act, dtype=dt, name="combine3")(
            jnp.concatenate([conv5, feature6], axis=-1), train)
        conv6 = ConvBN(ch * 4, 3, 1, 1, act=self.act, dtype=dt, name="conv6")(conv5, train)

        c7 = ConvTransposeBN(ch * 4, 3, 2, 1, 1, dtype=dt, name="conv7")(conv6, train)
        r3 = ConvBN(ch * 4, 1, 1, 0, dtype=dt, name="redir3")(conv4, train)
        conv7 = _ACTS[self.act](c7 + r3)
        c8 = ConvTransposeBN(ch * 2, 3, 2, 1, 1, dtype=dt, name="conv8")(conv7, train)
        r2 = ConvBN(ch * 2, 1, 1, 0, dtype=dt, name="redir2")(conv2, train)
        conv8 = _ACTS[self.act](c8 + r2)
        c9 = ConvTransposeBN(ch, 3, 2, 1, 1, dtype=dt, name="conv9")(conv8, train)
        r1 = ConvBN(ch, 1, 1, 0, dtype=dt, name="redir1")(x, train)
        return _ACTS[self.act](c9 + r1)


class HourglassMish(nn.Module):
    """Plain Mish hourglass without attention (pwcnet_ddim.py:208-248)."""

    channels: int
    act: str = "mish"  # "relu" = the KITTI12/models/relu/ fork
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch, dt = self.channels, self.dtype
        c1 = ConvBN(ch * 2, 3, 2, 1, act=self.act, dtype=dt, name="conv1")(x, train)
        c2 = ConvBN(ch * 2, 3, 1, 1, act=self.act, dtype=dt, name="conv2")(c1, train)
        c3 = ConvBN(ch * 4, 3, 2, 1, act=self.act, dtype=dt, name="conv3")(c2, train)
        c4 = ConvBN(ch * 4, 3, 1, 1, act=self.act, dtype=dt, name="conv4")(c3, train)
        c5 = ConvTransposeBN(ch * 2, 3, 2, 1, 1, dtype=dt, name="conv5")(c4, train)
        r2 = ConvBN(ch * 2, 1, 1, 0, dtype=dt, name="redir2")(c2, train)
        c5 = _ACTS[self.act](c5 + r2)
        c6 = ConvTransposeBN(ch, 3, 2, 1, 1, dtype=dt, name="conv6")(c5, train)
        r1 = ConvBN(ch, 1, 1, 0, dtype=dt, name="redir1")(x, train)
        return _ACTS[self.act](c6 + r1)


class RefineNetV3(nn.Module):
    """Full-res dilated refinement net → residual disparity
    (pwcnet_ddim.py:251-306)."""

    act: str = "mish"  # "relu" = the KITTI12/models/relu/ fork
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, disp: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        y = ConvBN(128, 3, 1, 1, act=self.act, dtype=dt, name="conv1")(x, train)
        y = ConvBN(128, 3, 1, 1, act=self.act, dtype=dt, name="conv2")(y, train)
        y = ConvBN(128, 3, 1, 2, 2, act=self.act, dtype=dt, name="conv3")(y, train)
        y = ConvBN(128, 3, 1, 4, 4, act=self.act, dtype=dt, name="conv4")(y, train)
        y = BasicBlockMish(96, dilation=8, downsample=True, act=self.act, dtype=dt, name="conv5")(y, train)
        y = BasicBlockMish(64, dilation=16, downsample=True, act=self.act, dtype=dt, name="conv6")(y, train)
        y = BasicBlockMish(32, dilation=1, downsample=True, act=self.act, dtype=dt, name="conv7")(y, train)
        y = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    kernel_init=torch_conv_init((3, 3)), dtype=dt, name="conv8")(y)
        return disp + y[..., 0]


class PCWNet(nn.Module):
    """PCWNet with multi-scale volume fusion, optionally diffusion-wrapped."""

    max_disp: int = 192
    diffusion: bool = True
    use_concat_volume: bool = True
    scale: float = 1.0
    num_groups: int = 40
    act: str = "mish"  # "relu" = the KITTI12/models/relu/ fork
    dtype: Any = jnp.float32

    def setup(self):
        dt = self.dtype
        cc = 12 if self.use_concat_volume else 0
        self.concat_channels = cc
        self.feature_extraction = PCWFeatureExtractor(concat_channels=max(cc, 1), act=self.act, dtype=dt)
        self.dres0_0 = ConvBN(32, 3, 1, 1, act=self.act, dtype=dt)
        self.dres0_1 = ConvBN(32, 3, 1, 1, act=self.act, dtype=dt)
        self.dres1_0 = ConvBN(32, 3, 1, 1, act=self.act, dtype=dt)
        self.dres1_1 = ConvBN(32, 3, 1, 1, dtype=dt)
        self.combine1 = HourglassUp(32, act=self.act, dtype=dt)
        if self.diffusion:
            self.time_embedding = DynamicHead(d_model=self.max_disp // 4, dtype=dt)
        self.dres2 = HourglassMish(32, act=self.act, dtype=dt)
        self.dres3 = HourglassMish(32, act=self.act, dtype=dt)
        self.dres4 = HourglassMish(32, act=self.act, dtype=dt)

        def classif():
            return (
                ConvBN(32, 3, 1, 1, act=self.act, dtype=dt),
                HeadConv3D(dtype=dt),
            )

        self.classif0_0, self.classif0_1 = classif()
        self.classif1_0, self.classif1_1 = classif()
        self.classif2_0, self.classif2_1 = classif()
        self.classif3_0, self.classif3_1 = classif()
        self.classif4_0, self.classif4_1 = classif()
        self.refinenet3 = RefineNetV3(act=self.act, dtype=dt)
        self.dispupsample = ConvBN(32, 1, 1, 0, act=self.act, dtype=dt)

    # ---- volume construction (pwcnet_ddim.py:605-641) ----

    def build_cost_volume(self, left, right, train: bool = False):
        """Returns ``(combine_volume, cost0, features_left, features_right)``:
        the multi-scale fused volume that the diffusion latent multiplies."""
        if not train:
            # Eval: one 2B trunk pass for both views (exact per-sample —
            # BN runs on stored statistics; same trick as the IGEV encode,
            # which measured it at half the trunk dispatch count).  Train
            # keeps separate calls for reference BN-batch-stat parity.
            b = left.shape[0]
            feat = self.feature_extraction(
                jnp.concatenate([left, right], axis=0), train
            )
            fl = {k: v[:b] for k, v in feat.items()}
            fr = {k: v[b:] for k, v in feat.items()}
        else:
            fl = self.feature_extraction(left, train)
            fr = self.feature_extraction(right, train)
        md = self.max_disp

        def vol(scale_key, concat_key, d):
            gwc = build_gwc_volume(fl[scale_key], fr[scale_key], d, self.num_groups)
            if self.use_concat_volume:
                # KITTI12's concat builder zeroes the REFERENCE channels where
                # w < d too (KITTI12/models/submodule.py:86-97), unlike
                # SceneFlow's (submodule.py:193-204) — mask_ref=True.
                cat = build_concat_volume(fl[concat_key], fr[concat_key], d,
                                          mask_ref=True)
                return jnp.concatenate([gwc, cat], axis=-1)
            return gwc

        v1 = vol("gw1", "concat1", md // 4)
        v2 = vol("gw2", "concat2", md // 8)
        v3 = vol("gw3", "concat3", md // 16)
        v4 = vol("gw4", "concat4", md // 32)

        cost0 = self.dres0_1(self.dres0_0(v1, train), train)
        cost0 = self.dres1_1(self.dres1_0(cost0, train), train) + cost0
        combine = self.combine1(cost0, v2, v3, v4, train)
        return combine, cost0, fl, fr

    # ---- heads ----

    def _head(self, conv_a, conv_b, x, out_hw, train):
        cost = conv_b(conv_a(x, train), train)[..., 0]
        return upsample_cost_and_regress(
            cost.astype(jnp.float32), self.max_disp, out_hw, align_corners=True
        )

    def refine(self, pred3, fl, fr, out_hw, train: bool = False):
        """Full-res warp + signed-correlation refinement (pwcnet_ddim.py:486-502,
        712-734)."""
        rl = resize_bilinear(fl["refine"], out_hw, 1, 2, align_corners=True)
        rr = resize_bilinear(fr["refine"], out_hw, 1, 2, align_corners=True)
        rr_warp = warp_right_to_left(rr, pred3)
        corr = build_signed_correlation_volume(rl, rr_warp, 24)  # (B, 49, H, W)
        corr = jnp.moveaxis(corr, 1, -1)
        pred3_feat = self.dispupsample(pred3[..., None], train)
        combine = jnp.concatenate(
            [rl - rr_warp, rl, pred3_feat, pred3[..., None], corr], axis=-1
        )  # 32+32+32+1+49 = 146 ch
        return self.refinenet3(combine, pred3, train)

    # ---- diffusion-conditioned single pass (pwcnet_ddim.py:467-530) ----

    def denoise(self, combine_volume, fl, fr, latent, t, out_hw, train: bool = False):
        """Returns ``(disp_finetune, uncertainty, transformed)`` via the fused
        Pallas head; ``transformed`` is the time-embedded [0,1]-rescaled noise
        volume the reference feeds to predict_noise_from_start
        (pwcnet_ddim.py:468-470→...).

        The reference scores uncertainty as ``Σ|d - disp_finetune|·p3``
        (pwcnet_ddim.py:554-559) — against the REFINED disparity, which only
        exists after the refinement net consumes pred3.  Default is therefore
        a second fused pass evaluating the uncertainty at disp_finetune
        (fused_uncertainty_at, exact reference semantics); set
        ``DIFFU_PCW_APPROX_UNC=1`` to skip it and reuse the first pass's
        pred3-scored uncertainty (differs by ≤ the refinement residual;
        ~2% cheaper per DDIM step).
        """
        import os

        from diffuvolume_tpu.ops.pallas.fused_head import (
            fused_uncertainty_at,
            fused_upsample_softargmin,
        )

        noise = self.time_embedding(latent, t)
        noise = jnp.clip(noise, -self.scale, self.scale)
        noise = (noise / self.scale + 1.0) / 2.0
        vol = combine_volume * noise[..., None].astype(combine_volume.dtype)
        out1 = self.dres2(vol, train)
        out2 = self.dres3(out1, train)
        out3 = self.dres4(out2, train)
        cost3 = self.classif3_1(self.classif3_0(out3, train), train)[..., 0]
        pred3, unc3 = fused_upsample_softargmin(
            cost3.astype(jnp.float32), self.max_disp, out_hw, align_corners=True
        )
        disp_finetune = self.refine(pred3, fl, fr, out_hw, train)
        if os.environ.get("DIFFU_PCW_APPROX_UNC", "0") != "1":
            unc3 = fused_uncertainty_at(
                cost3.astype(jnp.float32), disp_finetune, self.max_disp,
                out_hw, align_corners=True,
            )
        return disp_finetune, unc3, noise.astype(jnp.float32)

    # ---- forwards (pwcnet_ddim.py:604-758) ----

    def __call__(self, left, right, disp_gt_q=None, t=None, noise=None,
                 train: bool = False):
        out_hw = (left.shape[1], left.shape[2])
        combine, cost0, fl, fr = self.build_cost_volume(left, right, train)

        if self.diffusion and train:
            from diffuvolume_tpu.diffusion import make_schedule, q_sample
            from diffuvolume_tpu.diffusion.codec import encode_disparity_volume

            assert disp_gt_q is not None and t is not None and noise is not None
            x_start = encode_disparity_volume(
                disp_gt_q, num_bins=self.max_disp // 4, scale=self.scale
            )
            sched = make_schedule(1000)
            noisy = q_sample(sched, x_start, t, noise)
            noisy = self.time_embedding(noisy, t)
            noisy = jnp.clip(noisy, -self.scale, self.scale)
            noisy = (noisy / self.scale + 1.0) / 2.0
            combine_in = combine * noisy[..., None]
        else:
            combine_in = combine

        out1 = self.dres2(combine_in, train)
        out2 = self.dres3(out1, train)
        out3 = self.dres4(out2, train)
        pred3, prob3 = self._head(self.classif3_0, self.classif3_1, out3, out_hw, train)
        disp_finetune = self.refine(pred3, fl, fr, out_hw, train)

        if not train:
            return [disp_finetune], [prob3]

        pred0, _ = self._head(self.classif0_0, self.classif0_1, cost0, out_hw, train)
        comb_pred, _ = self._head(self.classif4_0, self.classif4_1, combine, out_hw, train)
        pred1, _ = self._head(self.classif1_0, self.classif1_1, out1, out_hw, train)
        pred2, _ = self._head(self.classif2_0, self.classif2_1, out2, out_hw, train)
        return [pred0, comb_pred, pred1, pred2, pred3, disp_finetune]


# ---- TPU-eval fast path: all-Pallas packed aggregation (round 4) ----
#
# Same all-or-nothing packed strategy as the ACV denoise (models/acv.py
# r3/r4 history: partial-Pallas configs poison neighboring XLA conv
# strategies; the full packed chain took the ACV step 49 → 25 ms).  The PCW
# denoise re-runs three Mish hourglasses + the classifier head over the
# (B, 48, H4, W4, 32) combine volume per DDIM step
# (pwcnet_ddim.py:467-530) — structurally the ACV aggregation minus
# attention, plus Mish epilogues (in-kernel, see conv3d._apply_act).  The
# full-resolution warp refinement stays on XLA (2-D image convs).


def _hourglass_mish_packed(model, variables, name, pk_in, h4, w4, th,
                           interpret=False):
    """HourglassMish fully packed (BN folded, eval): conv1(s2) → conv2 →
    conv3(s2) → conv4 → conv5 = deconv+redir2+act → conv6 = deconv+redir1+act.
    """
    from diffuvolume_tpu.models.acv import (
        _fold_convbn_tree,
        _fold_deconv_tree,
    )
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv1x1_fold_p,
        conv3d_fold_p,
        conv3d_fold_s2,
        conv3d_fold_up,
    )

    dt = model.dtype
    mish = model.act == "mish"
    relu = not mish
    p = variables["params"][name]
    bs = variables["batch_stats"][name]
    h8, w8, h16, w16 = h4 // 2, w4 // 2, h4 // 4, w4 // 4
    th2, th4 = th // 2, th // 4
    assert th4 >= 2, th

    k1, b1 = _fold_convbn_tree(p["conv1"], bs["conv1"])
    c1 = conv3d_fold_s2(pk_in, k1.astype(dt), b1, relu=relu, mish=mish,
                        w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k2, b2 = _fold_convbn_tree(p["conv2"], bs["conv2"])
    c2 = conv3d_fold_p(c1, k2.astype(dt), b2, relu=relu, mish=mish,
                       w_real=w8, h_real=h8, tile_h=th2, interpret=interpret)
    k3, b3 = _fold_convbn_tree(p["conv3"], bs["conv3"])
    c3 = conv3d_fold_s2(c2, k3.astype(dt), b3, relu=relu, mish=mish,
                        w_real=w8, h_real=h8, tile_h=th2, interpret=interpret)
    k4, b4 = _fold_convbn_tree(p["conv4"], bs["conv4"])
    c4 = conv3d_fold_p(c3, k4.astype(dt), b4, relu=relu, mish=mish,
                       w_real=w16, h_real=h16, tile_h=th4,
                       interpret=interpret)

    kr2, br2 = _fold_convbn_tree(p["redir2"], bs["redir2"])
    r2 = conv1x1_fold_p(c2, kr2.astype(dt), br2, w_real=w8, h_real=h8,
                        tile_h=th2, interpret=interpret)
    k5, b5 = _fold_deconv_tree(p["conv5"], bs["conv5"])
    c5 = conv3d_fold_up(c4, k5.astype(dt), b5, relu=relu, mish=mish,
                        residual=r2, w_real=w16, h_real=h16, tile_h=th4,
                        interpret=interpret)

    kr1, br1 = _fold_convbn_tree(p["redir1"], bs["redir1"])
    r1 = conv1x1_fold_p(pk_in, kr1.astype(dt), br1, w_real=w4, h_real=h4,
                        tile_h=th, interpret=interpret)
    k6, b6 = _fold_deconv_tree(p["conv6"], bs["conv6"])
    return conv3d_fold_up(c5, k6.astype(dt), b6, relu=relu, mish=mish,
                          residual=r1, w_real=w8, h_real=h8, tile_h=th2,
                          interpret=interpret)


class PackedCombine(NamedTuple):
    """Scan-invariant packed combine volume (r5): built once by
    _pcw_build_packed; each DDIM step multiplies its noise in via
    packed_dhw_mul_k(c_slot=32) instead of re-packing 47 MB."""

    pk: jax.Array


def _hourglass_up_packed(model, variables, cost0_pk, fl, fr, h4, w4,
                         interpret=False):
    """HourglassUp on the packed kernel family (models/pcw.py:142-183,
    reference pwcnet_ddim.py:131-205).

    The cross-scale concat-then-conv fusions run as kernel-sliced piece
    convs with residual accumulation (conv(concat(a, b), k) =
    conv(a, k[:Ca]) + conv(b, k[Ca:]) — exact by linearity); v2/v3 are
    built directly packed by gwc_volume_packed (v3 at slot=128 so its
    64-real-channel piece conv runs with a zero-padded kernel, dodging the
    co > c limitation).  Only the 1/32 sub-branch (conv5→conv7 at
    (6, H/32, W/32) — ~1% of the volume) runs as an XLA island.
    """
    from diffuvolume_tpu.models.acv import (
        _fold_convbn_tree,
        _fold_deconv_tree,
    )
    from diffuvolume_tpu.ops.cost_volume import (
        build_concat_volume,
        build_gwc_volume,
    )
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv1x1_fold_p,
        conv3d_fold_p,
        conv3d_fold_s2,
        conv3d_fold_up,
        pack_padded_k,
        unpack_padded_k,
    )
    from diffuvolume_tpu.ops.pallas.gwc_volume import gwc_volume_packed

    dt = model.dtype
    mish = model.act == "mish"
    act_kw = dict(mish=mish, relu=not mish)
    hp = variables["params"]["combine1"]
    hbs = variables["batch_stats"]["combine1"]
    md = model.max_disp
    h8, w8, h16, w16 = h4 // 2, w4 // 2, h4 // 4, w4 // 4
    g = model.num_groups

    def vol_pk(scale_key, concat_key, d, slot, th):
        return gwc_volume_packed(
            fl[scale_key], fr[scale_key], d, g, tile_h=th,
            interpret=interpret, c_slot=slot,
            cat_l=fl[concat_key] if model.use_concat_volume else None,
            cat_r=fr[concat_key] if model.use_concat_volume else None,
            mask_ref=True,
        )

    v2_pk = vol_pk("gw2", "concat2", md // 8, 64, 4)
    v3_pk = vol_pk("gw3", "concat3", md // 16, 128, 2)

    c1 = conv3d_fold_s2(cost0_pk, hp["conv1"]["kernel"].astype(dt), None,
                        relu=False, w_real=w4, h_real=h4, tile_h=8,
                        interpret=interpret)
    kc1, bc1 = _fold_convbn_tree(hp["combine1"], hbs["combine1"])
    rb = conv3d_fold_p(v2_pk, kc1[:, :, :, 64:, :].astype(dt), None,
                       relu=False, w_real=w8, h_real=h8, tile_h=4,
                       interpret=interpret)
    c1 = conv3d_fold_p(c1, kc1[:, :, :, :64, :].astype(dt), bc1,
                       residual=rb, w_real=w8, h_real=h8, tile_h=4,
                       interpret=interpret, **act_kw)
    k2, b2 = _fold_convbn_tree(hp["conv2"], hbs["conv2"])
    c2 = conv3d_fold_p(c1, k2.astype(dt), b2, w_real=w8, h_real=h8,
                       tile_h=4, interpret=interpret, **act_kw)

    c3 = conv3d_fold_s2(c2, hp["conv3"]["kernel"].astype(dt), None,
                        relu=False, w_real=w8, h_real=h8, tile_h=4,
                        interpret=interpret)
    kc2, bc2 = _fold_convbn_tree(hp["combine2"], hbs["combine2"])
    kb = jnp.pad(kc2[:, :, :, 128:, :], ((0, 0),) * 3 + ((0, 64), (0, 0)))
    rb = conv3d_fold_p(v3_pk, kb.astype(dt), None, relu=False,
                       w_real=w16, h_real=h16, tile_h=2, interpret=interpret)
    c3 = conv3d_fold_p(c3, kc2[:, :, :, :128, :].astype(dt), bc2,
                       residual=rb, w_real=w16, h_real=h16, tile_h=2,
                       interpret=interpret, **act_kw)
    k4, b4 = _fold_convbn_tree(hp["conv4"], hbs["conv4"])
    c4 = conv3d_fold_p(c3, k4.astype(dt), b4, w_real=w16, h_real=h16,
                       tile_h=2, interpret=interpret, **act_kw)

    # ---- 1/32 sub-branch: XLA island (tiny — (6, H/32, W/32)) ----
    act = _ACTS[model.act]
    x4 = unpack_padded_k(c4, md // 16, h16, w16, 128, tile_h=2,
                         interpret=interpret)

    def conv3(x, k, stride=1):
        return jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (stride,) * 3, [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    gwc4 = build_gwc_volume(fl["gw4"], fr["gw4"], md // 32, g)
    v4 = gwc4
    if model.use_concat_volume:
        v4 = jnp.concatenate(
            [gwc4, build_concat_volume(fl["concat4"], fr["concat4"],
                                       md // 32, mask_ref=True)], axis=-1)
    c5 = conv3(x4, hp["conv5"]["kernel"], 2)
    kc3, bc3 = _fold_convbn_tree(hp["combine3"], hbs["combine3"])
    c5 = act(conv3(jnp.concatenate([c5, v4.astype(dt)], -1), kc3) + bc3.astype(dt))
    k6, b6 = _fold_convbn_tree(hp["conv6"], hbs["conv6"])
    c6 = act(conv3(c5, k6) + b6.astype(dt))
    k7, b7 = _fold_deconv_tree(hp["conv7"], hbs["conv7"])
    y7 = jax.lax.conv_general_dilated(
        c6, k7.astype(dt), (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b7.astype(dt)
    kr3, br3 = _fold_convbn_tree(hp["redir3"], hbs["redir3"])
    r3 = jnp.einsum("bdhwc,co->bdhwo", x4.astype(dt),
                    kr3[0, 0, 0].astype(dt)) + br3.astype(dt)
    a7 = act(y7 + r3)
    pk7 = pack_padded_k(a7.astype(dt), tile_h=2, interpret=interpret)

    kr2, br2 = _fold_convbn_tree(hp["redir2"], hbs["redir2"])
    r2 = conv1x1_fold_p(c2, kr2.astype(dt), br2, w_real=w8, h_real=h8,
                        tile_h=4, interpret=interpret)
    k8, b8 = _fold_deconv_tree(hp["conv8"], hbs["conv8"])
    c8 = conv3d_fold_up(pk7, k8.astype(dt), b8, residual=r2,
                        w_real=w16, h_real=h16, tile_h=2,
                        interpret=interpret, **act_kw)

    kr1, br1 = _fold_convbn_tree(hp["redir1"], hbs["redir1"])
    r1 = conv1x1_fold_p(cost0_pk, kr1.astype(dt), br1, w_real=w4, h_real=h4,
                        tile_h=8, interpret=interpret)
    k9, b9 = _fold_deconv_tree(hp["conv9"], hbs["conv9"])
    return conv3d_fold_up(c8, k9.astype(dt), b9, residual=r1,
                          w_real=w8, h_real=h8, tile_h=4,
                          interpret=interpret, **act_kw)


def _pcw_build_packed(model, variables, left, right, interpret=False):
    """build_cost_volume with the whole dres chain + HourglassUp on the
    packed family (r5).  The r5 A/B measured the PARTIAL config (packed
    aggregation, XLA build) at 1.77 pairs/s vs 2.13 all-XLA — the build's
    lhs-dilated deconvs and dres convs collapse once a custom-call consumer
    appears, so the build must be all-or-nothing too.

    Returns ``(combine_pk, fl, fr)``.
    """
    from diffuvolume_tpu.models.acv import _fold_convbn_tree
    from diffuvolume_tpu.ops.pallas.conv3d import conv3d_fold_p, conv3d_fold_x2
    from diffuvolume_tpu.ops.pallas.gwc_volume import gwc_volume_packed

    dt = model.dtype
    mish = model.act == "mish"
    act_kw = dict(mish=mish, relu=not mish)
    b = left.shape[0]
    h4, w4 = left.shape[1] // 4, left.shape[2] // 4
    p_ = variables["params"]
    bs = variables["batch_stats"]

    import os

    # 2B trunk batching A/B: helped IGEV (r3) but LOST ~9 ms for ACV in the
    # packed-prep context (r5) — measure per-backbone.
    if os.environ.get("DIFFU_PCW_PREP_B2", "1") == "1":
        feat = model.apply(
            variables, jnp.concatenate([left, right], axis=0),
            method=lambda m, x: m.feature_extraction(x, False))
        fl = {k: v[:b] for k, v in feat.items()}
        fr = {k: v[b:] for k, v in feat.items()}
    else:
        fl = model.apply(variables, left,
                         method=lambda m, x: m.feature_extraction(x, False))
        fr = model.apply(variables, right,
                         method=lambda m, x: m.feature_extraction(x, False))

    v1_pk = gwc_volume_packed(
        fl["gw1"], fr["gw1"], model.max_disp // 4, model.num_groups,
        tile_h=8, interpret=interpret, c_slot=64,
        cat_l=fl["concat1"] if model.use_concat_volume else None,
        cat_r=fr["concat1"] if model.use_concat_volume else None,
        mask_ref=True,
    )
    k00, b00 = _fold_convbn_tree(p_["dres0_0"], bs["dres0_0"])
    pk = conv3d_fold_x2(v1_pk, k00.astype(dt), b00, w_real=w4, h_real=h4,
                        tile_h=8, interpret=interpret, **act_kw)
    k01, b01 = _fold_convbn_tree(p_["dres0_1"], bs["dres0_1"])
    pk_y = conv3d_fold_p(pk, k01.astype(dt), b01, w_real=w4, h_real=h4,
                         tile_h=8, interpret=interpret, **act_kw)
    k10, b10 = _fold_convbn_tree(p_["dres1_0"], bs["dres1_0"])
    pk_z = conv3d_fold_p(pk_y, k10.astype(dt), b10, w_real=w4, h_real=h4,
                         tile_h=8, interpret=interpret, **act_kw)
    k11, b11 = _fold_convbn_tree(p_["dres1_1"], bs["dres1_1"])
    cost0_pk = conv3d_fold_p(pk_z, k11.astype(dt), b11, relu=False,
                             residual=pk_y, w_real=w4, h_real=h4, tile_h=8,
                             interpret=interpret)
    combine_pk = _hourglass_up_packed(model, variables, cost0_pk, fl, fr,
                                      h4, w4, interpret=interpret)
    return combine_pk, fl, fr


def _refine_flat(model, variables, pred3, fl, fr, out_hw, interpret=False):
    """RefineNetV3 with every 3×3 conv on the Pallas conv2d_flat kernel
    (BN folded f32; Mish/act + residual adds stay XLA elementwise; the 1×1
    downsample projections run as einsum dots — never XLA convs, so there is
    no conv strategy left to poison).  r5, VERDICT item 3: the r4 park
    compared conv2d_flat standalone (3.99 ms) against XLA standalone (3.5)
    while the real in-program XLA cost is 5.4 ms/conv × 8 convs × 3 DDIM
    steps (trace_pcw).  Wired behind DIFFU_PCW_REFINE_FLAT for the
    in-program A/B the verdict ordered.  Reference: pwcnet_ddim.py:251-306.
    """
    from diffuvolume_tpu.models.acv import _fold_convbn_tree
    from diffuvolume_tpu.ops.pallas.conv2d import conv2d_flat

    dt = model.dtype
    act = _ACTS[model.act]
    p = variables["params"]["refinenet3"]
    bs = variables["batch_stats"]["refinenet3"]

    def prefix(m, pred3, fl, fr):
        rl = resize_bilinear(fl["refine"], out_hw, 1, 2, align_corners=True)
        rr = resize_bilinear(fr["refine"], out_hw, 1, 2, align_corners=True)
        rr_warp = warp_right_to_left(rr, pred3)
        corr = build_signed_correlation_volume(rl, rr_warp, 24)
        corr = jnp.moveaxis(corr, 1, -1)
        pred3_feat = m.dispupsample(pred3[..., None], False)
        return jnp.concatenate(
            [rl - rr_warp, rl, pred3_feat, pred3[..., None], corr], axis=-1
        )

    # Compute dtype at entry (the module's nn.Conv casts operands to dt):
    # an f32 concat reaching conv2d_flat doubles its window VMEM and OOMs
    # the 64 MB scoped stack at dilation 16 (68.3 MB measured at 384×1248).
    x = model.apply(variables, pred3, fl, fr, method=prefix).astype(dt)

    def cbn(t, tree, tree_bs, dil):
        k, b = _fold_convbn_tree(tree, tree_bs)
        return conv2d_flat(t, k.astype(dt), b, dilation=dil,
                           tile_h=8, interpret=interpret)

    def block(t, name, dil):
        # BasicBlockMish (stride 1): act(conv1) → conv2, + 1×1 downsample.
        o = act(cbn(t, p[name]["conv1"], bs[name]["conv1"], dil))
        o = cbn(o, p[name]["conv2"], bs[name]["conv2"], dil)
        kd, bd = _fold_convbn_tree(p[name]["downsample"], bs[name]["downsample"])
        ds = (
            jnp.einsum("bhwc,co->bhwo", t.astype(dt), kd[0, 0].astype(dt))
            .astype(jnp.float32) + bd
        ).astype(t.dtype)
        return o + ds

    y = act(cbn(x, p["conv1"], bs["conv1"], 1))
    y = act(cbn(y, p["conv2"], bs["conv2"], 1))
    y = act(cbn(y, p["conv3"], bs["conv3"], 2))
    y = act(cbn(y, p["conv4"], bs["conv4"], 4))
    y = block(y, "conv5", 8)
    y = block(y, "conv6", 16)
    y = block(y, "conv7", 1)
    y = conv2d_flat(y, p["conv8"]["kernel"].astype(dt), None, dilation=1,
                    tile_h=8, interpret=interpret)
    return pred3 + y[..., 0]


def pcw_denoise_fast(
    model: PCWNet,
    variables,
    combine_volume: jax.Array,
    fl,
    fr,
    latent: jax.Array,
    t: jax.Array,
    out_hw: tuple[int, int],
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """PCWNet.denoise with packed conv chains — numerically equal (BN folded
    in f32) — eval only.  The refinement net runs through the module."""
    import os

    from diffuvolume_tpu.models.acv import _fold_convbn_params
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_p,
        pack_padded_k,
        unpack_padded_k,
    )
    from diffuvolume_tpu.ops.pallas.fused_head import (
        fused_uncertainty_at,
        fused_upsample_softargmin,
    )

    noise = model.apply(variables, latent, t,
                        method=lambda m, l, tt: m.time_embedding(l, tt))
    noise = jnp.clip(noise, -model.scale, model.scale)
    noise = (noise / model.scale + 1.0) / 2.0
    disp_finetune, unc3 = _pcw_aggregate_packed(
        model, variables, combine_volume, fl, fr, out_hw, noise=noise,
        interpret=interpret,
    )
    return disp_finetune, unc3, noise.astype(jnp.float32)


def _pcw_aggregate_packed(model, variables, combine_volume, fl, fr, out_hw,
                          noise=None, interpret=False, want_unc=True):
    """The packed PCW aggregation pass: (noise ⊙) combine → dres2/3/4 Mish
    hourglasses → classif3 head → warp refinement.  Shared by the DDIM
    denoise step (noise ≠ None) and the frozen-baseline eval forward
    (noise = None — pwcnet.py's eval branch runs the byte-identical blocks).
    Returns ``(disp_finetune, uncertainty)`` at ``out_hw``.
    """
    import os

    from diffuvolume_tpu.models.acv import _fold_convbn_params
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_p,
        pack_padded_k,
        unpack_padded_k,
    )
    from diffuvolume_tpu.ops.pallas.fused_head import (
        fused_uncertainty_at,
        fused_upsample_softargmin,
    )

    dt = model.dtype
    d = model.max_disp // 4
    th = 8
    mish = model.act == "mish"

    if isinstance(combine_volume, PackedCombine):
        from diffuvolume_tpu.ops.pallas.conv3d import packed_dhw_mul_k

        h4, w4 = out_hw[0] // 4, out_hw[1] // 4
        if noise is None:
            pk = combine_volume.pk
        else:
            pk = packed_dhw_mul_k(
                combine_volume.pk, noise, c_slot=32, max_disp=d, tile_h=th,
                interpret=interpret,
            )
    else:
        b, d, h4, w4, _ = combine_volume.shape
        pk = pack_padded_k(
            combine_volume, th, interpret=interpret,
            noise=None if noise is None else noise.astype(combine_volume.dtype),
        )

    pk = _hourglass_mish_packed(model, variables, "dres2", pk, h4, w4, th,
                                interpret)
    pk = _hourglass_mish_packed(model, variables, "dres3", pk, h4, w4, th,
                                interpret)
    pk = _hourglass_mish_packed(model, variables, "dres4", pk, h4, w4, th,
                                interpret)

    kc, bc = _fold_convbn_params(variables, "classif3_0")
    pk_h = conv3d_fold_p(pk, kc.astype(dt), bc, relu=not mish, mish=mish,
                         w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k_head = variables["params"]["classif3_1"]["kernel"]
    pk_c = conv3d_fold_p(pk_h, k_head.astype(dt), None, w_real=w4,
                         h_real=h4, tile_h=th, interpret=interpret)
    cost3 = unpack_padded_k(pk_c, d, h4, w4, 1, tile_h=th,
                            interpret=interpret)[..., 0].astype(jnp.float32)

    pred3, unc3 = fused_upsample_softargmin(
        cost3, model.max_disp, out_hw, align_corners=True,
        interpret=interpret or None,
    )
    pred3_r = pred3
    if os.environ.get("DIFFU_PCW_BARRIER", "0") == "1":
        # A/B: decouple the refinement convs from the fused-head custom call
        # (the r3 ACV poison class: XLA convs adjacent to custom-calls pick
        # degraded strategies; refine's 8 full-res convs run 5.4 ms
        # in-program vs 3.5 standalone).  Measured r4: 2.1311 vs 2.1315 —
        # NO effect; the inflation is not barrier-breakable fusion context.
        pred3_r = jax.lax.optimization_barrier(pred3)
    # MEASURED r5 (bench_pcw A/B at HEAD-1): flat refine 1.814 vs module
    # 2.13 pairs/s with everything else all-XLA — conv2d_flat IN-PROGRAM is
    # a ~27 ms/step REGRESSION despite the 3.99-vs-5.4 standalone numbers
    # (the dilated convs' (th+2d)-row windows + island poisoning).  The r4
    # park stands; default OFF, kept as the wired A/B the verdict ordered.
    if os.environ.get("DIFFU_PCW_REFINE_FLAT", "0") == "1":
        disp_finetune = _refine_flat(model, variables, pred3_r, fl, fr,
                                     out_hw, interpret=interpret)
    else:
        disp_finetune = model.apply(variables, pred3_r, fl, fr, out_hw, False,
                                    method=PCWNet.refine)
    if want_unc and os.environ.get("DIFFU_PCW_APPROX_UNC", "0") != "1":
        unc3 = fused_uncertainty_at(
            cost3, disp_finetune, model.max_disp, out_hw,
            align_corners=True, interpret=interpret or None,
        )
    return disp_finetune, unc3


def pcw_prep_fast(baseline_model, ddim_model, baseline_vars, ddim_vars,
                  left, right, interpret: bool = False):
    """Packed PCW pass-1/prep (r5): the frozen baseline's aggregation +
    refinement run on the packed kernel family (the module path re-ran the
    exact blocks pcw_denoise_fast already accelerates, once per pair); the
    multi-scale volume builds stay on the XLA module path for now
    (HourglassUp's cross-scale concats need p-mixing merge kernels — see
    CLAUDE.md r5 notes).  Returns ``(baseline_disp, combine, fl, fr)``.
    """
    out_hw = (left.shape[1], left.shape[2])
    combine_b, fl_b, fr_b = _pcw_build_packed(
        baseline_model, baseline_vars, left, right, interpret=interpret)
    baseline_disp, _ = _pcw_aggregate_packed(
        baseline_model, baseline_vars, PackedCombine(combine_b), fl_b, fr_b,
        out_hw, interpret=interpret, want_unc=False)
    combine, fl, fr = _pcw_build_packed(
        ddim_model, ddim_vars, left, right, interpret=interpret)
    return baseline_disp, PackedCombine(combine), fl, fr
