"""IGEV-Stereo (+ DiffuVolume diffusion variant) in flax.linen.

TPU-native re-design of KITTI15/core/igev_stereo_ddim.py:118-463 and
igev_stereo.py:91-221: MobileNetV2 feature trunk, Geometry Encoding Volume via
an 8-group correlation volume + feature-attended 3D hourglass, RAFT-style
multi-level ConvGRU refinement driven by a precomputed geometry lookup
pyramid, superpixel upsampling, and the DiffuVolume noise injection into the
GEV lookups.

Interface mirrors the other backbones but the iterative loop runs OUTSIDE the
module (pure apply composition under ``lax.scan``): ``encode`` builds
everything static, ``update`` performs one GRU step, ``upsample`` lifts the
quarter-res disparity, and the helpers in this file assemble the reference's
train/eval forwards.

Note: images enter RAW in [0,255]; the model normalizes to [-1, 1] itself
(igev_stereo_ddim.py:364-365), unlike the ImageNet-normalized ACV/PCW inputs.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffuvolume_tpu.models.igev.extractor import (
    BasicConvBN,
    BasicConvIN,
    Conv2xBN,
    Conv2xIN,
    InstanceNorm,
    MobileNetV2Feature,
    MultiBasicEncoder,
)
from diffuvolume_tpu.models.igev.geometry import build_geo_pyramid
from diffuvolume_tpu.models.igev.update import BasicMultiUpdateBlock
from diffuvolume_tpu.models.layers import (
    ConvTransposeBN,
    DynamicHead,
    _ConvKernel,
    conv3x3x3,
    torch_conv_init,
)
from diffuvolume_tpu.ops.cost_volume import build_gwc_volume
from diffuvolume_tpu.ops.regression import disparity_regression
from diffuvolume_tpu.ops.sampling import context_upsample


def _igev_packed_flag() -> bool:
    """Packed GEV-tower eval path (gev_packed.py).  Trace-time read; the
    eval pipeline keys its stage cache on this value (DIFFU_CORR_MODE
    pattern) so mid-process flips retrace correctly.

    Default (env unset): ON when lowering for TPU (r4: bench_igev
    4.86 → 5.15 pairs/s), OFF elsewhere (the CPU fallback would run the
    kernels in interpret mode — correct but orders of magnitude slower
    than XLA; tests opt in explicitly with DIFFU_IGEV_PACKED=1)."""
    import os

    v = os.environ.get("DIFFU_IGEV_PACKED")
    if v is not None:
        return v == "1"
    from diffuvolume_tpu.utils.platform import is_tpu_lowering

    return is_tpu_lowering()


def igev_packed_eval(train: bool, max_disp: int, h4: int, w4: int) -> bool:
    """Single source of truth for the packed-GEV-tower dispatch (shared by
    IGEVStereo.encode and igev_encode's pyramid-layout decision)."""
    return (
        not train
        and max_disp == 192
        and h4 % 16 == 0
        and w4 % 8 == 0
        and _igev_packed_flag()
    )


class FeatureAtt(nn.Module):
    """Sigmoid feature-attention over a cost volume (submodule.py:226-239)."""

    cv_chan: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cv, feat, train: bool = False):
        feat_chan = feat.shape[-1]
        a = BasicConvBN(feat_chan // 2, 1, 1, 0, dtype=self.dtype, name="att0")(feat, train)
        a = nn.Conv(self.cv_chan, (1, 1), use_bias=True, dtype=self.dtype, name="att1")(a)
        # cv: (B, D, H, W, C); attention broadcast over D.
        return jax.nn.sigmoid(a)[:, None] * cv


class HourglassGEV(nn.Module):
    """Feature-attended 3D hourglass → Geometry Encoding Volume
    (igev_stereo_ddim.py:24-89)."""

    channels: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, features, train: bool = False):
        ch, dt = self.channels, self.dtype
        conv3d = lambda f, s, name: BasicConvBN(f, 3, (s, s, s) if isinstance(s, int) else s,
                                                1, dtype=dt, name=name)
        c1 = conv3d(ch * 2, 2, "conv1_0")(x, train)
        c1 = conv3d(ch * 2, 1, "conv1_1")(c1, train)
        c1 = FeatureAtt(ch * 2, dt, name="feature_att_8")(c1, features[1], train)

        c2 = conv3d(ch * 4, 2, "conv2_0")(c1, train)
        c2 = conv3d(ch * 4, 1, "conv2_1")(c2, train)
        c2 = FeatureAtt(ch * 4, dt, name="feature_att_16")(c2, features[2], train)

        c3 = conv3d(ch * 6, 2, "conv3_0")(c2, train)
        c3 = conv3d(ch * 6, 1, "conv3_1")(c3, train)
        c3 = FeatureAtt(ch * 6, dt, name="feature_att_32")(c3, features[3], train)

        c3u = BasicConvBN(ch * 4, 4, 2, 1, deconv=True, dtype=dt, name="conv3_up")(c3, train)
        c2 = jnp.concatenate([c3u, c2], axis=-1)
        c2 = BasicConvBN(ch * 4, 1, 1, 0, dtype=dt, name="agg0_0")(c2, train)
        c2 = BasicConvBN(ch * 4, 3, 1, 1, dtype=dt, name="agg0_1")(c2, train)
        c2 = BasicConvBN(ch * 4, 3, 1, 1, dtype=dt, name="agg0_2")(c2, train)
        c2 = FeatureAtt(ch * 4, dt, name="feature_att_up_16")(c2, features[2], train)

        c2u = BasicConvBN(ch * 2, 4, 2, 1, deconv=True, dtype=dt, name="conv2_up")(c2, train)
        c1 = jnp.concatenate([c2u, c1], axis=-1)
        c1 = BasicConvBN(ch * 2, 1, 1, 0, dtype=dt, name="agg1_0")(c1, train)
        c1 = BasicConvBN(ch * 2, 3, 1, 1, dtype=dt, name="agg1_1")(c1, train)
        c1 = BasicConvBN(ch * 2, 3, 1, 1, dtype=dt, name="agg1_2")(c1, train)
        c1 = FeatureAtt(ch * 2, dt, name="feature_att_up_8")(c1, features[1], train)

        return BasicConvBN(8, 4, 2, 1, deconv=True, use_bn=False, relu=False,
                           dtype=dt, name="conv1_up")(c1, train)


class IGEVStereo(nn.Module):
    """IGEV-Stereo with the DiffuVolume GEV noise filter."""

    max_disp: int = 192
    diffusion: bool = True
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    corr_levels: int = 2
    corr_radius: int = 4
    scale: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        dt = self.dtype
        self.feature = MobileNetV2Feature(dtype=dt)
        self.cnet = MultiBasicEncoder(
            output_dims=(tuple(self.hidden_dims), tuple(self.hidden_dims)),
            norm="batch", dtype=dt,
        )
        self.update_block = BasicMultiUpdateBlock(
            hidden_dims=tuple(self.hidden_dims), n_gru_layers=self.n_gru_layers,
            corr_levels=self.corr_levels, corr_radius=self.corr_radius, dtype=dt,
        )
        self.context_zqr_convs = [
            nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=True, dtype=dt, name=f"context_zqr_{i}")
            for i in range(self.n_gru_layers)
        ]
        if self.diffusion:
            self.time_embedding = DynamicHead(
                d_model=180, out_bins=self.max_disp // 4, dtype=dt
            )

        def stem(name, c):
            return (
                BasicConvIN(c, 3, 2, 1, dtype=dt, name=f"{name}_0"),
                nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=dt,
                        kernel_init=torch_conv_init((3, 3)), name=f"{name}_1"),
                InstanceNorm(name=f"{name}_in"),
            )

        self.stem_2_ops = stem("stem_2", 32)
        self.stem_4_ops = stem("stem_4", 48)

        self.spx_4_0 = BasicConvIN(24, 3, 1, 1, dtype=dt)
        self.spx_4_1 = nn.Conv(24, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                               kernel_init=torch_conv_init((3, 3)), dtype=dt)
        self.spx_4_in = InstanceNorm()
        self.spx_2 = Conv2xIN(32, deconv=True, dtype=dt)
        self.spx = ConvTransposeBN(9, 4, 2, 1, 0, use_bn=False, use_bias=True, dtype=dt)

        self.spx_2_gru = Conv2xBN(32, deconv=True, dtype=dt)
        self.spx_gru = ConvTransposeBN(9, 4, 2, 1, 0, use_bn=False, use_bias=True, dtype=dt)

        self.conv = BasicConvIN(96, 3, 1, 1, dtype=dt)
        self.desc = nn.Conv(96, (1, 1), use_bias=True, dtype=dt)
        self.corr_stem = BasicConvBN(8, 3, 1, 1, dtype=dt)
        self.corr_feature_att = FeatureAtt(8, dt)
        self.cost_agg = HourglassGEV(8, dt)
        # Parameter holder with nn.Conv's exact tree (classifier/kernel); the
        # 8→1 conv itself goes through the conv3x3x3 dispatch (the XLA conv
        # runs ~2.5 ms at 384×1248 for 0.6 real GFLOP).
        self.classifier = _ConvKernel((3, 3, 3, 8, 1))

    def _stem(self, ops, x, train):
        conv_in, conv2, inorm = ops
        y = conv_in(x)
        return jax.nn.relu(inorm(conv2(y)))

    # ---- static encoding (igev_stereo_ddim.py:366-402) ----

    def encode(self, left: jax.Array, right: jax.Array, train: bool = False):
        """Features, GEV, init disparity, GRU states — everything iteration-
        independent.  Inputs RAW [0,255]."""
        left_n = 2.0 * (left / 255.0) - 1.0
        right_n = 2.0 * (right / 255.0) - 1.0
        b = left.shape[0]

        if not train:
            # Eval: run BOTH views through the trunk as one 2B batch — per-
            # sample conv/IN arithmetic is independent of batching, so the
            # results are identical to two separate calls, at half the op
            # count (the encode trace shows 142 separate conv dispatches).
            # Training keeps separate calls: BN batch statistics must match
            # the reference's per-view updates.
            im = jnp.concatenate([left_n, right_n], axis=0)
            feat = self.feature(im, train)
            stem_2 = self._stem(self.stem_2_ops, im, train)
            stem_4 = self._stem(self.stem_4_ops, stem_2, train)
            feat0 = jnp.concatenate([feat[0], stem_4], axis=-1)  # 96 ch
            match = self.desc(self.conv(feat0))
            match_l, match_r = match[:b], match[b:]
            stem_2x = stem_2[:b]
            feat_l = [feat0[:b]] + [f[:b] for f in feat[1:]]
        else:
            feat_l = self.feature(left_n, train)
            feat_r = self.feature(right_n, train)
            stem_2x = self._stem(self.stem_2_ops, left_n, train)
            stem_4x = self._stem(self.stem_4_ops, stem_2x, train)
            stem_2y = self._stem(self.stem_2_ops, right_n, train)
            stem_4y = self._stem(self.stem_4_ops, stem_2y, train)
            feat_l[0] = jnp.concatenate([feat_l[0], stem_4x], axis=-1)  # 96 ch
            feat_r[0] = jnp.concatenate([feat_r[0], stem_4y], axis=-1)

            match_l = self.desc(self.conv(feat_l[0]))
            match_r = self.desc(self.conv(feat_r[0]))

        h4, w4 = match_l.shape[1], match_l.shape[2]
        use_packed = igev_packed_eval(train, self.max_disp, h4, w4)
        if use_packed:
            # All-Pallas packed GEV tower (gwc → corr_stem → attended
            # hourglass → classifier) — the ACV all-or-nothing lesson
            # applied to the encode's cost-volume segment (gev_packed.py).
            # Trace-time env read; eval/pipeline keys its stage cache on it.
            from diffuvolume_tpu.models.igev.gev_packed import gev_tower_packed

            vars_view = {
                "params": {
                    "corr_stem": self.corr_stem.variables["params"],
                    "corr_feature_att":
                        self.corr_feature_att.variables["params"],
                    "cost_agg": self.cost_agg.variables["params"],
                    "classifier": {"kernel": self.classifier()},
                },
                "batch_stats": {
                    "corr_stem": self.corr_stem.variables["batch_stats"],
                    "corr_feature_att":
                        self.corr_feature_att.variables["batch_stats"],
                    "cost_agg": self.cost_agg.variables["batch_stats"],
                },
            }
            from diffuvolume_tpu.utils.platform import is_tpu_lowering

            # gev comes back channels-minor (B, H4, W4, D, 8) — the geometry
            # pyramid's native layout; cost as (B, H4, W4, D) with D in
            # lanes, so softmax + regression run over the minor axis.
            gev, cost = gev_tower_packed(
                self, vars_view, match_l, match_r, feat_l,
                interpret=not is_tpu_lowering(),
            )
            prob = jax.nn.softmax(cost.astype(jnp.float32), axis=-1)
            bins = jnp.arange(self.max_disp // 4, dtype=jnp.float32)
            init_disp = jnp.einsum("bhwd,d->bhw", prob, bins)
        else:
            gwc = build_gwc_volume(match_l, match_r, self.max_disp // 4, 8)
            gwc = self.corr_stem(gwc, train)
            gwc = self.corr_feature_att(gwc, feat_l[0], train)
            gev = self.cost_agg(gwc, feat_l, train)

            prob = jax.nn.softmax(
                conv3x3x3(gev, self.classifier(), train=train,
                          dtype=self.dtype)[..., 0],
                axis=1,
            )
            init_disp = disparity_regression(prob, self.max_disp // 4)

        cnet_list = self.cnet(left_n, train)
        net_list = [jnp.tanh(h) for h, _ in cnet_list]
        inp_list = []
        for i, (_, ctx) in enumerate(cnet_list):
            z = self.context_zqr_convs[i](jax.nn.relu(ctx))
            inp_list.append(tuple(jnp.split(z, 3, axis=-1)))

        out = {
            "match_l": match_l, "match_r": match_r, "gev": gev,
            "init_disp": init_disp, "net_list": net_list, "inp_list": inp_list,
            "stem_2x": stem_2x,
        }
        if train:
            xspx = self.spx_4_in(self.spx_4_1(self.spx_4_0(feat_l[0])))
            xspx = self.spx_2(jax.nn.relu(xspx), stem_2x)
            out["spx_pred"] = jax.nn.softmax(self.spx(xspx), axis=-1)
        return out

    # ---- per-iteration pieces ----

    def update(self, net_list, inp_list, geo_feat, disp, iter16=True, iter08=True):
        """One GRU update (update.py:121-142). disp is (B,H4,W4,1)."""
        return self.update_block(
            net_list, inp_list, corr=geo_feat, disp=disp,
            iter04=True, iter08=iter08, iter16=iter16, update=True,
        )

    def upsample(self, disp, mask_feat_4, stem_2x, train: bool = False):
        """Superpixel upsample ×4 (igev_stereo_ddim.py:203-211). disp (B,H4,W4)."""
        xspx = self.spx_2_gru(mask_feat_4, stem_2x, train)
        spx_pred = jax.nn.softmax(self.spx_gru(xspx, train), axis=-1)
        # context_upsample wants (B, 9, H, W) weights
        return context_upsample(disp * 4.0, jnp.moveaxis(spx_pred, -1, 1))

    def embed_noise(self, noisy: jax.Array, t: jax.Array) -> jax.Array:
        """Time-embed + clamp + [0,1] map (igev_stereo_ddim.py:228-231)."""
        y = self.time_embedding(noisy, t)
        y = jnp.clip(y, -self.scale, self.scale)
        return (y / self.scale + 1.0) / 2.0

    def embed_noise_train(self, noisy: jax.Array, t: jax.Array) -> jax.Array:
        """Train variant additionally adds t/T (igev_stereo_ddim.py:433)."""
        y = self.time_embedding(noisy, t)
        y = y + (t.astype(y.dtype) / 1000.0)[:, None, None, None]
        y = jnp.clip(y, -self.scale, self.scale)
        return (y / self.scale + 1.0) / 2.0

    def upsample_init(self, init_disp, spx_pred):
        """Training-path init-disp upsample (igev_stereo_ddim.py:461)."""
        return context_upsample(init_disp * 4.0, jnp.moveaxis(spx_pred, -1, 1))

    def __call__(self, left: jax.Array, right: jax.Array, train: bool = True):
        """Single-iteration forward touching every submodule — used for
        parameter initialization (the real loops live in igev_forward)."""
        from diffuvolume_tpu.models.igev.geometry import build_geo_pyramid, geo_lookup

        enc = self.encode(left, right, train)
        b_, h4_, w4_ = enc["init_disp"].shape
        pyramid = build_geo_pyramid(
            enc["match_l"], enc["match_r"], enc["gev"],
            num_levels=self.corr_levels,
            hwdc=igev_packed_eval(train, self.max_disp, h4_, w4_),
        )
        b, h4, w4 = enc["init_disp"].shape
        coords = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4)
        )
        noise_mod = None
        if self.diffusion:
            noisy = jnp.zeros((b, self.max_disp // 4, h4, w4))
            noise_mod = self.embed_noise(noisy, jnp.zeros((b,), jnp.int32))
        geo = geo_lookup(pyramid, enc["init_disp"], coords, noise_mod,
                         self.corr_radius, concat=False)
        _, mask_feat, delta = self.update(
            enc["net_list"], enc["inp_list"], geo, enc["init_disp"][..., None]
        )
        return self.upsample(
            enc["init_disp"] + delta[..., 0], mask_feat, enc["stem_2x"], train
        )


# ---- pure-function forward loops (compose module.apply under lax.scan) ----


def igev_rollout(
    model: IGEVStereo,
    variables,
    enc: dict,
    pyramid,
    iters: int,
    noisy: jax.Array | None = None,
    t: jax.Array | None = None,
    train: bool = False,
    test_mode: bool = False,
    noise_mode: str = "pixel",
) -> jax.Array:
    """The GRU refinement loop as a ``lax.scan`` (igev_stereo_ddim.py:438-457).

    The loop state is (quarter-res disparity, GRU hidden states); BatchNorms
    inside the loop run frozen (matching the reference recipe's freeze_bn,
    train_stereo.py:142,198-201).  When ``noisy``/``t`` are given, the
    DiffuVolume latent modulates the GEV lookups (geometry_ddim.py:56); the
    modulated pyramid is premultiplied ONCE here — it is loop-invariant, and
    hoisting it out of the scan saves a ~46 MB broadcast-multiply + pyramid
    pool per iteration.

    ``test_mode=True`` matches the reference's eval loop
    (igev_stereo_ddim.py:452-454: ``if test_mode and itr < iters-1:
    continue``): only the final iterate is superpixel-upsampled to full
    resolution, so the returned stack has length 1.

    ``noise_mode``: "pixel" (default) is our cleaned-up per-pixel noise
    semantics; "ref" reproduces the reference's reshape-scramble and
    pool-then-multiply order exactly (geometry_ddim.py:37-58) for
    checkpoint-parity evaluation — see geometry.fold_reference_noise.

    Returns stacked full-res disparities ``(iters or 1, B, H, W)``.
    """
    from diffuvolume_tpu.models.igev.geometry import fold_reference_noise, geo_lookup

    b, h4, w4 = enc["init_disp"].shape
    coords = jnp.broadcast_to(
        jnp.arange(w4, dtype=jnp.float32)[None, None, :], (b, h4, w4)
    )
    noise_eff = None
    if noisy is not None:
        method = IGEVStereo.embed_noise_train if train else IGEVStereo.embed_noise
        noise_mod = model.apply(variables, noisy, t, method=method)
        if noise_mode == "ref":
            # Loop-invariant: fold the scrambled+pooled noise into the hat
            # weights once; the geo volume stays clean.
            noise_eff = fold_reference_noise(noise_mod, model.corr_levels)
        elif noise_mode == "pixel":
            # Premultiply the level-0 volume with the noise (identical to the
            # per-lookup multiply in geo_lookup).  Any materialized pooled
            # levels (geo_pool mode) are rebuilt from the product — pooling is
            # linear, so this matches the coarsened level-0-hat formulation.
            from diffuvolume_tpu.models.igev.geometry import _avgpool_last2

            nl = jnp.moveaxis(noise_mod, 1, 3)[..., None]  # (B, H, W, D, 1)
            gls = [pyramid.geo_levels[0] * nl]
            for _ in range(len(pyramid.geo_levels) - 1):
                gls.append(_avgpool_last2(gls[-1]))
            pyramid = pyramid._replace(geo_levels=tuple(gls))
        else:
            raise ValueError(noise_mode)

    def core(disp, net_list):
        geo = geo_lookup(pyramid, disp, coords, None, model.corr_radius,
                         concat=False, noise_eff=noise_eff)
        net_list, mask_feat, delta = model.apply(
            variables, net_list, enc["inp_list"], geo, disp[..., None],
            method=IGEVStereo.update,
        )
        return disp + delta[..., 0], net_list, mask_feat

    def upsample(disp, mask_feat):
        return model.apply(
            variables, disp, mask_feat, enc["stem_2x"], False,
            method=IGEVStereo.upsample,
        )

    if test_mode:
        def step(carry, _):
            disp, net_list = carry
            disp, net_list, _ = core(disp, net_list)
            return (disp, net_list), None

        (disp, net_list), _ = jax.lax.scan(
            step, (enc["init_disp"], enc["net_list"]), None, length=iters - 1
        )
        disp, _, mask_feat = core(disp, net_list)
        return upsample(disp, mask_feat)[None]

    def step(carry, _):
        disp, net_list = carry
        disp, net_list, mask_feat = core(disp, net_list)
        return (disp, net_list), upsample(disp, mask_feat)

    (_, _), disp_ups = jax.lax.scan(
        step, (enc["init_disp"], enc["net_list"]), None, length=iters
    )
    return disp_ups


def igev_rollout_ref_eval(
    model: IGEVStereo,
    variables,
    enc: dict,
    pyramid,
    iters: int,
    coords1: jax.Array,
    noisy: jax.Array,
    t: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Reference-faithful KITTI15 eval rollout (quirk mode).

    The reference's ddim_sample seeds ``coords0 = coords1 = init_disp``
    (igev_stereo_ddim.py:425,313) and its model_predictions then iterates on
    ``flow = coords1 - coords0`` — so the geometry volume is sampled at the
    accumulated RESIDUAL (0 on the first GRU iteration of the first DDIM
    step), the all-pairs correlation is sampled at the constant
    ``coords1 - flow = init_disp``, the update block's disparity input is the
    residual, and the upsampled step output is the full-res residual
    (model_predictions:226-265).  ``coords1`` additionally carries across DDIM
    steps.  Our default rollout (igev_rollout) instead runs the training
    semantics — absolute disparity — for eval too (documented deviation);
    this function reproduces the reference exactly for checkpoint parity,
    including the noise reshape-scramble (noise_mode="ref" semantics).

    Args:
      coords1: ``(B, H4, W4)`` carried coordinate state (init: init_disp).
      noisy: ``(B, D, H4, W4)`` raw latent; t: ``(B,)`` timestep.

    Returns:
      ``(resid_up (B, H, W), new_coords1 (B, H4, W4))``.
    """
    from diffuvolume_tpu.models.igev.geometry import fold_reference_noise, geo_lookup

    coords0 = enc["init_disp"]
    noise_mod = model.apply(variables, noisy, t, method=IGEVStereo.embed_noise)
    noise_eff = fold_reference_noise(noise_mod, model.corr_levels)

    def core(c1, net_list):
        flow = c1 - coords0
        geo = geo_lookup(pyramid, flow, c1, None, model.corr_radius,
                         concat=False, noise_eff=noise_eff)
        net_list, mask_feat, delta = model.apply(
            variables, net_list, enc["inp_list"], geo, flow[..., None],
            method=IGEVStereo.update,
        )
        return c1 + delta[..., 0], net_list, mask_feat

    def step(carry, _):
        c1, net_list = carry
        c1, net_list, _ = core(c1, net_list)
        return (c1, net_list), None

    (c1, net_list), _ = jax.lax.scan(
        step, (coords1, enc["net_list"]), None, length=iters - 1
    )
    c1, _, mask_feat = core(c1, net_list)
    resid_up = model.apply(
        variables, c1 - coords0, mask_feat, enc["stem_2x"], False,
        method=IGEVStereo.upsample,
    )
    return resid_up, c1


def igev_encode(model: IGEVStereo, variables, left, right, train: bool = False,
                rngs=None, corr_mode: str | None = None):
    """Run the static encoder and build the geometry pyramid.

    Returns ``(enc, pyramid)`` (plus batch_stats updates appended to enc as
    ``enc['batch_stats']`` when training)."""
    mutable = ["batch_stats"] if train else False
    enc = model.apply(variables, left, right, train, method=IGEVStereo.encode,
                      mutable=mutable, rngs=rngs)
    if train:
        enc, updates = enc
        enc = dict(enc)
        enc["batch_stats"] = updates["batch_stats"]
    h4_, w4_ = enc["init_disp"].shape[1], enc["init_disp"].shape[2]
    pyramid = build_geo_pyramid(
        enc["match_l"], enc["match_r"], enc["gev"],
        num_levels=model.corr_levels, corr_mode=corr_mode,
        hwdc=igev_packed_eval(train, model.max_disp, h4_, w4_),
    )
    return enc, pyramid


def igev_forward(
    model: IGEVStereo,
    variables,
    left: jax.Array,
    right: jax.Array,
    iters: int = 22,
    noisy: jax.Array | None = None,
    t: jax.Array | None = None,
    train: bool = False,
    test_mode: bool = False,
    rngs=None,
    noise_mode: str = "pixel",
    corr_mode: str | None = None,
):
    """Full forward (igev_stereo_ddim.py:361-463).

    Returns train: ``(init_disp_up (B,H,W), disp_preds (iters,B,H,W),
    new_batch_stats|None)``; test_mode: final ``(B, H, W)`` disparity.
    """
    enc, pyramid = igev_encode(model, variables, left, right, train, rngs,
                               corr_mode=corr_mode)
    disp_ups = igev_rollout(
        model, variables, enc, pyramid, iters, noisy, t, train, test_mode,
        noise_mode,
    )

    if test_mode:
        return disp_ups[-1]
    init_up = model.apply(
        variables, enc["init_disp"], enc["spx_pred"], method=IGEVStereo.upsample_init
    )
    return init_up, disp_ups, enc.get("batch_stats")
