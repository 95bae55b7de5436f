"""ACVNet backbone (+ DiffuVolume diffusion variant) in flax.linen.

A TPU-native re-design of the reference ACVNet / ACVNet_DDIM pair
(SceneFlow/models/acv.py:94-260, SceneFlow/models/acv_ddim.py:122-482):
channels-last layouts, one module with a ``diffusion`` switch (the reference
duplicates the whole network), cost volumes from
``diffuvolume_tpu.ops.cost_volume``, and a method-based interface so the
generic DDIM sampler can re-run the aggregation head per step without
rebuilding the volume:

  * ``build_cost_volume(left, right)`` → attention-weighted concat volume
  * ``denoise(ac_volume, latent, t, out_hw)`` → one diffusion-conditioned
    aggregation pass (the reference's ``model_predictions`` body)
  * ``__call__`` → the training / baseline-eval forward
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffuvolume_tpu.models.layers import (
    ACVFeatureExtractor,
    ConvBN,
    DynamicHead,
    HeadConv3D,
    HourglassACV,
    torch_conv_init,
)
from diffuvolume_tpu.ops.cost_volume import build_concat_volume, build_gwc_volume
from diffuvolume_tpu.ops.regression import upsample_cost_and_regress


class ACVNet(nn.Module):
    """ACVNet with attention cost-volume filtering, optionally diffusion-wrapped.

    Volumes are ``(B, D, H4, W4, C)`` channels-last; the diffusion latent is
    ``(B, D, H4, W4)`` (bins in the reference's channel slot).
    """

    max_disp: int = 192
    diffusion: bool = True
    attn_weights_only: bool = False
    freeze_attn_weights: bool = False
    scale: float = 1.0
    num_groups: int = 40
    concat_channels: int = 32
    dtype: Any = jnp.float32

    def setup(self):
        dt = self.dtype
        self.feature_extraction = ACVFeatureExtractor(dtype=dt)
        self.concatconv0 = ConvBN(128, 3, 1, 1, act="relu", dtype=dt)
        self.concatconv1 = nn.Conv(
            self.concat_channels, (1, 1), use_bias=False,
            kernel_init=torch_conv_init((1, 1)), dtype=dt,
        )
        # Multi-dilation grouped "patch" convs over (H, W) per volume slice
        # (acv_ddim.py:181-188; kernel (1,3,3) ≡ depthwise 2D over H,W).
        def patch_conv(ch, dil):
            return ConvBN(
                ch, (1, 3, 3), 1, (0, dil, dil), (1, dil, dil), groups=ch,
                use_bn=False, use_bias=False, dtype=dt,
            )

        self.patch = patch_conv(40, 1)
        self.patch_l1 = patch_conv(8, 1)
        self.patch_l2 = patch_conv(16, 2)
        self.patch_l3 = patch_conv(16, 3)

        self.dres1_att_0 = ConvBN(32, 3, 1, 1, act="relu", dtype=dt)
        self.dres1_att_1 = ConvBN(32, 3, 1, 1, dtype=dt)
        self.dres2_att_ = HourglassACV(32, dtype=dt)
        self.classif_att_0 = ConvBN(32, 3, 1, 1, act="relu", dtype=dt)
        self.classif_att_1 = HeadConv3D(dtype=dt)

        if self.diffusion:
            self.time_embedding = DynamicHead(d_model=self.max_disp // 4, dtype=dt)

        self.dres0_0 = ConvBN(32, 3, 1, 1, act="relu", dtype=dt)
        self.dres0_1 = ConvBN(32, 3, 1, 1, act="relu", dtype=dt)
        self.dres1_0 = ConvBN(32, 3, 1, 1, act="relu", dtype=dt)
        self.dres1_1 = ConvBN(32, 3, 1, 1, dtype=dt)
        self.dres2 = HourglassACV(32, dtype=dt)
        self.dres3 = HourglassACV(32, dtype=dt)

        def classif():
            return (
                ConvBN(32, 3, 1, 1, act="relu", dtype=dt),
                HeadConv3D(dtype=dt),
            )

        self.classif0_0, self.classif0_1 = classif()
        self.classif1_0, self.classif1_1 = classif()
        self.classif2_0, self.classif2_1 = classif()

    # ---- volume construction (acv_ddim.py:373-390) ----

    def build_cost_volume(
        self, left: jax.Array, right: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """Features → gwc attention weights → attention-filtered concat volume.

        Returns ``(ac_volume (B,D,H4,W4,2*cc), att_weights (B,D,H4,W4,1))``.
        """
        feat_l = self.feature_extraction(left, train)
        feat_r = self.feature_extraction(right, train)
        gwc = build_gwc_volume(feat_l, feat_r, self.max_disp // 4, self.num_groups)
        gwc = self.patch(gwc, train)
        p1 = self.patch_l1(gwc[..., :8], train)
        p2 = self.patch_l2(gwc[..., 8:24], train)
        p3 = self.patch_l3(gwc[..., 24:40], train)
        patch_volume = jnp.concatenate([p1, p2, p3], axis=-1)
        att = self.dres1_att_1(self.dres1_att_0(patch_volume, train), train)
        att = self.dres2_att_(att, train)
        att_weights = self.classif_att_1(self.classif_att_0(att, train), train)

        cl = self.concatconv1(self.concatconv0(feat_l, train))
        cr = self.concatconv1(self.concatconv0(feat_r, train))
        concat_volume = build_concat_volume(cl, cr, self.max_disp // 4)
        ac_volume = jax.nn.softmax(att_weights, axis=1) * concat_volume
        return ac_volume, att_weights

    # ---- aggregation (acv_ddim.py:452-455 / 261-264) ----

    def _aggregate(self, volume: jax.Array, train: bool):
        cost0 = self.dres0_1(self.dres0_0(volume, train), train)
        cost0 = self.dres1_1(self.dres1_0(cost0, train), train) + cost0
        out1 = self.dres2(cost0, train)
        out2 = self.dres3(out1, train)
        return cost0, out1, out2

    def _head(self, conv_a, conv_b, x, out_hw, train):
        cost = conv_b(conv_a(x, train), train)[..., 0]  # (B, D, H4, W4)
        return upsample_cost_and_regress(
            cost.astype(jnp.float32), self.max_disp, out_hw
        )

    # ---- diffusion-conditioned single pass (acv_ddim.py:254-296) ----

    def denoise(
        self,
        ac_volume: jax.Array,
        latent: jax.Array,
        t: jax.Array,
        out_hw: tuple[int, int],
        train: bool = False,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Inject the noisy latent into the volume, aggregate, regress.

        Returns ``(disp (B,H,W), uncertainty (B,H,W), transformed (B,D,H4,W4))``
        — disp/unc via the fused Pallas head (never materializes the 192×H×W
        probability volume); ``transformed`` is the time-embedded
        [0,1]-rescaled noise volume, which the reference's
        predict_noise_from_start consumes as x_t (acv_ddim.py:256-258→295).
        """
        from diffuvolume_tpu.ops.pallas.fused_head import fused_upsample_softargmin

        noise = self.time_embedding(latent, t)
        noise = jnp.clip(noise, -self.scale, self.scale)
        noise = (noise / self.scale + 1.0) / 2.0
        vol = ac_volume * noise[..., None].astype(ac_volume.dtype)
        _, _, out2 = self._aggregate(vol, train)
        cost = self.classif2_1(self.classif2_0(out2, train), train)[..., 0]
        disp, unc = fused_upsample_softargmin(
            cost.astype(jnp.float32), self.max_disp, out_hw
        )
        return disp, unc, noise.astype(jnp.float32)

    # ---- forwards ----

    def __call__(
        self,
        left: jax.Array,
        right: jax.Array,
        disp_gt_q: jax.Array | None = None,
        t: jax.Array | None = None,
        noise: jax.Array | None = None,
        mask_gt: jax.Array | None = None,
        train: bool = False,
    ) -> list[jax.Array]:
        """Training forward (diffusion: acv_ddim.py:424-482; baseline:
        acv.py:168-260) and baseline eval forward.

        Args:
          left, right: ``(B, H, W, 3)`` normalized images.
          disp_gt_q: ``(B, H4, W4)`` quarter-res GT disparity in bin units
            (diffusion training only).
          t: ``(B,)`` diffusion timesteps (the reference samples one per batch
            and broadcasts — do that upstream).
          noise: ``(B, 48, H4, W4)`` Gaussian noise for q_sample.
          mask_gt: optional ``(B, H4, W4)`` validity mask for the codec.
          train: training mode (BatchNorm batch stats, aux heads).
        """
        out_hw = (left.shape[1], left.shape[2])

        if self.freeze_attn_weights:
            build = lambda: jax.tree.map(
                jax.lax.stop_gradient, self.build_cost_volume(left, right, train)
            )
        else:
            build = lambda: self.build_cost_volume(left, right, train)
        ac_volume, att_weights = build()

        if self.attn_weights_only:
            pred_att, _ = upsample_cost_and_regress(
                att_weights[..., 0], self.max_disp, out_hw
            )
            return [pred_att]

        if self.diffusion and train:
            from diffuvolume_tpu.diffusion import make_schedule, q_sample
            from diffuvolume_tpu.diffusion.codec import encode_disparity_volume

            assert disp_gt_q is not None and t is not None and noise is not None
            x_start = encode_disparity_volume(
                disp_gt_q, num_bins=self.max_disp // 4, scale=self.scale,
                valid_mask=mask_gt,
            )
            sched = make_schedule(1000)
            noisy = q_sample(sched, x_start, t, noise)
            noisy = self.time_embedding(noisy, t)
            noisy = jnp.clip(noisy, -self.scale, self.scale)
            noisy = (noisy / self.scale + 1.0) / 2.0
            ac_volume = ac_volume * noisy[..., None]

        if not train:
            # Eval uses the fused Pallas head (acv.py:255-260 semantics, f32
            # parity ~1e-4) — never materializes the 192×H×W probability
            # volume, same as the DDIM denoise path.
            from diffuvolume_tpu.ops.pallas.fused_head import fused_upsample_softargmin

            _, _, out2 = self._aggregate(ac_volume, train)
            cost = self.classif2_1(self.classif2_0(out2, train), train)[..., 0]
            pred2, _ = fused_upsample_softargmin(
                cost.astype(jnp.float32), self.max_disp, out_hw
            )
            return [pred2]

        cost0, out1, out2 = self._aggregate(ac_volume, train)
        pred2, _ = self._head(self.classif2_0, self.classif2_1, out2, out_hw, train)

        pred_att, _ = upsample_cost_and_regress(
            att_weights[..., 0], self.max_disp, out_hw
        )
        pred0, _ = self._head(self.classif0_0, self.classif0_1, cost0, out_hw, train)
        pred1, _ = self._head(self.classif1_0, self.classif1_1, out1, out_hw, train)
        if self.freeze_attn_weights:
            return [pred0, pred1, pred2]
        return [pred_att, pred0, pred1, pred2]


# ---- TPU-eval fast path: packed-persistent aggregation (round-3) ----
#
# Device traces attribute ~22.5 ms of the 49 ms DDIM denoise step to the
# aggregation's 3×3×3 convolutions on XLA's im2col path (2.5 ms each at
# (48,128,240,32)), while the Pallas fold kernel's custom-call runs the same
# conv in ~1.3-1.8 ms — the per-call pack/pad/unpack wrappers are what made
# forcing it regress in round 2 (ops/pallas/conv3d.py v3 header).  This path
# keeps the volume in the packed+padded geometry across consecutive convs
# (dres0_1 → dres1_0 → dres1_1+residual, classif2_0 → classif2_1), with
# inference BatchNorm folded into the kernels and ReLU fused.  Pure function
# over the variables pytree (same composition style as igev_forward);
# hourglasses and the 64→32 entry conv stay on XLA.


def _fold_convbn_params(variables, name, eps=1e-5):
    """ConvBN(name) inference weights with BN folded: (kernel', bias')."""
    p = variables["params"][name]
    s = variables["batch_stats"][name]
    k = p["conv"]["kernel"].astype(jnp.float32)
    gamma = p["bn"]["scale"].astype(jnp.float32)
    beta = p["bn"]["bias"].astype(jnp.float32)
    mean = s["bn"]["mean"].astype(jnp.float32)
    var = s["bn"]["var"].astype(jnp.float32)
    scale = gamma * jax.lax.rsqrt(var + eps)
    return k * scale, beta - mean * scale


def _fold_convbn_tree(p, bs, eps=1e-5):
    """Fold a ConvBN {conv/kernel, bn/...} subtree → (kernel', bias')."""
    k = p["conv"]["kernel"].astype(jnp.float32)
    scale = p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bs["bn"]["var"].astype(jnp.float32) + eps)
    return k * scale, (p["bn"]["bias"].astype(jnp.float32)
                       - bs["bn"]["mean"].astype(jnp.float32) * scale)


def _fold_deconv_tree(p, bs, eps=1e-5):
    """Fold ConvTransposeBN {kernel, bn/...} → (kernel', bias')."""
    k = p["kernel"].astype(jnp.float32)
    scale = p["bn"]["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bs["bn"]["var"].astype(jnp.float32) + eps)
    return k * scale, (p["bn"]["bias"].astype(jnp.float32)
                       - bs["bn"]["mean"].astype(jnp.float32) * scale)


def _hourglass_packed(model, variables, name, pk_in, d, h4, w4, th,
                      interpret=False):
    """HourglassACV fully in the packed-padded geometry (BN folded, eval).

    conv1(s2) → conv2 → conv3(s2) → conv4 → [unpack → attention → pack] →
    conv5 = deconv+redir2+relu (fused) → conv6 = deconv+redir1+relu.
    Cells are preserved at every scale; tile heights are th → th/2 → th/4.
    """
    from diffuvolume_tpu.models.layers import AttentionBlock3D
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv1x1_fold_p, conv3d_fold_p, conv3d_fold_s2, conv3d_fold_up,
        pack_padded_k, unpack_padded_k,
    )

    dt = model.dtype
    p = variables["params"][name]
    bs = variables["batch_stats"][name]
    h8, w8, h16, w16 = h4 // 2, w4 // 2, h4 // 4, w4 // 4
    th2, th4 = th // 2, th // 4
    assert th4 >= 1, th

    k1, b1 = _fold_convbn_tree(p["conv1"], bs["conv1"])
    c1 = conv3d_fold_s2(pk_in, k1.astype(dt), b1, relu=True,
                        w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k2, b2 = _fold_convbn_tree(p["conv2"], bs["conv2"])
    c2 = conv3d_fold_p(c1, k2.astype(dt), b2, relu=True,
                       w_real=w8, h_real=h8, tile_h=th2, interpret=interpret)
    k3, b3 = _fold_convbn_tree(p["conv3"], bs["conv3"])
    c3 = conv3d_fold_s2(c2, k3.astype(dt), b3, relu=True,
                        w_real=w8, h_real=h8, tile_h=th2, interpret=interpret)
    k4, b4 = _fold_convbn_tree(p["conv4"], bs["conv4"])
    c4 = conv3d_fold_p(c3, k4.astype(dt), b4, relu=True,
                       w_real=w16, h_real=h16, tile_h=th4, interpret=interpret)

    attn = AttentionBlock3D(num_heads=16, block=(4, 4, 4), dtype=dt)
    x4 = unpack_padded_k(c4, d // 4, h16, w16, 128, tile_h=th4,
                         interpret=interpret)
    x4 = attn.apply({"params": variables["params"][name]["attention_block"]},
                    x4.astype(dt))
    c4 = pack_padded_k(x4, tile_h=th4, interpret=interpret)

    kr2, br2 = _fold_convbn_tree(p["redir2"], bs["redir2"])
    r2 = conv1x1_fold_p(c2, kr2.astype(dt), br2, w_real=w8, h_real=h8,
                        tile_h=th2, interpret=interpret)
    k5, b5 = _fold_deconv_tree(p["conv5"], bs["conv5"])
    c5 = conv3d_fold_up(c4, k5.astype(dt), b5, relu=True, residual=r2,
                        w_real=w16, h_real=h16, tile_h=th4,
                        interpret=interpret)

    kr1, br1 = _fold_convbn_tree(p["redir1"], bs["redir1"])
    r1 = conv1x1_fold_p(pk_in, kr1.astype(dt), br1, w_real=w4, h_real=h4,
                        tile_h=th, interpret=interpret)
    k6, b6 = _fold_deconv_tree(p["conv6"], bs["conv6"])
    return conv3d_fold_up(c5, k6.astype(dt), b6, relu=True, residual=r1,
                          w_real=w8, h_real=h8, tile_h=th2,
                          interpret=interpret)


def _acv_tile_h(h4: int) -> int:
    """Entry-chain tile height.  th=4 was forced in r3 (the cross-packing
    64→32 kernel's 12-ref + 512-lane window blew the then-16 MB scoped
    VMEM); with the r4 vmem_limit_bytes raise th=8 compiles, shares the
    hourglass geometry (no retile pair), and runs the entry fold_p chain
    at the wider tile.  DIFFU_ACV_TH overrides for A/B (trace-time read).
    th=16 measured WORSE (bench 3.448 → 3.336 — bigger tiles lose to
    VMEM pressure/pipelining); 8 stays the default."""
    import os

    th = int(os.environ.get("DIFFU_ACV_TH", "8"))
    return 4 if h4 % th else th


class PackedConcat(NamedTuple):
    """Scan-invariant packed concat volume + softmaxed attention (r5).

    The DDIM scan's per-step entry: ``pk_cat`` is pack_concat_k(cl, cr,
    att=None) built ONCE in the prep; each step multiplies att ⊙ step-noise
    in via packed_dhw_mul_k (~1.2 ms) instead of re-building the packed
    volume from features (2.61 ms/step measured)."""

    pk_cat: jax.Array
    att: jax.Array


def _aggregate_packed(
    model: ACVNet,
    variables,
    entry,
    out_hw: tuple[int, int],
    noise: jax.Array | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The full packed aggregation pass: (noise ⊙) ac_volume → dres chain →
    hourglasses → classif2 → fused head.  Shared by the DDIM denoise step
    (noise ≠ None) and the frozen-baseline eval forward (noise = None; the
    blocks are byte-identical module types, acv.py:168-260 ≡ acv_ddim.py's
    aggregation).  Returns (disp, uncertainty) at ``out_hw``.

    ``entry``: either the materialized ``(B, D, H4, W4, 2cc)`` ac_volume, or
    a ``(cl, cr, att)`` feature triple — then the concat volume is never
    materialized: pack_concat_k builds+multiplies+packs in one pass (r5).
    """
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_p, conv3d_fold_x2, pack_concat_k, pack_padded_k,
        packed_dhw_mul_k, unpack_padded_k,
    )
    from diffuvolume_tpu.ops.pallas.fused_head import fused_upsample_softargmin

    dt = model.dtype
    if isinstance(entry, PackedConcat):
        b = entry.att.shape[0]
        d = model.max_disp // 4
        h4, w4 = entry.att.shape[2], entry.att.shape[3]
    elif isinstance(entry, tuple):
        cl, cr, att = entry
        b, h4, w4, _ = cl.shape
        d = model.max_disp // 4
    else:
        b, d, h4, w4, _ = entry.shape
    th = _acv_tile_h(h4)

    def pack(x, t):
        return pack_padded_k(x, t, interpret=interpret)

    def unpack(pkx, dd, hh, ww, cc, t):
        return unpack_padded_k(pkx, dd, hh, ww, cc, t, interpret=interpret)

    # dres0_0 (64→32) via the cross-packing kernel: ANY XLA conv whose
    # output feeds a custom-call picks a catastrophic strategy here
    # (6.9 → 39.5 ms/step measured), so the whole step stays packed.
    k00, b00 = _fold_convbn_params(variables, "dres0_0")
    # Noise multiply fused into the pack (saves the 190 MB XLA broadcast-
    # multiply round trip, ~1.15 ms/step measured r4).
    if isinstance(entry, PackedConcat):
        pk64 = packed_dhw_mul_k(
            entry.pk_cat, entry.att,
            None if noise is None else noise.astype(entry.att.dtype),
            c_slot=64, max_disp=d, tile_h=th, interpret=interpret,
        )
    elif isinstance(entry, tuple):
        pk64 = pack_concat_k(cl, cr, att, noise, max_disp=d, tile_h=th,
                             interpret=interpret)
    else:
        pk64 = pack_padded_k(
            entry, th, interpret=interpret,
            noise=None if noise is None else noise.astype(entry.dtype),
        )
    pk = conv3d_fold_x2(pk64, k00.astype(dt), b00, relu=True,
                        w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k01, b01 = _fold_convbn_params(variables, "dres0_1")
    pk_y = conv3d_fold_p(pk, k01.astype(dt), b01, relu=True,
                         w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k10, b10 = _fold_convbn_params(variables, "dres1_0")
    pk_z = conv3d_fold_p(pk_y, k10.astype(dt), b10, relu=True,
                         w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k11, b11 = _fold_convbn_params(variables, "dres1_1")
    pk_c0 = conv3d_fold_p(pk_z, k11.astype(dt), b11, relu=False,
                          residual=pk_y, w_real=w4, h_real=h4, tile_h=th,
                          interpret=interpret)
    # Hourglasses fully packed (no XLA conv remains in the step).  The
    # hourglass MUST run th≥8: conv3d_fold_p's 2-row halos need tile_h ≥ 2
    # at quarter res (th=4 → th4=1 mis-slices the halo reads — r4 measured,
    # not just theory).  Retile via the Pallas unpack/pack pair (no XLA op
    # in between, nothing to poison).  conv3d_fold_s2 at th=8 sits 184 KB
    # over the default 16 MB scoped-VMEM budget — the fold kernels raise it
    # via CompilerParams(vmem_limit_bytes) instead (ops/pallas/conv3d.py).
    th_hg = th if th >= 8 and h4 % th == 0 else (8 if h4 % 8 == 0 else th)
    if th_hg != th:
        pk_c0 = pack(unpack(pk_c0, d, h4, w4, 32, th), th_hg)
    pk_o1 = _hourglass_packed(model, variables, "dres2", pk_c0, d, h4, w4,
                              th_hg, interpret)
    pk_o2 = _hourglass_packed(model, variables, "dres3", pk_o1, d, h4, w4,
                              th_hg, interpret)

    kc0, bc0 = _fold_convbn_params(variables, "classif2_0")
    pk_h = conv3d_fold_p(pk_o2, kc0.astype(dt), bc0, relu=True,
                         w_real=w4, h_real=h4, tile_h=th_hg,
                         interpret=interpret)
    k_head = variables["params"]["classif2_1"]["kernel"]
    pk_c = conv3d_fold_p(pk_h, k_head.astype(dt), w_real=w4, h_real=h4,
                         tile_h=th_hg, interpret=interpret)
    cost = unpack(pk_c, d, h4, w4, 1, th_hg)[..., 0]

    disp, unc = fused_upsample_softargmin(
        cost.astype(jnp.float32), model.max_disp, out_hw,
        interpret=interpret or None,
    )
    return disp, unc


def acv_denoise_fast(
    model: ACVNet,
    variables,
    entry,
    latent: jax.Array,
    t: jax.Array,
    out_hw: tuple[int, int],
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """ACVNet.denoise with packed conv chains — numerically equal (BN folded
    in f32; conv kernel parity ~1e-4) — eval only.  ``entry``: ac_volume or
    the (cl, cr, att) triple from acv_prep_fast (see _aggregate_packed)."""
    noise = model.apply(variables, latent, t,
                        method=lambda m, l, tt: m.time_embedding(l, tt))
    noise = jnp.clip(noise, -model.scale, model.scale)
    noise = (noise / model.scale + 1.0) / 2.0
    disp, unc = _aggregate_packed(model, variables, entry, out_hw,
                                  noise=noise, interpret=interpret)
    return disp, unc, noise.astype(jnp.float32)


def _patch_lane_weights(variables, num_groups: int = 40, c_slot: int = 64):
    """Patch-conv kernels laid out on packed lanes for depthwise_hw_p.

    Returns ``(w_patch (1,3,3,128), w_l123 (3,3,3,128))`` f32: the all-groups
    dilation-1 `patch` conv, and the per-slice dilation-1/2/3 `patch_l1/2/3`
    convs (acv_ddim.py:181-188), each channel placed at lane ``φ·c_slot + c``
    for both phases φ of the 2-cell packing.
    """
    p = 128 // c_slot

    def k33(name):
        # ConvBN(groups=ch, use_bn=False): flax kernel (1, 3, 3, 1, ch).
        return variables["params"][name]["conv"]["kernel"][0, :, :, 0, :].astype(
            jnp.float32
        )

    w_patch = jnp.zeros((1, 3, 3, 128), jnp.float32)
    kp = k33("patch")
    for phi in range(p):
        w_patch = w_patch.at[
            0, :, :, phi * c_slot : phi * c_slot + num_groups
        ].set(kp)
    w_l = jnp.zeros((3, 3, 3, 128), jnp.float32)
    for gi, (name, lo, hi) in enumerate(
        (("patch_l1", 0, 8), ("patch_l2", 8, 24), ("patch_l3", 24, 40))
    ):
        kk = k33(name)
        for phi in range(p):
            w_l = w_l.at[
                gi, :, :, phi * c_slot + lo : phi * c_slot + hi
            ].set(kk)
    return w_patch, w_l


def _attention_volume_packed(
    model: ACVNet,
    variables,
    left: jax.Array,
    right: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """build_cost_volume with the attention chain on packed kernels (eval).

    Feature trunk, gwc build, and the depthwise patch convs stay XLA (2-D
    convs / elementwise).  From dres1_att_0 onward every 3×3×3 conv runs in
    the packed geometry: the 40-ch patch volume enters the cross-packing x2
    kernel via pack_padded_k(c_slot=64) (zero lane-fill in-kernel; the x2
    weights zero-pad 40→64 — exact), then fold_p / packed hourglass / co=1
    head.  Returns the ``(cl, cr, att)`` triple — concat features + the
    softmaxed attention — for pack_concat_k consumers; ``att[..., None] *
    build_concat_volume(cl, cr, D)`` reconstructs the reference's ac_volume
    (acv_ddim.py:181-197,375-390).

    DIFFU_ACV_PREP_B2=1 batches left+right through one 2B trunk call
    (exact at eval: BN running stats).  Measured r5: the batched form LOST
    ~9 ms/prep (2D conv per-op cost up 2.26× and extractor data-formatting
    3.4 → 9.4 ms — the post-trunk slice forces relayouts), default off.
    """
    import os

    from diffuvolume_tpu.ops.cost_volume import build_gwc_volume
    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_p, conv3d_fold_x2, pack_padded_k, unpack_padded_k,
    )

    dt = model.dtype
    b = left.shape[0]
    d = model.max_disp // 4
    h4, w4 = left.shape[1] // 4, left.shape[2] // 4
    th = 8 if h4 % 8 == 0 else _acv_tile_h(h4)

    if os.environ.get("DIFFU_ACV_PREP_B2", "0") == "1":
        feats = model.apply(
            variables, jnp.concatenate([left, right], axis=0),
            method=lambda m, x: m.feature_extraction(x, False),
        )
        feat_l, feat_r = feats[:b], feats[b:]
    else:
        feat_l = model.apply(
            variables, left, method=lambda m, x: m.feature_extraction(x, False))
        feat_r = model.apply(
            variables, right, method=lambda m, x: m.feature_extraction(x, False))

    wp = -(-(w4 + 2) // 8) * 8
    if wp - w4 - 1 >= 3:
        # gwc volume built DIRECTLY in the packed 64-slot geometry (the XLA
        # builder's slice/stack fusions measured 20.2 ms/prep once layout-
        # poisoned by the custom-call consumer, + 3.3 ms of c_slot packs),
        # then the patch convs as packed per-lane stencils (depthwise_hw_p:
        # XLA's depthwise lowering collapsed 8.5 → 27.6 ms/prep in the same
        # context).
        from diffuvolume_tpu.ops.pallas.conv3d import depthwise_hw_p
        from diffuvolume_tpu.ops.pallas.gwc_volume import gwc_volume_packed

        w_patch, w_l123 = _patch_lane_weights(variables, model.num_groups)
        pk_g = gwc_volume_packed(feat_l, feat_r, d, model.num_groups,
                                 tile_h=th, interpret=interpret, c_slot=64)
        pk_g = depthwise_hw_p(pk_g, w_patch, (1,), w_real=w4, h_real=h4,
                              tile_h=th, interpret=interpret)
        pk64 = depthwise_hw_p(pk_g, w_l123, (1, 2, 3), w_real=w4, h_real=h4,
                              tile_h=th, interpret=interpret)
    else:
        gwc = build_gwc_volume(feat_l, feat_r, d, model.num_groups)

        def patch_fn(m, g):
            g = m.patch(g, False)
            p1 = m.patch_l1(g[..., :8], False)
            p2 = m.patch_l2(g[..., 8:24], False)
            p3 = m.patch_l3(g[..., 24:40], False)
            return jnp.concatenate([p1, p2, p3], axis=-1)

        patch_volume = model.apply(variables, gwc, method=patch_fn)
        pk64 = pack_padded_k(patch_volume, th, interpret=interpret, c_slot=64)

    # dres1_att_0's (3,3,3,40,32) kernel zero-pads to (3,3,3,64,32) to match
    # the 64-lane slots — numerically identical.
    ka0, ba0 = _fold_convbn_params(variables, "dres1_att_0")
    ka0 = jnp.pad(ka0, ((0, 0),) * 3 + ((0, 24), (0, 0)))
    pk_a = conv3d_fold_x2(pk64, ka0.astype(dt), ba0, relu=True,
                          w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    ka1, ba1 = _fold_convbn_params(variables, "dres1_att_1")
    pk_a = conv3d_fold_p(pk_a, ka1.astype(dt), ba1, relu=False,
                         w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    pk_a = _hourglass_packed(model, variables, "dres2_att_", pk_a, d, h4, w4,
                             th, interpret)
    kc0, bc0 = _fold_convbn_params(variables, "classif_att_0")
    pk_a = conv3d_fold_p(pk_a, kc0.astype(dt), bc0, relu=True,
                         w_real=w4, h_real=h4, tile_h=th, interpret=interpret)
    k_head = variables["params"]["classif_att_1"]["kernel"]
    pk_a = conv3d_fold_p(pk_a, k_head.astype(dt), w_real=w4, h_real=h4,
                         tile_h=th, interpret=interpret)
    att_weights = unpack_padded_k(pk_a, d, h4, w4, 1, th,
                                  interpret=interpret)

    def concat_fn(m, f):
        return m.concatconv1(m.concatconv0(f, False))

    cl = model.apply(variables, feat_l, method=concat_fn)
    cr = model.apply(variables, feat_r, method=concat_fn)
    att = jax.nn.softmax(
        att_weights[..., 0].astype(jnp.float32), axis=1
    ).astype(dt)
    return cl, cr, att


def acv_prep_fast(baseline_model, ddim_model, baseline_vars, ddim_vars,
                  left, right, interpret: bool = False):
    """Packed pass-1/prep: the frozen ACVNet baseline forward and the DDIM
    model's attention-weighted volume build, with every 3×3×3 conv chain on
    the packed kernel family (r5; the r4 verdict's largest unharvested pool
    — ~130 ms/pair of unpacked XLA running the exact blocks the packed
    denoise already accelerates 49→32 ms).  Eval only, BN folded.

    Returns ``(baseline_disp (B,H,W), (cl, cr, att))`` — the DDIM model's
    concat features + softmaxed attention; the sampler's packed denoise
    consumes the triple directly (pack_concat_k), so the 94 MB ac_volume is
    never materialized anywhere in the fast pipeline.
    """
    out_hw = (left.shape[1], left.shape[2])
    entry_base = _attention_volume_packed(
        baseline_model, baseline_vars, left, right, interpret=interpret)
    baseline_disp, _ = _aggregate_packed(
        baseline_model, baseline_vars, entry_base, out_hw, interpret=interpret)
    entry_ddim = _attention_volume_packed(
        ddim_model, ddim_vars, left, right, interpret=interpret)
    return baseline_disp, entry_ddim
