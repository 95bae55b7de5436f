"""Torch→JAX converter rules for IGEV-Stereo (IGEVStereo_ddim / IGEVStereo).

State-dict layout follows KITTI15/core/igev_stereo_ddim.py:118-196 with the
timm ``mobilenetv2_100`` trunk split into block0..block4 Sequentials
(extractor.py:336-341).  Linear/conv transposes shared with convert_torch.
InstanceNorm layers carry no parameters.
"""

from __future__ import annotations

import numpy as np

from diffuvolume_tpu.tools.convert_torch import _conv, _deconv, _set


def _lin(tp, fp):
    return [
        (f"{tp}.weight", "params", (*fp, "kernel"), lambda w: w.T),
        (f"{tp}.bias", "params", (*fp, "bias"), None),
    ]


def _conv2d(tp, fp, bias=True):
    rules = [(f"{tp}.weight", "params", (*fp, "kernel"), _conv)]
    if bias:
        rules.append((f"{tp}.bias", "params", (*fp, "bias"), None))
    return rules


def _deconv2d(tp, fp, bias=False):
    rules = [(f"{tp}.weight", "params", (*fp, "kernel"), _deconv2d_w)]
    if bias:
        rules.append((f"{tp}.bias", "params", (*fp, "bias"), None))
    return rules


def _deconv2d_w(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d (I,O,kh,kw) → flipped (kh,kw,I,O)."""
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _bn(tp, fp):
    return [
        (f"{tp}.weight", "params", (*fp, "scale"), None),
        (f"{tp}.bias", "params", (*fp, "bias"), None),
        (f"{tp}.running_mean", "batch_stats", (*fp, "mean"), None),
        (f"{tp}.running_var", "batch_stats", (*fp, "var"), None),
    ]


def _basic_conv_bn(tp, fp, deconv=False):
    """BasicConv (submodule.py:9-37): conv (no bias) + bn."""
    w = _deconv if deconv else _conv
    if deconv:
        # is_3d deconv in IGEV uses 5-D kernels; 2-D handled by _deconv2d
        pass
    return [(f"{tp}.conv.weight", "params", (*fp, "conv", "kernel"), w)] + _bn(
        f"{tp}.bn", (*fp, "bn")
    )


def _basic_conv_in(tp, fp, deconv=False):
    """BasicConv_IN: conv only (InstanceNorm has no params)."""
    w = _deconv2d_w if deconv else _conv
    return [(f"{tp}.conv.weight", "params", (*fp, "conv", "kernel"), w)]


def _feature_att(tp, fp):
    return (
        _basic_conv_bn(f"{tp}.feat_att.0", (*fp, "att0"))
        + _conv2d(f"{tp}.feat_att.1", (*fp, "att1"))
    )


def _inverted_residual(tp, fp, expand: bool):
    """timm InvertedResidual (conv_pw/bn1, conv_dw/bn2, conv_pwl/bn3) or
    DepthwiseSeparableConv (conv_dw/bn1, conv_pw/bn2) for the t=1 block."""
    if expand:
        return (
            _conv2d(f"{tp}.conv_pw", (*fp, "pw"), bias=False)
            + _bn(f"{tp}.bn1", (*fp, "pw_bn"))
            + _conv2d(f"{tp}.conv_dw", (*fp, "dw"), bias=False)
            + _bn(f"{tp}.bn2", (*fp, "dw_bn"))
            + _conv2d(f"{tp}.conv_pwl", (*fp, "proj"), bias=False)
            + _bn(f"{tp}.bn3", (*fp, "proj_bn"))
        )
    return (
        _conv2d(f"{tp}.conv_dw", (*fp, "dw"), bias=False)
        + _bn(f"{tp}.bn1", (*fp, "dw_bn"))
        + _conv2d(f"{tp}.conv_pw", (*fp, "proj"), bias=False)
        + _bn(f"{tp}.bn2", (*fp, "proj_bn"))
    )


def _residual_block_ctx(tp, fp, has_downsample: bool):
    rules = (
        _conv2d(f"{tp}.conv1", (*fp, "conv1"))
        + _bn(f"{tp}.norm1", (*fp, "norm1"))
        + _conv2d(f"{tp}.conv2", (*fp, "conv2"))
        + _bn(f"{tp}.norm2", (*fp, "norm2"))
    )
    if has_downsample:
        rules += _conv2d(f"{tp}.downsample.0", (*fp, "downsample"))
        rules += _bn(f"{tp}.norm3", (*fp, "norm3"))
    return rules


def _conv2x_in(tp, fp):
    return _basic_conv_in(f"{tp}.conv1", (*fp, "conv1"), deconv=True) + _basic_conv_in(
        f"{tp}.conv2", (*fp, "conv2")
    )


def _conv2x_bn(tp, fp):
    return [
        (f"{tp}.conv1.conv.weight", "params", (*fp, "conv1", "conv", "kernel"), _deconv2d_w),
        *_bn(f"{tp}.conv1.bn", (*fp, "conv1", "bn")),
        (f"{tp}.conv2.conv.weight", "params", (*fp, "conv2", "conv", "kernel"), _conv),
        *_bn(f"{tp}.conv2.bn", (*fp, "conv2", "bn")),
    ]


# (flax block index, torch prefix, has expansion)
_MBV2_BLOCK_MAP = [
    (0, "block0.0.0", False),
    (1, "block1.0.0", True), (2, "block1.0.1", True),
    (3, "block2.0.0", True), (4, "block2.0.1", True), (5, "block2.0.2", True),
    (6, "block3.0.0", True), (7, "block3.0.1", True), (8, "block3.0.2", True),
    (9, "block3.0.3", True),
    (10, "block3.1.0", True), (11, "block3.1.1", True), (12, "block3.1.2", True),
    (13, "block4.0.0", True), (14, "block4.0.1", True), (15, "block4.0.2", True),
]


def igev_rules(diffusion: bool = True, n_gru_layers: int = 3):
    r = []
    # MobileNetV2 trunk
    fe = "feature"
    r += _conv2d(f"{fe}.conv_stem", (fe, "conv_stem"), bias=False)
    r += _bn(f"{fe}.bn1", (fe, "bn1"))
    for idx, tp, expand in _MBV2_BLOCK_MAP:
        r += _inverted_residual(f"{fe}.{tp}", (fe, f"block{idx}"), expand)
    r += _conv2x_in(f"{fe}.deconv32_16", (fe, "deconv32_16"))
    r += _conv2x_in(f"{fe}.deconv16_8", (fe, "deconv16_8"))
    r += _conv2x_in(f"{fe}.deconv8_4", (fe, "deconv8_4"))
    r += _basic_conv_in(f"{fe}.conv4", (fe, "conv4"))

    # context encoder
    c = "cnet"
    r += _conv2d(f"{c}.conv1", (c, "conv1"))
    r += _bn(f"{c}.norm1", (c, "norm1"))
    downsampled = {  # (layer, block) with in/out or stride mismatch
        (1, 0): False, (1, 1): False,
        (2, 0): True, (2, 1): False,
        (3, 0): True, (3, 1): False,
        (4, 0): True, (4, 1): False,
        (5, 0): True, (5, 1): False,
    }
    for (layer, blk), ds in downsampled.items():
        r += _residual_block_ctx(f"{c}.layer{layer}.{blk}", (c, f"layer{layer}_{blk}"), ds)
    for di in range(2):
        r += _residual_block_ctx(f"{c}.outputs04.{di}.0", (c, f"out04_{di}_res"), False)
        r += _conv2d(f"{c}.outputs04.{di}.1", (c, f"out04_{di}_conv"))
        r += _residual_block_ctx(f"{c}.outputs08.{di}.0", (c, f"out08_{di}_res"), False)
        r += _conv2d(f"{c}.outputs08.{di}.1", (c, f"out08_{di}_conv"))
        r += _conv2d(f"{c}.outputs16.{di}", (c, f"out16_{di}"))

    # update block
    u = "update_block"
    for m in ("convc1", "convc2", "convd1", "convd2", "conv"):
        r += _conv2d(f"{u}.encoder.{m}", (u, "encoder", m))
    for gru in ("gru04", "gru08", "gru16"):
        for g in ("convz", "convr", "convq"):
            r += _conv2d(f"{u}.{gru}.{g}", (u, gru, g))
    r += _conv2d(f"{u}.disp_head.conv1", (u, "disp_head", "conv1"))
    r += _conv2d(f"{u}.disp_head.conv2", (u, "disp_head", "conv2"))
    r += _conv2d(f"{u}.mask_feat_4.0", (u, "mask_feat_4"))
    for i in range(n_gru_layers):
        r += _conv2d(f"context_zqr_convs.{i}", (f"context_zqr_{i}",))

    if diffusion:
        te = "time_embedding"
        r += _lin(f"{te}.time_mlp.1", (te, "time1"))
        r += _lin(f"{te}.time_mlp.3", (te, "time2"))
        r += _lin(f"{te}.block_time_mlp.1", (te, "block"))

    # stems / superpixel paths
    for stem in ("stem_2", "stem_4"):
        r += _basic_conv_in(f"{stem}.0", (f"{stem}_0",))
        r += _conv2d(f"{stem}.1", (f"{stem}_1",), bias=False)
    r += _basic_conv_in("spx_4.0", ("spx_4_0",))
    r += _conv2d("spx_4.1", ("spx_4_1",), bias=False)
    r += _conv2x_in("spx_2", ("spx_2",))
    r += _deconv2d("spx.0", ("spx",), bias=True)
    r += _conv2x_bn("spx_2_gru", ("spx_2_gru",))
    r += _deconv2d("spx_gru.0", ("spx_gru",), bias=True)

    # matching / GEV path
    r += _basic_conv_in("conv", ("conv",))
    r += _conv2d("desc", ("desc",))
    r += _basic_conv_bn("corr_stem", ("corr_stem",))
    r += _feature_att("corr_feature_att", ("corr_feature_att",))

    h = "cost_agg"
    for pair, fl in (("conv1", "conv1"), ("conv2", "conv2"), ("conv3", "conv3")):
        r += _basic_conv_bn(f"{h}.{pair}.0", (h, f"{fl}_0"))
        r += _basic_conv_bn(f"{h}.{pair}.1", (h, f"{fl}_1"))
    r += [
        (f"{h}.conv3_up.conv.weight", "params", (h, "conv3_up", "conv", "kernel"), _deconv),
        *_bn(f"{h}.conv3_up.bn", (h, "conv3_up", "bn")),
        (f"{h}.conv2_up.conv.weight", "params", (h, "conv2_up", "conv", "kernel"), _deconv),
        *_bn(f"{h}.conv2_up.bn", (h, "conv2_up", "bn")),
        (f"{h}.conv1_up.conv.weight", "params", (h, "conv1_up", "conv", "kernel"), _deconv),
    ]
    for agg, fl in (("agg_0", "agg0"), ("agg_1", "agg1")):
        for i in range(3):
            r += _basic_conv_bn(f"{h}.{agg}.{i}", (h, f"{fl}_{i}"))
    for att in ("feature_att_8", "feature_att_16", "feature_att_32",
                "feature_att_up_16", "feature_att_up_8"):
        r += _feature_att(f"{h}.{att}", (h, att))
    r += [("classifier.weight", "params", ("classifier", "kernel"), _conv)]
    return r


def convert_igev_state_dict(state_dict, diffusion: bool = True, strict: bool = True):
    """Convert a reference IGEVStereo(_ddim) state dict to flax variables."""
    from diffuvolume_tpu.tools.convert_torch import _BUFFER_RE

    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    out = {"params": {}, "batch_stats": {}}
    used = set()
    for torch_key, coll, flax_path, transform in igev_rules(diffusion):
        if torch_key not in sd:
            if strict:
                raise KeyError(f"missing torch key: {torch_key}")
            continue
        w = sd[torch_key]
        if transform is not None:
            w = transform(w)
        path = tuple(p for part in flax_path for p in part.split("/"))
        _set(out[coll], path, np.asarray(w))
        used.add(torch_key)
    # ResidualBlock (KITTI15/core/extractor.py:44-49) registers norm3 and ALSO
    # reuses the same module inside downsample = Sequential(conv, norm3), so
    # the state dict carries duplicate alias keys `*.downsample.1.*` for
    # parameters already converted via `*.norm3.*`.
    # BasicConv registers self.bn unconditionally (submodule.py:21,27) even
    # when constructed with bn=False; cost_agg.conv1_up (igev hourglass, bn=
    # False relu=False) therefore carries DEAD never-executed BN parameters.
    dead = ("cost_agg.conv1_up.bn.",)
    leftovers = [k for k in sd if k not in used and not _BUFFER_RE.match(k)
                 and "num_batches_tracked" not in k
                 and ".downsample.1." not in k
                 and not k.startswith(dead)]
    if strict and leftovers:
        raise KeyError(f"unconverted torch keys: {leftovers[:10]}")
    return out
