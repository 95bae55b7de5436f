"""Torch→JAX converter rules for PCWNet (PWCNet_ddim / PWCNet) checkpoints.

State-dict layout follows KITTI12/models/pwcnet_ddim.py (Sequential index
conventions: convbn→(conv=.0, bn=.1); Seq(convbn, Mish, ...) interleaves
activations at odd indices).  Transposes are shared with convert_torch.
"""

from __future__ import annotations

import numpy as np

from diffuvolume_tpu.tools.convert_torch import (
    _BUFFER_RE,
    _conv,
    _deconv,
    _set,
    _convbn_rules,
)


def _mish_head_rules(tp: str, fn: str):
    """Sequential(convbn, Mish, Conv1x1): .0.* + .2 → {fn}_0 (ConvBN), {fn}_1."""
    return _convbn_rules(f"{tp}.0", f"{fn}_0") + [
        (f"{tp}.2.weight", "params", (f"{fn}_1", "kernel"), _conv)
    ]


def _basic_block_rules(tp: str, fn: str, downsample: bool):
    rules = _convbn_rules(f"{tp}.conv1.0", f"{fn}/conv1")
    rules += _convbn_rules(f"{tp}.conv2", f"{fn}/conv2")
    if downsample:
        rules += _convbn_rules(f"{tp}.downsample", f"{fn}/downsample")
    return rules


def _mish_hourglass_rules(tp: str, fn: str):
    rules = []
    for i in (1, 2, 3, 4):
        rules += _convbn_rules(f"{tp}.conv{i}.0", f"{fn}/conv{i}")
    for i in (5, 6):
        rules += [
            (f"{tp}.conv{i}.0.weight", "params", (f"{fn}/conv{i}", "kernel"), _deconv),
            (f"{tp}.conv{i}.1.weight", "params", (f"{fn}/conv{i}", "bn", "scale"), None),
            (f"{tp}.conv{i}.1.bias", "params", (f"{fn}/conv{i}", "bn", "bias"), None),
            (f"{tp}.conv{i}.1.running_mean", "batch_stats", (f"{fn}/conv{i}", "bn", "mean"), None),
            (f"{tp}.conv{i}.1.running_var", "batch_stats", (f"{fn}/conv{i}", "bn", "var"), None),
        ]
    for r in (1, 2):
        rules += _convbn_rules(f"{tp}.redir{r}", f"{fn}/redir{r}")
    return rules


def _hourglassup_rules(tp: str, fn: str):
    rules = []
    for i in (1, 3, 5):  # plain strided Conv3d
        rules += [(f"{tp}.conv{i}.weight", "params", (f"{fn}/conv{i}", "kernel"), _conv)]
    for i in (2, 4, 6):  # Seq(convbn_3d, Mish)
        rules += _convbn_rules(f"{tp}.conv{i}.0", f"{fn}/conv{i}")
    for i in (7, 8, 9):  # Seq(ConvTranspose3d, BN)
        rules += [
            (f"{tp}.conv{i}.0.weight", "params", (f"{fn}/conv{i}", "kernel"), _deconv),
            (f"{tp}.conv{i}.1.weight", "params", (f"{fn}/conv{i}", "bn", "scale"), None),
            (f"{tp}.conv{i}.1.bias", "params", (f"{fn}/conv{i}", "bn", "bias"), None),
            (f"{tp}.conv{i}.1.running_mean", "batch_stats", (f"{fn}/conv{i}", "bn", "mean"), None),
            (f"{tp}.conv{i}.1.running_var", "batch_stats", (f"{fn}/conv{i}", "bn", "var"), None),
        ]
    for i in (1, 2, 3):
        rules += _convbn_rules(f"{tp}.combine{i}.0", f"{fn}/combine{i}")
    for r in (1, 2, 3):
        rules += _convbn_rules(f"{tp}.redir{r}", f"{fn}/redir{r}")
    return rules


def pcw_rules(diffusion: bool = True, use_concat_volume: bool = True):
    fe = "feature_extraction"
    rules = []
    for i, seq in enumerate((0, 2, 4)):
        rules += _convbn_rules(f"{fe}.firstconv.{seq}", f"{fe}/firstconv{i}")
    layer_specs = [
        ("layer1", 3, False), ("layer2", 16, True), ("layer3", 3, True),
        ("layer4", 3, False), ("layer5", 3, True), ("layer7", 3, True),
        ("layer9", 3, True),
    ]
    for layer, blocks, ds in layer_specs:
        for i in range(blocks):
            rules += _basic_block_rules(
                f"{fe}.{layer}.{i}", f"{fe}/{layer}_{i}", downsample=(i == 0 and ds)
            )
    for head in ("gw2", "gw3", "gw4", "layer11"):
        rules += _mish_head_rules(f"{fe}.{head}", f"{fe}/{head}")
    rules += _convbn_rules(f"{fe}.layer_refine.0", f"{fe}/layer_refine_0")
    rules += _convbn_rules(f"{fe}.layer_refine.2", f"{fe}/layer_refine_1")
    if use_concat_volume:
        rules += _mish_head_rules(f"{fe}.lastconv", f"{fe}/lastconv")
        for head in ("concat2", "concat3", "concat4"):
            rules += _mish_head_rules(f"{fe}.{head}", f"{fe}/{head}")

    rules += _convbn_rules("dres0.0", "dres0_0")
    rules += _convbn_rules("dres0.2", "dres0_1")
    rules += _convbn_rules("dres1.0", "dres1_0")
    rules += _convbn_rules("dres1.2", "dres1_1")
    rules += _hourglassup_rules("combine1", "combine1")
    if diffusion:
        te = "time_embedding"
        for tk, fk in (("time_mlp.1", "time1"), ("time_mlp.3", "time2"),
                       ("block_time_mlp.1", "block")):
            rules += [
                (f"{te}.{tk}.weight", "params", (te, fk, "kernel"), lambda w: w.T),
                (f"{te}.{tk}.bias", "params", (te, fk, "bias"), None),
            ]
    for d in (2, 3, 4):
        rules += _mish_hourglass_rules(f"dres{d}", f"dres{d}")
    for k in (0, 1, 2, 3, 4):
        rules += _convbn_rules(f"classif{k}.0", f"classif{k}_0")
        rules += [(f"classif{k}.2.weight", "params", (f"classif{k}_1", "kernel"), _conv)]

    rn = "refinenet3"
    for i in (1, 2, 3, 4):
        rules += _convbn_rules(f"{rn}.conv{i}.0", f"{rn}/conv{i}")
    for i in (5, 6, 7):  # _make_layer of one BasicBlock (Sequential idx 0)
        rules += _basic_block_rules(f"{rn}.conv{i}.0", f"{rn}/conv{i}", downsample=True)
    rules += [(f"{rn}.conv8.weight", "params", (rn, "conv8", "kernel"), _conv)]
    rules += _convbn_rules("dispupsample.0", "dispupsample")
    return rules


def convert_pcw_state_dict(state_dict, diffusion: bool = True,
                           use_concat_volume: bool = True, strict: bool = True):
    """Convert a reference PWCNet(_ddim) state dict to flax variables."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    out = {"params": {}, "batch_stats": {}}
    used = set()
    for torch_key, coll, flax_path, transform in pcw_rules(diffusion, use_concat_volume):
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
    leftovers = [k for k in sd if k not in used and not _BUFFER_RE.match(k)
                 and "num_batches_tracked" not in k]
    if strict and leftovers:
        raise KeyError(f"unconverted torch keys: {leftovers[:10]}")
    return out
