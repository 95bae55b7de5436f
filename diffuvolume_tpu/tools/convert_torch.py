"""Torch→JAX weight converter for released DiffuVolume/ACVNet checkpoints.

Maps the reference's state-dict names (SceneFlow/models/acv_ddim.py module
tree) onto this package's flax param/batch-stats pytrees, with the layout
transposes:

  * Conv2d ``(O,I,kh,kw)`` → ``(kh,kw,I,O)``; Conv3d ``(O,I,kd,kh,kw)`` →
    ``(kd,kh,kw,I,O)`` (grouped convs identical: ``I`` is per-group).
  * ConvTranspose3d ``(I,O,kd,kh,kw)`` → spatially flipped ``(kd,kh,kw,I,O)``
    (see ConvTransposeBN docstring).
  * Linear ``(O,I)`` → ``(I,O)``.
  * BatchNorm weight/bias → scale/bias; running stats → ``batch_stats``.

Usage:
    variables = convert_acv_state_dict(torch.load(ckpt)["model"], diffusion=True)
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight → flax kernel."""
    if w.ndim == 4:
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 5:
        return w.transpose(2, 3, 4, 1, 0)
    raise ValueError(w.shape)


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d weight → pre-flipped conv-oriented kernel."""
    assert w.ndim == 5, w.shape
    return np.ascontiguousarray(w[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convbn_rules(torch_prefix: str, flax_name: str):
    """(convbn Sequential: .0 = conv, .1 = bn) → ConvBN {conv, bn}."""
    return [
        (f"{torch_prefix}.0.weight", "params", (flax_name, "conv", "kernel"), _conv),
        (f"{torch_prefix}.1.weight", "params", (flax_name, "bn", "scale"), None),
        (f"{torch_prefix}.1.bias", "params", (flax_name, "bn", "bias"), None),
        (f"{torch_prefix}.1.running_mean", "batch_stats", (flax_name, "bn", "mean"), None),
        (f"{torch_prefix}.1.running_var", "batch_stats", (flax_name, "bn", "var"), None),
    ]


def _hourglass_rules(tp: str, fn: str):
    """Reference hourglass (acv_ddim.py:56-93) → HourglassACV."""
    rules = []
    for i in (1, 2, 3, 4):
        rules += _convbn_rules(f"{tp}.conv{i}.0", f"{fn}/conv{i}")
    # attention block
    ab = f"{tp}.attention_block"
    fab = f"{fn}/attention_block"
    rules += [
        (f"{ab}.qkv_3d.weight", "params", (fab, "qkv", "kernel"), lambda w: w.T),
        (f"{ab}.qkv_3d.bias", "params", (fab, "qkv", "bias"), None),
        (f"{ab}.final1x1.weight", "params", (fab, "final1x1", "kernel"), _conv),
        (f"{ab}.final1x1.bias", "params", (fab, "final1x1", "bias"), None),
    ]
    # deconvs: conv5/conv6 Sequential(ConvTranspose3d, BN)
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


def _basic_block_rules(tp: str, fn: str, has_downsample: bool):
    rules = _convbn_rules(f"{tp}.conv1.0", f"{fn}/conv1")
    rules += _convbn_rules(f"{tp}.conv2", f"{fn}/conv2")
    if has_downsample:
        rules += _convbn_rules(f"{tp}.downsample", f"{fn}/downsample")
    return rules


def acv_rules(diffusion: bool = True):
    """Full torch-key → flax-path rule table for ACVNet / ACVNet_DDIM."""
    rules = []
    fe = "feature_extraction"
    for i, seq in enumerate((0, 2, 4)):
        rules += _convbn_rules(f"{fe}.firstconv.{seq}", f"{fe}/firstconv{i}")
    for layer, blocks, ds_first in (
        ("layer1", 3, False), ("layer2", 16, True), ("layer3", 3, True), ("layer4", 3, False),
    ):
        for i in range(blocks):
            rules += _basic_block_rules(
                f"{fe}.{layer}.{i}", f"{fe}/{layer}_{i}", has_downsample=(i == 0 and ds_first)
            )

    rules += _convbn_rules("concatconv.0", "concatconv0")
    rules += [("concatconv.2.weight", "params", ("concatconv1", "kernel"), _conv)]

    for p in ("patch", "patch_l1", "patch_l2", "patch_l3"):
        rules += [(f"{p}.weight", "params", (p, "conv", "kernel"), _conv)]

    rules += _convbn_rules("dres1_att_.0", "dres1_att_0")
    rules += _convbn_rules("dres1_att_.2", "dres1_att_1")
    rules += _hourglass_rules("dres2_att_", "dres2_att_")
    rules += _convbn_rules("classif_att_.0", "classif_att_0")
    rules += [("classif_att_.2.weight", "params", ("classif_att_1", "kernel"), _conv)]

    if diffusion:
        te = "time_embedding"
        for tk, fk in (("time_mlp.1", "time1"), ("time_mlp.3", "time2"), ("block_time_mlp.1", "block")):
            rules += [
                (f"{te}.{tk}.weight", "params", (te, fk, "kernel"), lambda w: w.T),
                (f"{te}.{tk}.bias", "params", (te, fk, "bias"), None),
            ]

    rules += _convbn_rules("dres0.0", "dres0_0")
    rules += _convbn_rules("dres0.2", "dres0_1")
    rules += _convbn_rules("dres1.0", "dres1_0")
    rules += _convbn_rules("dres1.2", "dres1_1")
    rules += _hourglass_rules("dres2", "dres2")
    rules += _hourglass_rules("dres3", "dres3")
    for k in (0, 1, 2):
        rules += _convbn_rules(f"classif{k}.0", f"classif{k}_0")
        rules += [(f"classif{k}.2.weight", "params", (f"classif{k}_1", "kernel"), _conv)]
    return rules


# Reference diffusion buffers registered in the state dict but recomputed here
# (make_schedule): safe to ignore on load.
_BUFFER_RE = re.compile(
    r"^(betas|alphas_cumprod|alphas_cumprod_prev|sqrt_alphas_cumprod|"
    r"sqrt_one_minus_alphas_cumprod|log_one_minus_alphas_cumprod|"
    r"sqrt_recip_alphas_cumprod|sqrt_recipm1_alphas_cumprod|posterior_variance|"
    r"posterior_log_variance_clipped|posterior_mean_coef1|posterior_mean_coef2)$"
)


def convert_acv_state_dict(
    state_dict: dict[str, Any], diffusion: bool = True, strict: bool = True
) -> dict:
    """Convert a reference ACVNet(_DDIM) state dict to flax variables.

    Accepts ``module.``-prefixed keys (nn.DataParallel) transparently.
    Returns ``{"params": ..., "batch_stats": ...}`` with nested dicts whose
    leaf arrays are NumPy (cast with jnp.asarray downstream).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        sd[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)

    out = {"params": {}, "batch_stats": {}}
    used = set()
    for torch_key, coll, flax_path, transform in acv_rules(diffusion):
        if torch_key not in sd:
            if strict:
                raise KeyError(f"missing torch key: {torch_key}")
            continue
        w = sd[torch_key]
        if transform is not None:
            w = transform(w)
        # flax_path elements may contain '/' submodule separators
        path = tuple(p for part in flax_path for p in part.split("/"))
        _set(out[coll], path, np.asarray(w))
        used.add(torch_key)

    leftovers = [
        k for k in sd
        if k not in used and not _BUFFER_RE.match(k) and "num_batches_tracked" not in k
    ]
    if strict and leftovers:
        raise KeyError(f"unconverted torch keys: {leftovers[:10]} (+{len(leftovers)-10 if len(leftovers)>10 else 0})")
    return out
