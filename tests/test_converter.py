"""Structural validation of the torch→jax converter rule tables.

Without the released checkpoints we can't test numerics, but we CAN verify
bidirectional coverage: every rule's flax path must exist in the actual model
parameter tree, and every flax parameter leaf must be produced by some rule —
so a real checkpoint load can only fail on torch-side key names.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.models.acv import ACVNet
from diffuvolume_tpu.models.pcw import PCWNet
from diffuvolume_tpu.tools.convert_torch import acv_rules
from diffuvolume_tpu.tools.convert_torch_pcw import pcw_rules

pytestmark = pytest.mark.slow


def _leaf_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _leaf_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def _rule_paths(rules):
    by_coll = {"params": set(), "batch_stats": set()}
    for _, coll, flax_path, _ in rules:
        path = tuple(p for part in flax_path for p in part.split("/"))
        by_coll[coll].add(path)
    return by_coll


def _unfreeze(tree):
    return jax.tree.map(lambda x: x, tree) if not isinstance(tree, dict) else tree


def _check(variables, rules):
    params = _leaf_paths(dict(variables["params"]))
    stats = _leaf_paths(dict(variables.get("batch_stats", {})))
    rp = _rule_paths(rules)
    missing_in_model = rp["params"] - params
    uncovered = params - rp["params"]
    missing_stats = rp["batch_stats"] - stats
    uncovered_stats = stats - rp["batch_stats"]
    assert not missing_in_model, f"rules target non-existent params: {sorted(missing_in_model)[:5]}"
    assert not uncovered, f"model params not covered by rules: {sorted(uncovered)[:5]}"
    assert not missing_stats, f"rules target non-existent stats: {sorted(missing_stats)[:5]}"
    assert not uncovered_stats, f"batch stats not covered: {sorted(uncovered_stats)[:5]}"


def test_acv_rules_cover_model():
    model = ACVNet(max_disp=192, diffusion=True)
    x = jnp.zeros((1, 64, 192, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, x, jnp.zeros((1, 16, 48)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 48)), train=True,
    )
    _check(jax.device_get(variables), acv_rules(diffusion=True))


def test_pcw_rules_cover_model():
    model = PCWNet(max_disp=192, diffusion=True)
    x = jnp.zeros((1, 64, 192, 3))
    variables = model.init(
        jax.random.PRNGKey(0), x, x, jnp.zeros((1, 16, 48)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 48)), train=True,
    )
    _check(jax.device_get(variables), pcw_rules(diffusion=True))


def test_igev_rules_cover_model():
    from diffuvolume_tpu.models.igev.model import IGEVStereo
    from diffuvolume_tpu.tools.convert_torch_igev import igev_rules

    model = IGEVStereo(max_disp=64, diffusion=True)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=True)
    _check(jax.device_get(variables), igev_rules(diffusion=True))
