"""Checkpoint round-trip + partial warm-start tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from diffuvolume_tpu.models.acv import ACVNet
from diffuvolume_tpu.train.checkpoint import (
    latest_step,
    partial_warm_start,
    restore_checkpoint,
    save_checkpoint,
)
from diffuvolume_tpu.train.loop import create_train_state


def _state():
    model = ACVNet(max_disp=64, diffusion=True)
    return model, create_train_state(
        model, jax.random.PRNGKey(0), (1, 32, 64), optax.adam(1e-3)
    )


def test_save_restore_roundtrip(tmp_path):
    _, state = _state()
    ckpt = str(tmp_path / "ckpts")
    save_checkpoint(ckpt, 7, jax.device_get(state))
    assert latest_step(ckpt) == 7
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        jax.device_get(state),
    )
    restored = restore_checkpoint(ckpt, abstract)
    orig_leaf = jax.tree_util.tree_leaves(state.params)[0]
    rest_leaf = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(orig_leaf), np.asarray(rest_leaf))


def test_partial_warm_start_absorbs_baseline():
    """A diffusion model must absorb a plain-backbone checkpoint, leaving the
    extra time-embedding params at init (SceneFlow/main.py:84-91 semantics)."""
    baseline = ACVNet(max_disp=64, diffusion=False)
    x = jnp.zeros((1, 32, 64, 3))
    bvars = baseline.init(jax.random.PRNGKey(1), x, x, train=False)

    ddim_model, state = _state()
    merged = partial_warm_start(state.params, bvars["params"])
    # shared leaf copied from the baseline
    src = np.asarray(bvars["params"]["feature_extraction"]["firstconv0"]["conv"]["kernel"])
    dst = np.asarray(merged["feature_extraction"]["firstconv0"]["conv"]["kernel"])
    np.testing.assert_allclose(src, dst)
    # diffusion-only leaf untouched (still the DDIM init)
    te_orig = np.asarray(
        jax.tree_util.tree_leaves(state.params["time_embedding"])[0]
    )
    te_new = np.asarray(jax.tree_util.tree_leaves(merged["time_embedding"])[0])
    np.testing.assert_allclose(te_orig, te_new)
