"""Orbax checkpointing with the reference's partial warm-start semantics.

Reference: epoch checkpoints ``{'epoch','model','optimizer'}`` via torch.save
(SceneFlow/main.py:118-121), ``--resume`` scanning the logdir for the latest
checkpoint (main.py:73-83), and the partial load that filters to intersecting
keys so the diffusion wrapper absorbs a plain-backbone checkpoint
(main.py:84-91).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> int | None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, abstract_state: Any, step: int | None = None):
    """Restore the given (or latest) step, shaped like ``abstract_state``."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def partial_warm_start(target_params: Any, source_params: Any) -> Any:
    """Copy leaves whose path exists in both trees with matching shapes.

    The reference's intersect-keys load (SceneFlow/main.py:84-91) generalized
    to pytrees: lets an ACVNet_DDIM model absorb a plain ACVNet checkpoint
    (extra DynamicHead params stay at init).
    """
    flat_src = dict(jax.tree_util.tree_flatten_with_path(source_params)[0])

    def pick(path, leaf):
        src = flat_src.get(path)
        if src is not None and getattr(src, "shape", None) == leaf.shape:
            return src
        return leaf

    flat_tgt, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    return jax.tree_util.tree_unflatten(
        treedef, [pick(p, l) for p, l in flat_tgt]
    )
