"""Learning-rate schedules.

Reference: the epoch-milestone decay parser ``"16,24,32,40,48:2"``
(SceneFlow/utils/experiment.py:91-109) and KITTI15's OneCycle policy
(train_stereo.py:126-128) — the latter is provided by optax directly.
"""

from __future__ import annotations

import optax


def milestone_lr_schedule(
    base_lr: float, lrepochs: str, steps_per_epoch: int
) -> optax.Schedule:
    """Parse ``"e1,e2,...:gamma"`` (divide LR by gamma at each epoch milestone)."""
    splits = lrepochs.split(":")
    assert len(splits) == 2, lrepochs
    milestones = [int(e) for e in splits[0].split(",")]
    gamma = float(splits[1])
    boundaries = {m * steps_per_epoch: 1.0 / gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def one_cycle_schedule(
    max_lr: float, total_steps: int, pct_start: float = 0.01
) -> optax.Schedule:
    """KITTI15 OneCycleLR equivalent (linear anneal strategy,
    train_stereo.py:126-128: pct_start=0.01, cycle_momentum=False)."""
    return optax.linear_onecycle_schedule(
        transition_steps=total_steps + 100,
        peak_value=max_lr,
        pct_start=pct_start,
        pct_final=1.0,
        div_factor=25.0,
        final_div_factor=1e4 / 25.0,
    )
