"""Parameter / FLOPs accounting (the reference's thop + param prints,
SceneFlow/test_sceneflow_ddim.py:27-28,52-59) via XLA cost analysis."""

from __future__ import annotations

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def trainable_param_report(variables) -> dict:
    """Parameter counts per top-level module + total (in millions)."""
    params = variables.get("params", variables)
    report = {}
    for name, sub in params.items():
        report[name] = count_params(sub) / 1e6
    report["TOTAL_M"] = count_params(params) / 1e6
    return report


def xla_cost(fn, *args, **kwargs) -> dict:
    """FLOPs / bytes-accessed of a jitted function, from the compiled XLA
    executable's cost analysis."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {
        "gflops": analysis.get("flops", 0.0) / 1e9,
        "gbytes": analysis.get("bytes accessed", 0.0) / 1e9,
    }
