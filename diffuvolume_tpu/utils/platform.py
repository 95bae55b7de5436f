"""Centralized "what platform am I lowering for?" helper.

``jax.default_backend()`` reports the highest-priority *installed* backend and
IGNORES an active ``jax.default_device(...)`` context — so code keyed on it
(Pallas interpret-mode defaults, TPU-only fast paths) picks the TPU branch
even while eagerly executing on host CPU inside ``utils.hostinit.init_on_cpu``.
That exact interaction crashed round 1's bench (Pallas fused head lowered for
CPU backend: "Only interpret mode is supported on CPU backend").

Every backend-keyed branch in the package must go through this module.
"""

from __future__ import annotations

import jax


def lowering_platform() -> str:
    """Platform ('tpu' | 'cpu' | ...) the current trace/eager op lowers to.

    Respects the thread-local ``jax.default_device(...)`` context; falls back
    to ``jax.default_backend()`` when no explicit default device is set.
    """
    dev = jax.config.jax_default_device
    if dev is not None:
        # May be a Device or a string like "cpu" depending on how it was set.
        platform = getattr(dev, "platform", None)
        if platform is not None:
            return platform
        return str(dev).split(":")[0].lower()
    return jax.default_backend()


def is_tpu_lowering() -> bool:
    return lowering_platform() == "tpu"
