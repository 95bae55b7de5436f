"""Cost-volume sharding over the mesh (the reference's missing scaling story).

The ``(B, D, H, W, C)`` cost volume is the memory-dominant activation
(SURVEY.md §5: the reference fits it per-GPU and never shards it).  Here a
context-local PartitionSpec lets the volume builders annotate their outputs
with ``with_sharding_constraint`` so GSPMD shards the volume over the
``volume`` mesh axis (typically along H) and inserts halo exchanges for the
3×3×3 convolutions over ICI automatically.

Usage:
    mesh = make_mesh(n_data=2, n_volume=4)
    with mesh, volume_sharding(P("data", None, "volume")):
        out = jit_train_step(...)   # volumes sharded (B/2, D, H/4, W, C)
"""

from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import PartitionSpec

_STATE = threading.local()


def current_volume_spec() -> PartitionSpec | None:
    return getattr(_STATE, "spec", None)


@contextlib.contextmanager
def volume_sharding(spec: PartitionSpec):
    """Set the PartitionSpec applied to freshly-built cost volumes."""
    prev = current_volume_spec()
    _STATE.spec = spec
    try:
        yield
    finally:
        _STATE.spec = prev


def constrain_volume(volume: jax.Array) -> jax.Array:
    """Apply the active volume sharding constraint (no-op outside the context
    or outside a mesh scope)."""
    spec = current_volume_spec()
    if spec is None:
        return volume
    # Pad the spec to the volume rank.
    full = PartitionSpec(*(list(spec) + [None] * (volume.ndim - len(spec))))
    return jax.lax.with_sharding_constraint(volume, full)
