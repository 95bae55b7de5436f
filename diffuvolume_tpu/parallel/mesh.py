"""Device-mesh and sharding helpers.

The reference scales with single-process ``nn.DataParallel`` over ≤6 GPUs
(SceneFlow/main.py:67) plus dormant NCCL DDP helpers (SceneFlow/utils/
misc.py:20-41).  The TPU-native story replaces all of it with one
``jax.sharding.Mesh``:

  * ``data``  — batch axis; gradients all-reduce over ICI automatically when
    the loss is jitted with batch-sharded inputs and replicated params.
  * ``volume`` — optional model axis for sharding the 4D cost volume over its
    height dimension at large resolution (XLA inserts halo exchanges for the
    3×3×3 convolutions).

No hand-written collectives: GSPMD propagates the shardings and places
psum/all-gather/ppermute on ICI.  BatchNorm statistics are computed with
global-batch means, because reductions under pjit are global across the mesh —
stronger than the reference's per-GPU-shard BN under DataParallel.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_volume: int = 1, devices=None
) -> Mesh:
    """Build a ``(data, volume)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_volume
    assert n_data * n_volume <= len(devices), (n_data, n_volume, len(devices))
    grid = np.asarray(devices[: n_data * n_volume]).reshape(n_data, n_volume)
    return Mesh(grid, ("data", "volume"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of arrays with batch-dim sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
