"""Host-CPU parameter initialization for TPU tools.

Flax ``model.init`` runs eagerly, op by op.  Through the remote-relay TPU
backend every one of those tiny ops is a separate remote compile, so
initializing even a small model on the accelerator takes minutes of relay
round-trips before the real program ever compiles.  Parameters are
device-agnostic: initialize them on the host CPU backend (local, milliseconds)
and transfer the finished pytree to the default device once.
"""

from __future__ import annotations

import jax


def init_on_cpu(init_fn, *args, to_device: bool = True, device=None, **kwargs):
    """Run a flax ``init`` (or any pure param-constructing fn) on host CPU.

    NOTE: unlike a bare ``model.init`` (which returns *uncommitted* arrays),
    the returned pytree is **committed** to a single device — CPU:0 when
    ``to_device=False`` or the backend is CPU-only, else ``device`` (default
    ``jax.devices()[0]``).  Committed single-device params fed to a
    mesh-sharded ``pjit`` raise "incompatible devices"; sharded callers must
    pass a ``NamedSharding`` (or target device) via ``device=``.

    Args:
      init_fn: e.g. ``model.init``.
      to_device: transfer the resulting pytree off the host after init.
      device: a ``jax.Device`` or ``jax.sharding.Sharding`` to commit the
        result to; defaults to ``jax.devices()[0]`` (the TPU under the relay
        backend).

    Returns:
      The variables pytree (committed; see note).
    """
    cpu = jax.devices("cpu")[0]

    def to_cpu(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, cpu) if isinstance(x, jax.Array) else x, tree
        )

    with jax.default_device(cpu):
        variables = init_fn(*to_cpu(args), **to_cpu(kwargs))
    if to_device:
        target = device if device is not None else jax.devices()[0]
        if device is not None or jax.devices()[0].platform != "cpu":
            variables = jax.device_put(variables, target)
    return variables
