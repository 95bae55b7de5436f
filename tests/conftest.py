"""Test configuration: run on CPU with 8 virtual devices.

This is the standard JAX substitute for multi-chip testing without a pod
(SURVEY.md §4): sharding/collective tests see 8 devices on one host.

Note: this environment's sitecustomize imports jax and registers the remote
TPU backend at interpreter startup, so env vars are too late here — but
backends initialize lazily, so `jax.config.update` before first device use
still forces CPU (and avoids running unit tests over the TPU tunnel, which is
both slow and bf16-default).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
