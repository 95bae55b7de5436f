"""Data-parallel scaling efficiency benchmark (BASELINE.json config 5).

Measures train-step throughput at 1 device vs N devices on the current
platform (real pod slice, or a virtual CPU mesh for smoke runs) and reports
scaling efficiency = throughput_N / (N * throughput_1).

Usage:
    python -m diffuvolume_tpu.tools.scaling_bench [--devices 8] [--hw 128 256]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


def step_time(model, mesh, per_device_batch, h, w, iters=5):
    from diffuvolume_tpu.parallel.mesh import batch_sharding, shard_batch
    from diffuvolume_tpu.train.loop import create_train_state, make_train_step

    n = mesh.shape["data"]
    b = per_device_batch * n
    key = jax.random.PRNGKey(0)
    batch = {
        "left": jax.random.normal(key, (b, h, w, 3)),
        "right": jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, 3)),
        "disp_gt": jax.random.uniform(
            jax.random.fold_in(key, 2), (b, h, w), minval=1.0, maxval=100.0
        ),
    }
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, jax.random.PRNGKey(1), (1, h, w), optimizer)
    bsh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    jitted = jax.jit(
        make_train_step(model, optimizer),
        in_shardings=(repl, {k: bsh for k in batch}, repl),
        out_shardings=(repl, repl),
    )
    with mesh:
        state_r = jax.device_put(state, repl)
        batch_s = shard_batch(batch, mesh)
        s, m = jitted(state_r, batch_s, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for i in range(iters):
            s, m = jitted(state_r, batch_s, jax.random.fold_in(jax.random.PRNGKey(3), i))
        jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    return b / dt  # samples/s


def main(argv=None):
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.parallel.mesh import make_mesh

    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=0, help="0 = all")
    p.add_argument("--hw", type=int, nargs=2, default=(64, 128))
    p.add_argument("--per_device_batch", type=int, default=1)
    p.add_argument("--maxdisp", type=int, default=64)
    args = p.parse_args(argv)

    n = args.devices or len(jax.devices())
    h, w = args.hw
    model = ACVNet(max_disp=args.maxdisp, diffusion=True)

    mesh1 = make_mesh(n_data=1, devices=jax.devices()[:1])
    tput1 = step_time(model, mesh1, args.per_device_batch, h, w)
    meshN = make_mesh(n_data=n)
    tputN = step_time(model, meshN, args.per_device_batch, h, w)
    eff = tputN / (n * tput1)
    print(
        json.dumps(
            {
                "metric": "dp_scaling_efficiency",
                "devices": n,
                "tput_1": round(tput1, 3),
                "tput_N": round(tputN, 3),
                "value": round(eff, 3),
                "unit": "fraction",
            }
        )
    )


if __name__ == "__main__":
    main()
