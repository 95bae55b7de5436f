"""One-TPU-chip training-step throughput (SceneFlow ACV recipe).

Measures the full jitted train step (forward + backward + adam update) at the
reference's training crop 256×512 (SceneFlow/main.py crop), bf16 compute with
f32 master params, on the real chip.  Chained steps on the SAME donated state
with per-iteration fold_in rngs defeat the relay result cache (CLAUDE.md).

    python -m diffuvolume_tpu.tools.bench_train [--batch 4] [--iters 8] [--f32]

Prints steps/s and samples/s/chip.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)

    import optax

    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.train.loop import create_train_state, make_train_step
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    b, h, w = args.batch, args.height, args.width
    model = ACVNet(max_disp=192, diffusion=True, dtype=dtype)
    optimizer = optax.adam(1e-3)

    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, h, w, 3))

    def init_fn(r, *a, **k):
        return model.init(r, *a, **k)

    variables = init_on_cpu(
        model.init, rng, xs, xs, jnp.zeros((1, h // 4, w // 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, h // 4, w // 4)),
        train=True,
    )
    from diffuvolume_tpu.train.loop import TrainState
    from flax.core import FrozenDict

    params = variables["params"]
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    step_fn = make_train_step(model, optimizer)

    key = jax.random.PRNGKey(1)
    batch = {
        "left": jax.random.normal(key, (b, h, w, 3), jnp.float32) * 0.3,
        "right": jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, 3),
                                   jnp.float32) * 0.3,
        "disp_gt": jax.random.uniform(jax.random.fold_in(key, 2), (b, h, w),
                                      minval=1.0, maxval=150.0),
    }

    jitted = jax.jit(step_fn, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = jitted(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics["loss"])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.3f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = jitted(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"train_step {h}x{w} b={b} {'f32' if args.f32 else 'bf16'}: "
        f"{dt * 1e3:.1f} ms/step = {1 / dt:.3f} steps/s = "
        f"{b / dt:.3f} samples/s/chip  (loss {float(metrics['loss']):.3f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
