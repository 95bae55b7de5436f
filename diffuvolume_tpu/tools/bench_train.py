"""One-TPU-chip training-step throughput (SceneFlow ACV recipe).

Measures the full jitted train step (forward + backward + adam update), bf16
compute with f32 master params, on the real chip.

MEASURED LIMITATION of this environment (r3): through the remote-TPU relay
the wall time is DOMINATED by tunnel transfer of the ~75 MB train state —
the device-plane trace of one step shows 5 opaque ~18 s events with ZERO
XLA device ops (the chip is idle; tools/parse_trace on /tmp/r3_trace_train).
Wall numbers from this tool therefore measure the tunnel, not the chip; real
single-host training throughput needs local-chip hardware.  Additionally the
256×512 backward program crashes the relay compile helper (HTTP 500) —
128×256 compiles.

    python -m diffuvolume_tpu.tools.bench_train [--batch 4] [--iters 8] [--f32]
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

    # Chain steps INSIDE one jit: separate dispatches round-trip the full
    # state through the relay (measured 18 s/step of pure transfer).
    @jax.jit
    def run(state, batch, key):
        def body(carry, i):
            st, _ = carry
            st, metrics = step_fn(st, batch, jax.random.fold_in(key, i))
            return (st, metrics["loss"]), None

        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), jnp.arange(args.iters)
        )
        return st, loss

    t0 = time.perf_counter()
    state, loss = run(state, batch, jax.random.PRNGKey(2))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.3f}", flush=True)

    t0 = time.perf_counter()
    state, loss = run(state, batch, jax.random.PRNGKey(3))
    loss = float(loss)  # host fetch forces completion (relay caveat)
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"train_step {h}x{w} b={b} {'f32' if args.f32 else 'bf16'}: "
        f"{dt * 1e3:.1f} ms/step = {1 / dt:.3f} steps/s = "
        f"{b / dt:.3f} samples/s/chip  (loss {loss:.3f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
