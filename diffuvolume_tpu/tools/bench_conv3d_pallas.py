"""Microbench: Pallas conv3d_fold variants vs XLA conv3d on the TPU.

Compares, per (shape, channels) config, chained in-fori-loop timings of
  xla       : lax conv3d NDHWC
  fold      : conv3d_fold (v2, 6/9 rotated dot operands per tile)
  fold_hdx  : conv3d_fold hoist_dx=True (2 rotated buffers per tile)

In-loop standalone numbers overstate XLA's cost vs in-program (CLAUDE.md) —
they are only comparable BETWEEN the Pallas variants and as an upper bound
for XLA.  Chaining (x = f(x)+x) defeats the relay result cache.

    python -m diffuvolume_tpu.tools.bench_conv3d_pallas [--f32] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--f32", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--configs", default="1,48,128,240,32;1,24,64,120,64")
    args = p.parse_args(argv)

    from diffuvolume_tpu.ops.pallas.conv3d import conv3d_fold

    dt = jnp.float32 if args.f32 else jnp.bfloat16
    rng = jax.random.PRNGKey(0)

    def xla(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    for cfgs in args.configs.split(";"):
        b, d, h, w, c = map(int, cfgs.split(","))
        x0 = jax.random.normal(rng, (b, d, h, w, c), dt) * 0.1
        k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, c, c), dt) * 0.05
        th = 8 if w <= 258 else 4
        forms = {
            "xla": xla,
            "fold": functools.partial(conv3d_fold, tile_h=th, hoist_dx=False),
            "fold_hdx": functools.partial(conv3d_fold, tile_h=th, hoist_dx=True),
        }
        for name, f in forms.items():
            @jax.jit
            def run(x, k, f=f):
                def body(xc, _):
                    return f(xc, k) * 0.5 + xc * 0.5, None

                y, _ = lax.scan(body, x, None, length=args.iters)
                # Host-fetched scalar forces real completion (block_until_ready
                # on relay-backed arrays returns before execution finishes).
                return y, jnp.sum(y.astype(jnp.float32))

            y, s = run(x0, k)
            float(s)
            t0 = time.perf_counter()
            y2, s2 = run(y, k)
            float(s2)
            dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"{cfgs} c={c} {name:9s}: {dt_ms:7.3f} ms/conv", flush=True)


if __name__ == "__main__":
    main()
