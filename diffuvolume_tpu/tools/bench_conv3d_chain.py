"""TPU microbench: packed-persistent conv3d chain (v3) vs XLA conv chain.

Measures N chained 3x3x3 convs at the ACV aggregation shape, keeping the v3
kernel's packed geometry across convs (pack once, unpack once).  Host-fetched
scalars force real completion (relay block_until_ready caveat, CLAUDE.md).

    python -m diffuvolume_tpu.tools.bench_conv3d_chain [--convs 3] [--iters 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="1,48,128,240,32")
    p.add_argument("--convs", type=int, default=3)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tile_h", type=int, default=8)
    args = p.parse_args(argv)

    from diffuvolume_tpu.ops.pallas.conv3d import (
        conv3d_fold_p, pack_padded, unpack_padded,
    )

    b, d, h, w, c = map(int, args.shape.split(","))
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, d, h, w, c), jnp.bfloat16) * 0.1
    ks = [
        jax.random.normal(jax.random.fold_in(rng, i), (3, 3, 3, c, c),
                          jnp.bfloat16) * 0.05
        for i in range(args.convs)
    ]
    th = args.tile_h

    @jax.jit
    def run_packed(x, ks):
        def body(xc, _):
            pk = pack_padded(xc, th)
            for k in ks:
                pk = conv3d_fold_p(pk, k, relu=True, w_real=w, h_real=h,
                                   tile_h=th)
            y = unpack_padded(pk, d, h, w, c, th)
            return y * 0.3 + xc * 0.5, None

        y, _ = lax.scan(body, x, None, length=args.iters)
        return y, jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def run_xla(x, ks):
        def body(xc, _):
            y = xc
            for k in ks:
                y = jnp.maximum(
                    lax.conv_general_dilated(
                        y, k, (1, 1, 1), [(1, 1)] * 3,
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    ), 0)
            return y * 0.3 + xc * 0.5, None

        y, _ = lax.scan(body, x, None, length=args.iters)
        return y, jnp.sum(y.astype(jnp.float32))

    for name, fn in (("packed_v3", run_packed), ("xla", run_xla)):
        y, s = fn(x0, ks)
        float(s)
        t0 = time.perf_counter()
        y2, s2 = fn(y, ks)
        float(s2)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:10s}: {dt * 1e3:7.3f} ms per {args.convs}-conv chain "
              f"({dt / args.convs * 1e3:.3f} ms/conv)", flush=True)


if __name__ == "__main__":
    main()
