"""Microbench: XLA formulations of the 3x3x3 aggregation convolution.

The DiffuVolume aggregation hourglasses (reference SceneFlow/models/
acv_ddim.py:452-455) are dominated by C=32 3x3x3 convs over the
(B, D=48, H/4, W/4) cost volume, which XLA lowers im2col-HBM-bound on v5e
(~5 ms vs ~0.4 ms MXU speed-of-light at (48,128,240)).  CLAUDE.md's earlier
analysis assumed every XLA-level reformulation pays the same im2col bytes —
but that is only true if the 2-D conv emitter ALSO materializes patches.
This bench measures:

  v3d      : lax conv3d NDHWC (the current production path)
  v2d_sum  : 3x conv2d over (B*D, H, W, C), shifted-add along D
  v2d_pack : manual D-im2col -> (B*D, H, W, 3C) -> ONE conv2d (3,3,3C,Co)
  v2d_one  : a single conv2d (B*D,H,W,C) -> lower bound for the 2d emitter

Chained iterations (x = f(x)) defeat the relay result cache (CLAUDE.md).

    python -m diffuvolume_tpu.tools.bench_conv3d_forms [--f32]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
from jax import lax


def conv3d(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv2d(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3d_as_2d_sum(x, k):
    """out[d] = sum_dz conv2d(x[d+dz-1], k[dz])."""
    b, d, h, w, c = x.shape
    x2 = x.reshape(b * d, h, w, c)
    ys = [conv2d(x2, k[dz]).reshape(b, d, h, w, -1) for dz in range(3)]
    out = ys[1]
    out = out.at[:, 1:].add(ys[0][:, :-1])
    out = out.at[:, :-1].add(ys[2][:, 1:])
    return out


def conv3d_as_2d_pack(x, k):
    """Manual D-axis im2col: concat the 3 D-shifted planes into channels,
    then one conv2d with a (3, 3, 3C, Co) kernel."""
    b, d, h, w, c = x.shape
    z = jnp.zeros((b, 1, h, w, c), x.dtype)
    xm = jnp.concatenate([z, x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], z], axis=1)
    xc = jnp.concatenate([xm, x, xp], axis=-1).reshape(b * d, h, w, 3 * c)
    kc = jnp.concatenate([k[0], k[1], k[2]], axis=2)  # (3,3,3C,Co)
    return conv2d(xc, kc).reshape(b, d, h, w, -1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--f32", action="store_true")
    p.add_argument("--shape", default="1,48,128,240,32")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    dt = jnp.float32 if args.f32 else jnp.bfloat16
    b, d, h, w, c = map(int, args.shape.split(","))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, d, h, w, c), dt) * 0.1
    k = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 3, c, c), dt) * 0.05

    def chain(f):
        @jax.jit
        def run(x, k):
            def body(xc, _):
                y = f(xc, k)
                return jnp.tanh(y), ()
            y, _ = lax.scan(body, x, (), length=args.iters)
            return y
        return run

    flops = 2 * 27 * c * c * b * d * h * w
    variants = {
        "v3d": chain(conv3d),
        "v2d_sum": chain(conv3d_as_2d_sum),
        "v2d_pack": chain(conv3d_as_2d_pack),
    }

    # correctness cross-check (single apply, f32 on this backend)
    y0 = conv3d(x.astype(jnp.float32), k.astype(jnp.float32))
    for name, fn in [("v2d_sum", conv3d_as_2d_sum), ("v2d_pack", conv3d_as_2d_pack)]:
        y1 = fn(x.astype(jnp.float32), k.astype(jnp.float32))
        err = float(jnp.max(jnp.abs(y1 - y0)))
        print(f"{name} max|err| vs conv3d: {err:.2e}", flush=True)

    for name, run in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(run(x, k))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x, k))
            best = min(best, time.perf_counter() - t0)
        per = best / args.iters
        print(f"{name}: {per*1e3:.3f} ms/conv  ({flops/per/1e12:.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
