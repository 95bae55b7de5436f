"""Trace ONLY the IGEV static encoder (features, GEV, init disp, cnet).

The rollout scan is near its measured per-iteration floor (~1.45 ms × 96);
the remaining headroom to the 5.6 pairs/s reference bar lives in the two
encode passes (~60 ms of the 208 ms pair).  This traces igev_encode alone at
the KITTI shape for per-op attribution (entry convs, cnet, MobileNet trunk,
GEV hourglass, volume build).

    python -m diffuvolume_tpu.tools.trace_encode [--outdir /tmp/encode_trace]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--outdir", default="/tmp/encode_trace")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--corr_mode", default="band")
    args = p.parse_args(argv)

    from diffuvolume_tpu.models.igev.model import IGEVStereo, igev_encode
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = IGEVStereo(max_disp=192, diffusion=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    variables = init_on_cpu(model.init, rng, xs, xs, train=True)

    b, h, w = 1, args.height, args.width

    @jax.jit
    def run(left, right):
        enc, pyramid = igev_encode(model, variables, left, right, train=False,
                                   corr_mode=args.corr_mode)
        # Touch every output so nothing is DCE'd.
        leaves = jax.tree_util.tree_leaves((enc, pyramid))
        return [x.sum() for x in leaves if hasattr(x, "sum")]

    def inputs(i):
        k = jax.random.fold_in(rng, i)
        left = jax.random.uniform(k, (b, h, w, 3), jnp.float32, 0, 255)
        right = jnp.roll(left, -8, axis=2)
        return left, right

    def fetch(outs):
        # Host fetch, not block_until_ready (relay early-return gotcha).
        return sum(float(x) for x in outs)

    t0 = time.perf_counter()
    fetch(run(*inputs(0)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for i in range(1, 3):
        t0 = time.perf_counter()
        fetch(run(*inputs(i)))
        print(f"steady: {(time.perf_counter() - t0) * 1e3:.2f} ms/encode "
              "(incl dispatch)", flush=True)
    with jax.profiler.trace(args.outdir):
        fetch(run(*inputs(3)))
    print(f"trace written to {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
