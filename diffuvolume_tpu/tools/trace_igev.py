"""Capture a jax.profiler device trace of the KITTI15 IGEV DDIM-2 inference.

The axon relay forwards device-plane XLA op events (verified), so this gives
the in-scan per-op cost breakdown that wall-clock component timing cannot
(CLAUDE.md perf notes: standalone component jits mostly measure dispatch).

    python -m diffuvolume_tpu.tools.trace_igev [--iters 32] [--outdir /tmp/igev_trace]

Then parse with tools/parse_trace.py.
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
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--outdir", default="/tmp/igev_trace")
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)

    from diffuvolume_tpu.eval.pipeline import igev_ddim_inference
    from diffuvolume_tpu.models.igev.model import IGEVStereo

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    bm = IGEVStereo(max_disp=192, diffusion=False, dtype=dtype)
    dm = IGEVStereo(max_disp=192, diffusion=True, dtype=dtype)
    xs = jnp.zeros((1, 64, 128, 3))
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    bv = init_on_cpu(bm.init, rng, xs, xs, train=True)
    dv = init_on_cpu(dm.init, rng, xs, xs, train=True)

    h, w = args.height, args.width
    left = jax.random.uniform(rng, (1, h, w, 3), maxval=255.0)
    right = jax.random.uniform(jax.random.fold_in(rng, 1), (1, h, w, 3), maxval=255.0)

    def run(key):
        final, _ = igev_ddim_inference(bm, dm, bv, dv, left, right, key, iters=args.iters)
        return final

    t0 = time.perf_counter()
    jax.block_until_ready(run(rng))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    jax.block_until_ready(run(jax.random.fold_in(rng, 7)))
    print(f"steady run: {time.perf_counter() - t0:.3f}s", flush=True)

    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(run(jax.random.fold_in(rng, 13)))
    print(f"trace written to {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
