"""Trace the flagship's pass-1/prep stage (baseline forward + volume build).

The r4 verdict: at 3.43 pairs/s the pair costs ~291 ms, the packed DDIM scan
is 5 × ~32 = 160 ms, leaving ~130 ms in the prep (eval/pipeline.py::prep) —
the frozen ACVNet baseline forward + the DDIM model's attention-weighted
concat-volume build — all unpacked XLA.  This tool jits EXACTLY the prep
computation with both models' variables and writes a device trace so the
~130 ms can be bucketed per op before packing it.

    python -m diffuvolume_tpu.tools.trace_prep [--outdir /tmp/prep_trace]

Parse with tools/parse_trace.py [--by_source].
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--outdir", default="/tmp/prep_trace")
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)

    from diffuvolume_tpu.diffusion import DDIMConfig
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.ops.regression import resize_bilinear
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    baseline_model = ACVNet(max_disp=192, diffusion=False, dtype=dtype)
    ddim_model = ACVNet(max_disp=192, diffusion=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    baseline_vars = init_on_cpu(
        baseline_model.init, rng, xs, xs, train=False)
    ddim_vars = init_on_cpu(
        ddim_model.init, rng, xs, xs, jnp.zeros((1, 16, 32)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 32)), train=True,
    )

    b, h, w = 1, args.height, args.width
    cfg = DDIMConfig()

    # Mirror eval/pipeline.py::_stages.prep verbatim (incl. the packed
    # dispatch read from the env, so DIFFU_ACV_PREP_PACKED A/Bs here too).
    from diffuvolume_tpu.eval.pipeline import _acv_prep_fn

    prep = jax.jit(_acv_prep_fn(baseline_model, ddim_model, cfg))

    def rnd(i, shape, dt=jnp.float32):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt)

    left = rnd(1, (b, h, w, 3))
    right = rnd(2, (b, h, w, 3))

    t0 = time.perf_counter()
    out = prep(baseline_vars, ddim_vars, left, right)
    float(jnp.sum(out[0].astype(jnp.float32)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    for rep in range(2):
        left = left + rnd(10 + rep, left.shape) * 1e-3
        t0 = time.perf_counter()
        out = prep(baseline_vars, ddim_vars, left, right)
        float(jnp.sum(out[0].astype(jnp.float32)))
        dt_s = time.perf_counter() - t0
        print(f"steady: {dt_s * 1e3:.2f} ms incl dispatch", flush=True)

    left = left + rnd(20, left.shape) * 1e-3
    with jax.profiler.trace(args.outdir):
        out = prep(baseline_vars, ddim_vars, left, right)
        float(jnp.sum(out[0].astype(jnp.float32)))
    print(f"trace written to {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
