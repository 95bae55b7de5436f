"""Trace the ACV DDIM denoise scan (synthetic volume inputs).

The flagship bench's DDIM-5 scan is ~60% of the per-pair runtime; this tool
jits ONLY the scan (ddim_sample over ACVNet.denoise with a synthetic
ac_volume) — the encode/volume-build stages are excluded so the compile stays
minutes and the device-plane trace attributes per-op cost inside the scan body
(aggregation conv3ds, attention, relayouts).

    python -m diffuvolume_tpu.tools.trace_acv [--steps 5] [--outdir /tmp/acv_trace]

Parse with tools/parse_trace.py; divide durations by --steps for per-denoise
cost.
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
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--outdir", default="/tmp/acv_trace")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--denoise_only", action="store_true",
                   help="trace ONE unrolled denoise call instead of the scan")
    args = p.parse_args(argv)

    from diffuvolume_tpu.diffusion import DDIMConfig, ddim_sample, make_schedule
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = ACVNet(max_disp=192, diffusion=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    variables = init_on_cpu(
        model.init, rng, xs, xs, jnp.zeros((1, 16, 32)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 32)), train=True,
    )

    b, h, w = 1, args.height, args.width
    h4, w4 = h // 4, w // 4
    d = model.max_disp // 4
    cfg = DDIMConfig(sampling_steps=args.steps)
    sched = make_schedule(1000)

    def rnd(i, shape, dt=dtype):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt) * 0.1

    ac_volume = rnd(1, (b, d, h4, w4, 64))
    baseline_disp = jnp.abs(rnd(2, (b, h, w), jnp.float32)) * 60.0
    baseline_latent = encode_disparity_volume(
        jnp.abs(rnd(3, (b, h4, w4), jnp.float32)) * 15.0, cfg.num_bins, cfg.scale
    )

    import os

    use_fast = os.environ.get("DIFFU_ACV_PACKED", "0") == "1"
    if use_fast:
        from diffuvolume_tpu.models.acv import acv_denoise_fast

    def _denoise(vol, latent, t):
        # NOTE: takes the volume as an explicit operand — a closure capture
        # would shadow the jitted arg and silently pin the FIRST value as a
        # constant (the vary-the-input relay-cache defeat would be a no-op).
        if use_fast:
            return acv_denoise_fast(model, variables, vol, latent, t, (h, w))
        return model.apply(
            variables, vol, latent, t, (h, w), method=ACVNet.denoise
        )

    if args.denoise_only:
        @jax.jit
        def run(vol, latent, t):
            # honors DIFFU_ACV_PACKED here too (not only in the scan path)
            return _denoise(vol, latent, t)

        fn_args = lambda: (ac_volume, baseline_latent, jnp.zeros((b,), jnp.int32))
        denom = 1
    else:
        @jax.jit
        def run(vol, baseline_disp, baseline_latent, key):
            def denoise_fn(latent, t):
                return _denoise(vol, latent, t)

            final, _ = ddim_sample(
                sched, cfg, denoise_fn, baseline_disp, baseline_latent, key
            )
            return final

        fn_args = lambda: (ac_volume, baseline_disp, baseline_latent,
                           jax.random.PRNGKey(7))
        denom = args.steps

    t0 = time.perf_counter()
    jax.block_until_ready(run(*fn_args()))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    for rep in range(2):
        # Vary an input so the relay result-cache can't serve the repeat.
        ac_volume = ac_volume + rnd(10 + rep, ac_volume.shape) * 1e-3
        t0 = time.perf_counter()
        jax.block_until_ready(run(*fn_args()))
        dt_s = time.perf_counter() - t0
        print(f"steady: {dt_s:.4f}s ({dt_s / denom * 1e3:.2f} ms/denoise incl "
              "dispatch)", flush=True)

    ac_volume = ac_volume + rnd(20, ac_volume.shape) * 1e-3
    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(run(*fn_args()))
    print(f"trace written to {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
