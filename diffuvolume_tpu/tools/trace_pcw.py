"""Trace the PCW DDIM denoise scan (synthetic volume inputs).

The KITTI12 PCW pipeline's DDIM-3 scan re-runs per step: the three Mish
hourglasses (dres2/3/4) over the 32-ch combine volume, the classif3 head,
the fused softargmin head, and the FULL-RESOLUTION warp-correlation
refinement net (RefineNetV3 — 128-ch full-res convs).  This tool jits ONLY
that scan (ddim_sample over PCWNet.denoise with a synthetic combine volume
and refine features) so the compile stays minutes and the device plane
attributes per-op cost inside the scan body.

    python -m diffuvolume_tpu.tools.trace_pcw [--steps 3] [--outdir /tmp/pcw_trace]

Parse with tools/parse_trace.py; divide durations by --steps for per-denoise
cost.  Reference: KITTI12/models/pwcnet_ddim.py:467-530 (denoise body),
530-602 (sampler loop).
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
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--outdir", default="/tmp/pcw_trace")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--denoise_only", action="store_true",
                   help="trace ONE unrolled denoise call instead of the scan")
    args = p.parse_args(argv)

    from diffuvolume_tpu.diffusion import ddim_sample, make_schedule
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
    from diffuvolume_tpu.diffusion.ddim import KITTI12_DDIM
    from diffuvolume_tpu.models.pcw import PCWNet
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = PCWNet(max_disp=192, diffusion=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    variables = init_on_cpu(
        model.init, rng, xs, xs, jnp.zeros((1, 16, 32)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 32)), train=True,
    )

    b, h, w = 1, args.height, args.width
    h4, w4 = h // 4, w // 4
    d = model.max_disp // 4
    cfg = KITTI12_DDIM
    if args.steps != cfg.sampling_steps:
        import dataclasses

        cfg = dataclasses.replace(cfg, sampling_steps=args.steps)
    sched = make_schedule(1000)

    def rnd(i, shape, dt=dtype):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt) * 0.1

    combine = rnd(1, (b, d, h4, w4, 32))
    # denoise/refine touch only the "refine" feature (models/pcw.py:309-321).
    fl = {"refine": rnd(4, (b, h4, w4, 32))}
    fr = {"refine": rnd(5, (b, h4, w4, 32))}
    baseline_disp = jnp.abs(rnd(2, (b, h, w), jnp.float32)) * 60.0
    baseline_latent = encode_disparity_volume(
        jnp.abs(rnd(3, (b, h4, w4), jnp.float32)) * 15.0, cfg.num_bins, cfg.scale
    )

    import os

    use_fast = os.environ.get("DIFFU_PCW_PACKED", "0") == "1"
    if use_fast:
        from diffuvolume_tpu.models.pcw import pcw_denoise_fast

    def _denoise(vs, vol, fl_, fr_, latent, t):
        # EVERY concrete array is an explicit jit arg.  Closure-captured
        # fl/fr were baked in as constants and XLA constant-folded the
        # full-res upsampled refine feature through the 49 shifted slices
        # of the signed-correlation volume — a 3.1 GB HLO module vs the
        # relay's 2 GiB proto limit (r4).
        if use_fast:
            return pcw_denoise_fast(model, vs, vol, fl_, fr_, latent, t,
                                    (h, w))
        return model.apply(
            vs, vol, fl_, fr_, latent, t, (h, w), method=PCWNet.denoise,
        )

    if args.denoise_only:
        @jax.jit
        def run(vs, vol, fl_, fr_, latent, t):
            return _denoise(vs, vol, fl_, fr_, latent, t)

        fn_args = lambda: (variables, combine, fl, fr, baseline_latent,
                           jnp.zeros((b,), jnp.int32))
        denom = 1
    else:
        @jax.jit
        def run(vs, vol, fl_, fr_, baseline_disp, baseline_latent, key):
            final, _ = ddim_sample(
                sched, cfg,
                lambda latent, t: _denoise(vs, vol, fl_, fr_, latent, t),
                baseline_disp, baseline_latent, key,
            )
            return final

        fn_args = lambda: (variables, combine, fl, fr, baseline_disp,
                           baseline_latent, jax.random.PRNGKey(7))
        denom = args.steps

    t0 = time.perf_counter()
    out = run(*fn_args())
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    for rep in range(2):
        # Vary an input so the relay result-cache can't serve the repeat.
        combine = combine + rnd(10 + rep, combine.shape) * 1e-3
        t0 = time.perf_counter()
        out = run(*fn_args())
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        dt_s = time.perf_counter() - t0
        print(f"steady: {dt_s:.4f}s ({dt_s / denom * 1e3:.2f} ms/denoise incl "
              "dispatch)", flush=True)

    combine = combine + rnd(20, combine.shape) * 1e-3
    with jax.profiler.trace(args.outdir):
        out = run(*fn_args())
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"trace written to {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
