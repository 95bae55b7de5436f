"""Per-stage profile of the ACV DiffuVolume inference pipeline.

Reference-era profiling was wall-clock `time.time()` around whole iterations
(SURVEY.md §5).  This tool times each pipeline stage separately on the current
backend and reports speed-of-light ratios against the chip peaks:

    python -m diffuvolume_tpu.tools.profile_pipeline --height 512 --width 960

Stages: frozen-baseline pass, cost-volume build, one denoise (aggregation)
step, and the full DDIM-5 scan.  Inputs are perturbed per iteration and all
iterations are dispatched before blocking — both required for honest numbers
on remote-execution backends (identical executions may be served from a
cache; per-call blocking adds fixed relay latency).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _timeit(fn, make_args, n):
    out = fn(*make_args(n))  # warmup with an index outside 0..n-1
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*make_args(i)) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def profile(h: int, w: int, max_disp: int = 192, iters: int = 10,
            dtype=jnp.bfloat16) -> dict:
    from diffuvolume_tpu.diffusion import DDIMConfig, make_schedule
    from diffuvolume_tpu.diffusion.codec import encode_disparity_volume
    from diffuvolume_tpu.diffusion.ddim import ddim_sample
    from diffuvolume_tpu.models.acv import ACVNet
    from diffuvolume_tpu.ops.regression import resize_bilinear

    rng = jax.random.PRNGKey(0)
    bm = ACVNet(max_disp=max_disp, diffusion=False, dtype=dtype)
    dm = ACVNet(max_disp=max_disp, diffusion=True, dtype=dtype)
    xs = jnp.zeros((1, 64, 128, 3))
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    bv = init_on_cpu(bm.init, rng, xs, xs, train=False)
    dv = init_on_cpu(
        dm.init, rng, xs, xs, jnp.zeros((1, 16, 32)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, max_disp // 4, 16, 32)), train=True,
    )
    left = jax.random.normal(rng, (1, h, w, 3))
    right = jax.random.normal(jax.random.fold_in(rng, 1), (1, h, w, 3))
    cfg = DDIMConfig(max_disp=max_disp, num_bins=max_disp // 4)
    sched = make_schedule(1000)

    @jax.jit
    def baseline_pass(l, r):
        return bm.apply(bv, l, r, train=False)[-1]

    @jax.jit
    def build_volume(l, r):
        return dm.apply(dv, l, r, train=False, method=ACVNet.build_cost_volume)[0]

    @jax.jit
    def one_denoise(vol, latent, t):
        return dm.apply(dv, vol, latent, t, (h, w), method=ACVNet.denoise)

    @jax.jit
    def full_ddim(vol, disp, latent, key):
        def fn(lat, t):
            return dm.apply(dv, vol, lat, t, (h, w), method=ACVNet.denoise)

        return ddim_sample(sched, cfg, fn, disp, latent, key)[0]

    disp = baseline_pass(left, right)
    vol = build_volume(left, right)
    disp_q = resize_bilinear(
        jnp.clip(disp, 0.0, max_disp - 1.0), (h // 4, w // 4), 1, 2
    ) / 4.0
    latent = encode_disparity_volume(disp_q, max_disp // 4, 1.0)
    t0 = jnp.zeros((1,), jnp.int32)

    def vary(x, i):
        return x + jnp.asarray(i * 1e-6, x.dtype)

    return {
        "baseline_pass_ms": round(
            _timeit(baseline_pass, lambda i: (vary(left, i), right), iters), 2
        ),
        "build_volume_ms": round(
            _timeit(build_volume, lambda i: (vary(left, i), right), iters), 2
        ),
        "one_denoise_ms": round(
            _timeit(one_denoise, lambda i: (vary(vol, i), latent, t0), iters), 2
        ),
        "full_ddim_ms": round(
            _timeit(
                full_ddim,
                lambda i: (vol, disp, latent, jax.random.fold_in(jax.random.PRNGKey(1), i)),
                iters,
            ),
            2,
        ),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description="DiffuVolume pipeline stage profile")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)
    out = profile(
        args.height, args.width, args.maxdisp, args.iters,
        jnp.float32 if args.f32 else jnp.bfloat16,
    )
    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out))


if __name__ == "__main__":
    main()
