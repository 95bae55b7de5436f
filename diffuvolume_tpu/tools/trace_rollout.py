"""Trace ONLY the IGEV GRU rollout scan (synthetic encoder outputs).

The full two-model inference program compiles for >25 min through the relay;
the rollout scan is where ~90% of the per-pair time goes (96 GRU iterations),
so profile it in isolation: feed randomly-initialized tensors with the exact
encoder output shapes and jit igev_rollout alone.  Compile is minutes, and the
device-plane trace gives the true in-scan per-op costs (standalone component
jits mostly measure dispatch — CLAUDE.md perf notes).

    python -m diffuvolume_tpu.tools.trace_rollout [--iters 32] [--outdir /tmp/rollout_trace]
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
    p.add_argument("--outdir", default="/tmp/rollout_trace")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--no_noise", action="store_true", help="baseline (non-DDIM) rollout")
    p.add_argument("--corr_mode", default=None, choices=["volume", "band", "rsamp"])
    args = p.parse_args(argv)

    from diffuvolume_tpu.models.igev.geometry import build_geo_pyramid
    from diffuvolume_tpu.models.igev.model import IGEVStereo, igev_rollout

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    diffusion = not args.no_noise
    model = IGEVStereo(max_disp=192, diffusion=diffusion, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    variables = init_on_cpu(model.init, rng, xs, xs, train=True)

    b, h, w = 1, args.height, args.width
    h4, w4 = h // 4, w // 4
    d = model.max_disp // 4

    def rnd(i, shape, dt=dtype):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt) * 0.1

    enc = {
        "match_l": rnd(1, (b, h4, w4, 96)),
        "match_r": rnd(2, (b, h4, w4, 96)),
        "gev": rnd(3, (b, d, h4, w4, 8)),
        "init_disp": jnp.abs(rnd(4, (b, h4, w4), jnp.float32)) * 20.0,
        "net_list": [jnp.tanh(rnd(5 + i, (b, h4 // 2**i, w4 // 2**i, 128)))
                     for i in range(3)],
        "inp_list": [tuple(rnd(10 + 3 * i + j, (b, h4 // 2**i, w4 // 2**i, 128))
                           for j in range(3)) for i in range(3)],
        "stem_2x": rnd(20, (b, h // 2, w // 2, 32)),
    }
    noisy = None if args.no_noise else jnp.abs(rnd(21, (b, d, h4, w4), jnp.float32))
    t = None if args.no_noise else jnp.zeros((b,), jnp.int32)

    @jax.jit
    def run(enc, noisy, t):
        pyramid = build_geo_pyramid(enc["match_l"], enc["match_r"], enc["gev"],
                                    num_levels=model.corr_levels,
                                    corr_mode=args.corr_mode)
        return igev_rollout(model, variables, enc, pyramid, args.iters,
                            noisy=noisy, t=t, test_mode=True)

    t0 = time.perf_counter()
    jax.block_until_ready(run(enc, noisy, t))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    for rep in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(run(enc, noisy, t))
        print(f"steady: {time.perf_counter() - t0 :.4f}s "
              f"({(time.perf_counter() - t0) / args.iters * 1e3:.3f} ms/iter "
              f"incl dispatch)", flush=True)
        # Vary an input so the relay result-cache can't serve the repeat.
        enc["init_disp"] = enc["init_disp"] + 0.01

    with jax.profiler.trace(args.outdir):
        jax.block_until_ready(run(enc, noisy, t))
    print(f"trace written to {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
