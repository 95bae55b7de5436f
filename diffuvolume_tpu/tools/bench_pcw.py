"""KITTI12 benchmark: PCWNet-backbone DiffuVolume DDIM-3 two-pass inference.

Reference configuration (KITTI12/test.py:59-110): frozen PCWNet (gwcnet-gc)
pass + DDIM-3 refinement with warp refinement, KITTI-padded 384×1248 input.
The reference publishes no KITTI12 runtime; the closest published row is
GwcNet's KITTI15 leaderboard 0.32 s/pair (README.md:101), used as
``vs_baseline`` context only (PCWNet is the heavier multi-scale variant).

Measured v5e bf16: 2.04 pairs/s/chip (2026-08-20).

    python -m diffuvolume_tpu.tools.bench_pcw [--height 384] [--width 1248]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

GWCNET_PAIRS_PER_S = 1.0 / 0.32  # README.md:101 (context, not the same config)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)

    from diffuvolume_tpu.eval.pipeline import pcw_ddim_inference
    from diffuvolume_tpu.models.pcw import PCWNet
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    bm = PCWNet(max_disp=192, diffusion=False, dtype=dtype)
    dm = PCWNet(max_disp=192, diffusion=True, dtype=dtype)
    xs = jnp.zeros((1, 64, 128, 3))
    bv = init_on_cpu(bm.init, rng, xs, xs, train=False)
    dq = jnp.zeros((1, 16, 32))
    t = jnp.zeros((1,), jnp.int32)
    nz = jnp.zeros((1, 48, 16, 32))
    dv = init_on_cpu(dm.init, rng, xs, xs, dq, t, nz, train=True)

    h, w = args.height, args.width
    left = jax.random.normal(rng, (1, h, w, 3))
    right = jax.random.normal(jax.random.fold_in(rng, 1), (1, h, w, 3))

    # Host-fetched scalar, NOT block_until_ready: on relay-backed arrays
    # block_until_ready can return before execution completes (CLAUDE.md
    # "RELAY GOTCHA").
    t0 = time.perf_counter()
    final, _ = pcw_ddim_inference(bm, dm, bv, dv, left, right, rng)
    float(jnp.sum(final.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(args.reps):
        final, _ = pcw_ddim_inference(
            bm, dm, bv, dv, left, right, jax.random.fold_in(rng, i)
        )
    float(jnp.sum(final.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.reps
    pairs = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"kitti12_pcw_ddim3_pairs_per_s_{h}x{w}",
                "value": round(pairs, 4),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs / GWCNET_PAIRS_PER_S, 3),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
