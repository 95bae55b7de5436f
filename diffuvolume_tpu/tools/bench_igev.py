"""KITTI15 headline benchmark: IGEV-backbone DiffuVolume DDIM-2 inference.

Reference configuration (KITTI15/evaluate_stereo.py:71-130): frozen IGEV pass
at 32 GRU iterations + DDIM-2 refinement, KITTI-padded 384×1248 input,
0.18 s/pair on the leaderboard GPU (README.md:98).

    python -m diffuvolume_tpu.tools.bench_igev [--iters 32] [--height 384]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

REF_PAIRS_PER_S = 1.0 / 0.18  # README.md:98


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=1248)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--reps", type=int, default=5)
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
        final, _ = igev_ddim_inference(
            bm, dm, bv, dv, left, right, key, iters=args.iters
        )
        return final

    # Host-fetched scalar, NOT block_until_ready: on relay-backed arrays
    # block_until_ready can return before execution completes (CLAUDE.md
    # "RELAY GOTCHA").
    t0 = time.perf_counter()
    out = run(rng)
    float(jnp.sum(out.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(args.reps):
        out = run(jax.random.fold_in(rng, i))
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / args.reps
    pairs = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"kitti15_igev_ddim2_pairs_per_s_{h}x{w}_iters{args.iters}",
                "value": round(pairs, 4),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs / REF_PAIRS_PER_S, 3),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
