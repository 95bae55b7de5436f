"""End-of-round benchmark: DiffuVolume DDIM inference throughput on real TPU.

Measures the reference's headline configuration — SceneFlow ACVNet-backbone
two-pass DDIM-5 ensemble inference at 512×960 (BASELINE.md: 1.11 s/pair on the
reference GPU ⇒ 0.90 pairs/s baseline) — and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_PAIRS_PER_S = 1.0 / 1.11  # reference SceneFlow DDIM runtime (README.md:108)
H, W = 512, 960


def main():
    from diffuvolume_tpu.diffusion import DDIMConfig
    from diffuvolume_tpu.eval.pipeline import acv_ddim_inference
    from diffuvolume_tpu.models.acv import ACVNet

    # Production inference policy: bf16 conv path (MXU native), f32 heads /
    # diffusion algebra.  Set DIFFU_BENCH_F32=1 for an all-f32 run.
    dtype = jnp.float32 if os.environ.get("DIFFU_BENCH_F32") else jnp.bfloat16

    rng = jax.random.PRNGKey(0)
    baseline_model = ACVNet(max_disp=192, diffusion=False, dtype=dtype)
    ddim_model = ACVNet(max_disp=192, diffusion=True, dtype=dtype)

    # Init at a small spatial size (params are shape-independent), run at full.
    # Params are built on host CPU (eager init through the TPU relay costs
    # minutes of per-op remote compiles) and transferred once.
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    left_s = jnp.zeros((1, 64, 128, 3))
    baseline_vars = init_on_cpu(baseline_model.init, rng, left_s, left_s, train=False)
    disp_q = jnp.zeros((1, 16, 32))
    t = jnp.zeros((1,), jnp.int32)
    noise = jnp.zeros((1, 48, 16, 32))
    ddim_vars = init_on_cpu(
        ddim_model.init, rng, left_s, left_s, disp_q, t, noise, train=True
    )

    left = jax.random.normal(rng, (1, H, W, 3))
    right = jax.random.normal(jax.random.fold_in(rng, 1), (1, H, W, 3))
    cfg = DDIMConfig()

    def run(key):
        final, _ = acv_ddim_inference(
            baseline_model, ddim_model, baseline_vars, ddim_vars, left, right, key, cfg
        )
        return final

    # Warmup / compile.  Host-fetched scalar (not block_until_ready): on
    # relay-backed arrays block_until_ready can return BEFORE execution
    # completes — only a host fetch proves the work is done (CLAUDE.md
    # "RELAY GOTCHA"; same fix as tools/bench_conv3d_pallas.py).
    out = run(rng)
    float(jnp.sum(out.astype(jnp.float32)))

    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        out = run(jax.random.fold_in(rng, i))
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n

    pairs_per_s = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "sceneflow_ddim5_pairs_per_s_512x960",
                "value": round(pairs_per_s, 4),
                "unit": "pairs/s/chip",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
