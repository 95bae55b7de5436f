"""Device A/B for the all-Pallas packed ACV denoise (acv_denoise_fast).

Round-3 proved the packed path equal to the module path in CPU interpret
mode only; this tool retires the device risk: it compiles BOTH paths on the
real TPU at the full bench shape (512×960, bf16 by default), asserts
numeric agreement, and reports per-call steady-state timings (host-fetched
scalars — relay-safe).

    python -m diffuvolume_tpu.tools.ab_acv_packed [--height 512] [--width 960]

Tolerance: both paths run the same bf16 conv arithmetic but differ in
accumulation geometry (packed lanes vs XLA im2col) and in BN application
(packed folds BN into the conv weights in f32; the module path normalizes
post-conv).  At RANDOM weights the 192-bin softargmin amplifies bf16 conv
noise heavily (the r3 loop-parity analysis measured ±3 px flips from pure
conv fp noise at random init) — measured r4: disp mean|Δ| 0.20 px,
p99 1.09, noise branch bitwise 0.  The assert bounds sit just above that
measured bf16 floor; trained weights give peaked probabilities and far
tighter agreement.  Exact equivalence is pinned by the f32 interpret test
(tests/test_pallas_conv3d.py::test_acv_denoise_fast_matches_module).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)

    from diffuvolume_tpu.models.acv import ACVNet, acv_denoise_fast
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

    def rnd(i, shape, dt=dtype):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt) * 0.5

    ac_volume = rnd(1, (b, d, h4, w4, 64))
    latent = rnd(2, (b, d, h4, w4), jnp.float32)
    t = jnp.full((b,), 300, jnp.int32)

    @jax.jit
    def run_module(vol, latent, t):
        return model.apply(variables, vol, latent, t, (h, w),
                           method=ACVNet.denoise)

    @jax.jit
    def run_packed(vol, latent, t):
        return acv_denoise_fast(model, variables, vol, latent, t, (h, w))

    def timed(name, fn, vol):
        t0 = time.perf_counter()
        out = fn(vol, latent, t)
        s = float(jnp.sum(out[0].astype(jnp.float32)))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s "
              f"(sum {s:.1f})", flush=True)
        times = []
        v = vol
        for i in range(args.reps):
            # Vary the input so the relay result-cache can't serve repeats.
            v = v + rnd(50 + i, v.shape) * 1e-3
            t0 = time.perf_counter()
            out = fn(v, latent, t)
            float(jnp.sum(out[0].astype(jnp.float32)))
            times.append(time.perf_counter() - t0)
        best = min(times) * 1e3
        print(f"{name}: steady {best:.2f} ms/denoise (best of {args.reps}; "
              "incl dispatch)", flush=True)
        return fn(vol, latent, t), best

    (got_m, ms_m) = timed("module", run_module, ac_volume)
    (got_p, ms_p) = timed("packed", run_packed, ac_volume)

    labels = ("disp", "unc", "noise")
    ok = True
    for name, a, bb in zip(labels, got_p, got_m):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        ad = np.abs(a - bb)
        mean, p99, mx = float(ad.mean()), float(np.percentile(ad, 99)), float(ad.max())
        print(f"A/B {name}: mean|Δ| {mean:.4g}  p99 {p99:.4g}  max {mx:.4g}",
              flush=True)
        if name == "disp":
            ok &= mean < 0.5 and p99 < 2.5
        elif name == "unc":
            ok &= mean < 0.5
        else:
            ok &= mx < 1e-3
    print(f"packed {ms_p:.2f} ms vs module {ms_m:.2f} ms  "
          f"({ms_m / max(ms_p, 1e-9):.2f}x)  parity={'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
