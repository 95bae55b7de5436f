"""Device A/B for the packed fast paths: IGEV, PCW, and the ACV prep.

Extends the ab_acv_packed pattern (r4) to the remaining default-ON packed
paths, per the r4 verdict: their device numerics previously rested on CPU
interpret parity only, and the r4 ACV experience showed interpret mode can
hide device-only Mosaic bugs.  Compiles BOTH paths on the real TPU at bench
shape, asserts bf16 agreement above the measured softargmin noise floor, and
reports steady-state timings (host-fetched scalars — relay-safe).

    python -m diffuvolume_tpu.tools.ab_packed --backbone {igev,pcw,acv_prep}

Tolerances follow tools/ab_acv_packed.py: random weights + bf16 softargmin
give a measured ±px-level noise floor on a few percent of pixels; trained
weights agree far tighter.  Exact equivalence is pinned by the f32 interpret
tests (tests/test_gev_packed.py, test_pcw_model.py, test_pallas_conv3d.py).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(name, fn, args_fn, reps, perturb):
    t0 = time.perf_counter()
    out = fn(*args_fn())
    s = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s (sum {s:.1f})",
          flush=True)
    times = []
    for i in range(reps):
        perturb(i)  # vary inputs: the relay caches identical executions
        t0 = time.perf_counter()
        out = fn(*args_fn())
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    best = min(times) * 1e3
    print(f"{name}: steady {best:.2f} ms (best of {reps}; incl dispatch)",
          flush=True)
    return fn(*args_fn()), best


def _report(labels, got_p, got_m, bounds):
    ok = True
    for name, a, b in zip(labels, got_p, got_m):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        ad = np.abs(a - b)
        mean, p99, mx = float(ad.mean()), float(np.percentile(ad, 99)), float(ad.max())
        print(f"A/B {name}: mean|Δ| {mean:.4g}  p99 {p99:.4g}  max {mx:.4g}",
              flush=True)
        bm, bp = bounds.get(name, (None, None))
        if bm is not None:
            ok &= mean < bm
        if bp is not None:
            ok &= p99 < bp
    return ok


def ab_igev(args):
    """Full igev_forward(test_mode) with the packed GEV tower on vs off.

    The packed path is the encode tower (models/igev/gev_packed.py, r4
    default-ON); iters GRU rollouts amplify encode deltas, so the final
    disparity A/B bounds the whole-path device numerics.
    """
    from diffuvolume_tpu.models.igev.model import IGEVStereo, igev_forward
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = IGEVStereo(max_disp=192, diffusion=False, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    variables = init_on_cpu(model.init, rng, xs, xs, train=True)

    b, h, w = 1, args.height, args.width

    def rnd(i, shape, dt=jnp.float32):
        # IGEV consumes RAW [0,255] images.
        return jax.random.uniform(jax.random.fold_in(rng, i), shape, dt,
                                  maxval=255.0)

    left = rnd(1, (b, h, w, 3))
    right = rnd(2, (b, h, w, 3))
    state = {"left": left, "right": right}

    def make(packed):
        @jax.jit
        def run(l, r):
            return igev_forward(model, variables, l, r, iters=args.iters,
                                test_mode=True)

        return run

    os.environ["DIFFU_IGEV_PACKED"] = "0"
    run_m = make(False)
    got_m, ms_m = _timed("module", run_m,
                         lambda: (state["left"], state["right"]), args.reps,
                         lambda i: state.update(
                             left=state["left"] + rnd(50 + i, left.shape) * 1e-3))
    os.environ["DIFFU_IGEV_PACKED"] = "1"
    run_p = make(True)
    got_p, ms_p = _timed("packed", run_p,
                         lambda: (state["left"], state["right"]), args.reps,
                         lambda i: state.update(
                             left=state["left"] + rnd(70 + i, left.shape) * 1e-3))
    # Bounds looser than the single-call ACV A/B: --iters GRU iterations
    # iterate on the encode delta (bf16 noise compounds per iteration at
    # random weights; measured r5 at 16 iters: mean 0.60, p99 2.01).
    ok = _report(("disp",), (got_p,), (got_m,), {"disp": (1.0, 3.0)})
    print(f"packed {ms_p:.2f} ms vs module {ms_m:.2f} ms  "
          f"({ms_m / max(ms_p, 1e-9):.2f}x)  parity={'OK' if ok else 'FAIL'}",
          flush=True)
    return ok


def ab_pcw(args):
    """pcw_denoise_fast vs PCWNet.denoise at bench shape (one shared
    build_cost_volume feeds both)."""
    from diffuvolume_tpu.models.pcw import PCWNet, pcw_denoise_fast
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = PCWNet(diffusion=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    variables = init_on_cpu(
        model.init, rng, xs, xs, jnp.zeros((1, 16, 32)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 32)), train=True,
    )

    b, h, w = 1, args.height, args.width

    def rnd(i, shape, dt=dtype):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt) * 0.5

    left = rnd(1, (b, h, w, 3), jnp.float32)
    right = rnd(2, (b, h, w, 3), jnp.float32)

    @jax.jit
    def build(l, r):
        return model.apply(variables, l, r, train=False,
                           method=PCWNet.build_cost_volume)

    combine, _, fl, fr = build(left, right)
    latent0 = rnd(3, (b, 48, h // 4, w // 4), jnp.float32)
    t = jnp.full((b,), 300, jnp.int32)
    state = {"latent": latent0}

    @jax.jit
    def run_m(combine, fl, fr, latent, t):
        return model.apply(variables, combine, fl, fr, latent, t, (h, w),
                           method=PCWNet.denoise)

    @jax.jit
    def run_p(combine, fl, fr, latent, t):
        return pcw_denoise_fast(model, variables, combine, fl, fr, latent, t,
                                (h, w))

    def args_fn():
        return (combine, fl, fr, state["latent"], t)

    def perturb(i):
        state["latent"] = state["latent"] + rnd(50 + i, latent0.shape,
                                                jnp.float32) * 1e-3

    got_m, ms_m = _timed("module", run_m, args_fn, args.reps, perturb)
    got_p, ms_p = _timed("packed", run_p, args_fn, args.reps, perturb)
    # PCW's disp_finetune passes through the UNNORMALIZED RefineNetV3: at
    # random init its residual is ~1e10, and bf16 softargmin bin flips feed
    # that amplifier — absolute-px bounds are meaningless here (measured r5:
    # values ~6e10, mean|Δ|/mean|ref| 0.075).  Compare RELATIVE for
    # disp/unc; the noise branch (time-embed path) stays absolute-tight.
    # Exactness is pinned by the f32 interpret tests.
    ok = True
    for name, a, b in zip(("disp", "unc"), got_p[:2], got_m[:2]):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = float(np.abs(a - b).mean() / max(np.abs(b).mean(), 1e-9))
        print(f"A/B {name}: mean|Δ|/mean|ref| {rel:.4g}", flush=True)
        ok &= rel < 0.15
    ok &= _report(("noise",), (got_p[2],), (got_m[2],),
                  {"noise": (1e-3, None)})
    print(f"packed {ms_p:.2f} ms vs module {ms_m:.2f} ms  "
          f"({ms_m / max(ms_p, 1e-9):.2f}x)  parity={'OK' if ok else 'FAIL'}",
          flush=True)
    return ok


def ab_acv_prep(args):
    """acv_prep_fast vs the module prep (baseline forward + volume build)."""
    from diffuvolume_tpu.models.acv import ACVNet, acv_prep_fast
    from diffuvolume_tpu.ops.cost_volume import build_concat_volume
    from diffuvolume_tpu.utils.hostinit import init_on_cpu

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    base = ACVNet(max_disp=192, diffusion=False, dtype=dtype)
    ddim = ACVNet(max_disp=192, diffusion=True, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    xs = jnp.zeros((1, 64, 128, 3))
    base_vars = init_on_cpu(base.init, rng, xs, xs, train=False)
    ddim_vars = init_on_cpu(
        ddim.init, rng, xs, xs, jnp.zeros((1, 16, 32)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 48, 16, 32)), train=True,
    )

    b, h, w = 1, args.height, args.width
    state = {}

    def rnd(i, shape, dt=jnp.float32):
        return jax.random.normal(jax.random.fold_in(rng, i), shape, dt)

    state["left"] = rnd(1, (b, h, w, 3))
    state["right"] = rnd(2, (b, h, w, 3))

    @jax.jit
    def run_m(l, r):
        disp = base.apply(base_vars, l, r, train=False)[-1]
        vol, _ = ddim.apply(ddim_vars, l, r, train=False,
                            method=ACVNet.build_cost_volume)
        return disp, vol

    @jax.jit
    def run_p(l, r):
        disp, (cl, cr, att) = acv_prep_fast(base, ddim, base_vars, ddim_vars,
                                            l, r)
        return disp, att[..., None].astype(cl.dtype) * build_concat_volume(
            cl, cr, 48)

    def args_fn():
        return (state["left"], state["right"])

    def perturb(i):
        state["left"] = state["left"] + rnd(50 + i, state["left"].shape) * 1e-3

    got_m, ms_m = _timed("module", run_m, args_fn, args.reps, perturb)
    got_p, ms_p = _timed("packed", run_p, args_fn, args.reps, perturb)
    # CALIBRATED NOISE FLOOR (r5): the same comparison in CPU bf16 interpret
    # mode — the exact kernels pinned by the f32 tests, no device involved —
    # already measures disp mean|Δ| 10.4 px and vol max-rel 0.89 at random
    # init: the attention softmax sees ±1e4 logits, so bf16 tie-breaks flip
    # whole one-hot columns.  Absolute disp bounds are therefore
    # uninformative here; the volume's MEAN-relative error is the
    # discriminating statistic (CPU floor ~0.10).
    _report(("disp",), (got_p[0],), (got_m[0],), {})
    a, m = np.asarray(got_p[1], np.float32), np.asarray(got_m[1], np.float32)
    rel = float(np.abs(a - m).mean() / max(np.abs(m).mean(), 1e-9))
    print(f"A/B ac_volume: mean|Δ|/mean|ref| {rel:.4g}", flush=True)
    ok = rel < 0.2
    print(f"packed {ms_p:.2f} ms vs module {ms_m:.2f} ms  "
          f"({ms_m / max(ms_p, 1e-9):.2f}x)  parity={'OK' if ok else 'FAIL'}",
          flush=True)
    return ok


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", choices=("igev", "pcw", "acv_prep"),
                   required=True)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args(argv)
    defaults = {"igev": (384, 1248), "pcw": (384, 1248), "acv_prep": (512, 960)}
    dh, dw = defaults[args.backbone]
    args.height = args.height or dh
    args.width = args.width or dw
    ok = {"igev": ab_igev, "pcw": ab_pcw, "acv_prep": ab_acv_prep}[args.backbone](args)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
