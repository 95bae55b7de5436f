"""Evaluation CLI — the reference's test_sceneflow_ddim.py / KITTI12 test.py /
KITTI15 evaluate_stereo.py two-model DDIM evaluation.

Usage:
    python -m diffuvolume_tpu.cli.evaluate --backbone acv --datapath ... \
        --baseline_ckpt ... --ddim_ckpt ...
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from diffuvolume_tpu.data.zoo import fetch_dataset
from diffuvolume_tpu.diffusion import KITTI12_DDIM, KITTI15_DDIM, SCENEFLOW_DDIM
from diffuvolume_tpu.eval.metrics import metrics_batch
from diffuvolume_tpu.eval.pipeline import (
    acv_ddim_inference,
    igev_ddim_inference,
    pcw_ddim_inference,
)
from diffuvolume_tpu.models import build_model
from diffuvolume_tpu.utils.meters import AverageMeterDict


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DiffuVolume-TPU DDIM evaluation")
    p.add_argument("--backbone", choices=["acv", "pcw", "igev"], default="acv")
    p.add_argument("--dataset", default="sceneflow")
    p.add_argument("--datapath", required=True)
    p.add_argument("--testlist", default=None)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--baseline_ckpt", default=None, help="orbax dir or torch .ckpt")
    p.add_argument("--ddim_ckpt", default=None)
    p.add_argument("--iters", type=int, default=32, help="IGEV GRU iterations")
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--baseline_only", action="store_true",
        help="evaluate the frozen baseline alone, no DDIM refinement "
        "(the reference's KITTI15/evaluate_stereo_origin.py)",
    )
    return p.parse_args(argv)


def load_variables(path, model, sample_init, backbone="acv"):
    """Load torch .ckpt/.pth (via the per-backbone converter) or orbax."""
    if path is None:
        print("WARNING: no checkpoint; using random init")
        return sample_init()
    if path.endswith((".ckpt", ".pth", ".pt")):
        import torch

        from diffuvolume_tpu.tools.convert_torch import convert_acv_state_dict
        from diffuvolume_tpu.tools.convert_torch_igev import convert_igev_state_dict
        from diffuvolume_tpu.tools.convert_torch_pcw import convert_pcw_state_dict

        convert = {
            "acv": convert_acv_state_dict,
            "pcw": convert_pcw_state_dict,
            "igev": convert_igev_state_dict,
        }[backbone]
        sd = torch.load(path, map_location="cpu")
        sd = sd.get("model", sd)
        variables = convert(sd, diffusion=model.diffusion)
        return jax.tree.map(jnp.asarray, variables)
    raise ValueError(f"unsupported checkpoint: {path}")


def main(argv=None):
    args = parse_args(argv)
    dataset = fetch_dataset(args.dataset, args.datapath, training=False,
                            list_filename=args.testlist)

    names = {
        "acv": ("acvnet", "acvnet_ddim", SCENEFLOW_DDIM, acv_ddim_inference),
        "pcw": ("gwcnet-gc", "pcwnet_ddim", KITTI12_DDIM, pcw_ddim_inference),
        "igev": ("igev", "igev_ddim", KITTI15_DDIM, igev_ddim_inference),
    }
    import dataclasses

    base_name, ddim_name, cfg, pipeline = names[args.backbone]
    cfg = dataclasses.replace(cfg, max_disp=args.maxdisp, num_bins=args.maxdisp // 4)
    baseline = build_model(base_name, max_disp=args.maxdisp)
    ddim = build_model(ddim_name, max_disp=args.maxdisp)

    sample = dataset[0]
    h, w = sample["left"].shape[:2]
    # params are shape-independent; init at the /32-padded eval shape
    h, w = -(-h // 32) * 32, -(-w // 32) * 32

    def init_baseline():
        x = jnp.zeros((1, h, w, 3))
        if args.backbone == "igev":
            return baseline.init(jax.random.PRNGKey(0), x, x, train=True)
        return baseline.init(jax.random.PRNGKey(0), x, x, train=False)

    def init_ddim():
        x = jnp.zeros((1, h, w, 3))
        if args.backbone == "igev":
            return ddim.init(jax.random.PRNGKey(0), x, x, train=True)
        dq = jnp.zeros((1, h // 4, w // 4))
        nz = jnp.zeros((1, args.maxdisp // 4, h // 4, w // 4))
        return ddim.init(jax.random.PRNGKey(0), x, x, dq,
                         jnp.zeros((1,), jnp.int32), nz, train=True)

    bvars = load_variables(args.baseline_ckpt, baseline, init_baseline, args.backbone)
    dvars = (
        None
        if args.baseline_only
        else load_variables(args.ddim_ckpt, ddim, init_ddim, args.backbone)
    )

    meter = AverageMeterDict()
    rng = jax.random.PRNGKey(args.seed)
    n = len(dataset) if args.max_images == 0 else min(args.max_images, len(dataset))
    t_total, t_count = 0.0, 0
    from diffuvolume_tpu.utils.padding import InputPadder

    for i in range(n):
        s = dataset[i]
        left = jnp.asarray(s["left"])[None]
        right = jnp.asarray(s["right"])[None]
        padder = None
        if left.shape[1] % 32 or left.shape[2] % 32:
            # zero-shot datasets (ETH3D/Middlebury) come in odd sizes; pad to
            # /32 like KITTI15/evaluate_stereo.py:85-86 and unpad the output.
            padder = InputPadder(left.shape, divis_by=32)
            left, right = padder.pad(left, right)
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        if args.baseline_only:
            from diffuvolume_tpu.eval.pipeline import baseline_inference

            final = baseline_inference(
                baseline, bvars, left, right,
                iters=args.iters if args.backbone == "igev" else None,
            )
        else:
            kw = {"iters": args.iters} if args.backbone == "igev" else {}
            final, _ = pipeline(baseline, ddim, bvars, dvars, left, right, k, cfg, **kw)
        if padder is not None:
            final = padder.unpad(final)
        final = jax.block_until_ready(final)
        if i > 0:  # skip compile
            t_total += time.perf_counter() - t0
            t_count += 1
        if "disp_gt" in s:
            gt = jnp.asarray(s["disp_gt"])[None]
            mask = (gt > 0) & (gt < args.maxdisp)
            if "valid" in s:
                # Zero-shot loaders carry the reference-defined validity
                # (Middlebury/ETH3D nocc masks, sparse KITTI GT) — intersect
                # it like the reference validate_* loops do
                # (KITTI15/evaluate_stereo.py:52,220).
                mask = mask & jnp.asarray(s["valid"])[None]
            m = metrics_batch(final, gt, mask)
            meter.update({k2: float(v[0]) for k2, v in m.items() if k2 != "weight"})
        if i % 20 == 0:
            print(f"[{i}/{n}] {meter.mean()}")
    final_means = meter.mean()
    print("FINAL:", final_means)
    # Reference-defined zero-shot headline metric (validate_eth3d uses
    # D1 = err>1px over nocc; validate_middlebury uses err>2px —
    # KITTI15/evaluate_stereo.py:54,220).
    headline = {"eth3d": ("Thres1", "D1(>1px, nocc)"),
                "middlebury": ("Thres2", "D1(>2px)")}
    for prefix, (key, label) in headline.items():
        if args.dataset.startswith(prefix) and key in final_means:
            print(f"HEADLINE {args.dataset} {label}: "
                  f"{100 * final_means[key]:.3f}%")
    if t_count:
        print(f"throughput: {t_count / t_total:.3f} pairs/s")


if __name__ == "__main__":
    main()
