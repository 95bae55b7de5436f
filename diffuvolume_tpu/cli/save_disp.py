"""Disparity-map export CLI (the reference's save_disp_sceneflow.py /
save_disp_sceneflow_kitti12.py / KITTI15 save_disp.py: run the two-model DDIM
pipeline and write 16-bit KITTI-format PNGs / PFMs)."""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Save DDIM disparity predictions")
    p.add_argument("--backbone", choices=["acv", "pcw", "igev"], default="acv")
    p.add_argument("--dataset", default="sceneflow")
    p.add_argument("--datapath", required=True)
    p.add_argument("--testlist", default=None)
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--baseline_ckpt", default=None)
    p.add_argument("--ddim_ckpt", default=None)
    p.add_argument("--outdir", default="./predictions")
    p.add_argument("--format", choices=["png16", "pfm"], default="png16")
    p.add_argument("--max_images", type=int, default=0)
    return p.parse_args(argv)


def save_png16(path: str, disp: np.ndarray):
    """KITTI submission format: uint16 PNG, disparity*256."""
    from PIL import Image

    arr = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    Image.fromarray(arr, mode="I;16").save(path)


def main(argv=None):
    from diffuvolume_tpu.cli.evaluate import load_variables, parse_args as _
    from diffuvolume_tpu.data.readers import write_pfm
    from diffuvolume_tpu.data.zoo import fetch_dataset
    from diffuvolume_tpu.diffusion import KITTI12_DDIM, KITTI15_DDIM, SCENEFLOW_DDIM
    from diffuvolume_tpu.eval.pipeline import (
        acv_ddim_inference, igev_ddim_inference, pcw_ddim_inference,
    )
    from diffuvolume_tpu.models import build_model

    args = parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
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
    s0 = dataset[0]
    h, w = s0["left"].shape[:2]
    h, w = -(-h // 32) * 32, -(-w // 32) * 32  # init at /32-padded shape
    x = jnp.zeros((1, h, w, 3))
    bvars = load_variables(args.baseline_ckpt, baseline,
                           lambda: baseline.init(jax.random.PRNGKey(0), x, x, train=False))
    dq = jnp.zeros((1, h // 4, w // 4))
    nz = jnp.zeros((1, args.maxdisp // 4, h // 4, w // 4))
    dvars = load_variables(
        args.ddim_ckpt, ddim,
        lambda: ddim.init(jax.random.PRNGKey(0), x, x, dq,
                          jnp.zeros((1,), jnp.int32), nz, train=True),
    )

    rng = jax.random.PRNGKey(0)
    n = len(dataset) if args.max_images == 0 else min(args.max_images, len(dataset))
    for i in range(n):
        s = dataset[i]
        rng, k = jax.random.split(rng)
        final, _ = pipeline(
            baseline, ddim, bvars, dvars,
            jnp.asarray(s["left"])[None], jnp.asarray(s["right"])[None], k, cfg,
        )
        disp = np.asarray(final[0])
        # strip eval-time padding (top / right, KITTI convention)
        top = int(s.get("top_pad", 0))
        right_pad = int(s.get("right_pad", 0))
        if top or right_pad:
            disp = disp[top:, : disp.shape[1] - right_pad or None]
        name = os.path.basename(s.get("filename", f"{i:06d}.png"))
        out = os.path.join(args.outdir, os.path.splitext(name)[0])
        if args.format == "png16":
            save_png16(out + ".png", disp)
        else:
            write_pfm(out + ".pfm", disp)
        print(f"[{i + 1}/{n}] wrote {out}")


if __name__ == "__main__":
    main()
