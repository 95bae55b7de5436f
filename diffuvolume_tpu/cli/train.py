"""Training CLI — the reference's SceneFlow/main.py and KITTI12/main.py
recipes on a TPU mesh.

Usage:
    python -m diffuvolume_tpu.cli.train --dataset sceneflow --datapath ... \
        --model acvnet_ddim --batch_size 24 --epochs 48 --lrepochs "16,24,32,40,48:2"
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from diffuvolume_tpu.data.zoo import fetch_dataset
from diffuvolume_tpu.models import build_model
from diffuvolume_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from diffuvolume_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from diffuvolume_tpu.train.loop import create_train_state, make_train_step
from diffuvolume_tpu.train.lr import milestone_lr_schedule
from diffuvolume_tpu.utils.meters import AverageMeter


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DiffuVolume-TPU training")
    p.add_argument("--model", default="acvnet_ddim", help="model registry name")
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument(
        "--recipe", choices=["sceneflow", "kitti12", "kitti15"], default=None,
        help="training recipe (loss weights / optimizer / schedule); "
        "default inferred from --model.  sceneflow: Adam + milestone decay + "
        "[.5,.5,.7,1] (SceneFlow/main.py); kitti12: same optimizer family, "
        "6-head weights [...,1.3] (KITTI12/main.py:70,100); kitti15: AdamW + "
        "OneCycle + grad-clip 1.0 + sequence loss (KITTI15/train_stereo.py:64-70)",
    )
    p.add_argument("--iters", type=int, default=22, help="IGEV train GRU iterations")
    p.add_argument("--wdecay", type=float, default=1e-5, help="AdamW weight decay (kitti15)")
    p.add_argument("--dataset", default="sceneflow")
    p.add_argument("--datapath", required=True)
    p.add_argument("--trainlist", default=None)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--num_workers", type=int, default=8,
                   help="host decode/augment workers (reference: 16)")
    p.add_argument("--shuffle", action="store_true", default=True)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=48)
    p.add_argument("--lrepochs", default="16,24,32,40,48:2")
    p.add_argument("--logdir", default="./checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--summary_freq", type=int, default=100)
    # Per-epoch DDIM evaluation with best-D1 tracking (KITTI12/main.py:117-137).
    p.add_argument("--testlist", default=None)
    p.add_argument("--eval_freq", type=int, default=0, help="epochs between evals (0=off)")
    p.add_argument("--eval_baseline_ckpt", default=None,
                   help="frozen baseline checkpoint for the two-model eval")
    p.add_argument("--eval_max_images", type=int, default=0)
    return p.parse_args(argv)


def _epoch_eval(args, model, state, baseline, baseline_vars, dataset_cls):
    """Run the two-model DDIM eval with the in-training params; return D1."""
    import dataclasses

    from diffuvolume_tpu.diffusion import SCENEFLOW_DDIM
    from diffuvolume_tpu.eval.metrics import metrics_batch
    from diffuvolume_tpu.eval.pipeline import acv_ddim_inference

    cfg = dataclasses.replace(
        SCENEFLOW_DDIM, max_disp=model.max_disp, num_bins=model.max_disp // 4
    )
    test_ds = dataset_cls(args.datapath, list_filename=args.testlist, training=False)
    dvars = {"params": state.params, "batch_stats": state.batch_stats}
    n = len(test_ds) if args.eval_max_images == 0 else min(args.eval_max_images, len(test_ds))
    d1s, epes = [], []
    rng = jax.random.PRNGKey(0)
    for i in range(n):
        s = test_ds[i]
        left = jnp.asarray(s["left"])[None]
        right = jnp.asarray(s["right"])[None]
        rng, k = jax.random.split(rng)
        final, _ = acv_ddim_inference(
            baseline, model, baseline_vars, dvars, left, right, k, cfg
        )
        gt = jnp.asarray(s["disp_gt"])[None]
        mask = (gt > 0) & (gt < model.max_disp)
        m = metrics_batch(final, gt, mask)
        d1s.append(float(m["D1"][0]))
        epes.append(float(m["EPE"][0]))
    return float(np.mean(d1s)), float(np.mean(epes))


def main(argv=None):
    args = parse_args(argv)
    dataset = fetch_dataset(args.dataset, args.datapath, training=True,
                            list_filename=args.trainlist, seed=args.seed)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    print(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    model = build_model(args.model, max_disp=args.maxdisp)
    recipe = args.recipe
    if recipe is None:
        recipe = ("kitti15" if "igev" in args.model
                  else "kitti12" if "pcw" in args.model or "gwc" in args.model
                  else "sceneflow")

    sample = dataset[0]
    h, w = sample["disp_gt"].shape
    if recipe == "kitti15":
        from diffuvolume_tpu.train.loop import create_igev_train_state, make_igev_train_step
        from diffuvolume_tpu.train.lr import one_cycle_schedule

        schedule = one_cycle_schedule(args.lr, args.epochs * steps_per_epoch)
        optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(schedule, weight_decay=args.wdecay, eps=1e-8),
        )
        state = create_igev_train_state(
            model, jax.random.PRNGKey(args.seed), (1, h, w), optimizer
        )
        train_step = make_igev_train_step(model, optimizer, iters=args.iters)
    else:
        from diffuvolume_tpu.train.loss import KITTI12_WEIGHTS, SCENEFLOW_WEIGHTS

        weights = KITTI12_WEIGHTS if recipe == "kitti12" else SCENEFLOW_WEIGHTS
        schedule = milestone_lr_schedule(args.lr, args.lrepochs, steps_per_epoch)
        optimizer = optax.adam(schedule)
        state = create_train_state(
            model, jax.random.PRNGKey(args.seed), (1, h, w), optimizer
        )
        train_step = make_train_step(model, optimizer, weights=weights)

    start_epoch = 0
    if args.resume and latest_step(args.logdir) is not None:
        abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        state = restore_checkpoint(args.logdir, abstract)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed at epoch {start_epoch}")

    # Data-axis size must divide the global batch (the reference's bs=23 over
    # 6 GPUs unevenness has no GSPMD analog); use the largest compatible size.
    import math

    n_dev = len(jax.devices())
    n_data = math.gcd(args.batch_size, n_dev)
    if n_data < n_dev:
        print(f"note: using {n_data}/{n_dev} devices (batch {args.batch_size} "
              f"not divisible by {n_dev})")
    mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
    bsh, repl = batch_sharding(mesh), replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    # Inputs arrive pre-sharded (prefetch_to_device puts batches with ``bsh``);
    # the replicated state is donated so optimizer updates reuse its buffers.
    step_fn = jax.jit(train_step, out_shardings=(repl, repl), donate_argnums=(0,))

    # Optional frozen baseline for the per-epoch two-model eval.
    eval_on = args.eval_freq > 0
    if eval_on and recipe != "sceneflow":
        print("note: per-epoch DDIM eval currently wires the ACV pipeline; "
              "use cli.evaluate for the other backbones")
        eval_on = False
    if eval_on:
        from diffuvolume_tpu.cli.evaluate import load_variables

        baseline = build_model("acvnet", max_disp=args.maxdisp)
        s0 = dataset[0]
        eh, ew = s0["disp_gt"].shape
        x = jnp.zeros((1, eh, ew, 3))
        baseline_vars = load_variables(
            args.eval_baseline_ckpt, baseline,
            lambda: baseline.init(jax.random.PRNGKey(0), x, x, train=False),
        )
    best_d1 = float("inf")

    from diffuvolume_tpu.data.loader import DataLoader, prefetch_to_device

    loader = DataLoader(
        dataset, args.batch_size, shuffle=args.shuffle,
        num_workers=args.num_workers, drop_last=True, seed=args.seed,
    )

    rng = jax.random.PRNGKey(args.seed)
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            meter = AverageMeter()
            t0 = time.time()
            batches = (
                {k: v for k, v in b.items() if k not in ("filename", "filenames")}
                for b in loader
            )
            # Batches land on device already batch-sharded, 2 ahead of compute.
            for i, batch in enumerate(prefetch_to_device(batches, size=2, sharding=bsh)):
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, step_rng)
                meter.update(float(metrics["loss"]))
                if i % args.summary_freq == 0:
                    print(
                        f"epoch {epoch} step {i}/{steps_per_epoch} "
                        f"loss {float(metrics['loss']):.3f} EPE {float(metrics['epe']):.3f} "
                        f"({(time.time()-t0)/(i+1):.2f}s/it)"
                    )
            print(f"epoch {epoch} done: mean loss {meter.mean():.4f}")
            save_checkpoint(args.logdir, int(state.step), jax.device_get(state))
            if eval_on and (epoch + 1) % args.eval_freq == 0:
                d1, epe = _epoch_eval(
                    args, model, state, baseline, baseline_vars, type(dataset)
                )
                tag = ""
                if d1 < best_d1:
                    best_d1 = d1
                    tag = "  (best)"
                print(f"epoch {epoch} eval: D1 {d1:.4f} EPE {epe:.4f}{tag}")


if __name__ == "__main__":
    main()
