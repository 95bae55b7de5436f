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
        "--stage", choices=["attn_only", "freeze_attn", "full"], default="full",
        help="staged ACV training (SceneFlow recipe): 'attn_only' trains just "
        "the attention branch (SceneFlow/models/loss.py:5-8, acv.py:94 "
        "attn_weights_only), 'freeze_attn' trains the rest with the attention "
        "weights frozen (loss.py:10-13); chain the stages with --init_from",
    )
    p.add_argument(
        "--init_from", default=None,
        help="checkpoint dir to partially warm-start params from (pytree "
        "intersection; used to chain --stage runs or start KITTI finetunes "
        "from a SceneFlow checkpoint)",
    )
    p.add_argument("--bf16", action="store_true",
                   help="bf16 conv path (OptimConfig.bf16; AMP analog)")
    p.add_argument("--volume_axis", type=int, default=1,
                   help="mesh size of the cost-volume sharding axis "
                   "(ParallelConfig.volume_axis)")
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


# Per-recipe eval wiring: (baseline registry name, DDIM preset name,
# inference fn name) — the per-epoch best-D1 tracking is the KITTI12 recipe's
# defining behavior (KITTI12/main.py:117-137) but applies to all three.
_EVAL_WIRING = {
    "sceneflow": ("acvnet", "SCENEFLOW_DDIM", "acv_ddim_inference"),
    "kitti12": ("gwcnet-gc", "KITTI12_DDIM", "pcw_ddim_inference"),
    "kitti15": ("igev", "KITTI15_DDIM", "igev_ddim_inference"),
}


def _epoch_eval(args, recipe, model, state, baseline, baseline_vars, dataset_cls):
    """Run the two-model DDIM eval with the in-training params; return D1."""
    import dataclasses

    from diffuvolume_tpu import diffusion as diff_mod
    from diffuvolume_tpu.eval import pipeline as pipe_mod
    from diffuvolume_tpu.eval.metrics import metrics_batch

    _, preset_name, infer_name = _EVAL_WIRING[recipe]
    cfg = dataclasses.replace(
        getattr(diff_mod, preset_name),
        max_disp=model.max_disp, num_bins=model.max_disp // 4,
    )
    infer = getattr(pipe_mod, infer_name)
    test_ds = dataset_cls(args.datapath, list_filename=args.testlist, training=False)
    dvars = {"params": state.params, "batch_stats": state.batch_stats}
    n = len(test_ds) if args.eval_max_images == 0 else min(args.eval_max_images, len(test_ds))
    d1s, epes = [], []
    rng = jax.random.PRNGKey(0)
    kw = {"iters": args.iters} if recipe == "kitti15" else {}
    for i in range(n):
        s = test_ds[i]
        left = jnp.asarray(s["left"])[None]
        right = jnp.asarray(s["right"])[None]
        rng, k = jax.random.split(rng)
        final, _ = infer(
            baseline, model, baseline_vars, dvars, left, right, k, cfg, **kw
        )
        gt = jnp.asarray(s["disp_gt"])[None]
        mask = (gt > 0) & (gt < model.max_disp)
        m = metrics_batch(final, gt, mask)
        d1s.append(float(m["D1"][0]))
        epes.append(float(m["EPE"][0]))
    return float(np.mean(d1s)), float(np.mean(epes))


def build_experiment_config(args):
    """Fold the CLI surface into the one dataclass config (config.py) — the
    dataclasses are the real configuration; argparse is just their CLI skin."""
    from diffuvolume_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, OptimConfig, ParallelConfig,
    )

    backbone = ("igev" if "igev" in args.model
                else "pcw" if "pcw" in args.model or "gwc" in args.model
                else "acv")
    recipe = args.recipe or {"igev": "kitti15", "pcw": "kitti12",
                             "acv": "sceneflow"}[backbone]
    return recipe, ExperimentConfig(
        model=ModelConfig(backbone=backbone, max_disp=args.maxdisp,
                          diffusion="ddim" in args.model),
        data=DataConfig(dataset=args.dataset, datapath=args.datapath,
                        trainlist=args.trainlist, testlist=args.testlist,
                        batch_size=args.batch_size),
        optim=OptimConfig(lr=args.lr, lrepochs=args.lrepochs,
                          epochs=args.epochs,
                          optimizer="adamw" if recipe == "kitti15" else "adam",
                          weight_decay=args.wdecay,
                          grad_clip=1.0 if recipe == "kitti15" else None,
                          bf16=args.bf16),
        parallel=ParallelConfig(volume_axis=args.volume_axis),
        logdir=args.logdir, seed=args.seed, resume=args.resume,
        loadckpt=args.init_from,
    )


def main(argv=None):
    args = parse_args(argv)
    recipe, cfg = build_experiment_config(args)
    dataset = fetch_dataset(cfg.data.dataset, cfg.data.datapath, training=True,
                            list_filename=cfg.data.trainlist, seed=cfg.seed)
    steps_per_epoch = max(len(dataset) // cfg.data.batch_size, 1)
    print(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    model_kw = {"max_disp": cfg.model.max_disp}
    if cfg.optim.bf16:
        model_kw["dtype"] = jnp.bfloat16
    if args.stage != "full":
        assert recipe == "sceneflow", "--stage is the SceneFlow/ACV recipe"
        model_kw["attn_weights_only"] = args.stage == "attn_only"
        model_kw["freeze_attn_weights"] = args.stage == "freeze_attn"
    model = build_model(args.model, **model_kw)

    sample = dataset[0]
    h, w = sample["disp_gt"].shape
    if recipe == "kitti15":
        from diffuvolume_tpu.train.loop import create_igev_train_state, make_igev_train_step
        from diffuvolume_tpu.train.lr import one_cycle_schedule

        schedule = one_cycle_schedule(cfg.optim.lr, cfg.optim.epochs * steps_per_epoch)
        optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.optim.grad_clip or 1.0),
            optax.adamw(schedule, weight_decay=cfg.optim.weight_decay, eps=1e-8),
        )
        state = create_igev_train_state(
            model, jax.random.PRNGKey(cfg.seed), (1, h, w), optimizer
        )
        train_step = make_igev_train_step(model, optimizer, iters=args.iters)
    else:
        from diffuvolume_tpu.train.loss import (
            KITTI12_WEIGHTS,
            SCENEFLOW_WEIGHTS,
            SCENEFLOW_WEIGHTS_ATTN_ONLY,
            SCENEFLOW_WEIGHTS_FREEZE_ATTN,
        )

        weights = (
            KITTI12_WEIGHTS if recipe == "kitti12"
            else SCENEFLOW_WEIGHTS_ATTN_ONLY if args.stage == "attn_only"
            else SCENEFLOW_WEIGHTS_FREEZE_ATTN if args.stage == "freeze_attn"
            else SCENEFLOW_WEIGHTS
        )
        schedule = milestone_lr_schedule(cfg.optim.lr, cfg.optim.lrepochs, steps_per_epoch)
        optimizer = optax.adam(schedule)
        state = create_train_state(
            model, jax.random.PRNGKey(cfg.seed), (1, h, w), optimizer
        )
        train_step = make_train_step(model, optimizer, weights=weights)

    if cfg.loadckpt:
        # Stage chaining / finetune warm start: restore the donor with its own
        # (possibly different-model) structure — a raw orbax restore yields
        # the flattened TrainState [params, batch_stats, opt_state, step] —
        # then pytree-intersect into the fresh state.
        from diffuvolume_tpu.train.checkpoint import partial_warm_start
        from diffuvolume_tpu.train.loop import TrainState

        donor_params, donor_bs, _, _ = restore_checkpoint(cfg.loadckpt, None)
        state = TrainState(
            params=partial_warm_start(state.params, donor_params),
            batch_stats=partial_warm_start(state.batch_stats, donor_bs),
            opt_state=state.opt_state,
            step=state.step,
        )
        print(f"warm-started from {cfg.loadckpt}")

    start_epoch = 0
    if cfg.resume and latest_step(cfg.logdir) is not None:
        abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        state = restore_checkpoint(cfg.logdir, abstract)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed at epoch {start_epoch}")

    # Data-axis size must divide the global batch (the reference's bs=23 over
    # 6 GPUs unevenness has no GSPMD analog); use the largest compatible size.
    # The remaining devices go to the volume axis when --volume_axis asks.
    import math

    n_dev = len(jax.devices())
    n_vol = max(1, cfg.parallel.volume_axis)
    n_data = math.gcd(args.batch_size, max(n_dev // n_vol, 1))
    if n_data * n_vol < n_dev:
        print(f"note: using {n_data * n_vol}/{n_dev} devices (batch "
              f"{args.batch_size}, volume_axis {n_vol})")
    mesh = make_mesh(n_data=n_data, n_volume=n_vol,
                     devices=jax.devices()[: n_data * n_vol])
    bsh, repl = batch_sharding(mesh), replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    # Inputs arrive pre-sharded (prefetch_to_device puts batches with ``bsh``);
    # the replicated state is donated so optimizer updates reuse its buffers.
    step_fn = jax.jit(train_step, out_shardings=(repl, repl), donate_argnums=(0,))

    # Optional frozen baseline for the per-epoch two-model eval (all three
    # recipes; _EVAL_WIRING picks the baseline net + sampler per recipe).
    eval_on = args.eval_freq > 0
    if eval_on:
        from diffuvolume_tpu.cli.evaluate import load_variables

        base_name = _EVAL_WIRING[recipe][0]
        baseline = build_model(base_name, max_disp=args.maxdisp)
        s0 = dataset[0]
        eh, ew = s0["disp_gt"].shape
        x = jnp.zeros((1, eh, ew, 3))
        init_train = recipe == "kitti15"  # IGEV init needs train-mode BN
        baseline_vars = load_variables(
            args.eval_baseline_ckpt, baseline,
            lambda: baseline.init(jax.random.PRNGKey(0), x, x, train=init_train),
        )
    best_d1 = float("inf")

    from diffuvolume_tpu.data.loader import DataLoader, prefetch_to_device

    loader = DataLoader(
        dataset, args.batch_size, shuffle=args.shuffle,
        num_workers=args.num_workers, drop_last=True, seed=args.seed,
    )

    from diffuvolume_tpu.utils.logger import Logger
    from diffuvolume_tpu.utils.visualization import disp_error_image

    logger = Logger(cfg.logdir, print_freq=args.summary_freq)
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
                    logger.write_dict(
                        {"train/loss": metrics["loss"], "train/epe": metrics["epe"]},
                        step=int(state.step),
                    )
                    # TB image summaries (SceneFlow/main.py via experiment.py:
                    # 72-88 save_images): est / GT / KITTI error map, sample 0.
                    est = np.asarray(
                        jax.device_get(metrics["pred"])[0], np.float32
                    )
                    gt = np.asarray(jax.device_get(batch["disp_gt"])[0], np.float32)
                    logger.write_images(
                        {
                            "train/disp_est": est,
                            "train/disp_gt": gt,
                            "train/errormap": disp_error_image(est, gt),
                        },
                        step=int(state.step),
                    )
            print(f"epoch {epoch} done: mean loss {meter.mean():.4f}")
            save_checkpoint(args.logdir, int(state.step), jax.device_get(state))
            if eval_on and (epoch + 1) % args.eval_freq == 0:
                d1, epe = _epoch_eval(
                    args, recipe, model, state, baseline, baseline_vars,
                    type(dataset)
                )
                tag = ""
                if d1 < best_d1:
                    best_d1 = d1
                    tag = "  (best)"
                print(f"epoch {epoch} eval: D1 {d1:.4f} EPE {epe:.4f}{tag}")


if __name__ == "__main__":
    main()
