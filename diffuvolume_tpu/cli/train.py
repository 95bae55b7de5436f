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
import optax

from diffuvolume_tpu.data.zoo import fetch_dataset
from diffuvolume_tpu.models import build_model
from diffuvolume_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding, shard_batch
from diffuvolume_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from diffuvolume_tpu.train.loop import create_train_state, make_train_step
from diffuvolume_tpu.train.lr import milestone_lr_schedule
from diffuvolume_tpu.utils.meters import AverageMeter


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DiffuVolume-TPU training")
    p.add_argument("--model", default="acvnet_ddim", help="model registry name")
    p.add_argument("--maxdisp", type=int, default=192)
    p.add_argument("--dataset", default="sceneflow")
    p.add_argument("--datapath", required=True)
    p.add_argument("--trainlist", default=None)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=48)
    p.add_argument("--lrepochs", default="16,24,32,40,48:2")
    p.add_argument("--logdir", default="./checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--summary_freq", type=int, default=100)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dataset = fetch_dataset(args.dataset, args.datapath, training=True,
                            list_filename=args.trainlist, seed=args.seed)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    print(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    model = build_model(args.model, max_disp=args.maxdisp)
    schedule = milestone_lr_schedule(args.lr, args.lrepochs, steps_per_epoch)
    optimizer = optax.adam(schedule)

    sample = dataset[0]
    h, w = sample["disp_gt"].shape
    state = create_train_state(model, jax.random.PRNGKey(args.seed), (1, h, w), optimizer)

    start_epoch = 0
    if args.resume and latest_step(args.logdir) is not None:
        abstract = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        state = restore_checkpoint(args.logdir, abstract)
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed at epoch {start_epoch}")

    mesh = make_mesh()
    bsh, repl = batch_sharding(mesh), replicated_sharding(mesh)
    state = jax.device_put(state, repl)
    step_fn = jax.jit(
        make_train_step(model, optimizer),
        in_shardings=(repl, {"left": bsh, "right": bsh, "disp_gt": bsh}, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(args.seed)
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            meter = AverageMeter()
            t0 = time.time()
            for i, batch in enumerate(dataset.batches(args.batch_size)):
                batch = {k: v for k, v in batch.items() if k != "filenames"}
                batch = shard_batch(batch, mesh)
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


if __name__ == "__main__":
    main()
