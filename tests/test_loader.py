"""DataLoader / prefetch tests: ordering, determinism, worker-RNG isolation."""

import numpy as np
import jax

from diffuvolume_tpu.data.loader import DataLoader, default_collate, prefetch_to_device


class ToyDataset:
    """Indexable dataset whose samples depend on its (per-worker) rng."""

    def __init__(self, n=20):
        self.n = n
        self.rng = np.random.default_rng(0)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "left": np.full((4, 6, 3), float(i), np.float32),
            "disp_gt": np.full((4, 6), float(i), np.float32),
            "noise": self.rng.standard_normal(2).astype(np.float32),
            "filename": f"img{i}",
        }


def test_collate_stacks_and_lists():
    b = default_collate([ToyDataset()[0], ToyDataset()[1]])
    assert b["left"].shape == (2, 4, 6, 3)
    assert b["filename"] == ["img0", "img1"]


def test_loader_sequential_order_and_drop_last():
    dl = DataLoader(ToyDataset(20), batch_size=6, shuffle=False, drop_last=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 3
    np.testing.assert_allclose(batches[0]["disp_gt"][:, 0, 0], [0, 1, 2, 3, 4, 5])


def test_loader_parallel_matches_index_set_and_order():
    ds = ToyDataset(23)
    dl0 = DataLoader(ds, 4, shuffle=True, num_workers=0, seed=3)
    dl3 = DataLoader(ToyDataset(23), 4, shuffle=True, num_workers=3, seed=3)
    b0 = list(dl0)
    b3 = list(dl3)
    assert len(b0) == len(b3) == 5
    for a, b in zip(b0, b3):
        # deterministic epoch permutation, order-preserving parallel fetch
        np.testing.assert_allclose(a["left"], b["left"])


def test_loader_epoch_reshuffles():
    dl = DataLoader(ToyDataset(16), 16, shuffle=True, num_workers=2, seed=0)
    e0 = next(iter(dl))["disp_gt"][:, 0, 0]
    e1 = next(iter(dl))["disp_gt"][:, 0, 0]
    assert sorted(e0.tolist()) == sorted(e1.tolist()) == list(range(16))
    assert e0.tolist() != e1.tolist()


def test_worker_rng_deterministic_given_seed():
    """Same seed ⇒ identical augmentation noise regardless of thread timing
    (per-worker reseeded replicas, the torch worker_init_fn analog)."""
    a = [b["noise"] for b in DataLoader(ToyDataset(12), 3, num_workers=2, seed=5)]
    b = [b["noise"] for b in DataLoader(ToyDataset(12), 3, num_workers=2, seed=5)]
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y)


def test_prefetch_to_device_sharded():
    mesh = None
    from diffuvolume_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    bsh = batch_sharding(mesh)
    dl = DataLoader(ToyDataset(16), 8, num_workers=2)
    batches = ({k: v for k, v in b.items() if k != "filename"} for b in dl)
    out = list(prefetch_to_device(batches, size=2, sharding=bsh))
    assert len(out) == 2
    assert out[0]["left"].sharding.is_equivalent_to(bsh, out[0]["left"].ndim)
