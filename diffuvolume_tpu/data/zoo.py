"""Zero-shot / auxiliary dataset loaders and multi-dataset composition.

Reference: KITTI15/core/stereo_datasets.py:125-335 (glob-driven SceneFlow /
ETH3D / Middlebury / KITTI subclasses + fetch_dataloader composition) and the
KITTI12 zero-shot loaders (KITTI12/datasets/{MiddleburyLoader,eth3dLoader}.py).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from diffuvolume_tpu.data.readers import read_image, read_pfm
from diffuvolume_tpu.data.sceneflow import SceneFlowDataset, normalize_image


class ETH3DDataset:
    """ETH3D two-view (stereo_datasets.py:191-201): PFM GT, glob-driven."""

    def __init__(self, datapath: str, split: str = "training"):
        self.samples = []
        img1 = sorted(glob.glob(os.path.join(datapath, f"two_view_{split}/*/im0.png")))
        img2 = sorted(glob.glob(os.path.join(datapath, f"two_view_{split}/*/im1.png")))
        disp = sorted(
            glob.glob(os.path.join(datapath, "two_view_training_gt/*/disp0GT.pfm"))
        )
        if split == "training":
            self.samples = list(zip(img1, img2, disp))
        else:
            self.samples = [(a, b, None) for a, b in zip(img1, img2)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        lf, rf, df = self.samples[i]
        out = {
            "left": normalize_image(read_image(lf)),
            "right": normalize_image(read_image(rf)),
            "filename": lf,
        }
        if df is not None:
            disp, _ = read_pfm(df)
            out["disp_gt"] = disp
            out["valid"] = (disp < 512) & (disp > 0)
        return out


class MiddleburyDataset:
    """Middlebury-v3 (stereo_datasets.py:275-292): F/H/Q resolutions."""

    def __init__(self, datapath: str, split: str = "F"):
        assert split in "FHQ"
        lefts = sorted(glob.glob(os.path.join(datapath, f"Mid{split}/*/im0.png"))) or sorted(
            glob.glob(os.path.join(datapath, "*/im0.png"))
        )
        self.samples = []
        for lf in lefts:
            rf = lf.replace("im0.png", "im1.png")
            df = lf.replace("im0.png", "disp0GT.pfm")
            if os.path.exists(rf):
                self.samples.append((lf, rf, df if os.path.exists(df) else None))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        lf, rf, df = self.samples[i]
        out = {
            "left": normalize_image(read_image(lf)),
            "right": normalize_image(read_image(rf)),
            "filename": lf,
        }
        if df is not None:
            disp, _ = read_pfm(df)
            disp = np.where(np.isfinite(disp), disp, 0.0).astype(np.float32)
            out["disp_gt"] = disp
            out["valid"] = disp > 0
        return out


class ConcatDataset:
    """Weighted concatenation (the reference's ``__mul__`` dataset repetition
    + ``+`` composition, stereo_datasets.py:112-122,295-335)."""

    def __init__(self, datasets_with_repeats):
        self.parts = []
        for ds, rep in datasets_with_repeats:
            for _ in range(rep):
                self.parts.append(ds)
        self.lengths = [len(d) for d in self.parts]

    def __len__(self):
        return sum(self.lengths)

    def __getitem__(self, i):
        for d, n in zip(self.parts, self.lengths):
            if i < n:
                return d[i]
            i -= n
        raise IndexError


def fetch_dataset(name: str, datapath: str, training: bool = False, **kw):
    """Name-driven dataset factory (stereo_datasets.py:295-335 simplified)."""
    from diffuvolume_tpu.data.kitti import KITTIDataset

    if name == "sceneflow":
        return SceneFlowDataset(datapath, training=training, **kw)
    if name in ("kitti12", "kitti15", "kitti"):
        return KITTIDataset(datapath, training=training, **kw)
    if name == "eth3d":
        return ETH3DDataset(datapath, **kw)
    if name.startswith("middlebury"):
        return MiddleburyDataset(datapath, split=name[-1].upper() if name[-1] in "FHQfhq" else "F")
    raise KeyError(name)
