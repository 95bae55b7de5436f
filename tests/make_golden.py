"""Regenerate the golden pipeline outputs (tests/golden/*.npz).

Run after an INTENTIONAL numerics change (and say so in the commit message):

    python tests/make_golden.py [acv|pcw|igev ...]

Runs on CPU (same backend config as tests/conftest.py) so the anchors are
platform-stable and exactly reproducible under pytest.
"""

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

_here = pathlib.Path(__file__).parent
sys.path.insert(0, str(_here.parent))  # repo root: diffuvolume_tpu package
sys.path.insert(0, str(_here))
from golden_pipelines import RUNNERS  # noqa: E402


def main(names):
    outdir = pathlib.Path(__file__).parent / "golden"
    outdir.mkdir(exist_ok=True)
    for name in names or RUNNERS:
        out = RUNNERS[name]()
        arrays = {k: np.asarray(v) for k, v in out.items()}
        np.savez_compressed(outdir / f"{name}.npz", **arrays)
        stats = {k: (v.shape, float(np.abs(v).mean())) for k, v in arrays.items()}
        print(f"{name}: {stats}")


if __name__ == "__main__":
    main(sys.argv[1:])
