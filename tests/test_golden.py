"""Golden end-to-end regressions for the three full DDIM pipelines.

Asserts the fixed-seed tiny-shape two-pass runs (ACV DDIM-5, PCW DDIM-3,
IGEV DDIM-2 — see golden_pipelines.py) still reproduce the committed anchors
in tests/golden/*.npz to 1e-5.  This is the guard that lets perf surgery on
kernels/layout proceed without silently drifting the composite sampler math
(renewal masks, replacement modes, step ensemble) — the only other coverage
of those compositions is the slow torch-parity tier.

If a numerics change is INTENTIONAL, regenerate with
``python tests/make_golden.py`` and justify in the commit message.
"""

import pathlib

import numpy as np
import pytest

from golden_pipelines import RUNNERS

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", sorted(RUNNERS))
def test_golden_pipeline(name):
    path = GOLDEN_DIR / f"{name}.npz"
    assert path.exists(), (
        f"missing golden anchor {path}; run `python tests/make_golden.py {name}`"
    )
    want = np.load(path)
    got = {k: np.asarray(v) for k, v in RUNNERS[name]().items()}
    assert set(got) == set(want.files)
    for k in want.files:
        np.testing.assert_allclose(
            got[k], want[k], rtol=1e-5, atol=1e-5,
            err_msg=f"{name}.{k} drifted from the committed golden output",
        )
