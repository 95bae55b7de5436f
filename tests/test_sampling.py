"""Sampler / warp ops vs torch grid_sample oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.ops.sampling import (
    context_upsample,
    linear_sample_1d,
    warp_right_to_left,
)

RNG = np.random.default_rng(4)


def test_linear_sample_1d_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    p, w, c, n = 6, 10, 3, 7
    vals = RNG.standard_normal((p, w, c)).astype(np.float32)
    coords = RNG.uniform(-2, w + 1, (p, n)).astype(np.float32)

    ours = np.asarray(linear_sample_1d(jnp.asarray(vals), jnp.asarray(coords)))

    # torch oracle: grid_sample on (P, C, 1, W) with align_corners=True
    # normalization 2x/(W-1)-1 (KITTI15/core/utils/utils.py:59-77).
    img = torch.from_numpy(vals.transpose(0, 2, 1)).unsqueeze(2)  # (P, C, 1, W)
    xg = torch.from_numpy(coords) * 2 / (w - 1) - 1
    grid = torch.stack([xg, torch.zeros_like(xg)], dim=-1).unsqueeze(1)  # (P,1,N,2)
    ref = (
        torch.nn.functional.grid_sample(img, grid, align_corners=True)
        .squeeze(2)
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_warp_matches_torch_reference_quirk():
    torch = pytest.importorskip("torch")
    b, h, w, c = 1, 6, 8, 3
    right = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    disp = RNG.uniform(0, 3, (b, h, w)).astype(np.float32)

    ours = np.asarray(warp_right_to_left(jnp.asarray(right), jnp.asarray(disp)))

    # torch oracle = the reference warp (KITTI12/models/submodule.py:137-176):
    x = torch.from_numpy(right.transpose(0, 3, 1, 2))
    d = torch.from_numpy(disp).unsqueeze(1)
    xx = torch.arange(w).view(1, -1).repeat(h, 1).view(1, 1, h, w).float()
    yy = torch.arange(h).view(-1, 1).repeat(1, w).view(1, 1, h, w).float()
    vgrid = torch.cat((xx - d, yy), 1)
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    out = torch.nn.functional.grid_sample(x, vgrid)
    mask = torch.nn.functional.grid_sample(torch.ones_like(x), vgrid)
    mask = (mask >= 0.999).float()
    ref = (out * mask).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)


def test_context_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    b, h, w = 1, 3, 4
    disp = RNG.standard_normal((b, h, w)).astype(np.float32)
    wts = RNG.uniform(size=(b, 9, 4 * h, 4 * w)).astype(np.float32)

    ours = np.asarray(context_upsample(jnp.asarray(disp), jnp.asarray(wts)))

    dl = torch.from_numpy(disp).unsqueeze(1)
    unf = torch.nn.functional.unfold(dl, 3, 1, 1).reshape(b, 9, h, w)
    unf = torch.nn.functional.interpolate(unf, (h * 4, w * 4), mode="nearest")
    ref = (unf * torch.from_numpy(wts)).sum(1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_hat_sample_last2_equals_linear_sample():
    """The gather-free hat-einsum sampler is exactly linear_sample_1d with
    zero padding (the hat kernel reproduces per-tap edge zeroing)."""
    import numpy as np
    import jax.numpy as jnp

    from diffuvolume_tpu.ops.sampling import hat_sample_last2, linear_sample_1d

    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.standard_normal((2, 3, 5, 17, 4)).astype(np.float32))
    x0 = jnp.asarray(rng.uniform(-3, 20, (2, 3, 5, 9)).astype(np.float32))
    a = np.asarray(hat_sample_last2(vol, x0))
    b = np.asarray(linear_sample_1d(vol, x0, zero_pad=True))
    np.testing.assert_allclose(a, b, atol=1e-5)
