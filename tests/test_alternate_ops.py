"""Tests for the reference's alternate/auxiliary ops (SURVEY.md §2.3 tail):
unfold/v1/ones cost-volume variants, patch_aggregation, 4D gwc, the
SpatialTransformer pair, forward_interpolate, layer-factorization variants,
the PCWNet ReLU fork, extra readers, and the dormant co-transforms."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffuvolume_tpu.ops.cost_volume import (
    build_correlation_volume_ones,
    build_gwc_volume,
    build_gwc_volume_unfold,
    build_gwc_volume_v1,
    groupwise_correlation,
    groupwise_correlation_4d,
    patch_aggregation,
)
from diffuvolume_tpu.ops.sampling import (
    forward_interpolate,
    spatial_transformer,
    spatial_transformer_grid,
)

RNG = np.random.default_rng(7)


def _feats(b=1, h=4, w=9, c=8):
    l = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    r = RNG.standard_normal((b, h, w, c)).astype(np.float32)
    return jnp.asarray(l), jnp.asarray(r)


def test_gwc_unfold_is_sum_reduction():
    l, r = _feats()
    g = 4
    cpg = l.shape[-1] // g
    got = build_gwc_volume_unfold(l, r, 5, g)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(build_gwc_volume(l, r, 5, g)) * cpg, rtol=1e-6
    )


def test_gwc_v1_double_stride():
    l, r = _feats()
    g = 2
    vol = np.asarray(build_gwc_volume_v1(l, r, 4, g))
    ln, rn = np.asarray(l), np.asarray(r)
    b, h, w, c = ln.shape
    cpg = c // g
    for d in range(4):
        s = 2 * d
        for wi in range(w):
            if wi < s:
                np.testing.assert_allclose(vol[:, d, :, wi], 0.0)
            else:
                prod = (ln[:, :, wi] * rn[:, :, wi - s]).reshape(b, h, g, cpg)
                np.testing.assert_allclose(
                    vol[:, d, :, wi], prod.mean(-1), rtol=1e-5, atol=1e-6
                )


def test_correlation_volume_ones_background():
    l, r = _feats()
    vol = np.asarray(build_correlation_volume_ones(l, r, 6, 4))
    base = np.asarray(build_gwc_volume(l, r, 6, 4))
    for d in range(6):
        np.testing.assert_allclose(vol[:, d, :, :d], 1.0)  # new_ones background
        np.testing.assert_allclose(vol[:, d, :, d:], base[:, d, :, d:], rtol=1e-6)


def test_patch_aggregation_oracle():
    vol = RNG.standard_normal((1, 3, 5, 6, 2)).astype(np.float32)
    wgt = RNG.standard_normal((1, 3, 5, 6, 2)).astype(np.float32)
    got = np.asarray(patch_aggregation(jnp.asarray(vol), jnp.asarray(wgt)))
    pad = np.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    box = np.zeros_like(vol)
    for dy in range(3):
        for dx in range(3):
            box += pad[:, :, dy : dy + 5, dx : dx + 6]
    np.testing.assert_allclose(got, wgt * box, rtol=1e-5, atol=1e-6)


def test_groupwise_correlation_4d_matches_2d_per_plane():
    f1 = jnp.asarray(RNG.standard_normal((2, 3, 4, 5, 8)).astype(np.float32))
    f2 = jnp.asarray(RNG.standard_normal((2, 3, 4, 5, 8)).astype(np.float32))
    got = groupwise_correlation_4d(f1, f2, 4)
    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(got[:, d]),
            np.asarray(groupwise_correlation(f1[:, d], f2[:, d], 4)),
            rtol=1e-6,
        )


def test_spatial_transformer_nearest_gather():
    l, r = _feats(h=3, w=8, c=4)
    disp = jnp.asarray(RNG.uniform(-1.0, 9.0, (1, 2, 3, 8)).astype(np.float32))
    warped, left_e = spatial_transformer(l, r, disp)
    assert warped.shape == (1, 2, 3, 8, 4)
    rn, dn = np.asarray(r), np.asarray(disp)
    for s in range(2):
        for y in range(3):
            for x in range(8):
                coord = x - dn[0, s, y, x]
                if coord < 0 or coord > 7:
                    np.testing.assert_allclose(np.asarray(warped)[0, s, y, x], 0.0)
                else:
                    np.testing.assert_allclose(
                        np.asarray(warped)[0, s, y, x],
                        rn[0, y, int(np.clip(coord, 0, 7))],
                        rtol=1e-6,
                    )
    np.testing.assert_allclose(np.asarray(left_e)[0, 1], np.asarray(l)[0])


def test_spatial_transformer_grid_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, c, h, w, s = 1, 3, 4, 7, 2
    x = RNG.standard_normal((b, c, h, w)).astype(np.float32)
    y = RNG.standard_normal((b, c, h, w)).astype(np.float32)
    disp = RNG.uniform(-1.0, 8.0, (b, s, h, w)).astype(np.float32)

    # torch oracle == reference SpatialTransformer_grid (submodule.py:503-531)
    mh, mw = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    cx = mw[None, None] - disp
    cy = np.broadcast_to(mh[None, None], cx.shape)
    gx = cx / ((w - 1.0) / 2.0) - 1.0
    gy = cy / ((h - 1.0) / 2.0) - 1.0
    grid = torch.from_numpy(np.stack([gx, gy], axis=4).reshape(b, s * h, w, 2))
    y_ref = (
        F.grid_sample(torch.from_numpy(y), grid, mode="bilinear",
                      padding_mode="zeros", align_corners=True)
        .view(b, c, s, h, w)
        .numpy()
    )

    warped, x_e = spatial_transformer_grid(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(np.moveaxis(y, 1, -1)),
        jnp.asarray(disp),
    )
    # warped (B,S,H,W,C) → (B,C,S,H,W) to match the torch oracle layout
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(warped), -1, 1), y_ref, rtol=1e-5, atol=1e-5
    )
    assert x_e.shape == (b, s, h, w, c)


def test_forward_interpolate_identity_on_zero_flow():
    flow = np.zeros((2, 5, 6), np.float32)
    out = forward_interpolate(flow)
    np.testing.assert_allclose(out, 0.0)
    # constant rightward flow survives the splat+regrid round trip in range
    flow = np.zeros((2, 8, 8), np.float32)
    flow[0] = 2.0
    out = forward_interpolate(flow)
    assert out.shape == (2, 8, 8)
    np.testing.assert_allclose(out[0, :, 3:7], 2.0)


def test_layer_variants_shapes():
    from diffuvolume_tpu.models.layers import (
        ConvBN,
        DepthwiseConvBN3d,
        SeparableConvBN3d,
    )

    x3 = jnp.asarray(RNG.standard_normal((1, 6, 6, 6, 8)).astype(np.float32))
    for mod in (
        SeparableConvBN3d(16, 3, 2, 1),
        DepthwiseConvBN3d(16, 3, 1, 1),
        ConvBN(16, 3, 1, 1, norm="gn"),
    ):
        v = mod.init(jax.random.PRNGKey(0), x3, train=False)
        y = mod.apply(v, x3, train=False)
        expect_hw = 3 if isinstance(mod, SeparableConvBN3d) else 6
        assert y.shape == (1, expect_hw, expect_hw, expect_hw, 16)
    # GroupNorm variant must carry no batch stats
    gn = ConvBN(16, 3, 1, 1, norm="gn")
    v = gn.init(jax.random.PRNGKey(0), x3, train=False)
    assert "batch_stats" not in v


def test_separable_conv_matches_torch_factorization():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from diffuvolume_tpu.models.layers import SeparableConvBN3d

    k, s, p, cin, cout = 3, 1, 1, 4, 6
    x = RNG.standard_normal((1, cin, 5, 5, 5)).astype(np.float32)
    ref = tnn.Sequential(
        tnn.Conv3d(cin, cout, (k, 1, 1), (s, 1, 1), (p, 0, 0), bias=False),
        tnn.Conv3d(cout, cout, (1, k, 1), (1, s, 1), (0, p, 0), bias=False),
        tnn.Conv3d(cout, cout, (1, 1, k), (1, 1, s), (0, 0, p), bias=False),
    )
    mod = SeparableConvBN3d(cout, k, s, p, use_bn=False)
    params = {
        f"conv{i}": {
            "kernel": jnp.asarray(
                ref[i].weight.detach().numpy().transpose(2, 3, 4, 1, 0)
            )
        }
        for i in range(3)
    }
    got = mod.apply(
        {"params": params}, jnp.asarray(np.moveaxis(x, 1, -1)), train=False
    )
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want, rtol=1e-4, atol=1e-5
    )


def test_pcw_relu_fork_uses_relu():
    """The relu fork must be exactly Mish→ReLU (KITTI12/models/relu/pwcnet.py:18-22):
    same param tree, different activations."""
    from diffuvolume_tpu.models.pcw import PCWNet

    l = jnp.asarray(RNG.standard_normal((1, 32, 64, 3)).astype(np.float32))
    m_mish = PCWNet(max_disp=32, diffusion=False)
    m_relu = PCWNet(max_disp=32, diffusion=False, act="relu")
    v = m_mish.init(jax.random.PRNGKey(0), l, l, train=False)
    v2 = m_relu.init(jax.random.PRNGKey(0), l, l, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    out_m = m_mish.apply(v, l, l, train=False)[0][0]
    out_r = m_relu.apply(v, l, l, train=False)[0][0]
    assert not np.allclose(np.asarray(out_m), np.asarray(out_r))


def test_flo_round_trip(tmp_path):
    from diffuvolume_tpu.data.readers import read_flo, write_flo

    flow = RNG.standard_normal((6, 9, 2)).astype(np.float32)
    path = str(tmp_path / "a.flo")
    write_flo(path, flow)
    np.testing.assert_allclose(read_flo(path), flow)


def test_sintel_disparity_codec(tmp_path):
    from PIL import Image

    from diffuvolume_tpu.data.readers import read_disp_sintel

    # encode d = R*4 + G/64 + B/16384 (frame_utils.py:130-137)
    d = np.array([[8.25, 0.0], [100.0, 3.5]], np.float64)
    r = np.floor(d / 4).astype(np.uint8)
    rem = d - r * 4.0
    g = np.floor(rem * 64).astype(np.uint8)
    rem -= g / 64.0
    b = np.round(rem * 16384).astype(np.uint8)
    img = np.stack([r, g, b], axis=-1)
    dd = tmp_path / "disparities" / "x"
    oo = tmp_path / "occlusions" / "x"
    dd.mkdir(parents=True)
    oo.mkdir(parents=True)
    Image.fromarray(img).save(dd / "frame_0001.png")
    occ = np.array([[0, 0], [255, 0]], np.uint8)
    Image.fromarray(occ).save(oo / "frame_0001.png")
    disp, valid = read_disp_sintel(str(dd / "frame_0001.png"))
    np.testing.assert_allclose(disp, d, atol=1e-3)
    assert valid.tolist() == [[True, False], [False, True]]


def test_tartanair_and_read_gen(tmp_path):
    from diffuvolume_tpu.data.readers import read_disp_tartanair, read_gen

    depth = np.full((3, 4), 16.0, np.float32)
    np.save(tmp_path / "d.npy", depth)
    disp, valid = read_disp_tartanair(str(tmp_path / "d.npy"))
    np.testing.assert_allclose(disp, 5.0)
    assert valid.all()
    np.testing.assert_allclose(read_gen(str(tmp_path / "d.npy")), depth)


def test_dormant_co_transforms():
    from diffuvolume_tpu.data.augment import random_vdisp, scale_co_transform

    rng = np.random.default_rng(0)
    left = rng.uniform(0, 255, (40, 60, 3)).astype(np.float32)
    right = rng.uniform(0, 255, (40, 60, 3)).astype(np.float32)
    disp = rng.uniform(0, 30, (40, 60)).astype(np.float32)
    l2, r2, d2 = scale_co_transform(left, right, disp, 0.5)
    assert l2.shape == (20, 30, 3) and d2.shape == (20, 30)
    assert abs(d2.mean() - disp.mean() * 0.5) < 1.0  # values scale with ratio
    out = random_vdisp(right, rng, angle=0.05, px=1.0)
    assert out.shape == right.shape and not np.allclose(out, right)


def test_zoo_sintel_fallingthings_tartanair(tmp_path):
    """Glob/manifest loaders walk their directory layouts correctly."""
    import json

    from PIL import Image

    from diffuvolume_tpu.data.zoo import fetch_dataset

    # --- Sintel layout ---
    root = tmp_path / "sintel"
    for sub in ["training/clean_left/seq", "training/clean_right/seq",
                "training/disparities/seq", "training/occlusions/seq"]:
        (root / sub).mkdir(parents=True)
    img = np.zeros((4, 6, 3), np.uint8)
    Image.fromarray(img).save(root / "training/clean_left/seq/frame_0001.png")
    Image.fromarray(img).save(root / "training/clean_right/seq/frame_0001.png")
    Image.fromarray(img).save(root / "training/disparities/seq/frame_0001.png")
    Image.fromarray(np.zeros((4, 6), np.uint8)).save(
        root / "training/occlusions/seq/frame_0001.png"
    )
    ds = fetch_dataset("sintel", str(root))
    assert len(ds) == 1
    sample = ds[0]
    assert sample["left"].shape == (4, 6, 3) and sample["disp_gt"].shape == (4, 6)

    # --- FallingThings layout ---
    root = tmp_path / "ft"
    (root / "scene").mkdir(parents=True)
    Image.fromarray(img).save(root / "scene/0_left.jpg")
    Image.fromarray(img).save(root / "scene/0_right.jpg")
    Image.fromarray(np.full((4, 6), 1000, np.int32), mode="I").save(
        root / "scene/0_left.depth.png"
    )
    (root / "scene/_camera_settings.json").write_text(
        json.dumps({"camera_settings": [{"intrinsic_settings": {"fx": 768.0}}]})
    )
    (root / "filenames.txt").write_text("scene/0_left.jpg\n")
    ds = fetch_dataset("fallingthings", str(root))
    assert len(ds) == 1
    np.testing.assert_allclose(ds[0]["disp_gt"], 768.0 * 600 / 1000.0)

    # --- TartanAir layout ---
    root = tmp_path / "ta"
    (root / "env/image_left").mkdir(parents=True)
    (root / "env/depth_left").mkdir(parents=True)
    (root / "env/image_right").mkdir(parents=True)
    Image.fromarray(img).save(root / "env/image_left/0_left.png")
    Image.fromarray(img).save(root / "env/image_right/0_right.png")
    np.save(root / "env/depth_left/0_left_depth.npy", np.full((4, 6), 8.0, np.float32))
    (root / "tartanair_filenames.txt").write_text("env/image_left/0_left.png\n")
    ds = fetch_dataset("tartanair", str(root))
    assert len(ds) == 1
    np.testing.assert_allclose(ds[0]["disp_gt"], 10.0)
