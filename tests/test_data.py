"""Data pipeline tests: readers round-trip, augmentations, meters, padding."""

import io
import os

import numpy as np
import pytest

from diffuvolume_tpu.data.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_gamma,
    occlusion_patch,
    photometric_jitter,
    random_crop,
    resize_sparse_disparity,
    sparse_spatial_transform,
)
from diffuvolume_tpu.data.readers import read_pfm, write_pfm
from diffuvolume_tpu.data.sceneflow import IMAGENET_MEAN, IMAGENET_STD, normalize_image
from diffuvolume_tpu.utils.meters import AverageMeter, AverageMeterDict

RNG = np.random.default_rng(5)


def test_pfm_roundtrip(tmp_path):
    data = RNG.standard_normal((7, 9)).astype(np.float32)
    path = str(tmp_path / "x.pfm")
    write_pfm(path, data)
    out, scale = read_pfm(path)
    np.testing.assert_allclose(out, data)


def test_normalize_image():
    img = np.full((2, 2, 3), 255.0, np.float32)
    out = normalize_image(img)
    expect = np.broadcast_to((1.0 - IMAGENET_MEAN) / IMAGENET_STD, out.shape)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_photometric_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    from PIL import Image

    img = RNG.integers(0, 255, (16, 20, 3)).astype(np.uint8)
    pil = Image.fromarray(img)
    tf = torchvision.transforms.functional
    np.testing.assert_allclose(
        adjust_brightness(img.astype(np.float32), 1.4),
        np.asarray(tf.adjust_brightness(pil, 1.4), np.float32), atol=1.0,
    )
    np.testing.assert_allclose(
        adjust_gamma(img.astype(np.float32), 1.1),
        np.asarray(tf.adjust_gamma(pil, 1.1), np.float32), atol=1.0,
    )
    np.testing.assert_allclose(
        adjust_contrast(img.astype(np.float32), 0.8),
        np.asarray(tf.adjust_contrast(pil, 0.8), np.float32), atol=1.5,
    )


def test_random_crop_and_occlusion():
    rng = np.random.default_rng(0)
    a = RNG.standard_normal((300, 400, 3)).astype(np.float32)
    b = a.copy()
    d = RNG.uniform(0, 100, (300, 400)).astype(np.float32)
    ca, cb, cd = random_crop([a, b, d], (256, 384), rng)
    assert ca.shape == (256, 384, 3) and cd.shape == (256, 384)
    occ = occlusion_patch(cb, np.random.default_rng(1), p=1.0)
    assert (occ != cb).any()


def test_sparse_resize_scatter():
    disp = np.zeros((10, 10), np.float32)
    valid = np.zeros((10, 10), np.float32)
    disp[5, 5] = 4.0
    valid[5, 5] = 1.0
    d2, v2 = resize_sparse_disparity(disp, valid, 2.0, 2.0)
    assert d2.shape == (20, 20)
    assert v2.sum() == 1
    # the scaled point lands at (10, 10) with disparity scaled by fx
    assert d2[10, 10] == 8.0


def test_sparse_spatial_transform_shapes():
    rng = np.random.default_rng(2)
    img = RNG.uniform(0, 255, (400, 900, 3)).astype(np.float32)
    disp = RNG.uniform(0, 100, (400, 900)).astype(np.float32)
    valid = (RNG.uniform(size=(400, 900)) > 0.5).astype(np.float32)
    i1, i2, d, v = sparse_spatial_transform(
        img, img.copy(), disp, valid, (320, 736), rng
    )
    assert i1.shape == (320, 736, 3)
    assert d.shape == (320, 736)
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_meters():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.mean() == 2.0
    md = AverageMeterDict()
    md.update({"a": 1.0, "b": [1.0, 2.0]})
    md.update({"a": 3.0, "b": [3.0, 4.0]})
    out = md.mean()
    assert out["a"] == 2.0 and out["b"] == [2.0, 3.0]
