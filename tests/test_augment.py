"""Augmentation pipeline tests (host-side geometry + statistics)."""
import random

import numpy as np
import pytest

from tpu_yolo.data import augment as A

IDENTITY_HYP = {"degrees": 0.0, "scale": 0.0, "shear": 0.0, "translate": 0.0}


def test_corner_roundtrip():
    rng = np.random.default_rng(0)
    norm = np.zeros((8, 4), np.float32)
    norm[:, :2] = rng.uniform(0.3, 0.7, (8, 2))
    norm[:, 2:] = rng.uniform(0.05, 0.2, (8, 2))
    px = A.denorm_corners(norm, 640, 480)
    back = A.corners_to_norm(px.copy(), 640, 480)
    np.testing.assert_allclose(back, norm, atol=1e-5)


def test_denorm_with_pad():
    norm = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    px = A.denorm_corners(norm, 100, 100, pad_w=10, pad_h=20)
    np.testing.assert_allclose(px[0], [40 + 10, 40 + 20, 60 + 10, 60 + 20])


def test_random_affine_identity_keeps_boxes():
    random.seed(0)
    img = np.zeros((128, 128, 3), np.uint8)
    label = np.array([[0, 20.0, 30.0, 80.0, 90.0]], np.float32)
    # translate=0 centers the 0.5 offset -> shift by exactly (w/2, h/2)?
    # with translate=0 the matrix translates by 0.5*out, so compare via a
    # zero-centered variant: full-identity needs translate handled below.
    out_img, out_lbl = A.random_affine(img.copy(), label.copy(), IDENTITY_HYP)
    assert out_img.shape == img.shape
    assert out_lbl.shape[0] == 1
    # pure translation by (out/2, out/2) relative to the centering matrix
    w = label[0, 3] - label[0, 1]
    got_w = out_lbl[0, 3] - out_lbl[0, 1]
    assert got_w == pytest.approx(w, abs=1e-3)


def test_affine_survival_filter_drops_degenerates():
    before = np.array([[10, 10], [10, 10], [50, 110], [50, 110]], np.float32)
    after = np.array([[0, 0], [0, 0], [1.5, 100], [1.5, 1]], np.float32)
    keep = A._box_survives(before, after)
    assert not keep[0]  # too small after warp
    assert not keep[1]  # extreme aspect/area


def test_hsv_jitter_shape_and_range():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    orig = img.copy()
    np.random.seed(3)
    out = A.hsv_jitter(img, 0.015, 0.7, 0.4)
    assert out.dtype == np.uint8 and out.shape == orig.shape
    assert (out != orig).any()  # actually changed something


def test_mixup_blend():
    np.random.seed(0)
    a = np.full((8, 8, 3), 200, np.uint8)
    b = np.zeros((8, 8, 3), np.uint8)
    la = np.array([[0, 1, 1, 5, 5]], np.float32)
    lb = np.array([[1, 2, 2, 6, 6]], np.float32)
    img, lbl = A.mixup(a, la, b, lb)
    assert lbl.shape == (2, 5)
    # Beta(32,32) concentrates near 0.5
    assert 50 < img.mean() < 150


def test_mosaic_labels_inside_canvas():

    class FakeDS:
        input_size = 64
        indices = range(4)
        labels = [np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)] * 4

        def read_image(self, i):
            rng = np.random.default_rng(i)
            return rng.integers(0, 255, (48, 64, 3), np.uint8), (48, 64)

    random.seed(1)
    hyp = dict(IDENTITY_HYP, scale=0.5, translate=0.1)
    img, label = A.mosaic4(FakeDS(), 0, hyp)
    assert img.shape == (64, 64, 3)
    if len(label):
        assert (label[:, 1:] >= 0).all()
        assert (label[:, 1:] <= 64).all()


def test_photometric_jitter_forced():
    """p=1 applies every perturbation; output stays uint8 same-shape."""
    random.seed(0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    out = A.photometric_jitter(img.copy(), p=1.0)
    assert out.shape == img.shape and out.dtype == np.uint8
    # grayscale happened somewhere in the chain -> channels equal
    assert (out[..., 0] == out[..., 1]).all() or (out != img).any()
    # p=0 is the identity
    same = A.photometric_jitter(img.copy(), p=0.0)
    np.testing.assert_array_equal(same, img)
