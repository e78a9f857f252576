"""On-device letterbox (ops/letterbox.py) vs the host cv2 geometry oracle
(data/image.py::letterbox — the frozen reference contract,
utils/dataset.py:292-313). Geometry must match exactly; interpolated
pixel values to the same tolerance as the native C++ loader tests
(mean |diff| < 1.5, q99 <= 6 — cv2 uses fixed-point taps)."""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from tpu_yolo.data.image import letterbox
from tpu_yolo.ops.letterbox import letterbox_batch

S = 192          # output size (small: CPU test)
STAGE = 256      # staging buffer


def _stage(imgs):
    """Top-left anchor originals into one (B, STAGE, STAGE, 3) buffer."""
    batch = np.zeros((len(imgs), STAGE, STAGE, 3), np.uint8)
    hw = np.zeros((len(imgs), 2), np.float32)
    for i, im in enumerate(imgs):
        h, w = im.shape[:2]
        batch[i, :h, :w] = im
        hw[i] = (h, w)
    return jnp.asarray(batch), jnp.asarray(hw)


def _cv2_single_resize_letterbox(img, size, allow_upscale):
    """Oracle: ONE cv2 resize at r=min(S/h,S/w) + center pad — the
    combined serving transform (serve.py::_decode_batch docstring)."""
    h, w = img.shape[:2]
    r = min(size / h, size / w)
    if not allow_upscale:
        r = min(r, 1.0)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    if (new_w, new_h) != (w, h):
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    pad_w, pad_h = (size - new_w) / 2, (size - new_h) / 2
    top, bottom = int(round(pad_h - 0.1)), int(round(pad_h + 0.1))
    left, right = int(round(pad_w - 0.1)), int(round(pad_w + 0.1))
    out = cv2.copyMakeBorder(img, top, bottom, left, right,
                             cv2.BORDER_CONSTANT)
    return out, (r, pad_w, pad_h)


SIZES = [(200, 150), (150, 200), (117, 93), (192, 192), (256, 96),
         (40, 64)]  # last one upscales


@pytest.mark.parametrize("allow_upscale", [True, False])
def test_matches_cv2_oracle(allow_upscale):
    rng = np.random.default_rng(0)
    # smooth-ish content: pure noise maximizes interpolation disagreement
    imgs = []
    for h, w in SIZES:
        base = rng.integers(0, 256, (h // 4 + 2, w // 4 + 2, 3), np.uint8)
        imgs.append(cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC))

    batch, hw = _stage(imgs)
    out, metas = letterbox_batch(batch, hw, out_size=S,
                                 allow_upscale=allow_upscale)
    out, metas = np.asarray(out), np.asarray(metas)

    for i, im in enumerate(imgs):
        ref, (r, pad_w, pad_h) = _cv2_single_resize_letterbox(
            im, S, allow_upscale)
        assert ref.shape == (S, S, 3)
        assert metas[i, 0] == pytest.approx(r, abs=1e-6)
        assert metas[i, 1] == pytest.approx(pad_w, abs=1e-4)
        assert metas[i, 2] == pytest.approx(pad_h, abs=1e-4)
        assert tuple(metas[i, 3:5]) == (im.shape[1], im.shape[0])

        # pad region: exactly the fill value, exactly where cv2 put it
        placed = np.zeros((S, S), bool)
        top = int(round(pad_h - 0.1))
        left = int(round(pad_w - 0.1))
        nh, nw = int(round(im.shape[0] * r)), int(round(im.shape[1] * r))
        placed[top:top + nh, left:left + nw] = True
        assert (out[i][~placed] == 0).all(), f"image {i}: fill leaked"

        diff = np.abs(out[i][placed].astype(np.int16)
                      - ref[placed].astype(np.int16))
        assert diff.mean() < 1.5, f"image {i}: mean abs diff {diff.mean()}"
        assert np.quantile(diff, 0.99) <= 6, f"image {i}"


def test_identity_when_already_square():
    """r == 1, no resize: the output must be a bit-exact copy."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (S, S, 3), np.uint8)
    batch, hw = _stage([img])
    out, metas = letterbox_batch(batch, hw, out_size=S,
                                 allow_upscale=False)
    np.testing.assert_array_equal(np.asarray(out)[0], img)
    assert np.asarray(metas)[0, 0] == 1.0


def test_custom_fill():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (S // 2, S, 3), np.uint8)
    batch, hw = _stage([img])
    out, _ = letterbox_batch(batch, hw, out_size=S, fill=114.0)
    out = np.asarray(out)[0]
    assert (out[0] == 114).all() and (out[-1] == 114).all()
