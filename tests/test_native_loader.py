"""Native C++ data-path vs the Python/OpenCV oracle: decode parity,
letterbox geometry equality, batch API, failure handling."""
import numpy as np
import pytest

from tpu_yolo.data import native_loader
from tpu_yolo.data.image import letterbox

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native lib not built")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, (h, w) in enumerate([(480, 640), (640, 480), (100, 100), (719, 405)]):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        img = cv2.GaussianBlur(img, (7, 7), 3)  # JPEG-friendly content
        p = str(root / f"im{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
        arrays.append(img)
    return paths, arrays


def test_decode_matches_opencv(jpegs):
    """Same libjpeg underneath -> near-identical pixels."""
    import cv2

    paths, _ = jpegs
    pipe = native_loader.NativePipeline(input_size=640, threads=2)
    for p in paths[:2]:
        with open(p, "rb") as f:
            ours, meta = pipe.load_one(f.read())
        ref_bgr = cv2.imread(p)
        ref, ratio, pad = letterbox(ref_bgr, 640, augment=False)
        ref = ref[:, :, ::-1]  # BGR -> RGB
        assert ours.shape == ref.shape == (640, 640, 3)
        assert meta["ratio"] == pytest.approx(ratio[0], abs=1e-6)
        diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
        # decode identical; resize interpolation may differ by a few LSB
        assert np.mean(diff) < 1.5, f"mean abs diff {np.mean(diff)}"
        assert np.quantile(diff, 0.99) <= 6


def test_letterbox_geometry_exact(jpegs):
    """Pad/ratio bookkeeping must equal the Python oracle bit-for-bit —
    boxes are rescaled with it (frozen reference contract)."""
    import cv2

    paths, _ = jpegs
    pipe = native_loader.NativePipeline(input_size=320, threads=2)
    for p in paths:
        with open(p, "rb") as f:
            ours, meta = pipe.load_one(f.read())
        ref_bgr = cv2.imread(p)
        _, ratio, (pad_w, pad_h) = letterbox(ref_bgr, 320, augment=False)
        assert meta["ratio"] == pytest.approx(ratio[0], abs=1e-6)
        assert meta["pad_w"] == pytest.approx(pad_w, abs=1e-4)
        assert meta["pad_h"] == pytest.approx(pad_h, abs=1e-4)


def test_batch_api_and_failures(jpegs, tmp_path):
    paths, _ = jpegs
    bad = str(tmp_path / "corrupt.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8 definitely not a jpeg")
    pipe = native_loader.NativePipeline(input_size=640, threads=4)
    batch, metas, nfail = pipe.load_batch(paths + [bad, "/nonexistent.jpg"])
    assert batch.shape == (6, 640, 640, 3)
    assert nfail == 2
    assert metas[4, 0] == -1 and metas[5, 0] == -1
    assert (metas[:4, 0] > 0).all()
    # batch result equals one-by-one result
    with open(paths[0], "rb") as f:
        one, _ = pipe.load_one(f.read())
    np.testing.assert_array_equal(batch[0], one)


def test_load_batch_raw_staging(jpegs):
    """Raw staging path: decode only (bit-identical to cv2's libjpeg for
    images that fit the stage), top-left anchored, dims recorded; larger
    images pre-shrunk so the long side == stage."""
    import cv2

    from tpu_yolo.data.native_loader import NativePipeline

    pipe = NativePipeline(640, threads=4, allow_upscale=True)
    paths, _ = jpegs
    stage = 512
    staged, dims, nfail = pipe.load_batch_raw(paths, stage)
    assert nfail == 0
    assert staged.shape == (len(paths), stage, stage, 3)
    for i, p in enumerate(paths):
        ref = cv2.imread(p)[:, :, ::-1]
        h, w = ref.shape[:2]
        sh, sw, oh, ow = dims[i].astype(int)
        assert (oh, ow) == (h, w)
        if max(h, w) <= stage:
            assert (sh, sw) == (h, w)
            diff = np.abs(staged[i, :h, :w].astype(np.int16)
                          - ref.astype(np.int16))
            # decode-only: same tolerance as test_decode_matches_opencv
            # (libjpeg vs cv2's jpeg backend may differ in IDCT rounding)
            assert diff.mean() < 1.5 and np.quantile(diff, 0.99) <= 6
        else:
            d = stage / max(h, w)
            assert sh in (round(h * d), stage) and sw in (round(w * d), stage)
            exp = cv2.resize(ref, (sw, sh), interpolation=cv2.INTER_LINEAR)
            diff = np.abs(staged[i, :sh, :sw].astype(np.int16)
                          - exp.astype(np.int16))
            assert diff.mean() < 1.5 and np.quantile(diff, 0.99) <= 6
        # outside the placed region: zero
        assert (staged[i, sh:, :] == 0).all()
        assert (staged[i, :, sw:] == 0).all()
