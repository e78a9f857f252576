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


def test_png_fallback_all_contracts(jpegs, tmp_path):
    """Non-JPEG images (PNG here) flow through every batch API via the
    per-image cv2 fallback with the native geometry contracts: the
    reference decodes anything cv2 reads (utils/dataset.py:100)."""
    import cv2

    paths, _ = jpegs
    rng = np.random.default_rng(3)
    png = str(tmp_path / "extra.png")
    png_img = cv2.GaussianBlur(
        rng.integers(0, 255, (300, 500, 3), np.uint8), (7, 7), 3)
    cv2.imwrite(png, png_img)
    mixed = [paths[0], png, paths[1]]

    # load_batch (letterbox serving contract, upscale handle)
    pipe = native_loader.NativePipeline(input_size=640, threads=2,
                                        allow_upscale=True)
    batch, metas, nfail = pipe.load_batch(mixed)
    assert nfail == 0 and (metas[:, 0] > 0).all()
    r = min(640 / 300, 640 / 500)
    assert metas[1, 0] == pytest.approx(r, abs=1e-6)
    assert (metas[1, 3], metas[1, 4]) == (500, 300)
    # pixels: the letterboxed PNG equals the Python oracle. augment=True
    # (needed for the upscale) draws a RANDOM train interp in letterbox;
    # pin it to bilinear — the fallback's fixed interpolation — so the
    # tolerance compares like against like (was an unseeded flake).
    import random as _random
    _orig_choice = _random.choice
    _random.choice = lambda seq: cv2.INTER_LINEAR
    try:
        ref, ratio, pad = letterbox(png_img, 640, augment=True)  # upscale
    finally:
        _random.choice = _orig_choice
    diff = np.abs(batch[1].astype(np.int16)
                  - ref[:, :, ::-1].astype(np.int16))
    assert diff.mean() < 1.5 and np.quantile(diff, 0.99) <= 6

    # load_batch_raw (device-letterbox staging)
    staged, dims, nfail = pipe.load_batch_raw(mixed, 256)
    assert nfail == 0
    sh, sw, oh, ow = dims[1].astype(int)
    assert (oh, ow) == (300, 500)
    d = 256 / 500
    assert (sh, sw) == (min(int(round(300 * d)), 256),
                        min(int(round(500 * d)), 256))
    assert staged[1, :sh, :sw].any() and not staged[1, sh:, :].any()

    # load_batch_scaled (train staging: truncated long-side contract)
    staged, dims, nfail = pipe.load_batch_scaled(mixed, 256)
    assert nfail == 0
    sh, sw, oh, ow = dims[1].astype(int)
    r = 256 / 500
    assert (sh, sw, oh, ow) == (int(300 * r), 256, 300, 500)
    assert staged[1, :sh, :sw].any()

    # a file neither decoder reads is still a failure
    bad = str(tmp_path / "junk.png")
    open(bad, "wb").write(b"not an image at all")
    _, metas, nfail = pipe.load_batch([paths[0], bad])
    assert nfail == 1 and metas[1, 0] == -1


def test_png_through_device_augment_and_stream(jpegs, tmp_path):
    """End-to-end: a PNG-containing dataset trains via --device-augment
    staging and serves via Detector.stream with correct boxes."""
    import cv2

    import jax
    import jax.numpy as jnp

    from tpu_yolo.data.device_augment import DeviceAugmentLoader
    from tpu_yolo.ops.augment_device import augment_batch

    rng = np.random.default_rng(5)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    files = []
    for i in range(4):
        ext = "png" if i == 1 else "jpg"
        p = str(img_dir / f"im{i}.{ext}")
        cv2.imwrite(p, rng.integers(0, 256, (90, 120, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        files.append(p)

    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.0, "flip_lr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
           "mosaic": 1.0, "mix_up": 0.0}
    loader = DeviceAugmentLoader(files, 128, hyp, batch_size=4, threads=2)
    staged, params, targets = next(iter(loader))
    # every quadrant decoded (no blank slots): each mosaic uses 4 picks
    # from 4 files, so the PNG appears somewhere
    assert not [(b, q) for b in range(4) for q in range(4)
                if not staged[b, q].any()]
    out = np.asarray(augment_batch(
        jnp.asarray(staged),
        jax.tree_util.tree_map(jnp.asarray, params), out_size=128))
    assert out.shape == (4, 128, 128, 3)

    # serving: stream over a PNG returns boxes in original pixel space
    from tpu_yolo.core.config import ModelConfig
    from tpu_yolo.models import yolov11
    from tpu_yolo.serve import Detector

    cfg = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                      csp=(False, True), num_classes=8)
    params_m = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    det = Detector(params_m, cfg, input_size=128, conf_thres=1e-6)
    results = list(det.stream([files[1]], batch_size=1))
    assert len(results) == 1
    assert "error" not in results[0]
    b = results[0]["boxes"]
    if len(b):
        assert (b[:, [0, 2]] <= 120).all() and (b[:, [1, 3]] <= 90).all()


@pytest.fixture(scope="module")
def eval_mini_coco(tmp_path_factory):
    """Mini val set in COCO layout, PNG + JPEG variants of the same
    scenes (PNG decode goes through the bit-identical cv2 fallback;
    JPEG exercises the native libjpeg pool)."""
    import cv2

    root = tmp_path_factory.mktemp("eval_mini_coco")
    rng = np.random.default_rng(3)
    sets = {}
    for ext in ("png", "jpg"):
        img_dir = root / ext / "images" / "val2017"
        lbl_dir = root / ext / "labels" / "val2017"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        names = []
        # odd/uneven sizes: downscale, upscale, exact, extreme aspect
        for i, (h, w) in enumerate([(48, 80), (96, 64), (64, 64),
                                    (33, 127), (200, 40), (64, 48)]):
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            img[h // 4: h // 2, w // 4: w // 2] = (255, 30, 30)
            p = str(img_dir / f"im{i}.{ext}")
            cv2.imwrite(p, img)
            (lbl_dir / f"im{i}.txt").write_text(
                f"{i % 3} 0.375 0.375 0.25 0.25\n")
            names.append(p)
        sets[ext] = names
    return sets


def _make_eval_loaders(files, batch_size=4, input_size=64):
    from tpu_yolo.core.config import load_hyperparams
    from tpu_yolo.data.dataset import DetectionDataset
    from tpu_yolo.data.loader import DataLoader
    from tpu_yolo.data.native_loader import NativeEvalLoader

    hyp = load_hyperparams()
    ds = DetectionDataset(files, input_size, hyp, augment=False)
    return (DataLoader(ds, batch_size, shuffle=False, num_workers=2),
            NativeEvalLoader(ds, batch_size, threads=2))


def test_native_eval_loader_bit_identical_png(eval_mini_coco):
    """PNG decode falls back to cv2 with the mirrored eval geometry ->
    images AND targets bit-identical to the Python eval Dataset, hence
    identical mAP end-to-end (VERDICT r3 item 2; reference eval loader
    main.py:232-234)."""
    import jax

    from tpu_yolo.core.config import ModelConfig
    from tpu_yolo.eval.evaluator import evaluate
    from tpu_yolo.models import yolov11

    py_loader, nat_loader = _make_eval_loaders(eval_mini_coco["png"])
    assert len(py_loader) == len(nat_loader)
    for (ia, ta), (ib, tb) in zip(py_loader, nat_loader):
        np.testing.assert_array_equal(ia, ib)
        for k in ("cls", "box", "idx"):
            np.testing.assert_array_equal(
                np.asarray(ta[k], np.float32), np.asarray(tb[k], np.float32))

    cfg = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                      csp=(False, True), num_classes=8)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    res_py = evaluate(params, py_loader, cfg, 64)
    res_nat = evaluate(params, nat_loader, cfg, 64)
    assert res_py == res_nat  # bit-identical inputs -> identical tuple


def test_native_eval_loader_jpeg_contract(eval_mini_coco):
    """JPEGs run the native libjpeg pool: label geometry bit-identical,
    pixel values within the decoder tolerance, mAP through both loaders
    agrees on the mini set."""
    import jax

    from tpu_yolo.core.config import ModelConfig
    from tpu_yolo.eval.evaluator import evaluate
    from tpu_yolo.models import yolov11

    py_loader, nat_loader = _make_eval_loaders(eval_mini_coco["jpg"])
    import cv2

    sizes = [cv2.imread(p).shape[:2] for p in eval_mini_coco["jpg"]]
    img_i = 0
    for (ia, ta), (ib, tb) in zip(py_loader, nat_loader):
        for k in ("cls", "box", "idx"):
            np.testing.assert_array_equal(
                np.asarray(ta[k], np.float32), np.asarray(tb[k], np.float32))
        diff = np.abs(ia.astype(np.int16) - ib.astype(np.int16))
        assert diff.mean() < 1.5 and np.quantile(diff, 0.99) <= 6
        # identical placement geometry: the load_image + letterbox
        # contract's padding borders are exactly zero in BOTH loaders
        for b in range(ia.shape[0]):
            h, w = sizes[img_i]
            r = 64 / max(h, w)
            sh, sw = (int(h * r), int(w * r)) if r != 1 else (h, w)
            top = int(round((64 - sh) / 2 - 0.1))
            left = int(round((64 - sw) / 2 - 0.1))
            for im in (ia, ib):
                content = im[b, top:top + sh, left:left + sw]
                border = im[b].copy()
                border[top:top + sh, left:left + sw] = 0
                assert content.any() and not border.any()
            img_i += 1

    cfg = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                      csp=(False, True), num_classes=8)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    res_py = evaluate(params, py_loader, cfg, 64)
    res_nat = evaluate(params, nat_loader, cfg, 64)
    assert abs(res_py[0] - res_nat[0]) < 0.05   # mAP
    assert abs(res_py[1] - res_nat[1]) < 0.05   # mAP50


def test_scaled_interp_modes_match_cv2(jpegs):
    """The random-interp prescale (round 5): every _TRAIN_INTERPS mode
    of the C++ resampler vs cv2.resize on the same decode, per-image
    codes honored. Tolerances widen with kernel sharpness (cubic /
    lanczos ring on the libjpeg-vs-cv2 decode LSB diffs)."""
    import cv2

    paths, _ = jpegs
    pipe = native_loader.NativePipeline(640, threads=2)
    stage = 320
    modes = [(0, cv2.INTER_NEAREST, 1.5, 6), (1, cv2.INTER_LINEAR, 1.5, 6),
             (2, cv2.INTER_CUBIC, 2.0, 10), (3, cv2.INTER_AREA, 1.5, 6),
             (4, cv2.INTER_LANCZOS4, 2.5, 14)]
    for code, flag, mtol, qtol in modes:
        staged, dims, nfail = pipe.load_batch_scaled(
            paths, stage, interps=[code] * len(paths))
        assert nfail == 0
        for i, p in enumerate(paths):
            ref = cv2.imread(p)[:, :, ::-1]
            h, w = ref.shape[:2]
            r = stage / max(h, w)
            sh, sw = ((max(int(h * r), 1), max(int(w * r), 1))
                      if max(h, w) != stage else (h, w))
            assert (int(dims[i][0]), int(dims[i][1])) == (sh, sw)
            exp = (cv2.resize(ref, (sw, sh), interpolation=flag)
                   if (sh, sw) != (h, w) else ref)
            diff = np.abs(staged[i, :sh, :sw].astype(np.int16)
                          - exp.astype(np.int16))
            assert diff.mean() < mtol, (code, p, diff.mean())
            assert np.quantile(diff, 0.99) <= qtol, \
                (code, p, np.quantile(diff, 0.99))

    # mixed per-image codes in ONE batch: each slot gets its own mode
    codes = [0, 2, 3, 4]
    staged, dims, nfail = pipe.load_batch_scaled(paths, stage,
                                                 interps=codes)
    assert nfail == 0
    for i, (p, code) in enumerate(zip(paths, codes)):
        ref = cv2.imread(p)[:, :, ::-1]
        h, w = ref.shape[:2]
        r = stage / max(h, w)
        sh, sw = ((max(int(h * r), 1), max(int(w * r), 1))
                  if max(h, w) != stage else (h, w))
        flag = [cv2.INTER_NEAREST, cv2.INTER_LINEAR, cv2.INTER_CUBIC,
                cv2.INTER_AREA, cv2.INTER_LANCZOS4][code]
        exp = (cv2.resize(ref, (sw, sh), interpolation=flag)
               if (sh, sw) != (h, w) else ref)
        diff = np.abs(staged[i, :sh, :sw].astype(np.int16)
                      - exp.astype(np.int16))
        assert diff.mean() < 2.5 and np.quantile(diff, 0.99) <= 14, \
            (code, p)
