"""Native-decode train loader (data/native_train.py) vs the host
Python/OpenCV path: refactor identities, pixel-assembly oracles, and a
full-loader bit-identity run on PNG sources (where the native decode
falls back to cv2 bit-identically — the eval-loader test pattern,
tests/test_native_loader.py)."""
import numpy as np
import pytest

from tpu_yolo.data import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native lib not built")


def test_hsv_apply_refactor_identity():
    """hsv_jitter == hsv_apply with the same drawn gains (the refactor
    that lets loaders pre-draw per-sample parameters must be a pure
    split, bit for bit)."""
    from tpu_yolo.data import augment as A

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 56, 3), np.uint8)
    r = np.random.RandomState(7).uniform(-1, 1, 3) * [0.015, 0.7, 0.4] + 1

    a = img.copy()
    A.hsv_apply(a, r)

    b = img.copy()
    orig = np.random.uniform
    np.random.uniform = lambda lo, hi, size=None: (r - 1) / np.array(
        [0.015, 0.7, 0.4])  # inverse of the jitter transform
    try:
        A.hsv_jitter(b, 0.015, 0.7, 0.4)
    finally:
        np.random.uniform = orig
    np.testing.assert_array_equal(a, b)


def test_photometric_apply_refactor_identity():
    """photometric_jitter == draw_photometric + photometric_apply under
    a scripted RNG (each op triggered at least once)."""
    import random as _random

    from tpu_yolo.data import augment as A

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)

    class Scripted:
        """random()-> below/above p script; choice -> fixed."""

        def __init__(self, hits):
            self.hits = list(hits)

        def random(self):
            return 0.0 if self.hits.pop(0) else 1.0

        def choice(self, seq):
            return seq[0]

    for hits in ([1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
                 [1, 1, 1, 1], [0, 0, 0, 0]):
        d = A.draw_photometric(Scripted(hits))
        a = A.photometric_apply(img.copy(), d)

        s = Scripted(hits)
        orig_r, orig_c = _random.random, _random.choice
        _random.random, _random.choice = s.random, s.choice
        try:
            b = A.photometric_jitter(img.copy())
        finally:
            _random.random, _random.choice = orig_r, orig_c
        np.testing.assert_array_equal(a, b, err_msg=str(hits))


def test_pixel_assembly_mosaic_matches_manual_cv2():
    """assemble_pixels_mosaic == an independent replay of the mosaic4 +
    random_affine image ops (quadrant paste into the 2S canvas, one
    warpAffine back to S) on the same staged sources, bit for bit."""
    import cv2

    from tpu_yolo.data.device_augment import (_compose_affine,
                                              _mosaic_placement)
    from tpu_yolo.data.native_train import assemble_pixels_mosaic

    rng = np.random.default_rng(2)
    size = 64
    dims = np.array([[48, 64], [64, 40], [64, 64], [30, 64]], np.float32)
    staged = np.zeros((4, size, size, 3), np.uint8)   # BGR staging
    for q, (h, w) in enumerate(dims.astype(int)):
        staged[q, :h, :w] = rng.integers(0, 256, (h, w, 3), np.uint8)

    draw = {"xc": 70, "yc": 58, "s": 0.83, "tx": 0.47 * size,
            "ty": 0.55 * size, "flip_ud": False, "flip_lr": True,
            "gains": np.ones(3)}

    got = assemble_pixels_mosaic(draw, staged, dims, size)

    canvas = np.zeros((size * 2, size * 2, 3), np.uint8)
    for q, (h, w) in enumerate(dims.astype(int)):
        (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
            q, draw["xc"], draw["yc"], w, h, size)
        canvas[y1a:y2a, x1a:x2a] = staged[q, y1b:y2b, x1b:x2b]
    m = _compose_affine(draw["s"], 0, 0, 0, draw["tx"], draw["ty"],
                        size, size)
    exp = cv2.warpAffine(canvas, m[:2], dsize=(size, size),
                         borderValue=(0, 0, 0))
    np.testing.assert_array_equal(got, exp)

    # a failed quadrant contributes no pixels
    got_f = assemble_pixels_mosaic(draw, staged, dims, size,
                                   failed=frozenset({2}))
    canvas2 = np.zeros((size * 2, size * 2, 3), np.uint8)
    for q, (h, w) in enumerate(dims.astype(int)):
        if q == 2:
            continue
        (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
            q, draw["xc"], draw["yc"], w, h, size)
        canvas2[y1a:y2a, x1a:x2a] = staged[q, y1b:y2b, x1b:x2b]
    exp_f = cv2.warpAffine(canvas2, m[:2], dsize=(size, size),
                           borderValue=(0, 0, 0))
    np.testing.assert_array_equal(got_f, exp_f)


def test_pixel_assembly_plain_matches_letterbox_warp():
    """assemble_pixels_plain == letterbox(augment=True) + warpAffine on
    the same prescaled source: with long side == S the train letterbox
    is the pure centered round(pad -/+ 0.1) pad (data/image.py:41-64)."""
    import cv2

    from tpu_yolo.data.device_augment import _compose_affine
    from tpu_yolo.data.image import letterbox
    from tpu_yolo.data.native_train import assemble_pixels_plain

    rng = np.random.default_rng(3)
    size = 64
    for sh, sw in ((48, 64), (64, 33), (64, 64)):
        src_bgr = rng.integers(0, 256, (sh, sw, 3), np.uint8)
        staged = np.zeros((size, size, 3), np.uint8)    # BGR staging
        staged[:sh, :sw] = src_bgr

        draw = {"s": 1.12, "tx": 0.51 * size, "ty": 0.44 * size}
        got = assemble_pixels_plain(draw, staged, sh, sw, size)

        # oracle: the host letterbox (random interp never fires: long
        # side == S means no resize) + the random_affine warp
        lb, ratio, pad = letterbox(src_bgr, size, augment=True)
        assert lb.shape == (size, size, 3) and ratio[0] == 1.0
        m = _compose_affine(draw["s"], 0, 0, 0, draw["tx"], draw["ty"],
                            size / 2, size / 2)
        exp = cv2.warpAffine(lb, m[:2], dsize=(size, size),
                             borderValue=(0, 0, 0))
        np.testing.assert_array_equal(got, exp, err_msg=f"{sh}x{sw}")


@pytest.fixture(scope="module")
def train_mini_coco(tmp_path_factory):
    """Mini train set in COCO layout, PNG and JPEG variants of the same
    scenes (PNG: native decode falls back to cv2 bit-identically)."""
    import cv2

    root = tmp_path_factory.mktemp("train_mini_coco")
    rng = np.random.default_rng(5)
    sets = {}
    for ext in ("png", "jpg"):
        img_dir = root / ext / "images" / "train2017"
        lbl_dir = root / ext / "labels" / "train2017"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        names = []
        for i, (h, w) in enumerate([(60, 100), (120, 80), (64, 64),
                                    (45, 150), (200, 50), (90, 90)]):
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            img[h // 4: h // 2, w // 4: w // 2] = (30, 200, 30)
            p = str(img_dir / f"im{i}.{ext}")
            cv2.imwrite(p, img)
            (lbl_dir / f"im{i}.txt").write_text(
                f"{i % 3} 0.375 0.375 0.25 0.25\n"
                f"{(i + 1) % 3} 0.7 0.7 0.2 0.2\n")
            names.append(p)
        sets[ext] = names
    return sets


_HYP = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.0, "flip_lr": 0.5,
        "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        "mosaic": 1.0, "mix_up": 0.3, "degrees": 0.0, "shear": 0.0}


def test_native_train_loader_contract_and_determinism(train_mini_coco):
    """Batch contract (collate() shapes/dtypes, boxes in [0,1], idx
    mapping), same-seed reproducibility, epoch reshuffle, and the
    mosaic-cutoff plain path."""
    from tpu_yolo.data.native_train import NativeTrainLoader

    loader = NativeTrainLoader(train_mini_coco["jpg"], 64, _HYP,
                               batch_size=3, threads=2, seed=0)
    assert len(loader) == 2
    b1 = list(loader)
    b2 = list(loader)                    # same epoch -> identical
    assert len(b1) == 2
    for (ia, ta), (ib, tb) in zip(b1, b2):
        np.testing.assert_array_equal(ia, ib)
        for k in ("cls", "box", "idx"):
            np.testing.assert_array_equal(ta[k], tb[k])
    for images, t in b1:
        assert images.shape == (3, 64, 64, 3) and images.dtype == np.uint8
        assert t["cls"].shape[1:] == (1,) and t["box"].shape[1:] == (4,)
        assert t["idx"].ndim == 1 and len(t["idx"]) == len(t["cls"])
        if len(t["box"]):
            assert (t["box"] >= 0).all() and (t["box"] <= 1).all()
            assert set(np.unique(t["idx"])) <= {0.0, 1.0, 2.0}

    loader.set_epoch(1)
    b3 = list(loader)                    # reshuffled epoch differs
    assert any(not np.array_equal(a[0], b[0]) for a, b in zip(b1, b3))

    loader.mosaic = False                # final-10-epochs cutoff
    loader.set_epoch(0)
    for images, t in loader:
        assert images.shape == (3, 64, 64, 3)


def test_native_train_loader_bit_identical_vs_cv2_oracle(train_mini_coco):
    """Full-loader bit-identity on PNG sources: replay the loader's own
    draw stream, but decode + prescale + paste + warp + HSV + flip with
    INDEPENDENT cv2/numpy code (the host-path ops) — images AND labels
    must match bit for bit. On PNGs the native pipeline's cv2 fallback
    makes decode identical, so any pixel diff is an assembly bug."""
    import cv2
    import random as _random

    from tpu_yolo.data.augment import (denorm_corners, hsv_apply,
                                       warp_labels_affine)
    from tpu_yolo.data.device_augment import (_compose_affine,
                                              _mosaic_placement)
    from tpu_yolo.data.native_train import NativeTrainLoader

    files = train_mini_coco["png"]
    size = 64
    # interp="bilinear": the oracle decodes with INTER_LINEAR; the
    # default "random" per-source draws are pinned separately
    # (test_scaled_interp_modes_match_cv2 + the determinism test)
    loader = NativeTrainLoader(files, size, _HYP, batch_size=2,
                               threads=2, seed=4, photometric=False,
                               interp="bilinear")
    batches = list(loader)

    # -- oracle: same plan stream, independent pixel/label math --------
    def decode_scaled(path):
        img = cv2.imread(path)                        # BGR
        h, w = img.shape[:2]
        r = size / max(h, w)
        if r != 1:
            img = cv2.resize(img, (int(w * r), int(h * r)),
                             interpolation=cv2.INTER_LINEAR)
        return img

    labels = {f: np.loadtxt(
        f.replace("images", "labels").rsplit(".", 1)[0] + ".txt",
        ndmin=2).astype(np.float32) for f in loader.filenames}

    def mosaic_oracle(draw):
        canvas = np.zeros((size * 2, size * 2, 3), np.uint8)
        merged = []
        for q, idx in enumerate(draw["indices"]):
            img = decode_scaled(loader.filenames[idx])
            h, w = img.shape[:2]
            (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = \
                _mosaic_placement(q, draw["xc"], draw["yc"], w, h, size)
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            lab = labels[loader.filenames[idx]].copy()
            if len(lab):
                lab[:, 1:] = denorm_corners(lab[:, 1:], w, h,
                                            x1a - x1b, y1a - y1b)
                merged.append(lab)
        lab4 = (np.concatenate(merged, 0) if merged
                else np.zeros((0, 5), np.float32))
        np.clip(lab4[:, 1:], 0, 2 * size, out=lab4[:, 1:])
        m = _compose_affine(draw["s"], 0, 0, 0, draw["tx"], draw["ty"],
                            size, size)
        img = cv2.warpAffine(canvas, m[:2], dsize=(size, size),
                             borderValue=(0, 0, 0))
        lab4 = warp_labels_affine(lab4, m, draw["s"], size, size)
        return img, lab4

    def finish_oracle(img, lab, draw):
        from tpu_yolo.data.augment import corners_to_norm
        cls = lab[:, 0:1].copy()
        box = (corners_to_norm(lab[:, 1:5], size, size) if len(lab)
               else lab[:, 1:5].copy())
        hsv_apply(img, draw["gains"])
        if draw["flip_ud"]:
            img = np.flipud(img)
            if len(box):
                box[:, 1] = 1 - box[:, 1]
        if draw["flip_lr"]:
            img = np.fliplr(img)
            if len(box):
                box[:, 0] = 1 - box[:, 0]
        return (np.ascontiguousarray(img[:, :, ::-1]),
                cls.astype(np.float32), box.astype(np.float32))

    # replay the loader's plan stream (same seed/epoch construction)
    rng = _random.Random(4 + 0)
    np_rng = np.random.default_rng((4 + 0) * 1 + 0)
    order = list(range(len(loader.filenames)))
    rng.shuffle(order)
    rng = _random.Random((4 + 0) * 1 + 0)

    sample_i = 0
    n_modes = {"mosaic": 0, "mixup": 0, "plain": 0}
    for images, targets in batches:
        for k in range(images.shape[0]):
            primary = order[sample_i]
            mode, draw, srcs, _ = loader._plan_sample(primary, rng, np_rng)
            n_modes[mode] += 1
            if mode == "mosaic":
                img, lab = mosaic_oracle(draw)
                img, cls, box = finish_oracle(img, lab, draw)
            elif mode == "mixup":
                d1, d2, alpha = draw
                i1, l1 = mosaic_oracle(dict(d1))
                i2, l2 = mosaic_oracle(dict(d2))
                img = (i1 * alpha + i2 * (1 - alpha)).astype(np.uint8)
                lab = np.concatenate([l1, l2], 0)
                img, cls, box = finish_oracle(img, lab, d1)
            else:
                src = decode_scaled(loader.filenames[srcs[0]])
                sh, sw = src.shape[:2]
                canvas = np.zeros((size, size, 3), np.uint8)
                top = int(round((size - sh) / 2 - 0.1))
                left = int(round((size - sw) / 2 - 0.1))
                canvas[top:top + sh, left:left + sw] = src
                m = _compose_affine(draw["s"], 0, 0, 0, draw["tx"],
                                    draw["ty"], size / 2, size / 2)
                img = cv2.warpAffine(canvas, m[:2], dsize=(size, size),
                                     borderValue=(0, 0, 0))
                lab = labels[loader.filenames[srcs[0]]].copy()
                r = min(size / sh, size / sw)
                nw, nh = int(round(sw * r)), int(round(sh * r))
                lab[:, 1:] = denorm_corners(lab[:, 1:], r * sw, r * sh,
                                            (size - nw) / 2,
                                            (size - nh) / 2)
                lab = warp_labels_affine(lab, m, draw["s"], size, size)
                img, cls, box = finish_oracle(img, lab, draw)

            np.testing.assert_array_equal(images[k], img,
                                          err_msg=f"sample {sample_i}")
            rows = targets["idx"] == k
            np.testing.assert_array_equal(targets["cls"][rows], cls)
            np.testing.assert_allclose(targets["box"][rows], box,
                                       rtol=0, atol=0)
            sample_i += 1
    assert sample_i == 6
    assert n_modes["mosaic"] + n_modes["mixup"] >= 1  # mosaic exercised


def test_native_train_loader_jpeg_tolerance(train_mini_coco):
    """JPEG sources run the native libjpeg pool: the loader must stay
    within the decoder tolerance of its own cv2-fallback decode (labels
    depend only on dims, which are contract-equal)."""
    from tpu_yolo.data.native_train import NativeTrainLoader

    kw = dict(batch_size=2, threads=2, seed=9, photometric=False)
    nat = NativeTrainLoader(train_mini_coco["jpg"], 64, _HYP, **kw)
    ref = NativeTrainLoader(train_mini_coco["jpg"], 64, _HYP, **kw)
    # force the pure-cv2 decode on the reference loader
    pipe = ref._pipe

    def cv2_decode(paths, stage, bgr=False, interps=None):
        n = len(paths)
        out = np.zeros((n, stage, stage, 3), np.uint8)
        dims = np.empty((n, 4), np.float32)
        bad = np.ones(n, bool)
        pipe._fallback(paths, bad, out, dims,
                       pipe._fb_scaled(stage, bgr=bgr, interps=interps))
        return out, dims, 0

    ref._pipe = type("P", (), {"load_batch_scaled": staticmethod(cv2_decode)})()

    for (ia, ta), (ib, tb) in zip(nat, ref):
        for k in ("cls", "box", "idx"):
            np.testing.assert_array_equal(ta[k], tb[k])
        diff = np.abs(ia.astype(np.int16) - ib.astype(np.int16))
        assert diff.mean() < 3.0, diff.mean()
        assert np.quantile(diff, 0.98) <= 16
