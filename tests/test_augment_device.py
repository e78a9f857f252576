"""Device-side augmentation vs the host cv2 path.

Three layers:
  * pixel parity: the device mosaic+affine compose (4 masked separable
    MXU resamples, ops/augment_device.py) vs the literal host oracle —
    paste into a 2S canvas, cv2.warpAffine — using the very placements
    and affine the sampler emitted (tolerances as for the letterbox
    kernel: cv2 interpolates in fixed point);
  * draw parity: sample_mosaic's placements/labels vs mosaic4() itself,
    both driven by scripted RNGs producing the same draws — labels must
    be bit-identical (shared warp_labels_affine), canvases identical;
  * HSV parity: hsv_jitter_device vs the cv2 uint8-LUT host jitter.
"""
import random

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_yolo.data import augment as A
from tpu_yolo.data.device_augment import _mosaic_placement, sample_mosaic
from tpu_yolo.ops.augment_device import (augment_batch, hsv_jitter_device,
                                         _mosaic_affine_one)

S = 128          # even (mosaic border arithmetic), small for CPU


def _sources(rng, dims):
    """Smooth-ish RGB sources at given (h, w) dims in (S, S) staging."""
    staged = np.zeros((len(dims), S, S, 3), np.uint8)
    imgs = []
    for i, (h, w) in enumerate(dims):
        base = rng.integers(0, 256, (h // 4 + 2, w // 4 + 2, 3), np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        staged[i, :h, :w] = img
        imgs.append(img)
    return staged, imgs


class ScriptedRandom(random.Random):
    """Replays a fixed script: uniform/random pop from a list, choices
    and shuffle deterministic."""

    def __init__(self, uniforms, choices_out):
        super().__init__(0)
        self._u = list(uniforms)
        self._c = list(choices_out)

    def uniform(self, a, b):
        frac = self._u.pop(0)
        return a + (b - a) * frac

    def random(self):
        return self._u.pop(0)

    def choices(self, population, k=1):
        return self._c[:k]

    def shuffle(self, x):
        pass


DIMS = [(128, 96), (72, 128), (128, 128), (60, 44)]


def _draw_params(staged_dims, labels, hyp, uniforms):
    """Run sample_mosaic with scripted draws; returns its outputs."""
    rng = ScriptedRandom(uniforms, [1, 2, 3])
    np_rng = np.random.default_rng(5)
    return sample_mosaic(rng, np_rng, 0, 4, lambda i: staged_dims[i],
                         lambda i: labels[i], S, hyp)


@pytest.mark.parametrize("uniforms", [
    [0.5, 0.5, 0.3, 0.55, 0.45, 0.9, 0.9],   # xc, yc, s, tx, ty, flips
    [0.1, 0.9, 0.8, 0.4, 0.6, 0.9, 0.9],
    [0.95, 0.05, 0.0, 0.5, 0.5, 0.9, 0.9],
])
def test_mosaic_affine_pixels_match_cv2(uniforms):
    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.0, "flip_lr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}
    rng = np.random.default_rng(1)
    staged, imgs = _sources(rng, DIMS)
    labels = [np.zeros((0, 5), np.float32)] * 4

    idxs, params, _, _ = _draw_params(DIMS, labels, hyp, list(uniforms))
    assert idxs == [0, 1, 2, 3]  # primary first + scripted choices

    # host oracle: paste into the 2S canvas, then warpAffine
    xc = int(S // 2 + uniforms[0] * S)
    yc = int(S // 2 + uniforms[1] * S)
    s = (1 - hyp["scale"]) + uniforms[2] * 2 * hyp["scale"]
    tx = ((0.5 - hyp["translate"]) + uniforms[3] * 2 * hyp["translate"]) * S
    ty = ((0.5 - hyp["translate"]) + uniforms[4] * 2 * hyp["translate"]) * S
    canvas = np.zeros((2 * S, 2 * S, 3), np.uint8)
    for q, idx in enumerate(idxs):
        h, w = DIMS[idx]
        (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
            q, xc, yc, w, h, S)
        canvas[y1a:y2a, x1a:x2a] = imgs[idx][y1b:y2b, x1b:x2b]
    M = np.array([[s, 0, tx - s * S], [0, s, ty - s * S]], np.float64)
    want = cv2.warpAffine(canvas, M, dsize=(S, S), borderValue=(0, 0, 0))

    got = np.asarray(_mosaic_affine_one(
        jnp.asarray(staged[np.array(idxs)]),
        jnp.float32(params["inv_scale"]),
        jnp.asarray(params["off_x"]), jnp.asarray(params["off_y"]),
        jnp.asarray(params["lo_x"]), jnp.asarray(params["hi_x"]),
        jnp.asarray(params["lo_y"]), jnp.asarray(params["hi_y"]),
        out_size=S))
    got = np.round(got)

    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.mean() < 1.5, diff.mean()
    assert np.quantile(diff, 0.99) <= 6, np.quantile(diff, 0.99)


def test_sampler_matches_mosaic4():
    """Same scripted draws through mosaic4() (host) and sample_mosaic
    (device path): labels bit-identical (pre-flip), placements equal."""
    hyp = {"scale": 0.5, "translate": 0.1, "degrees": 0.0, "shear": 0.0,
           "flip_ud": 0.0, "flip_lr": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4}
    rng = np.random.default_rng(2)
    staged, imgs = _sources(rng, DIMS)
    labels = []
    for h, w in DIMS:
        n = int(rng.integers(1, 4))
        cx, cy = rng.uniform(0.3, 0.7, (2, n))
        bw, bh = rng.uniform(0.2, 0.5, (2, n))
        labels.append(np.stack(
            [rng.integers(0, 3, n), cx, cy, bw, bh], 1).astype(np.float32))

    class StubDataset:
        input_size = S
        indices = range(4)

        def read_image(self, i):
            return imgs[i], DIMS[i]

    StubDataset.labels = labels

    # mosaic4 draw order: xc, yc, [choices, shuffle], then random_affine:
    # degrees, scale, shear, shear, tx, ty
    u = dict(xc=0.42, yc=0.61, s=0.37, tx=0.52, ty=0.48)
    host_rng = ScriptedRandom(
        [u["xc"], u["yc"], 0.5, u["s"], 0.5, 0.5, u["tx"], u["ty"]],
        [1, 2, 3])
    dev_rng = ScriptedRandom(
        [u["xc"], u["yc"], u["s"], u["tx"], u["ty"], 0.9, 0.9],
        [1, 2, 3])

    import unittest.mock as mock
    with mock.patch.object(A, "random", host_rng):
        img_host, label_host = A.mosaic4(StubDataset(), 0, hyp)

    _, params, cls_dev, box_dev = sample_mosaic(
        dev_rng, np.random.default_rng(3), 0, 4,
        lambda i: DIMS[i], lambda i: labels[i], S, hyp)

    # labels: host returns pixel corners; device returns normalized
    # cxcywh (no flips drawn) — convert and compare exactly
    from tpu_yolo.data.augment import corners_to_norm
    want_box = corners_to_norm(label_host[:, 1:5], S, S)
    np.testing.assert_array_equal(cls_dev[:, 0], label_host[:, 0])
    np.testing.assert_allclose(box_dev, want_box, rtol=0, atol=1e-7)

    # pixels: host image is the cv2-composed mosaic; device compose of
    # the same draws must match within interpolation tolerance
    got = np.asarray(_mosaic_affine_one(
        jnp.asarray(staged[np.array([0, 1, 2, 3])]),
        jnp.float32(params["inv_scale"]),
        jnp.asarray(params["off_x"]), jnp.asarray(params["off_y"]),
        jnp.asarray(params["lo_x"]), jnp.asarray(params["hi_x"]),
        jnp.asarray(params["lo_y"]), jnp.asarray(params["hi_y"]),
        out_size=S))
    diff = np.abs(np.round(got).astype(np.int16)
                  - img_host.astype(np.int16))
    assert diff.mean() < 1.5 and np.quantile(diff, 0.99) <= 6


def test_hsv_matches_cv2_lut():
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (40, 40, 3), np.uint8)
    img = cv2.resize(base, (160, 160), interpolation=cv2.INTER_LINEAR)

    for gains in ([1.01, 0.8, 1.2], [0.99, 1.3, 0.7], [1.0, 1.0, 1.0]):
        gains = np.float32(gains)
        # host path operates on BGR in place
        host = img[:, :, ::-1].copy()  # RGB -> BGR
        x = np.arange(256, dtype=np.float32)
        hue, sat, val = cv2.split(cv2.cvtColor(host, cv2.COLOR_BGR2HSV))
        lut_h = ((x * gains[0]) % 180).astype(np.uint8)
        lut_s = np.clip(x * gains[1], 0, 255).astype(np.uint8)
        lut_v = np.clip(x * gains[2], 0, 255).astype(np.uint8)
        hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                         cv2.LUT(val, lut_v)))
        want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[:, :, ::-1]  # ->RGB

        got = np.asarray(hsv_jitter_device(
            jnp.asarray(img, jnp.float32), jnp.asarray(gains)))
        got = np.clip(got, 0, 255)

        diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
        assert diff.mean() < 2.5, (gains, diff.mean())
        assert np.quantile(diff, 0.98) <= 10, (gains, np.quantile(diff, 0.98))


def test_device_augment_loader(tmp_path):
    """DeviceAugmentLoader end-to-end on a tiny on-disk COCO layout:
    staged sources + params + collate-contract targets, composable by
    augment_batch."""
    pytest.importorskip("PIL")
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    from tpu_yolo.data.device_augment import DeviceAugmentLoader

    rng = np.random.default_rng(7)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    files = []
    for i, (h, w) in enumerate([(100, 140), (80, 60), (128, 128), (200, 150)]):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (h, w, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        files.append(p)

    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.0, "flip_lr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "mix_up": 0.0}
    loader = DeviceAugmentLoader(files, S, hyp, batch_size=2, threads=2)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    staged, params, targets = batches[0]
    assert staged.shape == (2, 4, S, S, 3)
    assert params["off_x"].shape == (2, 4)
    assert targets["box"].shape[1] == 4
    assert set(np.asarray(targets["idx"]).ravel()) <= {0.0, 1.0}
    out = np.asarray(augment_batch(
        jnp.asarray(staged),
        jax.tree_util.tree_map(jnp.asarray, params), out_size=S))
    assert out.shape == (2, S, S, 3) and (out > 0).any()

    # boxes land where the image content is: normalized, inside [0,1]
    box = np.asarray(targets["box"])
    assert (box >= 0).all() and (box <= 1).all()


def test_plain_path_matches_host_oracle():
    """No-mosaic device path (letterbox -> affine -> flips) vs the
    literal host else-branch: cv2 letterbox (INTER_LINEAR) +
    cv2.warpAffine with the same draws; labels via the shared math."""
    from tpu_yolo.data.device_augment import assemble_plain
    from tpu_yolo.ops.augment_device import plain_augment_batch

    rng = np.random.default_rng(11)
    dims = [(128, 96), (72, 128), (100, 100)]
    staged, imgs = _sources(rng, dims)

    # last draw exercises both flips (pixel + label mirroring)
    draws = [{"s": s_, "tx": tx_ * S, "ty": ty_ * S, "flip_ud": fu,
              "flip_lr": fl, "gains": np.ones(3)}
             for s_, tx_, ty_, fu, fl in [
                 (0.8, 0.52, 0.47, False, False),
                 (1.3, 0.45, 0.55, False, False),
                 (1.0, 0.5, 0.5, True, True)]]
    label = np.array([[1, 0.5, 0.5, 0.5, 0.5]], np.float32)
    outs = [assemble_plain(d, dims[i], label, S)
            for i, d in enumerate(draws)]
    params = {k: np.stack([np.asarray(o[0][k]) for o in outs])
              for k in outs[0][0]}
    hw = np.asarray(dims, np.float32)

    got = np.asarray(plain_augment_batch(
        jnp.asarray(staged), jnp.asarray(hw),
        jax.tree_util.tree_map(jnp.asarray, params), out_size=S))

    for i, (img, d) in enumerate(zip(imgs, draws)):
        h, w = img.shape[:2]
        r = min(S / h, S / w)
        new_w, new_h = int(round(w * r)), int(round(h * r))
        boxed = cv2.resize(img, (new_w, new_h),
                           interpolation=cv2.INTER_LINEAR) \
            if (new_w, new_h) != (w, h) else img
        top = int(round((S - new_h) / 2 - 0.1))
        left = int(round((S - new_w) / 2 - 0.1))
        canvas = np.zeros((S, S, 3), np.uint8)
        canvas[top:top + new_h, left:left + new_w] = boxed
        s_ = d["s"]
        M = np.array([[s_, 0, d["tx"] - s_ * S / 2],
                      [0, s_, d["ty"] - s_ * S / 2]], np.float64)
        want = cv2.warpAffine(canvas, M, dsize=(S, S), borderValue=(0,) * 3)
        if d["flip_ud"]:
            want = want[::-1]
        if d["flip_lr"]:
            want = want[:, ::-1]
        diff = np.abs(got[i].astype(np.int16) - want.astype(np.int16))
        assert diff.mean() < 1.5, (i, diff.mean())
        assert np.quantile(diff, 0.99) <= 6, i

        # labels: box must sit where the pixels went (affine of the
        # letterboxed box, normalized; mirrored when flipped)
        _, cls_i, box_i = outs[i]
        assert cls_i.shape == (1, 1) and box_i.shape == (1, 4)
        cx = ((0.5 * w * r + left) * s_ + M[0, 2]) / S
        cy = ((0.5 * h * r + top) * s_ + M[1, 2]) / S
        if d["flip_lr"]:
            cx = 1 - cx
        if d["flip_ud"]:
            cy = 1 - cy
        assert box_i[0, 0] == pytest.approx(cx, abs=2e-2)
        assert box_i[0, 1] == pytest.approx(cy, abs=2e-2)


def test_scaled_staging_dims_match_python_exactly():
    """The C++ prescale must reproduce load_image's float64 truncated
    dims bit-for-bit — a float32 ratio gives int(532 * (640.f/532)) =
    639 != 640 (code-review regression)."""
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    import tempfile, os

    pipe = native_loader.NativePipeline(640, threads=2)
    d = tempfile.mkdtemp()
    rng = np.random.default_rng(8)
    paths, expect = [], []
    for h, w in [(532, 300), (299, 200), (77, 40), (640, 479), (133, 133)]:
        p = os.path.join(d, f"{h}x{w}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (h, w, 3), np.uint8))
        paths.append(p)
        r = 640 / max(h, w)
        expect.append((h, w) if r == 1 else (int(h * r), int(w * r)))
    _, dims, nfail = pipe.load_batch_scaled(paths, 640)
    assert nfail == 0
    got = [(int(a), int(b)) for a, b in dims[:, :2]]
    # note int-trunc means the long side can be stage-1 (e.g. 299 ->
    # int(299 * (640/299)) = 639) — that IS the load_image contract
    assert got == expect


def test_loader_drops_labels_of_failed_decodes(tmp_path):
    """A jpeg whose header parses but whose body is truncated: the
    quadrant is zeroed AND its labels are dropped (never train boxes on
    black pixels — code-review regression)."""
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    from tpu_yolo.data.device_augment import DeviceAugmentLoader

    rng = np.random.default_rng(9)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    files = []
    for i in range(4):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (90, 120, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        files.append(p)

    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.0, "flip_lr": 0.0,
           "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "mix_up": 0.0}
    loader = DeviceAugmentLoader(files, S, hyp, batch_size=4, threads=2)
    # the file goes bad AFTER verification/size-scan (the on-disk-rot /
    # concurrent-write case the load-time check exists for)
    # deep truncation (into the header tables): libjpeg treats a cut
    # scan body as a warning and decodes partial pixels, but a cut
    # header is a hard decode failure
    blob = open(files[2], "rb").read()
    open(files[2], "wb").write(blob[:120])
    staged, params, targets = next(iter(loader))

    # every mosaic uses all 4 sources (each primary + 3 picks from 4);
    # with a full batch the truncated file appears somewhere
    bad_slots = [(b, q) for b in range(4) for q in range(4)
                 if not staged[b, q].any()]
    assert bad_slots, "truncated jpeg never drawn (fixture broken)"
    for b, q in bad_slots:
        assert params["hi_x"][b, q] == params["lo_x"][b, q] == 0

    # labels: at most 4 per sample, and strictly fewer for samples with
    # a failed quadrant that had survived boxes is hard to assert
    # exactly; assert total labels < full 4-per-mosaic upper bound
    idx = np.asarray(targets["idx"])
    assert len(idx) <= 16 - len({b for b, _ in bad_slots})


def test_loader_shards_are_disjoint(tmp_path):
    """Multi-host sharding: same shuffle on every shard, disjoint
    primary slices, decorrelated draw streams (code-review regression:
    unsharded hosts trained every image n_hosts times)."""
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    from tpu_yolo.data.device_augment import DeviceAugmentLoader

    rng = np.random.default_rng(12)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    files = []
    for i in range(8):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (60, 80, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        files.append(p)

    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.0, "flip_lr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "mix_up": 0.0}

    primaries = {}
    for shard in (0, 1):
        loader = DeviceAugmentLoader(files, S, hyp, batch_size=2,
                                     threads=2, num_shards=2, shard=shard)
        assert len(loader) == 2  # (8 // 2 shards) // bs2
        seen = []
        # primaries are the first source of each sample before shuffle;
        # recover them by re-deriving the per-shard order
        import random as _r
        order = list(range(8))
        _r.Random(loader.seed + 0).shuffle(order)
        seen = order[shard::2][:4]
        primaries[shard] = set(seen)
        batches = list(loader)
        assert len(batches) == 2
    assert primaries[0].isdisjoint(primaries[1])
    assert primaries[0] | primaries[1] == set(range(8))


def test_augment_batch_end_to_end_shapes():
    """Full jitted program: staged sources + sampled params -> uint8
    batch; flips verified exactly against manual flip."""
    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 1.0, "flip_lr": 1.0,
           "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0}
    rng = np.random.default_rng(6)
    staged, _ = _sources(rng, DIMS)
    labels = [np.zeros((0, 5), np.float32)] * 4

    draws = [sample_mosaic(random.Random(i), np.random.default_rng(i),
                           i % 4, 4, lambda j: DIMS[j],
                           lambda j: labels[j], S, hyp)
             for i in range(2)]
    srcs = np.stack([staged[np.array(d[0])] for d in draws])
    params = {k: np.stack([np.asarray(d[1][k]) for d in draws])
              for k in draws[0][1]}
    out = np.asarray(augment_batch(jnp.asarray(srcs), jax.tree_util.tree_map(
        jnp.asarray, params), out_size=S))
    assert out.shape == (2, S, S, 3) and out.dtype == np.uint8
    assert (out > 0).any()

    # flips were certain (prob 1.0): un-flipping must equal the
    # no-flip program
    params_nf = dict(params, flip_lr=np.zeros(2, bool),
                     flip_ud=np.zeros(2, bool))
    out_nf = np.asarray(augment_batch(
        jnp.asarray(srcs), jax.tree_util.tree_map(jnp.asarray, params_nf),
        out_size=S))
    np.testing.assert_array_equal(out[:, ::-1, ::-1], out_nf)


def test_mixup_matches_host_oracle():
    """Device mosaic-mixup (two composes + Beta blend + HSV + flips) vs
    the literal host flow: two cv2-composed mosaics, uint8 blend
    (astype truncation), LUT HSV, flips (dataset.py:42-73,
    augment.py::mixup; reference dataset.py:382-387)."""
    from tpu_yolo.data.device_augment import draw_mixup_pair, assemble_mixup
    from tpu_yolo.ops.augment_device import mixup_augment_batch

    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.5, "flip_lr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4}
    rng = np.random.default_rng(21)
    staged, imgs = _sources(rng, DIMS)
    labels = [np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32)] * 4

    d1, d2, alpha = draw_mixup_pair(random.Random(3),
                                    np.random.default_rng(3), 0, 4, hyp, S)
    params, cls, box = assemble_mixup(d1, d2, alpha, lambda i: DIMS[i],
                                      lambda i: labels[i], S)

    def host_mosaic(d):
        canvas = np.zeros((2 * S, 2 * S, 3), np.uint8)
        for q, idx in enumerate(d["indices"]):
            h, w = DIMS[idx]
            (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
                q, d["xc"], d["yc"], w, h, S)
            canvas[y1a:y2a, x1a:x2a] = imgs[idx][y1b:y2b, x1b:x2b]
        s = d["s"]
        M = np.array([[s, 0, d["tx"] - s * S], [0, s, d["ty"] - s * S]],
                     np.float64)
        return cv2.warpAffine(canvas, M, dsize=(S, S), borderValue=(0,) * 3)

    m1, m2 = host_mosaic(d1), host_mosaic(d2)
    blend = (m1.astype(np.float64) * alpha
             + m2.astype(np.float64) * (1 - alpha)).astype(np.uint8)
    # LUT HSV on the blend (oracle works in BGR like cv2's host path)
    bgr = blend[:, :, ::-1].copy()
    x = np.arange(256, dtype=np.float32)
    g = d1["gains"]
    hue, sat, val = cv2.split(cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV))
    hsv = cv2.merge((cv2.LUT(hue, ((x * g[0]) % 180).astype(np.uint8)),
                     cv2.LUT(sat, np.clip(x * g[1], 0, 255).astype(np.uint8)),
                     cv2.LUT(val, np.clip(x * g[2], 0, 255).astype(np.uint8))))
    want = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[:, :, ::-1]
    if d1["flip_ud"]:
        want = want[::-1]
    if d1["flip_lr"]:
        want = want[:, ::-1]

    srcs = np.stack([staged[np.array(d1["indices"])],
                     staged[np.array(d2["indices"])]])[None]  # (1,2,4,S,S,3)
    got = np.asarray(mixup_augment_batch(
        jnp.asarray(srcs),
        jax.tree_util.tree_map(lambda v: jnp.asarray(np.asarray(v)[None]),
                               params), out_size=S))[0]

    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()
    assert np.quantile(diff, 0.98) <= 12, np.quantile(diff, 0.98)

    # labels: both mosaics contribute; all normalized
    assert len(cls) == len(box) and len(cls) >= 1
    assert (box >= 0).all() and (box <= 1).all()


def test_plan_batches_modes_and_count():
    """Fractional mosaic + mixup: per-sample Bernoulli draws partitioned
    into homogeneous batches, exactly len(loader) per epoch."""
    from tpu_yolo.data.device_augment import DeviceAugmentLoader

    class Stub(DeviceAugmentLoader):
        def __init__(self, n, bs, hyp):
            self.filenames = ["x"] * n
            self.batch_size = bs
            self.hyp = hyp
            self.mosaic = True
            self.num_shards, self.shard, self.seed = 1, 0, 0

    hyp = {"mosaic": 0.5, "mix_up": 0.5}
    stub = Stub(64, 4, hyp)
    batches = stub._plan_batches(list(range(64)), random.Random(0))
    assert len(batches) == 16
    modes = {m for m, _ in batches}
    assert modes == {"mosaic", "mixup", "plain"}
    for _, prim in batches:
        assert len(prim) == 4

    # mosaic prob 0 (trainer cutoff): everything plain
    stub.mosaic = False
    batches = stub._plan_batches(list(range(64)), random.Random(0))
    assert {m for m, _ in batches} == {"plain"} and len(batches) == 16


def test_device_augment_loader_mixup_end_to_end(tmp_path):
    """Loader with fractional mosaic + mixup: every yielded batch is
    homogeneous, composable by its program, with collate-contract
    targets."""
    pytest.importorskip("PIL")
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    from tpu_yolo.data.device_augment import DeviceAugmentLoader
    from tpu_yolo.ops.augment_device import (augment_batch,
                                             mixup_augment_batch,
                                             plain_augment_batch)

    rng = np.random.default_rng(31)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    files = []
    for i in range(12):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (70, 90, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        files.append(p)

    hyp = {"scale": 0.5, "translate": 0.1, "flip_ud": 0.2, "flip_lr": 0.5,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
           "mosaic": 0.6, "mix_up": 0.5}
    loader = DeviceAugmentLoader(files, S, hyp, batch_size=2, threads=2,
                                 seed=3)
    batches = list(loader)
    assert len(batches) == len(loader) == 6
    seen = set()
    for batch in batches:
        if len(batch) == 4:
            staged, hw, params, targets = batch
            out = plain_augment_batch(
                jnp.asarray(staged), jnp.asarray(hw),
                jax.tree_util.tree_map(jnp.asarray, params), out_size=S)
            seen.add("plain")
        elif np.asarray(batch[0]).ndim == 6:
            staged, params, targets = batch
            assert staged.shape == (2, 2, 4, S, S, 3)
            out = mixup_augment_batch(
                jnp.asarray(staged),
                jax.tree_util.tree_map(jnp.asarray, params), out_size=S)
            seen.add("mixup")
        else:
            staged, params, targets = batch
            out = augment_batch(
                jnp.asarray(staged),
                jax.tree_util.tree_map(jnp.asarray, params), out_size=S)
            seen.add("mosaic")
        assert np.asarray(out).shape == (2, S, S, 3)
        box = np.asarray(targets["box"])
        if len(box):
            assert (box >= 0).all() and (box <= 1).all()
        assert set(np.asarray(targets["idx"]).ravel()) <= {0.0, 1.0}
    assert len(seen) >= 2, seen


def test_general_affine_mosaic_matches_cv2():
    """Rotation/shear mosaic compose (gather path) vs the literal host
    oracle: paste into the 2S canvas, cv2.warpAffine with the full
    trans@shear@rot@center matrix (reference dataset.py:324-379)."""
    from tpu_yolo.data.device_augment import (_compose_affine,
                                              assemble_mosaic, draw_mosaic)
    from tpu_yolo.ops.augment_device import _mosaic_affine_general_one

    hyp = {"scale": 0.5, "translate": 0.1, "degrees": 10.0, "shear": 4.0,
           "flip_ud": 0.0, "flip_lr": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4}
    rng = np.random.default_rng(41)
    staged, imgs = _sources(rng, DIMS)
    labels = [np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32)] * 4

    for seed in (1, 2, 3):
        d = draw_mosaic(random.Random(seed), np.random.default_rng(seed),
                        0, 4, hyp, S)
        assert "angle" in d and "shear_x" in d
        params, cls, box = assemble_mosaic(
            d, lambda i: DIMS[i], lambda i: labels[i], S, general=True)
        assert params["minv"].shape == (2, 3)

        canvas = np.zeros((2 * S, 2 * S, 3), np.uint8)
        for q, idx in enumerate(d["indices"]):
            h, w = DIMS[idx]
            (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
                q, d["xc"], d["yc"], w, h, S)
            canvas[y1a:y2a, x1a:x2a] = imgs[idx][y1b:y2b, x1b:x2b]
        M = _compose_affine(d["s"], d["angle"], d["shear_x"], d["shear_y"],
                            d["tx"], d["ty"], S, S)
        want = cv2.warpAffine(canvas, M[:2], dsize=(S, S),
                              borderValue=(0, 0, 0))

        got = np.asarray(_mosaic_affine_general_one(
            jnp.asarray(staged[np.array(d["indices"])], jnp.float32),
            jnp.asarray(params["minv"]),
            jnp.asarray(params["shift_x"]), jnp.asarray(params["shift_y"]),
            jnp.asarray(params["lo_x"]), jnp.asarray(params["hi_x"]),
            jnp.asarray(params["lo_y"]), jnp.asarray(params["hi_y"]),
            out_size=S))
        diff = np.abs(np.round(got).astype(np.int16)
                      - want.astype(np.int16))
        assert diff.mean() < 2.0, (seed, diff.mean())
        assert np.quantile(diff, 0.98) <= 8, (seed, np.quantile(diff, 0.98))

        # labels go through the full-matrix warp; normalized output
        assert (box >= 0).all() and (box <= 1).all()


def test_general_affine_loader_end_to_end(tmp_path):
    """degrees/shear != 0 no longer raises: the loader emits minv-format
    batches and the general programs compose them."""
    pytest.importorskip("PIL")
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader not built")
    from tpu_yolo.data.device_augment import DeviceAugmentLoader
    from tpu_yolo.ops.augment_device import augment_batch_general

    rng = np.random.default_rng(51)
    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    files = []
    for i in range(4):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (80, 100, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        files.append(p)

    hyp = {"scale": 0.5, "translate": 0.1, "degrees": 10.0, "shear": 3.0,
           "flip_ud": 0.0, "flip_lr": 0.5, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "mosaic": 1.0, "mix_up": 0.0}
    loader = DeviceAugmentLoader(files, S, hyp, batch_size=2, threads=2)
    assert loader.general
    staged, params, targets = next(iter(loader))
    assert params["minv"].shape == (2, 2, 3)
    out = np.asarray(augment_batch_general(
        jnp.asarray(staged),
        jax.tree_util.tree_map(jnp.asarray, params), out_size=S))
    assert out.shape == (2, S, S, 3) and (out > 0).any()
