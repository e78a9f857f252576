"""Host side of the device-augment train pipeline.

Draws the same augmentation distributions as the host path
(data/augment.py::mosaic4 + random_affine + hsv_jitter + flips;
reference utils/dataset.py:105-176, 324-379) and computes labels with
the SAME shared code (warp_labels_affine), but ships only raw staged
uint8 sources + per-image transform parameters; all pixel work runs in
ops/augment_device.py::augment_batch on device.

Per output sample the mosaic placement (integer shift + crop into the
2S canvas) and the random affine (scale s, translation t; degrees and
shear are 0 by default) compose, per axis, into one map
  x_src = x_out / s + (S - t/s) - shift_k
per quadrant k, with the valid source interval [x1b, x2b) from the
crop. Those (inv_scale, offset, lo, hi) are the device parameters.
"""
from __future__ import annotations

import os
import queue
import random as _random
import threading

import numpy as np

from tpu_yolo.data.augment import (corners_to_norm, denorm_corners,
                                   warp_labels_affine)
from tpu_yolo.data.labels import load_labels


def _mosaic_placement(quadrant, xc, yc, w, h, size):
    """Quadrant crop/paste rectangles — the exact mosaic4 formulas
    (data/augment.py:148-166; reference dataset.py:124-151)."""
    if quadrant == 0:
        x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
        x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
    elif quadrant == 1:
        x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, size * 2), yc
        x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
    elif quadrant == 2:
        x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(size * 2, yc + h)
        x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
    else:
        x1a, y1a, x2a, y2a = xc, yc, min(xc + w, size * 2), min(size * 2, yc + h)
        x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
    return (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b)


def draw_mosaic(rng: _random.Random, np_rng: np.random.Generator,
                index: int, n_images: int, hyp: dict, size: int) -> dict:
    """Consume the RNG for one output image (placement center, source
    picks, affine, flips, HSV gains) — separated from assembly so the
    labels/params can be re-assembled with a quadrant dropped when its
    decode fails at load time."""
    border = size // 2
    draw = {
        "xc": int(rng.uniform(border, 2 * size - border)),
        "yc": int(rng.uniform(border, 2 * size - border)),
    }
    indices = [index] + rng.choices(range(n_images), k=3)
    rng.shuffle(indices)
    draw["indices"] = indices
    draw["s"] = rng.uniform(1 - hyp["scale"], 1 + hyp["scale"])
    draw["tx"] = rng.uniform(0.5 - hyp["translate"],
                             0.5 + hyp["translate"]) * size
    draw["ty"] = rng.uniform(0.5 - hyp["translate"],
                             0.5 + hyp["translate"]) * size
    draw["flip_ud"] = rng.random() < hyp["flip_ud"]
    draw["flip_lr"] = rng.random() < hyp["flip_lr"]
    draw["gains"] = (np_rng.uniform(-1, 1, 3)
                     * [hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"]] + 1)
    return draw


def assemble_mosaic(draw: dict, dims_of, label_of, size: int,
                    failed=frozenset()):
    """Turn one draw into device params + labels.

    dims_of(i) -> (staged_h, staged_w); label_of(i) -> (N, 5) normalized
    [cls, cx, cy, w, h]. `failed` quadrant indices get zero taps and
    contribute no labels (load-time decode failures). Returns (device
    params dict, cls (M,1), box (M,4) normalized cxcywh — flips already
    applied, the __getitem__ contract).
    """
    xc, yc = draw["xc"], draw["yc"]
    s, tx, ty = draw["s"], draw["tx"], draw["ty"]

    off_x, off_y = np.zeros(4, np.float32), np.zeros(4, np.float32)
    lo_x, hi_x = np.zeros(4, np.float32), np.zeros(4, np.float32)
    lo_y, hi_y = np.zeros(4, np.float32), np.zeros(4, np.float32)
    merged = []
    for q, idx in enumerate(draw["indices"]):
        h, w = dims_of(idx)
        if h <= 0 or q in failed:  # decode failure: empty quadrant
            continue
        (x1a, y1a, x2a, y2a), (x1b, y1b, x2b, y2b) = _mosaic_placement(
            q, xc, yc, int(w), int(h), size)
        off_x[q] = size - tx / s - (x1a - x1b)
        off_y[q] = size - ty / s - (y1a - y1b)
        lo_x[q], hi_x[q] = x1b, x2b
        lo_y[q], hi_y[q] = y1b, y2b

        label = label_of(idx).copy()
        if len(label):
            label[:, 1:] = denorm_corners(label[:, 1:], int(w), int(h),
                                          x1a - x1b, y1a - y1b)
            merged.append(label)

    label4 = (np.concatenate(merged, 0) if merged
              else np.zeros((0, 5), np.float32))
    np.clip(label4[:, 1:], 0, 2 * size, out=label4[:, 1:])

    # label affine: same matrix random_affine builds for
    # degrees=shear=0, border=(-size//2, -size//2)
    matrix = np.array([[s, 0.0, tx - s * size],
                       [0.0, s, ty - s * size],
                       [0.0, 0.0, 1.0]])
    label4 = warp_labels_affine(label4, matrix, s, size, size)

    cls, box = _labels_to_targets(label4, size, draw)

    params = {
        "inv_scale": np.float32(1.0 / s),
        "off_x": off_x, "off_y": off_y,
        "lo_x": lo_x, "hi_x": hi_x, "lo_y": lo_y, "hi_y": hi_y,
        "hsv_gains": draw["gains"].astype(np.float32),
        "flip_lr": draw["flip_lr"], "flip_ud": draw["flip_ud"],
    }
    return params, cls, box


def _labels_to_targets(lab, size: int, draw: dict):
    """Warped pixel-corner labels -> (cls (M,1), box (M,4) normalized
    cxcywh with flips applied) — the __getitem__ tail (data/dataset.py:
    60-74; reference dataset.py:84-101), shared by both assemble paths."""
    cls = lab[:, 0:1].copy()
    box = (corners_to_norm(lab[:, 1:5], size, size) if len(lab)
           else lab[:, 1:5].copy())
    if draw["flip_ud"] and len(box):
        box[:, 1] = 1 - box[:, 1]
    if draw["flip_lr"] and len(box):
        box[:, 0] = 1 - box[:, 0]
    return cls.astype(np.float32), box.astype(np.float32)


def sample_mosaic(rng: _random.Random, np_rng: np.random.Generator,
                  index: int, n_images: int, dims_of, label_of,
                  size: int, hyp: dict):
    """draw_mosaic + assemble_mosaic in one call (the no-failure path;
    returns (source_indices, params, cls, box))."""
    draw = draw_mosaic(rng, np_rng, index, n_images, hyp, size)
    params, cls, box = assemble_mosaic(draw, dims_of, label_of, size)
    return draw["indices"], params, cls, box


def draw_plain(rng: _random.Random, np_rng: np.random.Generator,
               hyp: dict, size: int) -> dict:
    """RNG draws for the no-mosaic path (letterbox + affine on one
    source; the host __getitem__ else-branch, data/dataset.py:48-58 —
    reference dataset.py:80-101 with random_perspective
    dataset.py:324-351 at degrees=shear=0)."""
    return {
        "s": rng.uniform(1 - hyp["scale"], 1 + hyp["scale"]),
        "tx": rng.uniform(0.5 - hyp["translate"],
                          0.5 + hyp["translate"]) * size,
        "ty": rng.uniform(0.5 - hyp["translate"],
                          0.5 + hyp["translate"]) * size,
        "flip_ud": rng.random() < hyp["flip_ud"],
        "flip_lr": rng.random() < hyp["flip_lr"],
        "gains": (np_rng.uniform(-1, 1, 3)
                  * [hyp["hsv_h"], hyp["hsv_s"], hyp["hsv_v"]] + 1),
    }


def assemble_plain(draw: dict, staged_hw, label, size: int, failed=False):
    """Plain-path params + labels for one sample.

    Mirrors __getitem__'s else-branch label math: letterbox geometry
    (data/image.py, upscale allowed in train) then the random_affine
    label warp with center -size/2 (letterboxed image is size x size).
    """
    sh, sw = staged_hw
    s, tx, ty = draw["s"], draw["tx"], draw["ty"]
    params = {
        "inv_scale": np.float32(1.0 / s),
        # x_canvas = (x_out - tx)/s + size/2  (warpAffine inverse)
        "off_x": np.float32(size / 2 - tx / s),
        "off_y": np.float32(size / 2 - ty / s),
        "hsv_gains": draw["gains"].astype(np.float32),
        "flip_lr": draw["flip_lr"], "flip_ud": draw["flip_ud"],
    }
    if failed or sh <= 0 or len(label) == 0:
        z = np.zeros((0, 1), np.float32)
        return params, z, np.zeros((0, 4), np.float32)

    r = min(size / sh, size / sw)
    new_w, new_h = int(round(sw * r)), int(round(sh * r))
    pad_w, pad_h = (size - new_w) / 2, (size - new_h) / 2
    lab = label.copy()
    lab[:, 1:] = denorm_corners(lab[:, 1:], r * sw, r * sh, pad_w, pad_h)

    matrix = np.array([[s, 0.0, tx - s * size / 2],
                       [0.0, s, ty - s * size / 2],
                       [0.0, 0.0, 1.0]])
    lab = warp_labels_affine(lab, matrix, s, size, size)
    cls, box = _labels_to_targets(lab, size, draw)
    return params, cls, box


class DeviceAugmentLoader:
    """Train loader for the device-augment path.

    With `mosaic` True (default) yields (staged (B, 4, St, St, 3)
    uint8, params, targets) for augment_batch; with `mosaic` False
    (the trainer flips it for the reference's final-10-epochs cutoff,
    main.py:109-110) yields (staged (B, St, St, 3), hw (B, 2), params,
    targets) for plain_augment_batch. targets are in the collate()
    contract either way. Requires the native loader
    (ip_load_batch_scaled); raises otherwise. hyp["mosaic"] must be
    0 or 1 — per-sample fractional mosaic stays on the host loader.
    """

    def __init__(self, filenames, input_size: int, hyp: dict,
                 batch_size: int, cache_path: str | None = None,
                 threads: int = 8, seed: int = 0,
                 num_shards: int = 1, shard: int = 0):
        """num_shards/shard: multi-host partition — each process must
        see a disjoint slice of the (identically shuffled) order, the
        ShardSampler contract; batch_size is the per-host batch."""
        from tpu_yolo.data import native_loader

        if not native_loader.available():
            raise RuntimeError("device-augment needs the native loader "
                               "(make -C native)")
        if hyp.get("mix_up", 0.0) > 0:
            raise NotImplementedError(
                "device-augment does not support mix_up > 0 "
                "(ops/augment_device.py docstring)")
        if hyp.get("mosaic", 1.0) not in (0.0, 1.0):
            raise NotImplementedError(
                "device-augment supports mosaic prob 0 or 1; "
                "fractional mosaic needs the host loader")
        if hyp.get("degrees", 0.0) or hyp.get("shear", 0.0):
            raise NotImplementedError(
                "device-augment models only axis-aligned affines "
                "(the default degrees=shear=0); rotation/shear needs "
                "the host loader (ops/augment_device.py docstring)")
        labels = load_labels(list(filenames), cache_path)
        self.filenames = list(labels.keys())
        self.labels = list(labels.values())
        self.input_size = input_size
        self.hyp = hyp
        self.batch_size = batch_size
        self.seed = seed
        self.num_shards = max(num_shards, 1)
        self.shard = shard
        self.mosaic = hyp.get("mosaic", 1.0) > 0
        self._epoch = 0
        self._pipe = native_loader.NativePipeline(input_size,
                                                 threads=threads)
        self._staged = self._scan_staged_dims(cache_path)

    def _scan_staged_dims(self, cache_path):
        """(N, 2) staged [h, w] for every image — the placement/label
        math needs dims BEFORE decode. PIL header reads only (no pixel
        decode), cached in a sidecar next to the label cache."""
        sizes_path = (cache_path + ".sizes.npy") if cache_path else None
        orig = None
        if sizes_path and os.path.exists(sizes_path):
            cached = np.load(sizes_path)
            if len(cached) == len(self.filenames):
                orig = cached
        if orig is None:
            from PIL import Image

            orig = np.zeros((len(self.filenames), 2), np.int32)
            for i, p in enumerate(self.filenames):
                try:
                    with open(p, "rb") as f:
                        w, h = Image.open(f).size
                    orig[i] = (h, w)
                except Exception:
                    orig[i] = (0, 0)  # decode will fail too: empty slot
            if sizes_path:
                np.save(sizes_path, orig)
        # the load_image contract: r = S/max(h,w); r != 1 -> int trunc
        staged = orig.astype(np.int64).copy()
        long_side = orig.max(1)
        scale = np.where(long_side > 0,
                         self.input_size / np.maximum(long_side, 1), 0.0)
        resized = (orig * scale[:, None]).astype(np.int64)
        # per-axis >=1 clamp, matching the native decoder's contract
        # (image_pipeline.cc: `if (sh < 1) sh = 1`) — an extreme-aspect
        # image must not be host-marked failed while C++ decodes it;
        # long_side == 0 (header-scan failure) stays 0
        resized = np.where((long_side > 0)[:, None],
                           np.maximum(resized, 1), resized)
        staged = np.where((long_side != self.input_size)[:, None],
                          resized, staged)
        return staged

    def __len__(self):
        return (len(self.filenames) // self.num_shards) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _staged_dims(self, idx: int):
        return (int(self._staged[idx, 0]), int(self._staged[idx, 1]))

    def _make_batch(self, primaries, rng, np_rng):
        bs = self.batch_size
        st = self.input_size
        n = len(self.filenames)

        draws = [draw_mosaic(rng, np_rng, p, n, self.hyp, st)
                 for p in primaries]
        flat_idx = [i for d in draws for i in d["indices"]]
        staged, dims, nfail = self._pipe.load_batch_scaled(
            [self.filenames[i] for i in flat_idx], st)
        staged = staged.reshape(bs, 4, st, st, 3)

        # quadrants whose decode failed at load time (header read fine,
        # body corrupt): zero taps, no labels — never train boxes on a
        # black quadrant
        failed_by_sample = [frozenset()] * bs
        if nfail:
            bad = np.flatnonzero(dims[:, 0] < 0)
            failed_by_sample = [
                frozenset(int(j % 4) for j in bad if j // 4 == i)
                for i in range(bs)]

        outs = [assemble_mosaic(d, self._staged_dims,
                                lambda i: self.labels[i], st,
                                failed=failed_by_sample[k])
                for k, d in enumerate(draws)]
        params, targets = self._collate_outs(outs)
        return staged, params, targets

    @staticmethod
    def _collate_outs(outs):
        params = {
            k: np.stack([np.asarray(o[0][k]) for o in outs])
            for k in outs[0][0]
        }
        cls = [o[1] for o in outs]
        box = [o[2] for o in outs]
        idx = [np.full(len(c), i, dtype=np.float32)
               for i, c in enumerate(cls)]  # 1-D, the collate() contract
        targets = {
            "cls": (np.concatenate(cls) if cls else np.zeros((0, 1), np.float32)),
            "box": (np.concatenate(box) if box else np.zeros((0, 4), np.float32)),
            "idx": (np.concatenate(idx) if idx else np.zeros((0,), np.float32)),
        }
        return params, targets

    def _make_batch_plain(self, primaries, rng, np_rng):
        """No-mosaic batch: one source per sample; images composed by
        plain_augment_batch(staged, hw, params)."""
        st = self.input_size
        draws = [draw_plain(rng, np_rng, self.hyp, st) for _ in primaries]
        staged, dims, nfail = self._pipe.load_batch_scaled(
            [self.filenames[i] for i in primaries], st)
        # a sample is bad if EITHER side failed (decode now, or the
        # header scan at init) — and then BOTH its pixels and labels
        # are blanked, never one without the other
        bad = [bool(dims[k, 0] < 0) or self._staged_dims(p)[0] <= 0
               for k, p in enumerate(primaries)]
        for k, b in enumerate(bad):
            if b:
                staged[k] = 0
        outs = [assemble_plain(d, self._staged_dims(p), self.labels[p],
                               st, failed=bad[k])
                for k, (d, p) in enumerate(zip(draws, primaries))]
        params, targets = self._collate_outs(outs)
        hw = np.maximum(dims[:, :2], 1.0).astype(np.float32)
        return staged, hw, params, targets

    def __iter__(self):
        rng = _random.Random(self.seed + self._epoch)
        np_rng = np.random.default_rng(
            (self.seed + self._epoch) * self.num_shards + self.shard)
        order = list(range(len(self.filenames)))
        rng.shuffle(order)          # same order on every host...
        order = order[self.shard::self.num_shards]  # ...disjoint slices
        # decorrelate the per-host draw streams after the shared shuffle
        rng = _random.Random((self.seed + self._epoch) * self.num_shards
                             + self.shard)

        # one-deep prefetch: stage batch i+1 (C++ pool, GIL-free) while
        # the device trains on batch i
        q: queue.Queue = queue.Queue(maxsize=1)

        make = self._make_batch if self.mosaic else self._make_batch_plain

        def produce():
            # a producer crash must surface in the consumer, not hang
            # the training loop on q.get() forever
            try:
                for b in range(len(self)):
                    primaries = order[b * self.batch_size:(b + 1) * self.batch_size]
                    q.put(make(primaries, rng, np_rng))
                q.put(None)
            except BaseException as e:  # noqa: BLE001
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
