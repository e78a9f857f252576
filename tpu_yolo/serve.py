"""Production serving pipeline: JPEG bytes/paths -> detections.

The deployment-facing API the reference lacks (its only inference
surface is the COCO eval loop, main.py:224-304). Design:

  host:   native C++ pipeline (decode + letterbox + batch assembly in a
          GIL-free thread pool, data/native_loader.py) — falls back to
          the Python/OpenCV loader when the .so isn't built;
  device: ONE jitted program: normalize(uint8) -> forward -> DFL decode
          -> batched NMS (ops/nms.py);
  overlap: double buffering — while the device runs batch i, the host
          decodes batch i+1 and its H2D copy is in flight (JAX dispatch
          is async; we only block on the *previous* result).

Boxes are returned in original-image pixel coordinates by inverting the
letterbox transform ((xy - pad) / ratio), clipped to the image — eval
keeps letterboxed coords for mAP parity (SURVEY.md §2 fidelity notes);
serving users want image space.
"""
from __future__ import annotations

import functools
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig, get_model_config
from tpu_yolo.models import yolov11


def image_input_format():
    """Entry Format for the serving program's uint8 NHWC image input on
    a single TPU chip, or None when not applicable (CPU, multi-device).

    The stem-conv emitter wants the batch-minor tiled layout
    u8{0,3,2,1:T(4,128)(4,1)}; an unconstrained jit entry receives the
    default {2,1,3,0} and relayouts IN-PROGRAM (copy.168, 0.78 ms/batch
    at bs128/640 — profiler 2026-08-17). Constraining the entry removes
    that device copy (+4.5% e2e) and host->device transfers write the
    tiled layout directly. Callers must device_put staged batches with
    this same Format (a differently-committed array would error)."""
    if jax.default_backend() != "tpu" or len(jax.devices()) != 1:
        return None
    try:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        return Format(
            Layout(major_to_minor=(1, 2, 3, 0), tiling=((4, 128), (4, 1))),
            SingleDeviceSharding(jax.devices()[0]))
    except Exception:
        return None


class Detector:
    """Batched streaming detector.

    >>> det = Detector.from_checkpoint("yolo11n.pt", size="n")
    >>> for res in det.stream(paths, batch_size=64):
    ...     res["boxes"], res["scores"], res["classes"]  # per image
    """

    def __init__(self, params, cfg: ModelConfig, input_size: int = 640,
                 conf_thres: float = 0.25, iou_thres: float = 0.65,
                 max_det: int = 300, compute_dtype=jnp.bfloat16,
                 decode_threads: int = 8, dp=None,
                 ranking: str = "approx",
                 device_letterbox: bool = False, stage_size: int = 960,
                 max_nms: int = 1024,
                 approx_recall: float = 0.9,
                 multi_label: bool = True):
        """`dp`: optional parallel.DataParallel — shards each batch over
        the mesh data axis and replicates params, scaling serving across
        every local chip (batch_size must divide the data-axis size).

        `ranking`: NMS candidate ranking. Serving defaults to "approx"
        (TPU approx_max_k, the measured-throughput path); pass "exact"
        for bit-exact reference-parity ranking — the eval harness's
        default (ops/nms.py::_rank_candidates).

        `approx_recall`: approx_max_k's recall_target — sizes the
        bucketed reduction whose sort is the dominant ranking cost.
        Serving default 0.9 (halves the sort input vs 0.95: +5.8%
        e2e at bs128/K2048, +3.4% at K=1024; object-level recall on
        clustered scenes 1.0 at every setting — BENCH.md "recall_target
        sweep"). Eval/parity ("exact" ranking) never consults it.

        `device_letterbox`: host only decodes (raw uint8, top-left in a
        (stage_size, stage_size) staging buffer); the aspect-preserving
        resize + pad runs on device in the jitted program
        (ops/letterbox.py) — SURVEY.md §7 step 3's native-replacement
        kernel. Originals longer than stage_size are pre-shrunk on host
        to fit (ratio folded into the returned boxes).

        `max_nms`: NMS candidate budget K. Serving default 1024 — the
        measured sweet spot (6,617 vs 5,571 img/s at the 2048 parity
        envelope, bs128; object-level recall on clustered scenes is
        1.0000 at K=1024 and even K=512 — BENCH.md object-level bound).
        Pass 2048 for the reference-parity envelope (covers every
        above-conf candidate at eval's conf=0.001; the eval harness's
        own default). The B·K² suppression work is the post-forward
        cost center at large batch. Measured NOT to move bs=1 latency
        (7.4 ms device either way — the batch-1 forward dominates), so
        it is a throughput/memory knob, not a latency one.

        `multi_label`: True (default) keeps the reference's
        (anchor, class) candidate expansion (util.py:147-148) — an
        anchor can emit several detections, one per above-conf class.
        False emits each anchor's argmax class only — the standard
        production simplification; candidate ranking collapses to one
        fused per-level max+argmax that never materializes the
        multi-label path's (B, A*nc) ranking operand. The fastest
        measured serving point (+2.2-2.8% over multi-label at
        bs128/K1024; object-level recall 1.0000 on clustered scenes —
        BENCH.md "single-label serving") but opt-in, because it
        changes detection semantics: an anchor with two above-conf
        classes emits one detection, not two."""
        self.cfg = cfg
        self.input_size = input_size
        self._dp = dp
        self.params = dp.replicate(params) if dp is not None else params
        self.device_letterbox = device_letterbox
        self.stage_size = stage_size
        self._step = functools.partial(
            _predict, cfg=cfg, compute_dtype=compute_dtype,
            conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det,
            ranking=ranking, max_nms=max_nms, approx_recall=approx_recall,
            multi_label=multi_label)
        # Single-chip fast path: pin the image entry layout to the
        # stem conv's preferred tiling so the in-program relayout copy
        # disappears (image_input_format docstring; bench.py mirrors
        # this). The dp/letterbox paths keep unconstrained entries.
        self._img_fmt = None if dp is not None else image_input_format()
        if self._img_fmt is not None:
            base = self._step
            self._step = jax.jit(lambda p, x: base(p, x),
                                 in_shardings=(None, self._img_fmt))
        self._step_staged = functools.partial(
            _predict_staged, cfg=cfg, out_size=input_size,
            compute_dtype=compute_dtype, conf_thres=conf_thres,
            iou_thres=iou_thres, max_det=max_det, ranking=ranking,
            max_nms=max_nms, approx_recall=approx_recall,
            multi_label=multi_label)
        self._pipe = None
        self._decode_threads = decode_threads

    # -- construction ---------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, size: str = "n", num_classes: int = 80,
                        **kw):
        """Load Ultralytics .pt / reference / own .ckpt weights, fold BN."""
        cfg = get_model_config(size, num_classes)
        template = yolov11.init_params(jax.random.PRNGKey(0), cfg)
        if path.endswith(".ckpt"):
            from tpu_yolo.io.checkpoint import load_checkpoint
            payload = load_checkpoint(path)
            params = payload.get("ema_params") or payload["params"]
            params = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float32), params)
        else:
            from tpu_yolo.io.weights import load_checkpoint_params
            params = load_checkpoint_params(path, template)
        return cls(yolov11.fold_batchnorm(params), cfg, **kw)

    def quantize(self, calib_paths: list[str], margin: float = 1.0):
        """Switch to int8 W8A8 inference, calibrated on `calib_paths`
        (tpu_yolo/quant.py). NOTE: measured slower than bf16 on v5e at
        YOLOv11 channel widths (BENCH.md) — provided for memory-bound
        deployments and smaller-footprint weight shipping."""
        from tpu_yolo.quant import quantize_model

        imgs, metas, nfail = self._decode_batch(calib_paths)
        if nfail:
            imgs = imgs[metas[:, 0] > 0]
        self.params = quantize_model(self.params, self.cfg, imgs,
                                     margin=margin)
        return self

    # -- host decode ------------------------------------------------------
    def _decode_batch(self, paths: list[str]):
        from tpu_yolo.data import native_loader

        if native_loader.available():
            if self._pipe is None:
                # allow_upscale=True reproduces the eval-parity geometry:
                # load_image scales the long side to input_size (upscaling
                # small images, reference dataset.py:98-102) before the
                # r<=1 letterbox — the combined scale equals the native
                # pipeline's unclamped min(size/h, size/w).
                self._pipe = native_loader.NativePipeline(
                    self.input_size, threads=self._decode_threads,
                    allow_upscale=True)
            return self._pipe.load_batch(paths)

        # Python/OpenCV fallback — same thread-pool overlap as the native
        # path (cv2 decode releases the GIL).
        from concurrent.futures import ThreadPoolExecutor

        from tpu_yolo.data.image import letterbox, load_image

        n = len(paths)
        out = np.zeros((n, self.input_size, self.input_size, 3), np.uint8)
        metas = np.full((n, 5), -1, np.float32)

        def decode(i):
            try:
                img, (h, w) = load_image(paths[i], self.input_size)
                boxed, ratio, pad = letterbox(img, self.input_size)
                out[i] = boxed[:, :, ::-1]
                # load_image pre-scales (long side -> input_size); fold
                # that and the letterbox ratio into one original->net scale.
                metas[i] = (ratio[0] * img.shape[1] / w,
                            pad[0], pad[1], w, h)
                return 0
            except Exception:
                return 1

        with ThreadPoolExecutor(max(self._decode_threads, 1)) as pool:
            fails = sum(pool.map(decode, range(n)))
        return out, metas, fails

    def _decode_batch_raw(self, paths: list[str]):
        """Raw decode into the staging buffer for the device-letterbox
        path. Returns (staged (N,St,St,3) uint8 RGB, dims (N,4)
        [staged_h, staged_w, orig_h, orig_w], n_failures)."""
        from tpu_yolo.data import native_loader

        st = self.stage_size
        if native_loader.available():
            if self._pipe is None:
                self._pipe = native_loader.NativePipeline(
                    self.input_size, threads=self._decode_threads,
                    allow_upscale=True)
            return self._pipe.load_batch_raw(paths, st)

        import cv2
        from concurrent.futures import ThreadPoolExecutor

        n = len(paths)
        out = np.zeros((n, st, st, 3), np.uint8)
        dims = np.zeros((n, 4), np.float32)

        def decode(i):
            try:
                img = cv2.imread(paths[i])
                if img is None:
                    raise ValueError(paths[i])
                h, w = img.shape[:2]
                sh, sw = h, w
                if max(h, w) > st:
                    d = st / max(h, w)
                    sw, sh = min(int(round(w * d)), st), min(int(round(h * d)), st)
                    img = cv2.resize(img, (sw, sh),
                                     interpolation=cv2.INTER_LINEAR)
                out[i, :sh, :sw] = img[:, :, ::-1]
                dims[i] = (sh, sw, h, w)
                return 0
            except Exception:
                dims[i, 0] = -1
                return 1

        with ThreadPoolExecutor(max(self._decode_threads, 1)) as pool:
            fails = sum(pool.map(decode, range(n)))
        return out, dims, fails

    @staticmethod
    def _metas_from_dims(dims: np.ndarray, out_size: int) -> np.ndarray:
        """Host mirror of the device letterbox geometry, combined with
        the host pre-shrink: (N,4) dims -> (N,6) [rx, pad_w, pad_h,
        orig_w, orig_h, ry] in the _emit meta contract.

        The host pre-shrink rounds each axis separately, so the total
        ratio differs per axis by up to ~1px on large originals: a 6th
        column carries the y-axis ratio (column 0 is the x ratio);
        _emit falls back to column 0 for 5-column (native-loader)
        metas."""
        metas = np.full((len(dims), 6), -1, np.float32)
        for i, (sh, sw, oh, ow) in enumerate(np.asarray(dims, np.float64)):
            if sh < 0:
                continue
            r = min(out_size / sh, out_size / sw)
            new_w, new_h = round(sw * r), round(sh * r)
            dx = sw / ow if ow else 1.0
            dy = sh / oh if oh else 1.0
            metas[i] = (r * dx, (out_size - new_w) / 2,
                        (out_size - new_h) / 2, ow, oh, r * dy)
        return metas

    # -- inference --------------------------------------------------------
    def detect_batch(self, images_u8: np.ndarray):
        """(B, S, S, 3) uint8 RGB -> device result dict (letterbox coords)."""
        if self._dp is not None:
            x = self._dp.shard_batch(jnp.asarray(images_u8))
        elif self._img_fmt is not None:
            x = jax.device_put(np.asarray(images_u8), self._img_fmt)
        else:
            x = jnp.asarray(images_u8)
        return self._step(self.params, x)

    def stream(self, paths: Iterable[str], batch_size: int = 64,
               rescale: bool = True) -> Iterator[dict]:
        """Double-buffered streaming over image paths; yields one dict per
        image: {path, boxes (N,4) xyxy original pixels, scores, classes}."""
        paths = list(paths)
        batches = [paths[i:i + batch_size]
                   for i in range(0, len(paths), batch_size)]
        pending = None  # (device result, metas, batch paths)

        for chunk in batches:
            pad = batch_size - len(chunk)
            if self.device_letterbox:
                imgs, dims, _ = self._decode_batch_raw(chunk)
                metas = self._metas_from_dims(dims, self.input_size)
                hw = np.maximum(dims[:, :2], 1.0)
                if pad:
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad, *imgs.shape[1:]), np.uint8)])
                    hw = np.concatenate([hw, np.ones((pad, 2), np.float32)])
                x, xhw = jnp.asarray(imgs), jnp.asarray(hw)
                if self._dp is not None:
                    x = self._dp.shard_batch(x)
                    xhw = self._dp.shard_batch(xhw)
                res = self._step_staged(self.params, x, xhw)
            else:
                imgs, metas, _ = self._decode_batch(chunk)
                if pad:
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad, *imgs.shape[1:]), np.uint8)])
                res = self.detect_batch(imgs)  # async dispatch; don't block
            if pending is not None:
                yield from self._emit(*pending, rescale)
            pending = (res, metas, chunk)
        if pending is not None:
            yield from self._emit(*pending, rescale)

    def _emit(self, res, metas, chunk, rescale):
        res = jax.device_get(res)
        for i, path in enumerate(chunk):
            n = int(res["count"][i])
            boxes = np.array(res["boxes"][i][:n], np.float32)  # writable copy
            if metas[i, 0] < 0:  # decode failure
                yield {"path": path, "boxes": np.zeros((0, 4), np.float32),
                       "scores": np.zeros(0, np.float32),
                       "classes": np.zeros(0, np.int32), "error": "decode"}
                continue
            if rescale and n:
                r, pw, ph, ow, oh = metas[i][:5]
                ry = metas[i][5] if metas.shape[1] > 5 else r
                boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pw) / r
                boxes[:, [1, 3]] = (boxes[:, [1, 3]] - ph) / ry
                boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, ow)
                boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, oh)
            yield {"path": path, "boxes": boxes,
                   "scores": np.asarray(res["scores"][i][:n]),
                   "classes": np.asarray(res["classes"][i][:n], np.int32)}


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype",
                                             "conf_thres", "iou_thres",
                                             "max_det", "ranking",
                                             "max_nms", "approx_recall",
                                             "multi_label"))
def _predict(params, images, *, cfg, compute_dtype, conf_thres, iou_thres,
             max_det, ranking="approx", max_nms=1024, approx_recall=0.9,
             multi_label=True):
    x = images.astype(compute_dtype) / compute_dtype(255)
    return yolov11.forward_nms(params, x, cfg, conf_thres=conf_thres,
                               iou_thres=iou_thres, max_det=max_det,
                               ranking=ranking, max_nms=max_nms,
                               approx_recall=approx_recall,
                               multi_label=multi_label)


@functools.partial(jax.jit, static_argnames=("cfg", "out_size",
                                             "compute_dtype", "conf_thres",
                                             "iou_thres", "max_det",
                                             "ranking", "max_nms",
                                             "approx_recall",
                                             "multi_label"))
def _predict_staged(params, staged, hw, *, cfg, out_size, compute_dtype,
                    conf_thres, iou_thres, max_det, ranking="approx",
                    max_nms=1024, approx_recall=0.9, multi_label=True):
    """Device-letterbox serving program: raw staged uint8 -> letterbox
    (ops/letterbox.py, single-resize serving geometry) -> normalize ->
    forward -> NMS, one jitted graph."""
    from tpu_yolo.ops.letterbox import letterbox_batch

    boxed, _ = letterbox_batch(staged, hw, out_size=out_size,
                               allow_upscale=True)
    x = boxed.astype(compute_dtype) / compute_dtype(255)
    return yolov11.forward_nms(params, x, cfg, conf_thres=conf_thres,
                               iou_thres=iou_thres, max_det=max_det,
                               ranking=ranking, max_nms=max_nms,
                               approx_recall=approx_recall,
                               multi_label=multi_label)
