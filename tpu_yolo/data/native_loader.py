"""ctypes binding for the native C++ serving data-path
(native/image_pipeline.cc): JPEG decode + bilinear resize + letterbox
in a GIL-free thread pool, batches emitted as contiguous NHWC uint8 RGB.

This replaces the reference's native image stack — OpenCV C++ calls from
Python workers (utils/dataset.py:100,292-313) under torch DataLoader
processes (main.py:72-73) — for the high-throughput inference path. The
Python/OpenCV pipeline in data/image.py stays the parity oracle for
training/eval; the letterbox geometry here is byte-compatible with it
(same ratio clamp and round(x -/+ 0.1) padding split).

Build: `make -C native` (g++, links -ljpeg). If the .so is absent,
`available()` is False and callers fall back to the Python loader.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "libtpuyolo_data.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:  # build on first use; toolchain is expected in the image
            subprocess.run(["make", "-C", os.path.dirname(_SO_PATH)],
                           check=True, capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.ip_create.restype = ctypes.c_void_p
    lib.ip_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ip_destroy.argtypes = [ctypes.c_void_p]
    lib.ip_load_one.restype = ctypes.c_int
    lib.ip_load_one.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
    lib.ip_load_batch.restype = ctypes.c_int
    lib.ip_load_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
    lib.ip_load_batch_raw.restype = ctypes.c_int
    lib.ip_load_batch_raw.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float)]
    lib.ip_load_batch_scaled.restype = ctypes.c_int
    lib.ip_load_batch_scaled.argtypes = lib.ip_load_batch_raw.argtypes
    lib.ip_load_batch_scaled_bgr.restype = ctypes.c_int
    lib.ip_load_batch_scaled_bgr.argtypes = lib.ip_load_batch_raw.argtypes
    lib.ip_load_batch_scaled_interp.restype = ctypes.c_int
    lib.ip_load_batch_scaled_interp.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float)]
    lib.ip_load_batch_eval.restype = ctypes.c_int
    lib.ip_load_batch_eval.argtypes = lib.ip_load_batch_raw.argtypes
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativePipeline:
    """Decode/letterbox pipeline handle over the C++ thread pool."""

    def __init__(self, input_size: int, threads: int = 8,
                 allow_upscale: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable; run `make -C native`")
        self._lib = lib
        self.input_size = input_size
        self.allow_upscale = allow_upscale
        self._h = lib.ip_create(threads, input_size, int(allow_upscale))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.ip_destroy(h)
            self._h = None

    def load_one(self, jpeg_bytes: bytes):
        """Decode one JPEG -> (letterboxed (S,S,3) uint8 RGB, meta dict)."""
        s = self.input_size
        out = np.empty((s, s, 3), np.uint8)
        meta = np.empty(5, np.float32)
        rc = self._lib.ip_load_one(
            self._h, jpeg_bytes, len(jpeg_bytes),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise ValueError("JPEG decode failed")
        return out, {"ratio": float(meta[0]), "pad_w": float(meta[1]),
                     "pad_h": float(meta[2]), "orig_w": int(meta[3]),
                     "orig_h": int(meta[4])}

    def load_batch(self, paths: list[str]):
        """Parallel decode+letterbox -> ((N,S,S,3) uint8, (N,5) meta,
        n_failures). Failed slots are zeroed with meta[i,0] == -1."""
        s = self.input_size
        n = len(paths)
        out = np.empty((n, s, s, 3), np.uint8)
        metas = np.empty((n, 5), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        nfail = self._lib.ip_load_batch(
            self._h, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            metas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nfail:
            nfail = self._fallback(paths, metas[:, 0] < 0, out, metas,
                                   self._fb_letterbox)
        return out, metas, int(nfail)

    # -- per-image Python fallback (non-JPEG / exotic JPEG) --------------
    # The C++ pipeline is libjpeg-only (native/image_pipeline.cc); the
    # reference decodes anything cv2 reads (utils/dataset.py:100). Any
    # slot the native pool fails is retried here through cv2 with the
    # SAME geometry contract, so PNG/BMP/WebP files flow through
    # Detector.stream and --device-augment instead of becoming blank
    # slots. Only files cv2 also rejects remain failures (dims/meta -1).

    def _fallback(self, paths, bad_mask, out, meta, fill_one) -> int:
        import cv2

        remaining = 0
        for i in np.flatnonzero(bad_mask):
            img = cv2.imread(paths[int(i)])  # BGR, any format cv2 knows
            if img is None:
                remaining += 1
                continue
            fill_one(img, out[int(i)], meta[int(i)], int(i))
        return remaining

    def _fb_letterbox(self, img, out_i, meta_i, i=0):
        """load_batch contract: single-resize letterbox, RGB, meta
        (ratio, pad_w, pad_h, orig_w, orig_h); allow_upscale unclamps
        the ratio (the native pipeline's combined min(s/h, s/w) —
        serve.py::_decode_batch docstring). Padding uses the frozen
        round(x -/+ 0.1) split (data/image.py::letterbox)."""
        import cv2

        h, w = img.shape[:2]
        s = self.input_size
        r = min(s / h, s / w)
        if not self.allow_upscale:
            r = min(r, 1.0)
        new_w, new_h = int(round(w * r)), int(round(h * r))
        if (new_w, new_h) != (w, h):
            img = cv2.resize(img, (new_w, new_h),
                             interpolation=cv2.INTER_LINEAR)
        pad_w, pad_h = (s - new_w) / 2, (s - new_h) / 2
        top = int(round(pad_h - 0.1))
        left = int(round(pad_w - 0.1))
        out_i[:] = 0
        out_i[top:top + new_h, left:left + new_w] = img[:, :, ::-1]
        meta_i[:] = (r, pad_w, pad_h, w, h)

    def _fb_raw(self, stage):
        def fill(img, out_i, dims_i, i=0):
            import cv2

            h, w = img.shape[:2]
            sh, sw = h, w
            if max(h, w) > stage:
                d = stage / max(h, w)
                sw = min(int(round(w * d)), stage)
                sh = min(int(round(h * d)), stage)
                img = cv2.resize(img, (sw, sh),
                                 interpolation=cv2.INTER_LINEAR)
            out_i[:] = 0
            out_i[:sh, :sw] = img[:, :, ::-1]
            dims_i[:] = (sh, sw, h, w)
        return fill

    def _fb_scaled(self, stage, bgr: bool = False, interps=None):
        def fill(img, out_i, dims_i, i=0):
            import cv2

            h, w = img.shape[:2]
            sh, sw = h, w
            r = stage / max(h, w)
            if max(h, w) != stage:  # the load_image contract: truncated
                sh, sw = max(int(h * r), 1), max(int(w * r), 1)
                # interp codes are cv2 enum values (0..4)
                flag = (cv2.INTER_LINEAR if interps is None
                        else int(interps[i]))
                img = cv2.resize(img, (sw, sh), interpolation=flag)
            out_i[:] = 0
            # cv2 decodes BGR: pass through for the bgr contract, swap
            # to RGB otherwise
            out_i[:sh, :sw] = img if bgr else img[:, :, ::-1]
            dims_i[:] = (sh, sw, h, w)
        return fill

    def load_batch_raw(self, paths: list[str], stage: int):
        """Parallel decode into a RAW (N, stage, stage, 3) top-left
        staging buffer (no letterbox — ops/letterbox.py runs it on
        device). Images longer than `stage` are pre-shrunk to fit.
        Returns (buffer, dims (N,4) [staged_h, staged_w, orig_h, orig_w],
        n_failures); failed slots zeroed with dims[i,0] == -1."""
        n = len(paths)
        out = np.empty((n, stage, stage, 3), np.uint8)
        dims = np.empty((n, 4), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        nfail = self._lib.ip_load_batch_raw(
            self._h, arr, n, stage,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nfail:
            nfail = self._fallback(paths, dims[:, 0] < 0, out, dims,
                                   self._fb_raw(stage))
        return out, dims, int(nfail)

    def _fb_eval(self, stage):
        def fill(img, out_i, dims_i, i=0):
            """Bit-identical mirror of the Python eval image path
            (data/image.py::load_image + letterbox(augment=False)):
            float64 ratio, truncated dims, cv2.INTER_LINEAR, centered
            round(pad - 0.1) placement, BGR->RGB at the end."""
            import cv2

            h, w = img.shape[:2]
            r = stage / max(h, w)
            sh, sw = h, w
            if r != 1:
                sh, sw = int(h * r), int(w * r)
                img = cv2.resize(img, (sw, sh),
                                 interpolation=cv2.INTER_LINEAR)
            top = int(round((stage - sh) / 2 - 0.1))
            left = int(round((stage - sw) / 2 - 0.1))
            out_i[:] = 0
            out_i[top:top + sh, left:left + sw] = img[:, :, ::-1]
            dims_i[:] = (sh, sw, h, w)
        return fill

    def load_batch_eval(self, paths: list[str], stage: int):
        """Parallel decode + the FULL eval image contract in one pass:
        load_image resize (long side == stage, truncated dims) then the
        centered letterbox pad (data/image.py load_image + letterbox
        composed; reference eval loader main.py:232-234). Returns
        (images (N, stage, stage, 3) uint8 RGB, dims (N,4)
        [staged_h, staged_w, orig_h, orig_w], n_failures); failed slots
        zeroed with dims[i,0] == -1. Label geometry derives from dims:
        pad_w = (stage - staged_w) / 2, pad_h = (stage - staged_h) / 2."""
        n = len(paths)
        out = np.empty((n, stage, stage, 3), np.uint8)
        dims = np.empty((n, 4), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        nfail = self._lib.ip_load_batch_eval(
            self._h, arr, n, stage,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nfail:
            nfail = self._fallback(paths, dims[:, 0] < 0, out, dims,
                                   self._fb_eval(stage))
        return out, dims, int(nfail)

    def load_batch_scaled(self, paths: list[str], stage: int,
                          bgr: bool = False, interps=None):
        """Parallel decode + resize so every image's long side == stage
        (up or down; truncated dims — the load_image contract,
        data/image.py:26-38), top-left anchored in a (N, stage, stage, 3)
        buffer. The train device-augment staging path. Returns
        (buffer, dims (N,4) [staged_h, staged_w, orig_h, orig_w],
        n_failures); failed slots zeroed with dims[i,0] == -1.
        bgr=True emits BGR channel order (decoded directly to BGR —
        same bytes reordered) for host-cv2 consumers
        (data/native_train.py). `interps`: optional per-image cv2
        interpolation codes (0 nearest / 1 linear / 2 cubic / 3 area /
        4 lanczos4) — the reference's random-interp train prescale
        (data/image.py::_TRAIN_INTERPS; dataset.py:95-103); None means
        bilinear for all."""
        n = len(paths)
        out = np.empty((n, stage, stage, 3), np.uint8)
        dims = np.empty((n, 4), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        if interps is not None:
            codes = (ctypes.c_int * n)(*[int(v) for v in interps])
            nfail = self._lib.ip_load_batch_scaled_interp(
                self._h, arr, n, stage, codes, int(bgr),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                dims.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            fn = (self._lib.ip_load_batch_scaled_bgr if bgr
                  else self._lib.ip_load_batch_scaled)
            nfail = fn(
                self._h, arr, n, stage,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                dims.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nfail:
            nfail = self._fallback(
                paths, dims[:, 0] < 0, out, dims,
                self._fb_scaled(stage, bgr=bgr, interps=interps))
        return out, dims, int(nfail)


class NativeEvalLoader:
    """Eval-loop data loader over the native C++ pipeline.

    Drop-in for data/loader.py::DataLoader in eval/evaluator.py::evaluate
    (reference eval loader: main.py:232-234 — torch DataLoader over a
    non-augmenting Dataset): yields (images (B,S,S,3) uint8 RGB,
    targets {"cls","box","idx"}) in dataset order. Images run through
    ip_load_batch_eval — the exact load_image + letterbox(augment=False)
    geometry in the GIL-free C++ pool (pixel values differ from cv2 only
    by the decoder/bilinear tolerance, test_native_loader.py; non-JPEGs
    take the bit-identical cv2 fallback) — and the label geometry is the
    same denorm_corners/corners_to_norm math the Python Dataset applies
    (data/dataset.py eval branch), computed from the returned dims.

    One batch is prefetched in a background thread so host decode
    overlaps the device forward (the evaluator double-buffers on top).
    """

    def __init__(self, dataset, batch_size: int, threads: int = 8,
                 prefetch: int = 2):
        self.dataset = dataset          # DetectionDataset(augment=False)
        self.batch_size = batch_size
        self.input_size = dataset.input_size
        self.pipe = NativePipeline(self.input_size, threads=threads)
        self.prefetch = prefetch

    def __len__(self):
        return -(-len(self.dataset.filenames) // self.batch_size)

    def _make_batch(self, lo: int):
        paths = self.dataset.filenames[lo:lo + self.batch_size]
        images, dims, nfail = self.pipe.load_batch_eval(paths,
                                                        self.input_size)
        if nfail:
            bad = [p for p, d in zip(paths, dims) if d[0] < 0]
            raise ValueError(f"undecodable eval images: {bad}")
        from tpu_yolo.data.augment import corners_to_norm, denorm_corners
        s = float(self.input_size)
        cls_all, box_all, idx_all = [], [], []
        for i, d in enumerate(dims):
            sh, sw = float(d[0]), float(d[1])
            label = self.dataset.labels[lo + i].copy()
            if label.size:
                label[:, 1:] = denorm_corners(
                    label[:, 1:], sw, sh, (s - sw) / 2, (s - sh) / 2)
                box = corners_to_norm(label[:, 1:5], s, s)
            else:
                box = label[:, 1:5].copy()
            cls_all.append(label[:, 0:1].astype(np.float32))
            box_all.append(box.astype(np.float32))
            idx_all.append(np.full(len(label), i, dtype=np.float32))
        targets = {"cls": np.concatenate(cls_all, 0),
                   "box": np.concatenate(box_all, 0),
                   "idx": np.concatenate(idx_all, 0)}
        return images, targets

    def __iter__(self):
        import queue
        import threading

        starts = list(range(0, len(self.dataset.filenames), self.batch_size))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for lo in starts:
                    if stop.is_set():
                        return
                    q.put(self._make_batch(lo))
            except Exception as e:  # surface decode errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            while worker.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
