"""Host-side image decode and letterbox geometry.

Counterpart of reference utils/dataset.py:95-103 (load_image) and
292-313 (resize). The letterbox rounding conventions (±0.1 center-pad
trick, "never upscale at eval") are a frozen contract — eval mAP is
computed in letterboxed pixel space (reference main.py:269,291) — so
they are matched bit-for-bit here.

Design note: for the high-throughput serving path the decode ships raw
uint8 at pre-letterbox size and the normalize/pad runs on device
(see eval/evaluator.py); this module is the host fallback + geometry
oracle.
"""
from __future__ import annotations

import random

import cv2
import numpy as np

_TRAIN_INTERPS = (cv2.INTER_AREA, cv2.INTER_CUBIC, cv2.INTER_LINEAR,
                  cv2.INTER_NEAREST, cv2.INTER_LANCZOS4)


def load_image(path: str, input_size: int, augment: bool = False):
    """Decode BGR and pre-scale so the long side is at most input_size.

    Returns (image, (orig_h, orig_w)).
    """
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(f"cannot decode image: {path}")
    h, w = img.shape[:2]
    r = input_size / max(h, w)
    if r != 1:
        interp = random.choice(_TRAIN_INTERPS) if augment else cv2.INTER_LINEAR
        img = cv2.resize(img, (int(w * r), int(h * r)), interpolation=interp)
    return img, (h, w)


def letterbox(img: np.ndarray, input_size: int, augment: bool = False):
    """Scale-preserving resize + center pad to (input_size, input_size).

    Returns (padded_image, (rw, rh) scale ratios, (pad_w, pad_h) in px).
    Eval never upscales (r clamped to 1) and pads with the reference's
    round(x -/+ 0.1) split so odd padding lands identically.
    """
    h, w = img.shape[:2]
    r = min(input_size / h, input_size / w)
    if not augment:
        r = min(r, 1.0)

    new_w, new_h = int(round(w * r)), int(round(h * r))
    pad_w = (input_size - new_w) / 2
    pad_h = (input_size - new_h) / 2

    if (w, h) != (new_w, new_h):
        interp = random.choice(_TRAIN_INTERPS) if augment else cv2.INTER_LINEAR
        img = cv2.resize(img, (new_w, new_h), interpolation=interp)

    top, bottom = int(round(pad_h - 0.1)), int(round(pad_h + 0.1))
    left, right = int(round(pad_w - 0.1)), int(round(pad_w + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT)
    return img, (r, r), (pad_w, pad_h)


def eval_geometry(orig_hw, input_size: int):
    """Original-image -> letterboxed-pixel mapping of the eval decode
    path (load_image prescale, then letterbox, augment=False), without
    decoding the image.

    Returns (gain (gx, gy), pad (pad_w, pad_h)) such that
    x_lb = x_orig * gx + pad_w — the same mapping DetectionDataset
    applies to GT labels (denorm with ratio*prescaled_size + pad), so
    detections are un-letterboxed with the exact inverse. Used by the
    COCO-protocol metrics (eval/coco_eval.py), whose area buckets are
    defined in original-image pixels.
    """
    h, w = orig_hw
    r1 = input_size / max(h, w)
    w1, h1 = (int(w * r1), int(h * r1)) if r1 != 1 else (w, h)
    r2 = min(input_size / h1, input_size / w1, 1.0)
    new_w, new_h = int(round(w1 * r2)), int(round(h1 * r2))
    pad_w = (input_size - new_w) / 2
    pad_h = (input_size - new_h) / 2
    return (r2 * w1 / w, r2 * h1 / h), (pad_w, pad_h)


def bgr_hwc_to_rgb(img: np.ndarray) -> np.ndarray:
    """HWC BGR (OpenCV) -> HWC RGB contiguous uint8 (device-ready NHWC slice)."""
    return np.ascontiguousarray(img[:, :, ::-1])
