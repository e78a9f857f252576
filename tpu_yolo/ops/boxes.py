"""Box geometry: format conversion, IoU / CIoU, DFL distribution decode.

Replaces reference utils/util.py:76-82 (wh2xy), 303-329 (compute_iou /
CIoU) and the DFL decode (nets/nn.py:212-225, utils/util.py:853-861) —
the reference's frozen arange(16) 1x1 conv is just softmax @ arange here.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh_to_xyxy(box):
    """(cx, cy, w, h) -> (x1, y1, x2, y2), any leading dims."""
    cx, cy, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate((cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2), axis=-1)


def xyxy_to_xywh(box):
    x1, y1, x2, y2 = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(((x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1), axis=-1)


def box_iou_pairwise(a, b, eps: float = 1e-7):
    """Plain IoU between all pairs: a (..., N, 4) x b (..., M, 4) -> (..., N, M).

    Boxes are xyxy. Used by NMS and the eval TP-matrix
    (reference utils/util.py:99-105).
    """
    a1, a2 = jnp.split(a[..., :, None, :], 2, axis=-1)   # (..., N, 1, 2) lt / rb
    b1, b2 = jnp.split(b[..., None, :, :], 2, axis=-1)   # (..., 1, M, 2)
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0).prod(-1)
    area_a = jnp.clip(a2 - a1, 0).prod(-1)
    area_b = jnp.clip(b2 - b1, 0).prod(-1)
    return inter / (area_a + area_b - inter + eps)


def ciou(box1, box2, eps: float = 1e-7):
    """Complete IoU between aligned boxes (xyxy, matching last dims).

    Element-wise counterpart of reference compute_iou (utils/util.py:303-329):
    IoU − center-distance/diagonal − aspect-consistency term. Returns shape
    box1.shape[:-1] + (1,), like the reference's chunked math.
    """
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * \
            jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi ** 2) * jnp.square(jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1))
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def dfl_expectation(dist_logits, reg_max: int = 16):
    """Distribution Focal Loss decode: softmax expectation over bins.

    dist_logits: (..., 4, reg_max) -> (..., 4) expected offsets.
    """
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    x = dist_logits.astype(jnp.float32)
    # single fused pass: softmax's prob @ proj is a dot, which forces
    # XLA to materialize the (…, 4, reg_max) f32 prob tensor in HBM
    # (275 MB at bs128/640, profiled 2026-08-17); the elementwise
    # multiply+reduce form fuses exp, weighting and both reductions
    # into one kernel. Same math: Σ eⱼ·j / Σ eⱼ == softmax @ proj.
    e = jnp.exp(x - jax.lax.stop_gradient(x.max(axis=-1, keepdims=True)))
    return (e * proj).sum(axis=-1) / e.sum(axis=-1)


def dfl_decode(dist_logits, anchors, reg_max: int = 16, xywh: bool = True):
    """Decode (..., A, 4*reg_max) DFL logits to boxes at `anchors` (A, 2).

    Returns xywh (eval head path, nets/nn.py:261-270) or xyxy (loss path,
    utils/util.py:853-861), in feature-grid units (multiply by stride for
    pixels).
    """
    shape = dist_logits.shape[:-1]
    d = dfl_expectation(dist_logits.reshape(*shape, 4, reg_max), reg_max)
    lt, rb = jnp.split(d, 2, axis=-1)
    x1y1 = anchors - lt
    x2y2 = anchors + rb
    if xywh:
        return jnp.concatenate(((x1y1 + x2y2) / 2, x2y2 - x1y1), axis=-1)
    return jnp.concatenate((x1y1, x2y2), axis=-1)
