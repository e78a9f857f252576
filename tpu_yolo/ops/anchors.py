"""Static anchor-grid generation.

The reference recomputes anchors from live feature-map shapes on every
eval forward (utils/util.py:85-96, nets/nn.py:261) and derives strides
from a dummy forward at model build (nets/nn.py:288-290). On TPU both
are static functions of the input size, computed once per jit trace.
"""
from __future__ import annotations

import numpy as np


def make_anchors(input_hw: tuple[int, int], strides=(8, 16, 32), offset: float = 0.5):
    """Per-level grid centers (+offset) and stride tensor.

    Returns:
      anchors: (A, 2) float32 — (x, y) grid-cell centers in feature units,
        level-major, rows y-outer x-inner (matches reference meshgrid
        flattening, utils/util.py:89-95).
      stride_t: (A, 1) float32.
    """
    h, w = input_hw
    anchor_list, stride_list = [], []
    for s in strides:
        fh, fw = h // s, w // s
        sx = np.arange(fw, dtype=np.float32) + offset
        sy = np.arange(fh, dtype=np.float32) + offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        anchor_list.append(np.stack((gx, gy), axis=-1).reshape(-1, 2))
        stride_list.append(np.full((fh * fw, 1), s, dtype=np.float32))
    return np.concatenate(anchor_list), np.concatenate(stride_list)


def num_anchors(input_hw: tuple[int, int], strides=(8, 16, 32)) -> int:
    h, w = input_hw
    return sum((h // s) * (w // s) for s in strides)
