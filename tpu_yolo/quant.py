"""Post-training int8 quantization (W8A8) for the inference path.

Beyond-reference capability (the reference has no quantization; its
closest analogue is fp16 eval, main.py:251). Design:

  * every folded conv (the FLOPs majority) runs int8 x int8 -> int32 on
    the MXU: weights are quantized per-output-channel symmetric, inputs
    per-tensor symmetric with scales calibrated from sample batches;
  * quantize/dequantize are elementwise neighbors of the conv (XLA fuses
    them), so activations between ops stay bf16 — concats, residual
    adds, SiLU, attention, SPPF pooling are unchanged and no cross-layer
    scale algebra is needed;
  * calibration reuses the Context side-channel: a forward pass with
    `Context(calibrate=True)` records each conv input's absmax
    (ops/nn.py::conv_bn), so the calibration graph IS the inference
    graph.

Param form per conv after `quantize_params`:
  {"w_q": int8 HWIO, "s_w": (O,) f32, "s_in": () f32, "b": (O,) f32}
conv_bn dispatches on the "w_q" key, like it dispatches folded/unfolded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.ops.nn import Context


def calibrate(folded_params, cfg: ModelConfig, sample_images_u8,
              compute_dtype=jnp.bfloat16) -> dict:
    """Run sample batches through the eval graph recording each conv
    input's absmax. Returns {param-path: absmax float}.

    sample_images_u8: (N, H, W, 3) uint8 (a handful of val images).
    """
    def calib_fn(p, x):
        ctx = Context(train=False, calibrate=True)
        yolov11.forward_raw(p, x, cfg, ctx)
        return ctx.absmax  # static keys, traced scalars -> one jit

    x = jnp.asarray(sample_images_u8).astype(compute_dtype) / compute_dtype(255)
    absmax = jax.jit(calib_fn)(folded_params, x)
    return {k: float(v) for k, v in absmax.items()}


def quantize_params(folded_params, absmax: dict, margin: float = 1.0):
    """Folded {'w','b'} convs -> int8 quantized form.

    absmax: calibration output (paths missing there stay un-quantized —
    e.g. if calibration ran on a sub-graph). margin scales the activation
    range (>1 trades resolution for clip robustness).
    """

    def rec(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 4 and "b" in node:
                if path in absmax:
                    w = np.asarray(node["w"], np.float32)
                    s_w = np.abs(w).reshape(-1, w.shape[-1]).max(0) / 127.0
                    s_w = np.maximum(s_w, 1e-12).astype(np.float32)
                    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
                    s_in = np.float32(max(absmax[path] * margin, 1e-12) / 127.0)
                    return {"w_q": jnp.asarray(w_q), "s_w": jnp.asarray(s_w),
                            "s_in": jnp.asarray(s_in),
                            "b": jnp.asarray(node["b"], jnp.float32)}
                return dict(node)
            return {k: rec(v, f"{path}/{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return rec(folded_params, "")


def quantize_model(folded_params, cfg: ModelConfig, sample_images_u8,
                   margin: float = 1.0):
    """One call: calibrate + quantize. Input params must be BN-folded."""
    absmax = calibrate(folded_params, cfg, sample_images_u8)
    return quantize_params(folded_params, absmax, margin)
