"""Model export: StableHLO (and optional TF SavedModel / ONNX via tf2onnx).

TPU-native analogue of the reference's ONNX export (utils/util.py:47-73,
opset 12, dynamic batch). JAX's portable serialization format is
StableHLO through `jax.export`: the artifact is a single .stablehlo
bytes file plus a JSON manifest, reloadable with `jax.export.deserialize`
and runnable on any XLA backend. A dynamic batch dimension is expressed
with symbolic shapes, mirroring the reference's dynamic_axes.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11


def export_stablehlo(params, cfg: ModelConfig, input_size: int,
                     out_dir: str, batch: int | None = None,
                     compute_dtype=jnp.bfloat16):
    """Serialize the eval forward (decode included) to StableHLO.

    batch=None exports a symbolic ("dynamic") batch dimension; an int
    pins it. Returns the manifest dict.
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)

    def fwd(p, img):
        x = img.astype(compute_dtype) / compute_dtype(255)
        return yolov11.forward(p, x, cfg, train=False)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, input_size, input_size, 3), jnp.uint8)
    else:
        spec = jax.ShapeDtypeStruct((batch, input_size, input_size, 3), jnp.uint8)

    exported = jexport.export(jax.jit(fwd))(params, spec)
    blob = exported.serialize()

    path = os.path.join(out_dir, "model.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)

    manifest = {
        "format": "stablehlo",
        "input": f"uint8[{'b' if batch is None else batch},{input_size},{input_size},3]",
        "output": "(B, A, 4+nc) pixel xywh + class probabilities",
        "num_classes": cfg.num_classes,
        "input_size": input_size,
        "bytes": len(blob),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_stablehlo(out_dir: str):
    """Reload an exported artifact; returns a callable(params, images)."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
