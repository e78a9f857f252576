"""Native checkpoint format: a pickled dict of pure-numpy pytrees.

Replaces reference torch.save checkpoints (main.py:207-216: {epoch, best,
ema model object, optimizer state, scheduler}) with a torch-free,
class-free format: everything is numpy arrays + plain python, so files
load anywhere without the defining modules (the reference's .pt files
require its own classes to unpickle).

Contents: {'epoch', 'best', 'params', 'ema_params', 'opt_state', 'step',
'ema_updates', 'meta'}. `strip_checkpoint` drops optimizer state and
halves precision for an inference-only artifact (reference
strip_optimizer, utils/util.py:332-337).
"""
from __future__ import annotations

import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: dict):
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def strip_checkpoint(path: str):
    """Keep only (ema) params, cast floats to fp16 for a small deploy file."""
    ckpt = load_checkpoint(path)
    params = ckpt.get("ema_params") or ckpt.get("params")

    def shrink(x):
        x = np.asarray(x)
        return x.astype(np.float16) if x.dtype == np.float32 else x

    out = {"epoch": ckpt.get("epoch"), "best": ckpt.get("best"),
           "params": jax.tree_util.tree_map(shrink, params),
           "meta": ckpt.get("meta")}
    with open(path, "wb") as f:
        pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
