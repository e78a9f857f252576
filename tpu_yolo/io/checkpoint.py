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

import os
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


# ---------------------------------------------------------------------------
# Orbax backend (optional): directory-based, async-capable, the JAX-
# ecosystem standard for sharded/multi-host checkpoints. The pickle
# format above stays the default because it is a single file loadable
# with zero framework deps; use orbax for very large models or when
# saving from a multi-host mesh (it handles per-shard IO).
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str, payload: dict):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), _to_numpy(payload), force=True)


def load_checkpoint_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


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
