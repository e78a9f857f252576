"""Checkpoint save/resume round-trip + strip, and the extra losses vs a
plain-numpy oracle."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.io import checkpoint as ckpt_io
from tpu_yolo.models import yolov11
from tpu_yolo.train.step import init_train_state

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)


def test_checkpoint_roundtrip(tmp_path):
    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    state = init_train_state(params, ema=True, accumulate=2)
    payload = {"epoch": 7, "best": 0.31, "meta": {"size": "n"},
               **{k: jax.device_get(state[k]) for k in
                  ("params", "opt", "step", "ema_updates", "ema_params")}}
    path = str(tmp_path / "last.ckpt")
    ckpt_io.save_checkpoint(path, payload)

    loaded = ckpt_io.load_checkpoint(path)
    assert loaded["epoch"] == 7 and loaded["best"] == 0.31
    # structural + numeric equality of the param tree
    a = jax.tree_util.tree_leaves(payload["params"])
    b = jax.tree_util.tree_leaves(loaded["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # pickle is torch-free / class-free: everything numpy or builtin
    for leaf in jax.tree_util.tree_leaves(loaded):
        assert isinstance(leaf, (np.ndarray, np.generic, int, float, str, bool))


def test_strip_checkpoint(tmp_path):
    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    state = init_train_state(params, ema=True)
    payload = {"epoch": 1, "best": 0.1, "meta": None,
               **{k: jax.device_get(state[k]) for k in
                  ("params", "opt", "step", "ema_updates", "ema_params")}}
    path = str(tmp_path / "best.ckpt")
    ckpt_io.save_checkpoint(path, payload)
    ckpt_io.strip_checkpoint(path)
    stripped = ckpt_io.load_checkpoint(path)
    assert "opt" not in stripped and "ema_params" not in stripped
    leaf = jax.tree_util.tree_leaves(stripped["params"])[0]
    assert leaf.dtype == np.float16  # fp16 deploy artifact (util.py:332-337)


def test_extra_losses_against_numpy():
    from tpu_yolo.train.losses_extra import (
        bce_with_logits, focal_loss, quality_focal_loss, varifocal_loss)

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 7)).astype(np.float32) * 3
    targets = rng.uniform(0, 1, (4, 7)).astype(np.float32)
    p = 1 / (1 + np.exp(-logits))
    bce_ref = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))

    np.testing.assert_allclose(
        np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))),
        bce_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(quality_focal_loss(jnp.asarray(logits), jnp.asarray(targets))),
        bce_ref * np.abs(targets - p) ** 2.0, rtol=1e-5, atol=1e-6)
    pt = targets * p + (1 - targets) * (1 - p)
    alpha_t = targets * 0.25 + (1 - targets) * 0.75
    np.testing.assert_allclose(
        np.asarray(focal_loss(jnp.asarray(logits), jnp.asarray(targets))),
        bce_ref * (1 - pt) ** 1.5 * alpha_t, rtol=1e-5, atol=1e-6)
    w = np.where(targets > 0, targets, 0.75 * p ** 2.0)
    np.testing.assert_allclose(
        np.asarray(varifocal_loss(jnp.asarray(logits), jnp.asarray(targets))),
        bce_ref * w, rtol=1e-5, atol=1e-6)
