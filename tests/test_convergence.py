"""Semantic end-to-end check: the full training loop must LEARN.

Overfits the tiny model on four fixed synthetic images (one bright box
each) and asserts the trained detector finds the boxes with high IoU and
mAP@50 — exercising assigner -> losses -> grads -> SGD -> EMA -> decode
-> NMS -> metric semantics together. Mechanical tests can't catch a
sign flip that still produces finite losses; this does.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.eval.evaluator import IOU_THRESHOLDS
from tpu_yolo.eval.metrics import average_precision, match_predictions
from tpu_yolo.models import yolov11
from tpu_yolo.ops.nms import batched_nms
from tpu_yolo.train.step import init_train_state, train_step

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=2)


@pytest.mark.slow
def test_overfit_finds_the_box():
    size = 128
    rng = np.random.default_rng(0)
    images = rng.integers(0, 80, (4, size, size, 3), np.uint8)
    gts = []
    for i in range(4):
        x1, y1 = rng.integers(10, 50, 2)
        w, h = rng.integers(36, 64, 2)
        images[i, y1:y1 + h, x1:x1 + w] = (250, 240, 60)
        gts.append([i % 2, x1, y1, x1 + w, y1 + h])
    gt = np.zeros((4, 1, 5), np.float32)
    gt[:, 0] = gts

    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    state = init_train_state(params, ema=False)
    ximg = jnp.asarray(images)
    xgt = jnp.asarray(gt)
    hyp = jnp.asarray([7.5, 0.5, 1.5], jnp.float32)

    # 200 steps: the bf16 mixed-precision path (reference-AMP parity,
    # step.py) reaches confident detections ~40 steps later than full
    # f32 on this 4-image overfit; a sign-flip class of bug still never
    # converges, which is what this test exists to catch.
    losses = []
    for step in range(200):
        lr = 0.002 if step < 20 else 0.01   # short warmup
        state, m = train_step(state, ximg, xgt, lr, hyp, 0.0, 0.9,
                              cfg=TINY, accumulate=1, apply_update=True)
        losses.append(float(m["loss_box"] + m["loss_cls"] + m["loss_dfl"]))
    assert losses[-1] < losses[0] * 0.5, f"did not converge: {losses[::20]}"

    folded = yolov11.fold_batchnorm(jax.device_get(state["params"]))
    preds = yolov11.forward(folded, ximg.astype(jnp.float32) / 255, TINY,
                            train=False)
    res = jax.device_get(batched_nms(preds, conf_thres=0.25))

    all_tp, all_conf, all_pcls, all_tcls = [], [], [], []
    for b in range(4):
        n = int(res["count"][b])
        assert n >= 1, f"image {b}: no detections above conf 0.25"
        det = np.concatenate([
            np.asarray(res["boxes"][b][:n]),
            np.asarray(res["scores"][b][:n])[:, None],
            np.asarray(res["classes"][b][:n], np.float32)[:, None]], axis=1)
        g = gt[b]
        tp = match_predictions(det, g, IOU_THRESHOLDS)
        all_tp.append(tp)
        all_conf.append(det[:, 4])
        all_pcls.append(det[:, 5])
        all_tcls.append(g[:, 0])

    out = average_precision(np.concatenate(all_tp), np.concatenate(all_conf),
                            np.concatenate(all_pcls), np.concatenate(all_tcls))
    assert out["map50"] > 0.5, f"mAP@50 after overfit: {out['map50']:.3f}"
