"""int8 W8A8 post-training quantization: calibration coverage, quantized
forward fidelity vs f32, end-to-end detections survive quantization."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.ops.nms import batched_nms
from tpu_yolo.quant import calibrate, quantize_model, quantize_params

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)


def _setup():
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), TINY))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    return params, images


def test_calibration_covers_every_conv():
    params, images = _setup()
    absmax = calibrate(params, TINY, images, compute_dtype=jnp.float32)
    # every folded conv in the tree got an observation
    n_convs = sum(1 for x in jax.tree_util.tree_leaves(params)
                  if getattr(x, "ndim", 0) == 4)
    assert len(absmax) == n_convs
    assert all(v > 0 for v in absmax.values())


def test_quantized_params_form():
    params, images = _setup()
    q = quantize_model(params, TINY, images)
    leaves = []

    def walk(node):
        if isinstance(node, dict):
            if "w_q" in node:
                leaves.append(node)
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(q)
    assert leaves, "nothing quantized"
    for p in leaves:
        assert p["w_q"].dtype == jnp.int8
        assert p["s_w"].shape == (p["w_q"].shape[-1],)
        assert int(jnp.max(jnp.abs(p["w_q"]))) <= 127


def test_quantized_forward_close_to_f32():
    params, images = _setup()
    q = quantize_model(params, TINY, images)
    x = jnp.asarray(images).astype(jnp.float32) / 255

    ref = yolov11.forward(params, x, TINY, train=False)
    got = yolov11.forward(q, x, TINY, train=False)

    # class probabilities: small absolute drift
    p_ref = np.asarray(ref[..., 4:])
    p_got = np.asarray(got[..., 4:])
    assert np.abs(p_ref - p_got).max() < 0.12
    assert np.abs(p_ref - p_got).mean() < 0.01

    # boxes: relative to the stride scale
    b_ref = np.asarray(ref[..., :4])
    b_got = np.asarray(got[..., :4])
    assert np.abs(b_ref - b_got).mean() < 2.0  # pixels at 64px input

    # detections: NMS outputs overlap strongly
    r_ref = batched_nms(ref, conf_thres=0.1)
    r_got = batched_nms(got, conf_thres=0.1)
    c_ref = int(np.asarray(r_ref["count"]).sum())
    c_got = int(np.asarray(r_got["count"]).sum())
    assert abs(c_ref - c_got) <= max(3, int(0.25 * max(c_ref, 1)))


def test_margin_loosens_clipping():
    params, images = _setup()
    absmax = calibrate(params, TINY, images, compute_dtype=jnp.float32)
    q1 = quantize_params(params, absmax, margin=1.0)
    q2 = quantize_params(params, absmax, margin=2.0)
    assert float(q2["net"]["p1"][0]["s_in"]) == \
        2 * float(q1["net"]["p1"][0]["s_in"])
