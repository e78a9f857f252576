"""Model-zoo structural checks for every size (reference nets/nn.py:308-347
defines n/t/s/m/l/x via width/depth/csp tuples; only v11-n has golden
activations, so the other sizes get parameter-count pins against the
published Ultralytics YOLO11 model card and a forward smoke test)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import get_model_config
from tpu_yolo.models import yolov11
from tpu_yolo.utils.profiler import count_params

# Ultralytics YOLO11 published parameter counts (million), nc=80.
# t is this fork's extra 0.75-width interpolation (no published number).
EXPECTED_M_PARAMS = {"n": 2.6, "s": 9.4, "m": 20.1, "l": 25.3, "x": 56.9}


@pytest.mark.parametrize("size", list("nsmlx"))
def test_param_counts(size):
    cfg = get_model_config(size)
    params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    folded = yolov11.fold_batchnorm(params)
    m = count_params(folded) / 1e6
    assert m == pytest.approx(EXPECTED_M_PARAMS[size], rel=0.02), \
        f"size {size}: {m:.2f}M params"


@pytest.mark.parametrize("size", list("ntsmlx"))
def test_forward_all_sizes(size):
    cfg = get_model_config(size)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    x = jnp.asarray(np.zeros((1, 128, 128, 3), np.float32))
    out = yolov11.forward(params, x, cfg, train=False)
    a = sum((128 // s) ** 2 for s in cfg.strides)
    assert out.shape == (1, a, 4 + cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()


def test_train_forward_shapes_all_sizes():
    """Raw train maps have (B, H/s, W/s, 4*reg+nc) at every size."""
    for size in "nx":
        cfg = get_model_config(size)
        params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        from tpu_yolo.ops.nn import Context
        maps = yolov11.forward_raw(params, x, cfg, Context(train=True))
        for m, s in zip(maps, cfg.strides):
            assert m.shape == (1, 64 // s, 64 // s, cfg.no)
