"""Inference-graph transforms: space-to-depth stem equivalence, orbax
checkpoint backend round-trip."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)


def test_stem_space_to_depth_equivalent():
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), TINY))
    p2 = yolov11.fold_stem_space_to_depth(params)
    assert p2["net"]["p1"][0]["w"].shape == (2, 2, 12, TINY.width[1])
    # idempotent: a second fold is a no-op
    p3 = yolov11.fold_stem_space_to_depth(p2)
    assert p3["net"]["p1"][0]["w"].shape == (2, 2, 12, TINY.width[1])

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    a = yolov11.forward(params, x, TINY, train=False)
    b = yolov11.forward(p2, x, TINY, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    # pre-rearranged host input (space_to_depth_host staging): the
    # backbone must accept the (B, H/2, W/2, 12) layout directly and
    # produce BITWISE the same program inputs as the on-device rearrange
    xs2d = jnp.asarray(yolov11.space_to_depth_host(np.asarray(x)))
    c = yolov11.forward(p2, xs2d, TINY, train=False)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(c))


def test_orbax_checkpoint_roundtrip(tmp_path):
    from tpu_yolo.io.checkpoint import (load_checkpoint_orbax,
                                        save_checkpoint_orbax)

    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    payload = {"epoch": 3, "params": jax.device_get(params)}
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(path, payload)
    loaded = load_checkpoint_orbax(path)
    assert loaded["epoch"] == 3
    a = jax.tree_util.tree_leaves(payload["params"])
    b = jax.tree_util.tree_leaves(loaded["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fold_input_scale_equivalent():
    """conv(x/255, W) == conv(x, W/255): folded-scale params on raw-valued
    input match the /255 pipeline bitwise-closely."""
    import jax.numpy as jnp

    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), TINY))
    scaled = yolov11.fold_input_scale(params)
    img = jnp.asarray(np.random.default_rng(0)
                      .integers(0, 256, (2, 64, 64, 3), np.uint8))
    a = yolov11.forward(params, img.astype(jnp.float32) / 255, TINY, train=False)
    b = yolov11.forward(scaled, img.astype(jnp.float32), TINY, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-4)
