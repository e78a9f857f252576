"""AOT deployment artifact: save_compiled / load_compiled round trip.

The serialized artifact is the compiled XLA executable of the serving
program plus the Detector configuration — loading must reproduce the
live Detector's outputs bit-exactly without retracing, and every
environment/architecture mismatch must fail loudly before the
executable runs (the reference's only saved form is a torch module
pickle, reference main.py:207-216 — no compiled-program artifact).
"""
import pickle

import numpy as np
import pytest

import jax

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.serve import Detector

# Executing a DESERIALIZED executable on the XLA:CPU backend hits a
# runtime hole: result buffers reference embedded sub-functions
# ("Buffer Definition Event: Function wrapped_iota not found") that the
# CPU AOT loader does not restore — an XLA:CPU limitation, not an
# artifact-format problem. Save/load/validation still runs on CPU; the
# execution round trip is exercised on the real chip
# (`tools/aot_bench.py --mode check`: bit-exact on TPU v5 lite,
# 2026-08-19 — BENCH.md "AOT deployment artifact").
CPU_CANNOT_EXECUTE = jax.default_backend() == "cpu"
needs_device_execution = pytest.mark.skipif(
    CPU_CANNOT_EXECUTE,
    reason="XLA:CPU cannot execute deserialized executables "
           "(wrapped_iota buffer-definition hole); covered on TPU by "
           "tools/aot_bench.py --mode check")

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)
SIZE = 128
BATCH = 2


def _params(key=0, cfg=TINY):
    return yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(key), cfg))


def _tiny_detector(params=None, **kw):
    return Detector(params if params is not None else _params(), TINY,
                    input_size=SIZE, conf_thres=1e-6, **kw)


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aot") / "det.aot")
    det = _tiny_detector()
    det.save_compiled(path, batch_size=BATCH)
    return path, det


@needs_device_execution
def test_roundtrip_bit_exact(artifact):
    path, live = artifact
    loaded = Detector.load_compiled(path, _params())
    imgs = np.random.default_rng(0).integers(
        0, 256, (BATCH, SIZE, SIZE, 3), np.uint8)
    _tree_equal(live.detect_batch(imgs), loaded.detect_batch(imgs))


def test_loaded_detector_rejects_other_batch(artifact):
    path, _ = artifact
    loaded = Detector.load_compiled(path, _params())
    bad = np.zeros((BATCH + 1, SIZE, SIZE, 3), np.uint8)
    with pytest.raises(ValueError, match="batch_size"):
        loaded.detect_batch(bad)


@needs_device_execution
def test_stream_adopts_compiled_batch(artifact, tmp_path):
    import cv2

    path, _ = artifact
    loaded = Detector.load_compiled(path, _params())
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):  # 3 images -> two chunks of the compiled batch 2
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (96, 120, 3), np.uint8))
        paths.append(p)
    results = list(loaded.stream(paths, batch_size=64))  # 64 is overridden
    assert [r["path"] for r in results] == paths


def test_environment_mismatch_raises(artifact, tmp_path):
    path, _ = artifact
    with open(path, "rb") as f:
        art = pickle.load(f)
    art["device_kind"] = "TPU v99"
    bad = str(tmp_path / "wrong_device.aot")
    with open(bad, "wb") as f:
        pickle.dump(art, f)
    with pytest.raises(RuntimeError, match="device_kind"):
        Detector.load_compiled(bad, _params())


def test_architecture_mismatch_raises(artifact):
    path, _ = artifact
    other = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                        csp=(False, True), num_classes=4)
    with pytest.raises(ValueError, match="mismatch|structures differ"):
        Detector.load_compiled(path, _params(cfg=other))


@needs_device_execution
def test_weights_stay_outside_the_artifact(artifact):
    """Same artifact + different weights = different results: the
    executable is architecture-specific, weight-agnostic."""
    path, _ = artifact
    a = Detector.load_compiled(path, _params(key=0))
    b = Detector.load_compiled(path, _params(key=1))
    imgs = np.random.default_rng(2).integers(
        0, 256, (BATCH, SIZE, SIZE, 3), np.uint8)
    ra, rb = a.detect_batch(imgs), b.detect_batch(imgs)
    assert not np.array_equal(np.asarray(ra["scores"]),
                              np.asarray(rb["scores"]))


@needs_device_execution
def test_staged_letterbox_roundtrip(tmp_path):
    det = _tiny_detector(device_letterbox=True, stage_size=160)
    path = str(tmp_path / "staged.aot")
    det.save_compiled(path, batch_size=BATCH)
    loaded = Detector.load_compiled(path, _params())
    assert loaded.device_letterbox
    rng = np.random.default_rng(3)
    staged = rng.integers(0, 256, (BATCH, 160, 160, 3), np.uint8)
    hw = np.array([[120.0, 160.0], [160.0, 96.0]], np.float32)
    _tree_equal(det._step_staged(det.params, staged, hw),
                loaded._step_staged(loaded.params, staged, hw))
