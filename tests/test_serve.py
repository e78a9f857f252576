"""Serving pipeline: streaming batches, coordinate rescale, failure slots."""
import os

import numpy as np
import pytest

import jax

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.serve import Detector

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("serve_jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (320, 240), (640, 640)]):
        img = cv2.GaussianBlur(
            rng.integers(0, 255, (h, w, 3), np.uint8), (5, 5), 2)
        p = str(root / f"im{i}.jpg")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def _tiny_detector(**kw):
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), TINY))
    return Detector(params, TINY, input_size=128, conf_thres=1e-6, **kw)


def test_stream_results_shape_and_rescale(jpeg_dir):
    det = _tiny_detector()
    results = list(det.stream(jpeg_dir, batch_size=2, rescale=True))
    assert [r["path"] for r in results] == jpeg_dir
    sizes = [(640, 480), (240, 320), (640, 640)]  # (w, h)
    for r, (w, h) in zip(results, sizes):
        assert r["boxes"].shape[1] == 4
        assert len(r["scores"]) == len(r["boxes"]) == len(r["classes"])
        if len(r["boxes"]):
            # rescaled boxes live in original-image pixel space
            assert r["boxes"][:, [0, 2]].max() <= w + 1e-3
            assert r["boxes"][:, [1, 3]].max() <= h + 1e-3
            assert r["boxes"].min() >= -1e-3


def test_detect_one_and_latency_mode(jpeg_dir):
    """detect_one: single-image path AND array inputs agree with the
    stream() pipeline on the same image; latency_mode presets
    (single-label, K=256) keep the result contract; explicit args
    override the preset."""
    import cv2

    det = _tiny_detector(latency_mode=True)
    assert det._knobs["multi_label"] is False
    assert det._knobs["max_nms"] == 256
    # explicit args beat the preset
    det2 = _tiny_detector(latency_mode=True, max_nms=512, multi_label=True)
    assert det2._knobs["max_nms"] == 512 and det2._knobs["multi_label"]

    # path input == the stream() result on the identical program
    r1 = det.detect_one(jpeg_dir[0])
    (r_stream,) = list(det.stream(jpeg_dir[:1], batch_size=1))
    np.testing.assert_allclose(r1["boxes"], r_stream["boxes"])
    np.testing.assert_allclose(r1["scores"], r_stream["scores"])
    np.testing.assert_array_equal(r1["classes"], r_stream["classes"])
    h, w = cv2.imread(jpeg_dir[0]).shape[:2]
    if len(r1["boxes"]):
        assert r1["boxes"][:, [0, 2]].max() <= w + 1e-3
        assert r1["boxes"][:, [1, 3]].max() <= h + 1e-3

    # array input: same geometry contract (decode tolerance only)
    img_rgb = cv2.imread(jpeg_dir[0])[:, :, ::-1]
    r2 = det.detect_one(np.ascontiguousarray(img_rgb))
    assert r2["path"] == "<array>"
    assert r2["boxes"].shape[1] == 4
    assert len(r2["scores"]) == len(r2["boxes"]) == len(r2["classes"])

    with pytest.raises(ValueError):
        det.detect_one(np.zeros((4, 4), np.uint8))


def test_stream_decode_failure_slot(jpeg_dir, tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg at all")
    det = _tiny_detector()
    results = list(det.stream([jpeg_dir[0], bad], batch_size=2))
    assert "error" not in results[0]
    assert results[1].get("error") == "decode"
    assert len(results[1]["boxes"]) == 0


def test_letterbox_vs_rescale_consistency(jpeg_dir):
    """rescale=False boxes transform to rescale=True boxes by the meta."""
    det = _tiny_detector()
    lb = list(det.stream(jpeg_dir[:1], batch_size=1, rescale=False))[0]
    orig = list(det.stream(jpeg_dir[:1], batch_size=1, rescale=True))[0]
    assert len(lb["boxes"]) == len(orig["boxes"])
    if len(lb["boxes"]):
        # un-letterboxing is (xy - pad)/ratio then clip to the original
        s = 128 / 640  # eval never upscales: ratio = 128/640 for this image
        manual = (lb["boxes"] - np.array([0, 16, 0, 16], np.float32)) / s
        manual[:, [0, 2]] = manual[:, [0, 2]].clip(0, 640)
        manual[:, [1, 3]] = manual[:, [1, 3]].clip(0, 480)
        np.testing.assert_allclose(orig["boxes"], manual, rtol=1e-5, atol=1e-3)


def test_detector_quantize(jpeg_dir):
    det = _tiny_detector()
    before = list(det.stream(jpeg_dir[:1], batch_size=1))[0]
    det.quantize(jpeg_dir)
    # quantized params form
    assert "w_q" in det.params["net"]["p1"][0]
    after = list(det.stream(jpeg_dir[:1], batch_size=1))[0]
    # still produces detections of the right shape
    assert after["boxes"].shape[1] == 4


def test_draw_detections(jpeg_dir):
    import cv2

    from tpu_yolo.utils.viz import draw_detections

    img = cv2.imread(jpeg_dir[0])
    boxes = np.array([[10, 10, 100, 120], [200, 50, 400, 300]], np.float32)
    out = draw_detections(img, boxes, [0.9, 0.4], [0, 5],
                          names={0: "red", 5: "blue"})
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()          # something was drawn
    np.testing.assert_array_equal(img, cv2.imread(jpeg_dir[0]))  # input untouched


def test_detector_data_parallel(jpeg_dir):
    """DP-sharded Detector equals the single-device one on the 8-device
    virtual mesh."""
    from tpu_yolo.parallel import DataParallel, make_mesh

    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), TINY))
    single = Detector(params, TINY, input_size=128, conf_thres=1e-6)
    sharded = Detector(params, TINY, input_size=128, conf_thres=1e-6,
                       dp=DataParallel(make_mesh(n_data=8)))
    a = list(single.stream(jpeg_dir[:2] * 4, batch_size=8))
    b = list(sharded.stream(jpeg_dir[:2] * 4, batch_size=8))
    assert len(a) == len(b) == 8
    for ra, rb in zip(a, b):
        assert len(ra["boxes"]) == len(rb["boxes"])
        if len(ra["boxes"]):
            np.testing.assert_allclose(ra["boxes"], rb["boxes"],
                                       rtol=1e-4, atol=0.2)


def test_detect_cli(jpeg_dir, tmp_path):
    """tools/detect.py end-to-end: checkpoint -> annotated images."""
    import os
    import subprocess
    import sys

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.io.checkpoint import save_checkpoint

    params = yolov11.init_params(jax.random.PRNGKey(0), get_model_config("n"))
    ckpt = str(tmp_path / "n.ckpt")
    save_checkpoint(ckpt, {"params": jax.device_get(params),
                           "ema_params": None, "epoch": 0, "best": 0,
                           "meta": {"size": "n"}})
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "annotated"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "detect.py"),
         "--weights", ckpt, "--size", "n", "--input-size", "128",
         "--conf", "0.0001", "--out", str(out), *jpeg_dir[:2]],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "done:" in r.stdout
    assert len(list(out.glob("*.jpg"))) == 2

    # --latency-mode: single-image detect_one path through the CLI
    out2 = tmp_path / "annotated_lat"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "detect.py"),
         "--weights", ckpt, "--size", "n", "--input-size", "128",
         "--conf", "0.0001", "--latency-mode", "--out", str(out2),
         jpeg_dir[0]],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "done:" in r.stdout
    assert len(list(out2.glob("*.jpg"))) == 1


def test_device_letterbox_stream(jpeg_dir, tmp_path):
    """device_letterbox=True: host ships raw staged uint8; the letterbox
    runs inside the jitted program (ops/letterbox.py). Boxes come back
    in original-image pixel space and decode failures are per-slot."""
    bad = str(tmp_path / "bad2.jpg")
    with open(bad, "wb") as f:
        f.write(b"nope")
    det = _tiny_detector(device_letterbox=True, stage_size=320)
    paths = jpeg_dir + [bad]
    results = list(det.stream(paths, batch_size=2, rescale=True))
    assert [r["path"] for r in results] == paths
    sizes = [(640, 480), (240, 320), (640, 640)]
    for r, (w, h) in zip(results, sizes):
        assert "error" not in r
        if len(r["boxes"]):
            assert r["boxes"][:, [0, 2]].max() <= w + 1e-3
            assert r["boxes"][:, [1, 3]].max() <= h + 1e-3
            assert r["boxes"].min() >= -1e-3
    assert results[-1].get("error") == "decode"


def test_device_letterbox_matches_host_path(jpeg_dir):
    """The device-letterbox detector finds essentially the same top
    detections as the host-letterbox one (same weights; geometry
    contract shared, interpolation differs by <2 LSB)."""
    host = _tiny_detector()
    dev = _tiny_detector(device_letterbox=True, stage_size=320)
    a = list(host.stream(jpeg_dir[1:2], batch_size=1))[0]
    b = list(dev.stream(jpeg_dir[1:2], batch_size=1))[0]
    assert len(a["boxes"]) and len(b["boxes"])
    # top-scoring box agrees to a couple of pixels
    ia, ib = int(np.argmax(a["scores"])), int(np.argmax(b["scores"]))
    np.testing.assert_allclose(a["boxes"][ia], b["boxes"][ib], atol=4.0)
    assert a["classes"][ia] == b["classes"][ib]


def test_pin_refusal_demotes_to_unpinned(monkeypatch):
    """stage_pinned reporting pin_held=False must demote the Detector to
    its unpinned entry program permanently and warn once (the relay can
    deterministically refuse the entry-layout pin for an exact shape —
    serve.stage_pinned docstring, measured 2026-08-19)."""
    import warnings

    from tpu_yolo import serve

    det = _tiny_detector()
    batch = np.zeros((2, 128, 128, 3), np.uint8)
    ref = det.detect_batch(batch)  # CPU: unpinned baseline result

    # simulate a TPU Detector whose pin is refused for this shape
    det._img_fmt = object()
    monkeypatch.setattr(serve, "stage_pinned",
                        lambda arr, fmt: (jax.numpy.asarray(arr), False))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = det.detect_batch(batch)
    assert any("entry layout pin" in str(x.message) for x in w)
    assert det._img_fmt is None and det._step is det._step_unpinned
    np.testing.assert_allclose(np.asarray(out["count"]),
                               np.asarray(ref["count"]))
    # demotion is permanent: no further stage_pinned involvement
    det.detect_batch(batch)


def test_pin_entry_false_never_pins():
    """pin_entry=False must build the unpinned serving program outright
    (escape hatch for relay states where the pin REQUEST itself wedges
    the client — serve.stage_pinned's trailing note)."""
    det = _tiny_detector(pin_entry=False)
    assert det._img_fmt is None and det._step is det._step_unpinned
    out = det.detect_batch(np.zeros((2, 128, 128, 3), np.uint8))
    assert "count" in out


def test_escape_refused_pin_no_reexec_when_disabled(monkeypatch):
    """With TPU_YOLO_NO_PIN already set, escape_refused_pin must RETURN
    (caller demotes in-process) instead of re-exec'ing — the re-exec
    guard that prevents a restart loop."""
    import bench

    monkeypatch.setenv("TPU_YOLO_NO_PIN", "1")
    monkeypatch.setattr(os, "execv",
                        lambda *a: pytest.fail("re-exec'd despite NO_PIN"))
    bench.escape_refused_pin()


def test_no_pin_env_disables_image_input_format(monkeypatch):
    """TPU_YOLO_NO_PIN=1 must force image_input_format() to None — the
    contract bench.escape_refused_pin's restart relies on."""
    from tpu_yolo import serve

    monkeypatch.setenv("TPU_YOLO_NO_PIN", "1")
    assert serve.image_input_format() is None


def test_pin_refusal_on_aot_artifact_raises(monkeypatch):
    """An AOT-restored Detector cannot rebuild its pinned executable; a
    refused pin must raise with a clear message, not demote."""
    from tpu_yolo import serve

    det = _tiny_detector()
    det._img_fmt = object()
    det._fixed_batch = 2
    monkeypatch.setattr(serve, "stage_pinned",
                        lambda arr, fmt: (jax.numpy.asarray(arr), False))
    with pytest.raises(RuntimeError, match="layout pin"):
        det.detect_batch(np.zeros((2, 128, 128, 3), np.uint8))
