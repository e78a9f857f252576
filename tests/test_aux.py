"""Aux subsystems: profiler (XLA cost model), StableHLO export round-trip,
label-converter tool."""
import subprocess
import sys

import numpy as np
import pytest

import jax

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11

TINY = ModelConfig(width=(3, 8, 16, 32, 64, 128), depth=(1,) * 6,
                   csp=(False, True), num_classes=8)


def test_profiler_counts():
    from tpu_yolo.utils.profiler import count_params, profile_model

    params = yolov11.init_params(jax.random.PRNGKey(0), TINY)
    n = count_params(params)
    assert n > 10_000
    folded = yolov11.fold_batchnorm(params)
    assert count_params(folded) < n  # BN stats folded away

    r = profile_model(folded, TINY, input_size=64)
    assert r["params"] == count_params(folded)
    assert r["gflops"] > 0


def test_stablehlo_export_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tpu_yolo.utils.export import export_stablehlo, load_stablehlo

    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), TINY))
    manifest = export_stablehlo(params, TINY, 64, str(tmp_path), batch=2,
                                compute_dtype=jnp.float32)
    assert manifest["bytes"] > 0

    call = load_stablehlo(str(tmp_path))
    x = np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), np.uint8)
    got = call(params, jnp.asarray(x))
    want = yolov11.forward(params, jnp.asarray(x).astype(jnp.float32) / 255,
                           TINY, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_convert_labels_tool(tmp_path):
    src = tmp_path / "seg"
    dst = tmp_path / "box"
    src.mkdir()
    # triangle polygon -> its enclosing box; plus an existing bbox line kept
    (src / "a.txt").write_text(
        "0 0.1 0.1 0.5 0.1 0.3 0.4\n"
        "2 0.5 0.5 0.2 0.2\n")
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_labels.py"),
         str(src), str(dst)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lines = (dst / "a.txt").read_text().strip().splitlines()
    assert len(lines) == 2
    cls, cx, cy, w, h = lines[0].split()
    assert cls == "0"
    assert float(cx) == pytest.approx(0.3, abs=1e-5)
    assert float(cy) == pytest.approx(0.25, abs=1e-5)
    assert float(w) == pytest.approx(0.4, abs=1e-5)
    assert float(h) == pytest.approx(0.3, abs=1e-5)
    assert lines[1] == "2 0.5 0.5 0.2 0.2"
