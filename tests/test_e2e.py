"""End-to-end integration: CLI-level train + test on a synthetic
mini-COCO under /tmp (the reference validates operationally, SURVEY.md
§4; this is the same check made hermetic and automatic)."""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    """4 train + 4 val synthetic images with one box each, COCO layout."""
    import cv2

    root = tmp_path_factory.mktemp("mini_coco")
    rng = np.random.default_rng(0)
    for split in ("train2017", "val2017"):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        names = []
        for i in range(4):
            img = rng.integers(0, 255, (120, 160, 3), np.uint8)
            # draw a bright box so there is actual signal
            img[30:70, 40:100] = (255, 40, 40)
            name = f"{split}_{i}.jpg"
            cv2.imwrite(str(img_dir / name), img)
            cls = i % 2
            (lbl_dir / f"{split}_{i}.txt").write_text(
                f"{cls} {70/160:.4f} {50/120:.4f} {60/160:.4f} {40/120:.4f}\n")
            names.append(str(img_dir / name))
        (root / f"{split}.txt").write_text("\n".join(names) + "\n")
    return root


def _hyp_tiny(tmp_path):
    import yaml

    from tpu_yolo.core.config import load_hyperparams
    hyp = load_hyperparams()
    hyp["names"] = {0: "red", 1: "blue"}
    hyp["mosaic"] = 1.0
    p = tmp_path / "hyp.yaml"
    p.write_text(yaml.safe_dump(hyp))
    return str(p)


def test_parity_check_harness(mini_coco, tmp_path):
    """tools/parity_check.py drives the full --test path end-to-end and
    emits the JSON verdict contract (VERDICT r1 missing #8: the harness
    must be runnable the hour COCO + yolo11n.pt appear; here it runs on
    the synthetic mini-COCO with init weights and an explicit --expect)."""
    import json

    import jax

    from tpu_yolo.core.config import get_model_config, load_hyperparams
    from tpu_yolo.io.checkpoint import save_checkpoint
    from tpu_yolo.models import yolov11

    hyp_path = _hyp_tiny(tmp_path)
    hyp = load_hyperparams(hyp_path)
    cfg = get_model_config("n", num_classes=len(hyp["names"]))
    params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "yolo11n.ckpt"
    save_checkpoint(str(ckpt), {"params": params, "ema_params": None})

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    cmd = [
        sys.executable, "tools/parity_check.py",
        "--weights", str(ckpt), "--data-dir", str(mini_coco),
        "--input-size", "128", "--val-batch-size", "4",
        "--hyp", hyp_path, "--workers", "2",
        "--expect", "0.0", "--tol", "5.0",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-4000:]
    verdict = json.loads(r.stdout.strip().splitlines()[-1])
    assert verdict["pass"] is True and verdict["full_set"] is True
    assert verdict["metric"] == "coco_val_map_v11n_128"
    assert 0.0 <= verdict["map"] <= 100.0

    # --max-images smoke mode: runs, but never grants a parity pass
    r2 = subprocess.run(cmd + ["--max-images", "2"],
                        cwd=os.path.dirname(os.path.dirname(__file__)),
                        env=env, capture_output=True, text=True, timeout=1200)
    assert r2.returncode == 1, r2.stderr[-4000:]
    v2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert v2["pass"] is False and v2["full_set"] is False


@pytest.mark.slow
def test_divergence_guard_saves_crash_ckpt(mini_coco, tmp_path):
    """A diverging run (absurd LR) must stop with FloatingPointError and
    save the blown state for post-mortem (beyond-reference guard; the
    reference trains on through NaNs silently)."""
    import yaml

    from tpu_yolo.core.config import load_hyperparams
    hyp = load_hyperparams()
    hyp["names"] = {0: "red", 1: "blue"}
    hyp["max_lr"] = hyp["min_lr"] = 1e12
    hyp["warmup_epochs"] = 0.0
    hyp_path = tmp_path / "hyp_nan.yaml"
    hyp_path.write_text(yaml.safe_dump(hyp))

    save_dir = tmp_path / "weights_nan"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    cmd = [
        sys.executable, "main.py", "--train",
        "--model-size", "n", "--input-size", "128",
        "--batch-size", "4", "--val-batch-size", "4", "--epochs", "2",
        "--data-dir", str(mini_coco), "--save-dir", str(save_dir),
        "--hyp", str(hyp_path), "--workers", "2",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode != 0
    assert "FloatingPointError" in r.stderr and "crash.ckpt" in r.stderr
    assert (save_dir / "crash.ckpt").exists()


@pytest.mark.slow
def test_cli_train_device_augment(mini_coco, tmp_path):
    """`main.py --train --device-augment`: the mosaic/affine/HSV/flip
    pixel work runs inside the jitted program; one epoch must train and
    log exactly like the host-augment path."""
    save_dir = tmp_path / "weights_da"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    cmd = [
        sys.executable, "main.py", "--train", "--device-augment",
        "--model-size", "n", "--input-size", "128",
        "--batch-size", "4", "--val-batch-size", "4", "--epochs", "1",
        "--data-dir", str(mini_coco), "--save-dir", str(save_dir),
        "--hyp", _hyp_tiny(tmp_path), "--workers", "2",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    csv_path = save_dir / "step.csv"
    assert csv_path.exists()
    rows = csv_path.read_text().splitlines()
    assert rows[0] == "epoch,box,cls,dfl,Recall,Precision,mAP@50,mAP"
    assert len(rows) >= 2  # one epoch row with finite losses
    vals = rows[1].split(",")
    assert all(float(v) == float(v) for v in vals[1:4])  # not NaN
    assert (save_dir / "last.ckpt").exists()


def test_cli_train_native_loader(mini_coco, tmp_path):
    """`main.py --train --native-train on`: decode + prescale through
    the C++ pool, augmentation on host (data/native_train.py); one
    epoch must train and log exactly like the Python-loader path."""
    from tpu_yolo.data import native_loader
    if not native_loader.available():
        pytest.skip("native lib not built")
    save_dir = tmp_path / "weights_nt"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    cmd = [
        sys.executable, "main.py", "--train", "--native-train", "on",
        "--model-size", "n", "--input-size", "128",
        "--batch-size", "4", "--val-batch-size", "4", "--epochs", "1",
        "--data-dir", str(mini_coco), "--save-dir", str(save_dir),
        "--hyp", _hyp_tiny(tmp_path), "--workers", "2",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    rows = (save_dir / "step.csv").read_text().splitlines()
    assert rows[0] == "epoch,box,cls,dfl,Recall,Precision,mAP@50,mAP"
    assert len(rows) >= 2
    vals = rows[1].split(",")
    assert all(float(v) == float(v) for v in vals[1:4])  # not NaN
    assert (save_dir / "last.ckpt").exists()


@pytest.mark.slow
def test_cli_train_then_test(mini_coco, tmp_path):
    """`main.py --train` one epoch then `--test` on the checkpoint, all on
    the virtual CPU mesh. Asserts the CSV contract and checkpoint files
    (reference step.csv/last.pt contract, main.py:98-103, 207-216)."""
    save_dir = tmp_path / "weights"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    hyp = _hyp_tiny(tmp_path)
    cmd = [
        sys.executable, "main.py", "--train",
        "--model-size", "n", "--input-size", "128",
        "--batch-size", "4", "--val-batch-size", "4", "--epochs", "1",
        "--data-dir", str(mini_coco), "--save-dir", str(save_dir),
        "--hyp", hyp, "--workers", "2",
        # fixed GT pad bucket (--gt-bucket): the no-allgather padding
        # path; 32 >= any mini-coco mosaic GT count, so identical math
        "--gt-bucket", "32",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]

    csv_path = save_dir / "step.csv"
    assert csv_path.exists()
    header = csv_path.read_text().splitlines()[0]
    assert header == "epoch,box,cls,dfl,Recall,Precision,mAP@50,mAP"
    assert (save_dir / "last.ckpt").exists()
    assert (save_dir / "best.ckpt").exists()
    assert (save_dir / "lr.png").exists()

    # strip_checkpoint produced an inference-only fp16 artifact
    from tpu_yolo.io.checkpoint import load_checkpoint
    ckpt = load_checkpoint(str(save_dir / "best.ckpt"))
    assert "opt" not in ckpt and "params" in ckpt

    cmd = [
        sys.executable, "main.py", "--test",
        "--model-size", "n", "--input-size", "128", "--val-batch-size", "4",
        "--data-dir", str(mini_coco), "--save-dir", str(save_dir),
        "--weights", str(save_dir / "best.ckpt"), "--hyp", hyp, "--workers", "2",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "mAP:" in r.stdout


@pytest.mark.slow
def test_cli_resume(mini_coco, tmp_path):
    """Train 1 epoch, then resume to epoch 2 from last.ckpt (reference
    --resume contract, main.py:29-35,51-55)."""
    save_dir = tmp_path / "weights"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    hyp = _hyp_tiny(tmp_path)
    base = [
        sys.executable, "main.py", "--train",
        "--model-size", "n", "--input-size", "128",
        "--batch-size", "4", "--val-batch-size", "4",
        "--data-dir", str(mini_coco), "--save-dir", str(save_dir),
        "--hyp", hyp, "--workers", "2",
    ]
    repo = os.path.dirname(os.path.dirname(__file__))
    r = subprocess.run(base + ["--epochs", "1"], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    # strip_checkpoint ran at end-of-training, so last.ckpt is an
    # inference-only artifact; resuming from it means fine-tune semantics
    # (params restored, fresh optimizer/EMA, epoch reset to 0).
    from tpu_yolo.io.checkpoint import load_checkpoint
    ckpt = load_checkpoint(str(save_dir / "last.ckpt"))
    assert "params" in ckpt and "opt" not in ckpt

    r = subprocess.run(
        base + ["--epochs", "2", "--resume", str(save_dir / "last.ckpt")],
        cwd=repo, env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "fine-tuning from stripped checkpoint" in r.stdout.lower()
    rows = (save_dir / "step.csv").read_text().strip().splitlines()
    assert rows[-1].startswith("002")  # ran both epochs of the new run


def test_cli_coco_metrics(mini_coco, tmp_path):
    """--test --coco-metrics prints the COCO-API 12-line table
    (first-party protocol, eval/coco_eval.py) computed in
    original-image space alongside the reference-parity mAP."""
    import jax

    from tpu_yolo.core.config import get_model_config, load_hyperparams
    from tpu_yolo.io.checkpoint import save_checkpoint
    from tpu_yolo.models import yolov11

    hyp_path = _hyp_tiny(tmp_path)
    hyp = load_hyperparams(hyp_path)
    cfg = get_model_config("n", num_classes=len(hyp["names"]))
    params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "init.ckpt"
    save_checkpoint(str(ckpt), {"params": params, "ema_params": None})

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [
        sys.executable, "main.py", "--test", "--coco-metrics",
        "--model-size", "n", "--input-size", "128", "--val-batch-size", "4",
        "--data-dir", str(mini_coco), "--save-dir", str(tmp_path),
        "--weights", str(ckpt), "--hyp", hyp_path, "--workers", "2",
    ]
    r = subprocess.run(cmd, cwd=os.path.dirname(os.path.dirname(__file__)),
                       env=env, capture_output=True, text=True, timeout=3000)
    assert r.returncode == 0, r.stderr[-4000:]
    table = [ln for ln in r.stdout.splitlines()
             if "Average Precision" in ln or "Average Recall" in ln]
    assert len(table) == 12, r.stdout[-4000:]
    assert "IoU=0.50:0.95 | area=   all | maxDets=100" in table[0]
    # init weights on synthetic data: values defined and in range
    for ln in table:
        val = float(ln.rsplit("=", 1)[1])
        assert -1.0 <= val <= 1.0
