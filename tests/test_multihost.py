"""Multi-host rehearsal: coordinated jax.distributed CPU processes.

Executes (for real, process_count() > 1) the trainer's multi-host
branches — make_array_from_process_local_data assembly, the GT-bucket
process_allgather, sharded eval with allgathered AP, checkpoint
save -> kill -> resume — and asserts the training trajectory matches a
single-process run over the same global batch (the SPMD contract:
process topology must not change the math). VERDICT round-2 item 2 +
round-3 item 4; reference launcher contract: main.sh, main.py:338-344.

Cold-compile Gloo-timeout note: the oracle runs FIRST at the GLOBAL
topology (1 process x 8 virtual devices), which populates the persistent
XLA compile cache with the same SPMD executables the multi-process runs
need — they then compile warm and hit their first collective together,
so no retry-on-DEADLINE_EXCEEDED hack is needed (removed in round 4).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_rehearsal.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(num_processes: int, port: int, timeout: int = 600,
                 extra=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(num_processes),
             "--process-id", str(i), *extra],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=REPO)
        for i in range(num_processes)]
    outs, failures = [], []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            failures.append(err)
        outs.append(None if p.returncode else
                    json.loads(out.strip().splitlines()[-1]))
    if failures:
        raise AssertionError("worker(s) failed:\n" + "\n---\n".join(
            f[-4000:] for f in failures))
    return outs


@pytest.fixture(scope="module")
def oracle():
    """Single-process reference at the GLOBAL 8-device topology — also
    the compile-cache prewarm for every multi-process run below."""
    return _run_workers(1, _free_port(),
                        extra=("--local-devices", "8", "--eval-ap"))[0]


def test_two_process_rehearsal_matches_single_process(oracle):
    multi = _run_workers(2, _free_port(), extra=("--eval-ap",))

    # both processes observe the same replicated losses
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=0, atol=0)
    # and the 2-process trajectory equals the single-process oracle on
    # the identical global batch (process topology is invisible to the
    # math; CPU f32 tolerances)
    np.testing.assert_allclose(np.asarray(multi[0]["losses"]),
                               np.asarray(oracle["losses"]),
                               rtol=2e-4, atol=2e-4)
    assert multi[0]["eval_counts"] == multi[1]["eval_counts"]
    assert multi[0]["eval_counts"] == oracle["eval_counts"]

    # full AP-producing distributed eval: mAP is replicated across
    # ranks and matches the oracle's (identical detections + identical
    # host-side matching on the gathered rows)
    assert multi[0]["map"] == multi[1]["map"]
    assert multi[0]["map50"] == multi[1]["map50"]
    assert multi[0]["map"] == pytest.approx(oracle["map"], abs=1e-6)
    assert multi[0]["map50"] == pytest.approx(oracle["map50"], abs=1e-6)

    # fixed-bucket mode (--gt-bucket, the sync-free multi-host padding
    # path: no per-step allgather): same trajectory as the adaptive
    # oracle — bucket 32 equals the adaptive choice for these GT counts,
    # and padded rows are masked out of the loss either way
    fixed = _run_workers(2, _free_port(), extra=("--gt-bucket", "32"))
    np.testing.assert_allclose(fixed[0]["losses"], fixed[1]["losses"],
                               rtol=0, atol=0)   # replicated across ranks
    assert fixed[0]["eval_counts"] == fixed[1]["eval_counts"]
    np.testing.assert_allclose(np.asarray(fixed[0]["losses"]),
                               np.asarray(oracle["losses"]),
                               rtol=2e-4, atol=2e-4)


def test_two_process_checkpoint_resume(oracle, tmp_path):
    """save -> kill -> resume across both processes: a 2-step run that
    checkpoints, new processes that resume for 2 more steps — the
    stitched trajectory equals an uninterrupted oracle's (the trainer
    resume contract, _save_train_ckpt/load_checkpoint)."""
    ckpt = str(tmp_path / "mid.ckpt")
    first = _run_workers(2, _free_port(),
                         extra=("--steps", "2", "--ckpt", ckpt))
    assert os.path.exists(ckpt)
    resumed = _run_workers(2, _free_port(),
                           extra=("--steps", "2", "--start-step", "2",
                                  "--resume-from", ckpt))
    np.testing.assert_allclose(resumed[0]["losses"], resumed[1]["losses"],
                               rtol=0, atol=0)
    stitched = np.concatenate([np.asarray(first[0]["losses"]),
                               np.asarray(resumed[0]["losses"])], 0)
    # oracle runs 3 steps; compare the overlap (steps 0-2), then extend
    np.testing.assert_allclose(stitched[:3], np.asarray(oracle["losses"]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_four_process_topology(oracle):
    """4 processes x 2 local devices: same global 8-device math."""
    multi = _run_workers(4, _free_port(), timeout=900,
                         extra=("--local-devices", "2"))
    for r in multi[1:]:
        np.testing.assert_allclose(multi[0]["losses"], r["losses"],
                                   rtol=0, atol=0)
        assert r["eval_counts"] == multi[0]["eval_counts"]
    np.testing.assert_allclose(np.asarray(multi[0]["losses"]),
                               np.asarray(oracle["losses"]),
                               rtol=2e-4, atol=2e-4)
    assert multi[0]["eval_counts"] == oracle["eval_counts"]


@pytest.mark.slow
def test_preflight_two_process(tmp_path):
    """tools/multihost_preflight.py as 2 coordinated CPU processes:
    rendezvous, topology consistency, batch sizing, gt-bucket advice
    from a real label scan, and the train-step compile prewarm — the
    day-one kit for the first real slice (VERDICT r4 item 8)."""
    import cv2

    img_dir = tmp_path / "images" / "train2017"
    lbl_dir = tmp_path / "labels" / "train2017"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(6):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 256, (48, 64, 3), np.uint8))
        (lbl_dir / f"im{i}.txt").write_text(
            "\n".join(f"{j % 3} 0.5 0.5 0.2 0.2".replace(
                "0.5 0.5", f"0.{3 + j} 0.{3 + j}")
                for j in range(i + 1)) + "\n")
        names.append(p)
    (tmp_path / "train2017.txt").write_text("\n".join(names) + "\n")

    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache_cpu"))
    tool = os.path.join(REPO, "tools", "multihost_preflight.py")

    # Oracle-first prewarm (the module-docstring lesson): a
    # single-process run at the GLOBAL 8-device topology populates the
    # persistent cache with the same SPMD executables; without it, the
    # two ranks compile the train step concurrently on this one core
    # and the slower rank misses the collective/shutdown windows.
    env1 = dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r0 = subprocess.run(
        [sys.executable, tool, "--batch-size", "16",
         "--input-size", "64", "--data-dir", str(tmp_path), "--prewarm"],
        capture_output=True, text=True, env=env1, cwd=REPO, timeout=900)
    assert r0.returncode == 0, r0.stderr[-4000:]
    oracle = json.loads(r0.stdout.strip().splitlines()[-1])
    assert oracle["ok"] and oracle["checks"]["prewarm"], oracle

    procs = [
        subprocess.Popen(
            [sys.executable, tool,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--batch-size", "16", "--input-size", "64",
             "--data-dir", str(tmp_path), "--prewarm"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=REPO)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-4000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    for i, r in enumerate(outs):
        assert r["ok"], r
        assert r["process_id"] == i
        for chk in ("rendezvous", "devices", "topology", "batch",
                    "gt_bucket", "prewarm"):
            assert r["checks"].get(chk), (chk, r)
