"""Multi-host rehearsal: 2 coordinated jax.distributed CPU processes.

Executes (for real, process_count()==2) the trainer's multi-host
branches — make_array_from_process_local_data assembly, the GT-bucket
process_allgather, sharded eval — and asserts the training trajectory
matches a single-process run over the same global batch (the SPMD
contract: process topology must not change the math). VERDICT round-2
item 2; reference launcher contract: main.sh, main.py:338-344.
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
                 extra=(), _retry: bool = True):
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
        # Known cold-compile flake on this 1-core host: with an
        # invalidated XLA cache both workers recompile the train step
        # concurrently and their skew can exceed Gloo's 30 s connect
        # window (GetKeyValue DEADLINE_EXCEEDED). The first attempt
        # populates the shared compile cache, so one retry runs warm.
        # Retry ONLY if every failed worker shows the flake signature
        # (the coordination-service teardown it triggers on the peer
        # also prints DEADLINE_EXCEEDED) — a genuine error on any rank
        # must surface, not be retried away.
        if _retry and all("DEADLINE_EXCEEDED" in f for f in failures):
            return _run_workers(num_processes, _free_port(),
                                timeout=timeout, extra=extra, _retry=False)
        raise AssertionError("worker(s) failed:\n" + "\n---\n".join(
            f[-4000:] for f in failures))
    return outs


def test_two_process_rehearsal_matches_single_process():
    ref = _run_workers(1, _free_port())[0]
    multi = _run_workers(2, _free_port())

    # both processes observe the same replicated losses
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=0, atol=0)
    # and the 2-process trajectory equals the single-process oracle on
    # the identical global batch (process topology is invisible to the
    # math; CPU f32 tolerances)
    np.testing.assert_allclose(np.asarray(multi[0]["losses"]),
                               np.asarray(ref["losses"]),
                               rtol=2e-4, atol=2e-4)
    assert multi[0]["eval_counts"] == multi[1]["eval_counts"]
    assert multi[0]["eval_counts"] == ref["eval_counts"]

    # fixed-bucket mode (--gt-bucket, the sync-free multi-host padding
    # path: no per-step allgather): same trajectory as the adaptive
    # oracle — bucket 32 equals the adaptive choice for these GT counts,
    # and padded rows are masked out of the loss either way
    fixed = _run_workers(2, _free_port(), extra=("--gt-bucket", "32"))
    np.testing.assert_allclose(fixed[0]["losses"], fixed[1]["losses"],
                               rtol=0, atol=0)   # replicated across ranks
    assert fixed[0]["eval_counts"] == fixed[1]["eval_counts"]
    np.testing.assert_allclose(np.asarray(fixed[0]["losses"]),
                               np.asarray(ref["losses"]),
                               rtol=2e-4, atol=2e-4)
