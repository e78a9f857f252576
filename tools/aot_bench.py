#!/usr/bin/env python
"""Serving cold-start A/B: AOT artifact vs jit (warm/cold compile cache).

Measures time-to-first-batch for the three ways a serving process can
start (one fresh process per mode — compile caches are per-process):

  save      build the AOT artifact (Detector.save_compiled) — run once
  aot       Detector.load_compiled: deserialize the executable, no compile
  jit-warm  normal Detector with the repo's persistent compile cache
  jit-cold  normal Detector with an empty compile cache (first-ever start)
  check     bit-parity assertion on THIS backend: save + load in-process,
            compare the live and deserialized programs' outputs over
            distinct random batches (the on-chip counterpart of
            tests/test_aot.py, whose execution tests the XLA:CPU
            backend cannot run — see that file's skip note)

Prints one JSON line per invocation. Orchestrate the full comparison:

  python tools/aot_bench.py --mode save
  for m in aot jit-warm jit-cold; do python tools/aot_bench.py --mode $m; done

Cold-start wall time is a one-shot measurement (no repeated identical
executions, so the relay's execution elision — CLAUDE.md environment
notes — does not apply); run each mode a couple of times to see the
spread, which is dominated by XLA compile time, not relay noise.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
ARTIFACT = os.path.join(tempfile.gettempdir(), "tpu_yolo_n640.aot")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["save", "aot", "jit-warm", "jit-cold", "check"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--model", default="n")
    ap.add_argument("--artifact", default=ARTIFACT)
    args = ap.parse_args()

    t_start = time.perf_counter()
    import jax

    if args.mode == "jit-cold":
        # first-ever process start: nothing cached anywhere
        cache = tempfile.mkdtemp(prefix="jax_cache_cold_")
    else:
        cache = os.path.join(ROOT, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.models import yolov11
    from tpu_yolo.serve import Detector

    t_import = time.perf_counter()

    cfg = get_model_config(args.model)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    imgs = np.random.default_rng(0).integers(
        0, 256, (args.batch, args.size, args.size, 3), np.uint8)

    if args.mode == "check":
        import jax.numpy as jnp  # noqa: F401 (backend init before timing)

        det = Detector(params, cfg, input_size=args.size)
        art = os.path.join(tempfile.gettempdir(),
                           f"tpu_yolo_check_b{args.batch}.aot")
        det.save_compiled(art, batch_size=args.batch)
        loaded = Detector.load_compiled(art, params)
        rng = np.random.default_rng(7)
        checked, mismatches = 0, []
        for _ in range(4):
            x = rng.integers(0, 256,
                             (args.batch, args.size, args.size, 3), np.uint8)
            a = jax.device_get(det.detect_batch(x))
            b = jax.device_get(loaded.detect_batch(x))
            for k in a:
                checked += 1
                if not np.array_equal(np.asarray(a[k]), np.asarray(b[k])):
                    mismatches.append(k)
        print(json.dumps({
            "mode": "check", "fields_checked": checked,
            "bit_identical": not mismatches, "mismatches": mismatches,
            "platform": jax.devices()[0].platform,
            "device_kind": jax.devices()[0].device_kind}))
        if mismatches:
            raise SystemExit(1)
        return

    if args.mode == "save":
        det = Detector(params, cfg, input_size=args.size)
        t0 = time.perf_counter()
        det.save_compiled(args.artifact, batch_size=args.batch)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": "save", "save_s": round(dt, 2),
            "artifact_mb": round(os.path.getsize(args.artifact) / 2**20, 1),
            "platform": jax.devices()[0].platform}))
        return

    t0 = time.perf_counter()
    if args.mode == "aot":
        det = Detector.load_compiled(args.artifact, params)
    else:
        det = Detector(params, cfg, input_size=args.size)
    t_ctor = time.perf_counter()
    jax.block_until_ready(det.detect_batch(imgs)["count"])
    t_first = time.perf_counter()
    print(json.dumps({
        "mode": args.mode,
        "import_s": round(t_import - t_start, 2),
        "ctor_s": round(t_ctor - t0, 2),
        "first_batch_s": round(t_first - t_ctor, 2),
        "time_to_first_batch_s": round(t_first - t0, 2),
        "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
