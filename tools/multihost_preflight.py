#!/usr/bin/env python
"""Multi-host day-one readiness preflight (VERDICT r4 item 8).

Run this ONCE PER HOST before the first real `main.py --train
--distributed` session on a new slice; it front-loads every failure
mode the CPU-process rehearsals hit (tools/multihost_rehearsal.py,
tests/test_multihost.py) so the real session spends zero time
rediscovering them:

  1. device visibility     — local device count/kind/platform;
  2. rendezvous            — jax.distributed.initialize against the
                             coordinator, with the barrier round-trip
                             timed (the Gloo/ICI connect window is the
                             classic first-session flake);
  3. topology consistency  — every host must see the same per-host
                             device count and agree on the global total
                             (psum smoke test doubles as the first
                             collective);
  4. batch divisibility    — the trainer's data-axis sizing rule
                             (cli/main.py: pc * gcd(per_host,
                             local_devices)) applied to your
                             --batch-size, with the per-host slice and
                             any dropped remainder shown;
  5. gt-bucket advice      — scans the label set (cache or .txt files)
                             and recommends a fixed --gt-bucket that
                             removes the per-step cross-host allgather
                             (a DCN sync point) with a quantified
                             truncation risk;
  6. compile prewarm       — optionally compiles the real SPMD train
                             step at your exact (topology, batch,
                             size, model) into the persistent compile
                             cache, so every rank of the REAL run hits
                             warm compiles and reaches its first
                             collective inside the rendezvous window —
                             the oracle-first-prewarm lesson from the
                             rehearsal (tests/test_multihost.py).

Single-host sanity (no coordinator):
  python tools/multihost_preflight.py --batch-size 256 \
      --data-dir ./COCO --prewarm

Real slice, one command per host (i = 0..N-1):
  python tools/multihost_preflight.py --coordinator HOST0:8476 \
      --num-processes N --process-id i --batch-size 256 \
      --data-dir ./COCO --prewarm

Prints one human-readable line per check and a final JSON verdict
{"ok": bool, "checks": {...}}; exit code 0 iff every check passed.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_GT_BUCKETS = (32, 64, 128, 256, 512)  # train/trainer.py


def _coord_barrier(name: str, timeout_ms: int = 1_800_000):
    """Coordination-service barrier (gRPC to the coordinator, NOT a
    Gloo collective — tolerates arbitrary rank skew). No-op
    single-process."""
    import jax

    if jax.process_count() > 1:
        from jax._src import distributed
        distributed.global_state.client.wait_at_barrier(
            name, timeout_in_ms=timeout_ms)


def check(results, name, ok, detail):
    results[name] = {"ok": bool(ok), "detail": detail}
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: {detail}")
    return ok


def gt_bucket_advice(data_dir: str, per_host_batch: int, results) -> None:
    """Recommend --gt-bucket from the label distribution: the bucket is
    per-batch max GT count; estimate the overflow probability by
    simulating batch maxes over the empirical per-image counts."""
    import numpy as np

    from tpu_yolo.data.labels import load_labels

    txt = os.path.join(data_dir, "train2017.txt")
    if not os.path.exists(txt):
        check(results, "gt_bucket", True,
              f"skipped (no {txt}; pass --data-dir to scan labels)")
        return
    with open(txt) as f:
        filenames = [
            os.path.join(data_dir, "images", "train2017",
                         os.path.basename(line.strip()))
            for line in f if line.strip()]
    cache = os.path.join(data_dir, "train2017.cache.npy")
    labels = load_labels(filenames, cache if os.path.exists(cache)
                         else None)
    counts = np.asarray([len(v) for v in labels.values()])
    if not len(counts):
        check(results, "gt_bucket", False, "no labels found")
        return
    rng = np.random.default_rng(0)
    sims = 2000
    draws = rng.choice(counts, size=(sims, max(per_host_batch, 1)))
    batch_max = draws.max(axis=1)
    rec = None
    for b in _GT_BUCKETS:
        if (batch_max <= b).mean() >= 0.999:
            rec = b
            break
    rec = rec or _GT_BUCKETS[-1]
    overflow = float((batch_max > rec).mean())
    trunc_boxes = float(np.maximum(draws - rec, 0).sum()
                        / max(draws.sum(), 1))
    check(results, "gt_bucket", True,
          f"images={len(counts)} gt/img p50={int(np.median(counts))} "
          f"max={int(counts.max())}; per-host-batch={per_host_batch} -> "
          f"recommend --gt-bucket {rec} "
          f"(batch overflow p={overflow:.2%}, truncated boxes "
          f"{trunc_boxes:.3%}; removes the per-step cross-host "
          f"allgather DCN sync)")


def prewarm(args, n_data: int, results) -> None:
    """Compile the real SPMD train step at the exact production shapes
    into the persistent cache (the oracle-first-prewarm pattern)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tpu_yolo.core.config import get_model_config, load_hyperparams
    from tpu_yolo.parallel import DataParallel, make_mesh
    from tpu_yolo.train.loss import build_padded_targets
    from tpu_yolo.train.step import init_train_state, train_step

    t0 = time.time()
    hyp = load_hyperparams(args.hyp or None)
    cfg = get_model_config(args.model_size, num_classes=len(hyp["names"]))
    from tpu_yolo.models import yolov11
    params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    accumulate = max(round(64 / args.batch_size), 1)
    dp = DataParallel(make_mesh(n_data=max(n_data, 1)))
    state = dp.replicate(init_train_state(params, ema=True,
                                          accumulate=accumulate))
    per_host = max(args.batch_size // max(jax.process_count(), 1), 1)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (per_host, args.input_size,
                                   args.input_size, 3), np.uint8)
    bucket = args.gt_bucket or 32
    gt = build_padded_targets(
        {"idx": np.zeros(1, np.float32), "cls": np.zeros(1, np.float32),
         "box": np.full((1, 4), 0.5, np.float32)},
        per_host, bucket, (args.input_size, args.input_size))
    gains = jnp.asarray([hyp["box"], hyp["cls"], hyp["dfl"]], jnp.float32)
    put = (dp.shard_batch if dp.num_data_shards > 1
           else (lambda a: jnp.asarray(a)))
    x, g = put(jnp.asarray(images)), put(jnp.asarray(gt))
    # Compile BOTH program variants the trainer runs (apply/accumulate)
    # — AOT (lower().compile()) with a coordination-service barrier
    # between compile and first execution: ranks can finish compiling
    # minutes apart (1-core rehearsal hosts serialize compiles), and
    # the first rank to ENTER the collective would otherwise time out
    # the Gloo context-init window waiting for its peer — the exact
    # skew pathology the rehearsal solved (tools/multihost_rehearsal.py
    # barrier docstring).
    for j, apply_update in enumerate(
            (True, False) if accumulate > 1 else (True,)):
        exe = train_step.lower(
            state, x, g, 0.001, gains, 5e-4, 0.937, cfg=cfg,
            accumulate=accumulate, apply_update=apply_update).compile()
        _coord_barrier(f"preflight-prewarm-{j}")
        state, m = exe(state, x, g, 0.001, gains, 5e-4, 0.937)
        jax.block_until_ready(m["loss_box"])
    check(results, "prewarm", True,
          f"train step compiled at bs={args.batch_size} "
          f"(per-host {per_host}), {args.model_size}@{args.input_size}, "
          f"gt-bucket {bucket}, accumulate {accumulate} "
          f"in {time.time() - t0:.1f}s -> persistent cache "
          f"{jax.config.jax_compilation_cache_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="",
                    help="HOST:PORT of process 0 (omit for single-host)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=256,
                    help="GLOBAL train batch you intend to use")
    ap.add_argument("--model-size", default="n")
    ap.add_argument("--input-size", type=int, default=640)
    ap.add_argument("--data-dir", default="")
    ap.add_argument("--hyp", default="")
    ap.add_argument("--gt-bucket", type=int, default=0)
    ap.add_argument("--prewarm", action="store_true")
    ap.add_argument("--rendezvous-timeout", type=int, default=120,
                    help="seconds to wait for all hosts")
    args = ap.parse_args()

    import jax
    # Honor JAX_PLATFORMS even where a site plugin force-registers a
    # TPU backend over the env var (cli/main.py does the same; without
    # this, a JAX_PLATFORMS=cpu rehearsal silently runs on the chip —
    # observed 2026-08-20).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))

    results: dict = {}
    ok = True

    # 2. rendezvous (before any backend query so initialize may own
    # device assignment)
    if args.coordinator:
        t0 = time.time()
        try:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
                initialization_timeout=args.rendezvous_timeout)
            ok &= check(results, "rendezvous", True,
                        f"{args.coordinator} joined as process "
                        f"{jax.process_index()}/{jax.process_count()} "
                        f"in {time.time() - t0:.1f}s")
        except Exception as e:
            ok &= check(results, "rendezvous", False,
                        f"{type(e).__name__}: {e}")
            print(json.dumps({"ok": False, "checks": results}))
            return 1

    # 1. device visibility
    try:
        local = jax.local_devices()
        ok &= check(results, "devices", len(local) > 0,
                    f"{len(local)} local x {local[0].device_kind} "
                    f"({local[0].platform}); "
                    f"{len(jax.devices())} global")
    except Exception as e:
        ok &= check(results, "devices", False, f"{type(e).__name__}: {e}")
        print(json.dumps({"ok": False, "checks": results}))
        return 1

    # 3. topology consistency + first collective
    pc = max(jax.process_count(), 1)
    if pc > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        t0 = time.time()
        per_host_counts = multihost_utils.process_allgather(
            np.int32(len(local)))
        rtt = time.time() - t0
        uniform = len(set(int(c) for c in per_host_counts)) == 1
        total_ok = int(np.sum(per_host_counts)) == len(jax.devices())
        ok &= check(results, "topology", uniform and total_ok,
                    f"per-host device counts "
                    f"{[int(c) for c in per_host_counts]} "
                    f"(allgather RTT {rtt * 1e3:.0f} ms)")

    # 4. batch divisibility (the trainer's data-axis rule)
    import math
    per_host = max(args.batch_size // pc, 1)
    n_data = pc * math.gcd(per_host, len(local))
    even = args.batch_size % pc == 0 and per_host % math.gcd(
        per_host, len(local)) == 0
    full = n_data == pc * len(local)
    ok &= check(
        results, "batch", even,
        f"global {args.batch_size} -> per-host {per_host}, data axis "
        f"{n_data} of {pc * len(local)} chips"
        + ("" if full else
           f" (UNDERUSED: raise --batch-size to a multiple of "
           f"{pc * len(local)} to engage every chip)"))

    # 5. gt-bucket advice
    if args.data_dir:
        gt_bucket_advice(args.data_dir, per_host, results)

    # 6. prewarm
    if args.prewarm:
        try:
            prewarm(args, n_data, results)
        except Exception as e:
            ok &= check(results, "prewarm", False,
                        f"{type(e).__name__}: {e}")

    print(json.dumps({"ok": bool(ok), "process_id": args.process_id,
                      "checks": {k: v["ok"] for k, v in results.items()}}),
          flush=True)
    if args.coordinator and pc > 1:
        # Exit-skew guard: the first rank to exit would leave the
        # others to die on jax.distributed's shutdown barrier
        # (DEADLINE_EXCEEDED at interpreter exit — observed on the
        # 1-core rehearsal box). Coordination-service barrier, not a
        # collective, so stragglers are tolerated.
        _coord_barrier("preflight-done")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
