#!/usr/bin/env python
"""Training-step throughput benchmark (production entry point).

Drives tpu_yolo.train.step.train_step exactly as the trainer's hot loop
does (same arguments, donated state, host LR schedule lookup), on
synthetic data. This is the standard A/B harness for training-perf work:
per CLAUDE.md, only timings from unmodified production entry points
A/B'd across committed changes are trustworthy in this environment.

Relay-elision defense: the relay dedupes identical-input executions, so
each timed iteration uses a DIFFERENT pre-generated batch (cycled from a
small pool) — never the same arrays twice in a row.

Usage:
  python tools/train_bench.py [--batch 64] [--size 640] [--gt 64]
                              [--model n] [--iters 12] [--remat]
                              [--profile DIR]
Prints one JSON line: {img_per_s, ms_per_step, ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_batch(rng, batch, size, n_gt):
    """Synthetic images + padded GT with a realistic box-count mix."""
    images = rng.integers(0, 256, (batch, size, size, 3), np.uint8)
    gt = np.zeros((batch, n_gt, 5), np.float32)
    for b in range(batch):
        n = int(rng.integers(1, n_gt + 1))
        xy1 = rng.uniform(0, size * 0.8, (n, 2))
        wh = rng.uniform(4, size * 0.3, (n, 2))
        gt[b, :n, 0] = rng.integers(0, 80, n)
        gt[b, :n, 1:3] = xy1
        gt[b, :n, 3:5] = np.minimum(xy1 + wh, size - 1)
    return images, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--gt", type=int, default=64, help="padded GT bucket")
    ap.add_argument("--model", default="n")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--pool", type=int, default=4, help="distinct batches")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repetitions; best is reported (run-to-run "
                         "interference on the shared relay measured up to "
                         "~8%% - BENCH.md environment notes)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-level", default="stage",
                    choices=("stage", "blocks"))
    ap.add_argument("--profile", default=None,
                    help="dump a jax.profiler trace to this dir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.models import yolov11
    from tpu_yolo.train.step import init_train_state, train_step

    cfg = get_model_config(args.model)
    params = yolov11.init_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, ema=True, accumulate=1)

    rng = np.random.default_rng(0)
    pool = [make_batch(rng, args.batch, args.size, args.gt)
            for _ in range(args.pool)]
    pool = [(jax.device_put(i), jax.device_put(g)) for i, g in pool]

    hyp_gains = jnp.asarray([7.5, 0.5, 1.5], jnp.float32)
    remat = args.remat and args.remat_level
    step_kw = dict(cfg=cfg, accumulate=1, apply_update=True, remat=remat)

    for i in range(args.warmup):
        images, gt = pool[i % len(pool)]
        state, metrics = train_step(state, images, gt, 0.01, hyp_gains,
                                    5e-4, 0.937, **step_kw)
    jax.block_until_ready(metrics["loss_box"])

    if args.profile:
        jax.profiler.start_trace(args.profile)

    dt = float("inf")
    for _ in range(max(args.repeats, 1) if not args.profile else 1):
        t0 = time.perf_counter()
        for i in range(args.iters):
            images, gt = pool[i % len(pool)]
            state, metrics = train_step(state, images, gt, 0.01,
                                        hyp_gains, 5e-4, 0.937, **step_kw)
        jax.block_until_ready(metrics["loss_box"])
        dt = min(dt, time.perf_counter() - t0)

    if args.profile:
        jax.profiler.stop_trace()

    print(json.dumps({
        "metric": f"train_step_v11{args.model}_{args.size}_bs{args.batch}"
                  f"_gt{args.gt}"
                  + (f"_remat_{args.remat_level}" if args.remat else ""),
        "img_per_s": round(args.batch * args.iters / dt, 1),
        "ms_per_step": round(dt / args.iters * 1e3, 1),
        "losses": {k: round(float(v), 3) for k, v in metrics.items()},
        "platform": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()
