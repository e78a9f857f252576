#!/usr/bin/env python
"""Serving-forward benchmark + profiler (production entry point).

Runs bench.py's exact jitted step (normalize-folded uint8 -> forward ->
DFL decode -> batched NMS) so profiles/timings reflect the production
serving program — per CLAUDE.md only production entry points A/B'd
across a change are trustworthy here. `--profile DIR` dumps a
jax.profiler trace (aggregate with tools/profile_agg.py).

Usage:
  python tools/infer_bench.py [--batch 128] [--size 640] [--model n]
      [--iters 20] [--repeats 3] [--profile DIR] [--max-nms K]
      [--ranking exact|approx] [--recall R] [--pregate|--no-pregate]
      [--single-label]
      [--s2d|--s2d-host] [--latency] [--latency-batch N] [--check-pregate]
      [--pallas-nms|--no-pallas-nms] [--check-pallas-nms]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_latency(args, cfg, params):
    """Small-batch p50 via the production Detector program
    (serve._predict at serving conf 0.25), minus the measured
    per-dispatch tunnel RTT — bench.py's method, distinct inputs per
    call (relay elision). --latency-batch sets the micro-batch (default
    1); per-image amortization = p50_device_est / batch."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from tpu_yolo import serve

    k = args.max_nms or 1024       # the Detector serving default
    recall = args.recall or 0.9    # single default across all paths
    # the Detector program divides by 255 itself — use plain BN-folded
    # params, not the input-scale-folded ones of the throughput step
    from tpu_yolo.models import yolov11 as y
    p = y.fold_batchnorm(y.init_params(jax.random.PRNGKey(0), cfg))
    if args.s2d:
        p = y.fold_stem_space_to_depth(p)
    step = functools.partial(serve._predict, cfg=cfg,
                             compute_dtype=jnp.bfloat16,
                             conf_thres=0.25, iou_thres=0.65, max_det=300,
                             ranking="approx", max_nms=k,
                             approx_recall=recall)

    lb = max(1, args.latency_batch)
    rng = np.random.default_rng(0)
    ones = [jax.device_put(rng.integers(
        0, 256, (lb, args.size, args.size, 3), np.uint8)) for _ in range(8)]
    jax.block_until_ready(step(p, ones[0]))
    jax.block_until_ready(step(p, ones[1]))
    lat = []
    for i in range(24):
        t0 = time.perf_counter()
        jax.block_until_ready(step(p, ones[i % len(ones)]))
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat) * 1e3)

    tick = jax.jit(lambda a: a + 1)
    scal = [jax.device_put(np.float32(i)) for i in range(8)]
    jax.block_until_ready(tick(scal[0]))
    jax.block_until_ready(tick(scal[1]))
    rtt = []
    for i in range(24):
        t0 = time.perf_counter()
        jax.block_until_ready(tick(scal[i % len(scal)]))
        rtt.append(time.perf_counter() - t0)
    rtt_ms = float(np.median(rtt) * 1e3)

    out = {
        "p50_latency_ms_bs1": round(p50, 2),
        "dispatch_rtt_ms": round(rtt_ms, 2),
        "p50_device_ms_bs1_est": round(p50 - rtt_ms, 2),
        "max_nms": k, "approx_recall": recall,
        "size": args.size, "model": args.model,
        "platform": str(jax.devices()[0].platform),
    }
    if lb > 1:
        out["latency_batch"] = lb
        out["p50_device_ms_per_img_est"] = round((p50 - rtt_ms) / lb, 2)
        # honest key names at micro-batch sizes
        out["p50_latency_ms"] = out.pop("p50_latency_ms_bs1")
        out["p50_device_ms_est"] = out.pop("p50_device_ms_bs1_est")
    print(json.dumps(out))


def check_pregate(args, cfg, params):
    """Assert the exact-ranking pre-gate is bit-identical to flat
    ranking ON THIS BACKEND (ops/nms.py::_rank_candidates_pregated).

    The pregate theorem's tie case relies on lax.top_k breaking score
    ties toward the lower index; tests verify that on the CPU backend,
    this verifies the TPU lowering too. bf16 head logits tie often, so
    random-init outputs on random images exercise the tie path."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.models import yolov11

    def f(p, images, pregate):
        return yolov11.forward_nms(p, images.astype(jnp.bfloat16), cfg,
                                   ranking="exact", conf_thres=0.001,
                                   pregate=pregate)

    on = jax.jit(lambda p, x: f(p, x, True))
    off = jax.jit(lambda p, x: f(p, x, False))
    rng = np.random.default_rng(7)
    n_batches, mismatches, checked = 4, [], 0
    for b in range(n_batches):
        img = jax.device_put(rng.integers(
            0, 256, (16, args.size, args.size, 3), np.uint8))
        a = jax.device_get(on(params, img))
        c = jax.device_get(off(params, img))
        for key in sorted(a):
            checked += 1
            if not np.array_equal(np.asarray(a[key]), np.asarray(c[key])):
                mismatches.append(f"batch{b}:{key}")
    print(json.dumps({
        "check": "pregate_vs_flat_exact_ranking",
        "backend": str(jax.default_backend()),
        "batches": n_batches, "fields_checked": checked,
        "bit_identical": not mismatches, "mismatches": mismatches,
        "model": args.model, "size": args.size,
    }))
    if mismatches:
        sys.exit(1)


def check_pallas_nms(args, cfg, params):
    """Assert the Pallas VMEM-resident greedy-keep kernel is
    bit-identical to the XLA fixpoint ON THIS BACKEND
    (ops/nms_pallas.py vs ops/nms.py::_greedy_keep). Interpret-mode
    equality is pinned by tests/test_pallas.py; this checks the
    compiled Mosaic lowering at production shapes (serving K=1024).
    The kernel is opt-in (rejected as default policy — ops/nms_pallas
    use_pallas_nms docstring), so the Pallas arm forces it on."""
    import jax
    import jax.numpy as jnp

    from tpu_yolo.models import yolov11
    from tpu_yolo.ops import nms_pallas

    def build(force):
        nms_pallas.force_pallas_nms(force)
        return jax.jit(lambda p, x: yolov11.forward_nms(
            p, x.astype(jnp.bfloat16), cfg, ranking="approx",
            max_nms=1024, approx_recall=0.9, conf_thres=0.001))

    rng = np.random.default_rng(11)
    n_batches, mismatches, checked = 4, [], 0
    try:
        for b in range(n_batches):
            img = jax.device_put(rng.integers(
                0, 256, (16, args.size, args.size, 3), np.uint8))
            a = jax.device_get(build(True)(params, img))
            c = jax.device_get(build(False)(params, img))
            for key in sorted(a):
                checked += 1
                if not np.array_equal(np.asarray(a[key]),
                                      np.asarray(c[key])):
                    mismatches.append(f"batch{b}:{key}")
    finally:
        nms_pallas.force_pallas_nms(None)
    print(json.dumps({
        "check": "pallas_nms_vs_xla_fixpoint",
        "backend": str(jax.default_backend()),
        "batches": n_batches, "fields_checked": checked,
        "bit_identical": not mismatches, "mismatches": mismatches,
        "model": args.model, "size": args.size,
    }))
    if mismatches:
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--model", default="n")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--pool", type=int, default=4, help="distinct batches")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repetitions; best is reported (run-to-run "
                         "interference on the shared relay measured up to "
                         "~8%% - BENCH.md environment notes)")
    ap.add_argument("--profile", default=None)
    ap.add_argument("--s2d", action="store_true",
                    help="apply fold_stem_space_to_depth")
    ap.add_argument("--s2d-host", action="store_true",
                    help="fold_stem_space_to_depth AND stage batches "
                         "pre-rearranged on host (space_to_depth_host): "
                         "no on-device transpose pass")
    ap.add_argument("--max-nms", type=int, default=None,
                    help="candidate budget K (throughput path default: "
                         "forward_nms's 2048 parity budget; --latency "
                         "defaults to the Detector serving 1024)")
    ap.add_argument("--ranking", default=None,
                    choices=["exact", "approx"],
                    help="candidate ranking (default approx = serving; "
                         "exact = the eval/parity configuration)")
    ap.add_argument("--recall", type=float, default=None,
                    help="approx_max_k recall_target (default 0.9, the "
                         "serving configuration — every path of this "
                         "tool uses it)")
    pregate_group = ap.add_mutually_exclusive_group()
    pregate_group.add_argument(
        "--no-pregate", action="store_true",
        help="force flat candidate ranking (the pre-gate A/B control; "
             "default = measured auto policy, ops/nms.py "
             "_rank_candidates_pregated)")
    pregate_group.add_argument(
        "--pregate", action="store_true",
        help="force the per-anchor candidate pre-gate on")
    ap.add_argument("--latency", action="store_true",
                    help="small-batch p50 latency of the production "
                         "serving program (serve._predict, conf 0.25) "
                         "with dispatch-RTT subtraction (bench.py's "
                         "method)")
    ap.add_argument("--latency-batch", type=int, default=1,
                    help="micro-batch for --latency (default 1; >1 "
                         "reports per-image amortization too)")
    pallas_group = ap.add_mutually_exclusive_group()
    pallas_group.add_argument(
        "--pallas-nms", action="store_true",
        help="force the Pallas VMEM-resident greedy-keep kernel ON "
             "(rejected as default policy: ~-1.6%% vs the XLA fixpoint "
             "at bs128/K1024 — ops/nms_pallas.py use_pallas_nms)")
    pallas_group.add_argument(
        "--no-pallas-nms", action="store_true",
        help="explicit XLA suppression fixpoint (the default policy; "
             "the A/B control for --pallas-nms)")
    ap.add_argument("--check-pallas-nms", action="store_true",
                    help="bit-parity assertion on THIS backend: run "
                         "the serving tail with the Pallas greedy-keep "
                         "kernel vs the XLA fixpoint over distinct "
                         "random batches and assert identical outputs")
    ap.add_argument("--single-label", action="store_true",
                    help="multi_label=False: one candidate per anchor "
                         "(argmax class) — the serving simplification "
                         "(ops/nms.py::_rank_candidates_singlelabel); "
                         "ranking collapses to a fused max+argmax pass")
    ap.add_argument("--check-pregate", action="store_true",
                    help="bit-parity assertion on THIS backend: run the "
                         "exact-ranking tail with pregate forced on and "
                         "forced off over distinct random batches and "
                         "assert identical outputs (the pregate theorem "
                         "relies on lax.top_k's lower-index tie-break, "
                         "verified on CPU by tests; this checks the TPU "
                         "lowering — ADVICE r3)")
    args = ap.parse_args()
    if args.s2d_host and args.latency:
        ap.error("--s2d-host is not implemented for --latency "
                 "(run_latency stages plain images; the measurement "
                 "would be mislabeled) — use --s2d or drop --latency")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from bench import build_step
    from tpu_yolo.core.config import get_model_config
    from tpu_yolo.models import yolov11

    cfg = get_model_config(args.model)
    params = yolov11.fold_batchnorm(
        yolov11.init_params(jax.random.PRNGKey(0), cfg))
    if args.s2d or args.s2d_host:
        params = yolov11.fold_stem_space_to_depth(params)
    params = yolov11.fold_input_scale(params)

    if args.pallas_nms or args.no_pallas_nms:
        from tpu_yolo.ops import nms_pallas
        nms_pallas.force_pallas_nms(bool(args.pallas_nms))

    if args.latency:
        return run_latency(args, cfg, params)
    if args.check_pregate:
        return check_pregate(args, cfg, params)
    if args.check_pallas_nms:
        return check_pallas_nms(args, cfg, params)

    if args.max_nms or args.ranking or args.recall or args.s2d_host \
            or args.no_pregate or args.pregate or args.single_label:
        import jax.numpy as jnp

        # bench.py's serving defaults unless overridden
        kw = {"ranking": args.ranking or "approx",
              "approx_recall": args.recall or 0.9}
        if args.single_label:
            kw["multi_label"] = False
        if args.max_nms:
            kw["max_nms"] = args.max_nms
        if args.no_pregate or args.pregate:
            kw["pregate"] = bool(args.pregate)
        from tpu_yolo.serve import image_input_format

        # the entry-layout pin is stem-shape-specific: stage the
        # (B, H/2, W/2, 12) s2d-host entry unpinned
        fmt = None if args.s2d_host else image_input_format()

        def _f(p, images):
            return yolov11.forward_nms(p, images.astype(jnp.bfloat16), cfg,
                                       **kw)
        raw_f = _f
        step = jax.jit(_f) if fmt is None else jax.jit(
            _f, in_shardings=(None, fmt))
    else:
        step, fmt, raw_f = build_step(cfg, params, args.batch)

    from bench import escape_refused_pin, stage_images
    rng = np.random.default_rng(0)

    def _make(seed_rng):
        img = seed_rng.integers(
            0, 256, (args.batch, args.size, args.size, 3), np.uint8)
        if args.s2d_host:
            # staged batches arrive pre-rearranged on host: same bytes,
            # no on-device transpose pass before the s2d stem conv
            return jax.device_put(yolov11.space_to_depth_host(img)), True
        return stage_images(img, fmt)

    staged = [_make(rng) for _ in range(args.pool)]
    pool = [x for x, _ in staged]
    if fmt is not None and not all(ok for _, ok in staged):
        # A refused pin may have wedged this relay client (the buffers
        # can be corrupt despite committing) — restart unpinned
        # (bench.escape_refused_pin); demote in-process only if the pin
        # was already disabled.
        escape_refused_pin()
        fmt, step = None, jax.jit(raw_f)

    for i in range(args.warmup):
        jax.block_until_ready(step(params, pool[i % args.pool]))

    if args.profile:
        jax.profiler.start_trace(args.profile)
    dt = float("inf")
    for _ in range(max(args.repeats, 1) if not args.profile else 1):
        t0 = time.perf_counter()
        out = None
        for i in range(args.iters):
            out = step(params, pool[i % args.pool])
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    if args.profile:
        jax.profiler.stop_trace()

    ms = dt / args.iters * 1e3
    print(json.dumps({
        "img_per_s": round(args.batch * args.iters / dt, 1),
        "ms_per_batch": round(ms, 2),
        "batch": args.batch, "size": args.size, "model": args.model,
        "s2d": bool(args.s2d), "s2d_host": bool(args.s2d_host),
        "pregate": ("on" if args.pregate else
                    "off" if args.no_pregate else "auto"),
        "multi_label": not args.single_label,
        "pallas_nms": "on" if args.pallas_nms else "off",
        "platform": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()
