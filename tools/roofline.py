#!/usr/bin/env python
"""Per-stage roofline for the detector (VERDICT r3 item 1).

Derives EXACT per-conv FLOPs and minimum HBM traffic from the traced
forward graph (Context.note_conv records every conv's real shapes at
trace time — the numbers cannot drift from the model code), groups them
by stage (net/p1..p5, fpn/h1..h6, head/<level>), and compares each
stage's compute-bound and memory-bound time lower bounds against the
TPU v5e peaks (197 TFLOP/s bf16, 819 GB/s HBM). With --profile DIR it
joins the measured per-stage device time from a jax.profiler trace
(conv_bn tags its ops with jax.named_scope(path), so trace events carry
the stage in their metadata).

Byte model (bf16 activations/weights; explicit, optimistic fusion —
these are LOWER bounds on traffic, not estimates of achieved traffic):
  inference (folded BN, act fused into conv):
      2*in + 2*out + 2*w
  training forward (unfolded BN: y must be materialized before the
  batch-stats reduce, then re-read by the normalize+act):
      2*in + 2*out(write y) + 2*out(stats read) + 2*out + 2*out(norm r/w)
  training backward (dx: read dy, write dx; dw: read dy, read x):
      4*in + 4*out + 2*w     with FLOPs = 2x forward (dx + dw passes)

No TPU needed: the trace runs via jax.eval_shape on CPU. Usage:
  python tools/roofline.py [--size n] [--input 640] [--batch 128]
      [--train] [--profile DIR] [--json OUT]

Reference backbone this characterizes: nets/nn.py:151-189.
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_TF = 197e12    # TPU v5e bf16
PEAK_BW = 819e9     # TPU v5e HBM B/s


def stage_of(path: str) -> str:
    parts = path.split("/")
    if parts[0] == "head":
        return f"head/P{3 + int(parts[2])}"   # head/box/i/j -> level 3+i
    return "/".join(parts[:2])                 # net/p1, fpn/h1


def trace_convs(size: str, input_size: int, batch: int):
    """Trace the eval forward abstractly; return the conv records."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tpu_yolo import get_model_config, init_params
    from tpu_yolo.models import yolov11
    from tpu_yolo.ops.nn import Context

    cfg = get_model_config(size)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ctx = Context(train=False, convs=[])
    x = jax.ShapeDtypeStruct((batch, input_size, input_size, cfg.width[0]),
                             jnp.bfloat16)
    jax.eval_shape(lambda p, xx: yolov11.forward_raw(p, xx, cfg, ctx),
                   params, x)
    return ctx.convs


def conv_cost(rec: dict, train: bool):
    """(flops, bytes) for one record under the byte model above."""
    if rec["kind"] == "dot":
        f, by = rec["flops"], rec["bytes"]
        return (3 * f, 3 * by) if train else (f, by)
    b, hi, wi, cin = rec["in"]
    _, ho, wo, cout = rec["out"]
    kh, kw, cin_g, _ = rec["w"]
    flops = 2 * b * ho * wo * cout * kh * kw * cin_g
    n_in = b * hi * wi * cin
    n_out = b * ho * wo * cout
    n_w = kh * kw * cin_g * cout
    if not train:
        return flops, 2 * (n_in + n_out + n_w)
    fwd_bytes = 2 * n_in + 8 * n_out + 2 * n_w
    bwd_bytes = 4 * n_in + 4 * n_out + 2 * n_w
    return 3 * flops, fwd_bytes + bwd_bytes


def profile_stage_ms(profile_dir: str, steps: int = 1, top: int = 15):
    """Measured device-time per stage (PER STEP) from a jax.profiler
    trace. Only the leaf 'XLA Ops' device lane is summed — the 'Steps'
    and 'XLA Modules' lanes are hierarchical parents of the same time
    and would double-count. Events whose name/metadata mention a
    named-scope path are attributed to that stage; everything else
    lands in '(unattributed)' and the top offenders are printed."""
    from tools.profile_agg import device_pids, load_trace
    trace = load_trace(profile_dir)
    events = trace["traceEvents"]
    pids, _ = device_pids(events, None)
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in pids
               and e["args"].get("name") == "XLA Ops"}
    pat = re.compile(r"(?:net|fpn|head)/[A-Za-z0-9_/]+")
    per = collections.defaultdict(float)
    unattr = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = float(e.get("dur", 0.0))
        hay = e.get("name", "") + " " + " ".join(
            str(v) for v in (e.get("args") or {}).values())
        m = pat.search(hay)
        if m:
            per[stage_of(m.group(0))] += dur
        else:
            per["(unattributed)"] += dur
            unattr[e.get("name", "?")] += dur
    if unattr:
        print(f"top unattributed leaf ops (ms/step over {steps} steps):")
        for name, d in sorted(unattr.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {d / 1e3 / steps:>8.2f}  {name}")
    return {k: v / 1e3 / steps for k, v in per.items()}   # us -> ms/step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="n")
    ap.add_argument("--input", type=int, default=640)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--train", action="store_true",
                    help="fwd+bwd byte/FLOP model (unfolded BN)")
    ap.add_argument("--profile", default="",
                    help="jax.profiler trace dir: join measured ms/stage")
    ap.add_argument("--steps", type=int, default=1,
                    help="steps captured in the trace (divides measured)")
    ap.add_argument("--peak-tf", type=float, default=PEAK_TF / 1e12)
    ap.add_argument("--peak-gbs", type=float, default=PEAK_BW / 1e9)
    ap.add_argument("--json", default="", help="also dump rows as JSON")
    args = ap.parse_args()

    peak_tf, peak_bw = args.peak_tf * 1e12, args.peak_gbs * 1e9
    recs = trace_convs(args.size, args.input, args.batch)
    stages = collections.defaultdict(lambda: [0, 0, 0])   # flops, bytes, n
    order = []
    for r in recs:
        s = stage_of(r["path"])
        if s not in stages:
            order.append(s)
        f, by = conv_cost(r, args.train)
        stages[s][0] += f
        stages[s][1] += by
        stages[s][2] += 1

    measured = (profile_stage_ms(args.profile, steps=args.steps)
                if args.profile else {})

    mode = "train fwd+bwd" if args.train else "inference (folded)"
    print(f"# v11-{args.size} @ {args.input}px bs{args.batch} — {mode}; "
          f"peaks {args.peak_tf:.0f} TF/s bf16, {args.peak_gbs:.0f} GB/s")
    hdr = (f"{'stage':<10} {'ops':>3} {'GFLOP':>8} {'MB':>8} "
           f"{'FLOP/B':>7} {'t_mxu':>8} {'t_hbm':>8} {'bound':>5}")
    if measured:
        hdr += f" {'meas_ms':>8} {'x_bound':>7}"
    print(hdr)
    rows = []
    tot_f = tot_b = 0
    for s in order:
        f, by, n = stages[s]
        tot_f += f
        tot_b += by
        t_mxu = f / peak_tf * 1e3
        t_hbm = by / peak_bw * 1e3
        row = {"stage": s, "ops": n, "gflop": f / 1e9, "mb": by / 1e6,
               "intensity": f / by, "t_mxu_ms": t_mxu, "t_hbm_ms": t_hbm,
               "bound": "hbm" if t_hbm > t_mxu else "mxu"}
        line = (f"{s:<10} {n:>3} {f / 1e9:>8.1f} {by / 1e6:>8.1f} "
                f"{f / by:>7.0f} {t_mxu:>8.2f} {t_hbm:>8.2f} "
                f"{row['bound']:>5}")
        if measured:
            m = measured.get(s, 0.0)
            lb = max(t_mxu, t_hbm)
            row["measured_ms"] = m
            row["x_bound"] = m / lb if lb else 0.0
            line += f" {m:>8.2f} {m / lb if lb else 0:>7.1f}"
        print(line)
        rows.append(row)
    t_mxu = tot_f / peak_tf * 1e3
    t_hbm = tot_b / peak_bw * 1e3
    line = (f"{'TOTAL':<10} {sum(v[2] for v in stages.values()):>3} "
            f"{tot_f / 1e9:>8.1f} {tot_b / 1e6:>8.1f} "
            f"{tot_f / tot_b:>7.0f} {t_mxu:>8.2f} {t_hbm:>8.2f} "
            f"{'hbm' if t_hbm > t_mxu else 'mxu':>5}")
    if measured:
        mtot = sum(measured.values())
        unattr = measured.get("(unattributed)", 0.0)
        line += f" {mtot:>8.2f} {'':>7}"
        print(line)
        print(f"(unattributed device time: {unattr:.2f} ms — loss, NMS, "
              f"optimizer, copies, non-conv fusions)")
    else:
        print(line)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"rows": rows, "total_gflop": tot_f / 1e9,
                       "total_mb": tot_b / 1e6, "mode": mode}, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
