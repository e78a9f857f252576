#!/usr/bin/env python
"""Aggregate a jax.profiler trace: total device-time per op name.

The CLAUDE.md profiling recipe as a script: find
DIR/plugins/profile/*/ *.trace.json.gz, sum `dur` per event name on the
TPU device pid(s), print the top-N with their `long_name`/`source` args
where present. Red flags to look for: `kCustom` fusions with S(1)
layouts (scalar-core gathers), `while` ops (lax.scan/map loops),
`sort` (lax.top_k lowers to a full sort).

Usage: python tools/profile_agg.py DIR [-n 30] [--pid-filter TEXT]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace(profile_dir: str) -> dict:
    paths = sorted(glob.glob(os.path.join(
        profile_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_pids(events, pid_filter: str | None):
    """pids whose process_name metadata looks like a device (TPU/XLA),
    not the host python threads."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    keys = ("TPU", "/device:", "XLA", "Device")
    if pid_filter:
        keys = (pid_filter,)
    return {p for p, n in names.items()
            if any(k.lower() in n.lower() for k in keys)}, names


def aggregate(trace: dict, pid_filter: str | None = None):
    events = trace["traceEvents"]
    pids, names = device_pids(events, pid_filter)
    per_op = collections.defaultdict(float)
    count = collections.defaultdict(int)
    detail = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in pids:
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        per_op[name] += dur
        count[name] += 1
        total += dur
        a = e.get("args") or {}
        ln = a.get("long_name") or a.get("source") or ""
        if ln and name not in detail:
            detail[name] = ln
    return per_op, count, detail, total, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("-n", type=int, default=30)
    ap.add_argument("--pid-filter", default=None)
    args = ap.parse_args()

    per_op, count, detail, total, names = aggregate(
        load_trace(args.profile_dir), args.pid_filter)
    if not per_op:
        print("no device events; pids seen:")
        for p, n in sorted(names.items()):
            print(f"  {p}: {n}")
        return
    print(f"total device time: {total / 1e3:.2f} ms")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.n]:
        extra = detail.get(name, "")
        if len(extra) > 110:
            extra = extra[:107] + "..."
        print(f"{dur / 1e3:9.2f} ms  x{count[name]:<5d} {name[:60]:<60s} {extra}")


if __name__ == "__main__":
    main()
