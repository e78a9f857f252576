#!/usr/bin/env python
"""Native C++ loader thread-count sweep (VERDICT r3 item 6).

The reference feeds training from a torch DataLoader with 8 worker
processes (main.py:72-73); our equivalent is the C++ libjpeg thread
pool (native/image_pipeline.cc). This tool substantiates the "scales
with cores" claim with numbers: it generates synthetic COCO-sized
JPEGs, then for each thread count measures

  - serve/eval staging: ip_load_batch (decode + letterbox to S), the
    path Detector.stream and the eval loop use;
  - train device-augment staging: ip_load_batch_scaled at S (the
    4-sources-per-mosaic-output path of data/device_augment.py).

One JSON line per (mode, threads): decodes/s and output images/s
(mosaic staging needs 4 decodes per trained image). Host-only, no TPU.

Usage: python tools/loader_bench.py [--images 256] [--batch 64]
           [--size 640] [--threads 1,2,4,8] [--epochs 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(outdir: str, n: int, rng) -> list[str]:
    """COCO-ish JPEGs: smooth low-frequency content (pure noise inflates
    entropy decode cost far beyond natural images)."""
    import cv2
    paths = []
    for i in range(n):
        h = int(rng.integers(360, 640))
        w = int(rng.integers(480, 800))
        small = rng.integers(0, 256, (h // 16, w // 16, 3), np.uint8)
        img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
        p = os.path.join(outdir, f"img{i:04d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
    return paths


def bench(pipe_fn, batches, epochs: int):
    """Best-epoch wall time over `epochs` passes (first pass warms the
    page cache / pool)."""
    pipe_fn(batches[0])                       # warmup
    best = float("inf")
    for _ in range(epochs):
        t0 = time.perf_counter()
        for b in batches:
            pipe_fn(b)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from tpu_yolo.data import native_loader
    if not native_loader.available():
        print(json.dumps({"error": "native library unavailable; "
                                   "run `make -C native`"}))
        return 1

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = make_jpegs(td, args.images, rng)
        batches = [paths[i:i + args.batch]
                   for i in range(0, len(paths), args.batch)]
        n_imgs = len(paths)

        for t in (int(x) for x in args.threads.split(",")):
            pipe = native_loader.NativePipeline(args.size, threads=t)

            dt = bench(lambda b: pipe.load_batch(b), batches, args.epochs)
            print(json.dumps({
                "mode": "letterbox_staging", "threads": t,
                "decodes_per_s": round(n_imgs / dt, 1),
                "img_per_s": round(n_imgs / dt, 1),
                "ncpu": os.cpu_count(),
            }))

            dt = bench(lambda b: pipe.load_batch_scaled(b, args.size),
                       batches, args.epochs)
            print(json.dumps({
                "mode": "mosaic_staging", "threads": t,
                "decodes_per_s": round(n_imgs / dt, 1),
                "img_per_s": round(n_imgs / dt / 4, 1),  # 4 decodes/output
                "ncpu": os.cpu_count(),
            }))
            del pipe
    return 0


if __name__ == "__main__":
    sys.exit(main())
