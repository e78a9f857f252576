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
       python tools/loader_bench.py --eval-ab [--images 512] [--model n]
           [--workers 4]   # full evaluate() native-vs-python loader A/B
       python tools/loader_bench.py --train-ab [--consume-ms 150]
           [--trainer]     # train-loader A/B + overlap proof (+ e2e)
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


def eval_ab(args):
    """Full-eval-loop wall-time A/B: evaluate() over synthetic COCO-layout
    JPEGs through the native C++ eval loader vs the Python cv2 thread
    loader (VERDICT r3 item 2's "Done =" measurement; results in
    BENCH.md "eval loader A/B"). Runs the production predict_step on
    the default backend (the chip, under axon) and asserts the two
    loaders produce matching metrics — bit-identical within each
    loader across rounds; across loaders within the JPEG decoder
    tolerance (libjpeg vs cv2 pixel drift, the per-batch contract
    tests/test_native_loader.py pins). Runs interleaved native/python
    rounds (CLAUDE.md: A/B comparisons must interleave) and reports
    the best wall time of each."""
    import jax

    from tpu_yolo.core.config import get_model_config, load_hyperparams
    from tpu_yolo.data.dataset import DetectionDataset
    from tpu_yolo.data.loader import make_val_loader
    from tpu_yolo.eval.evaluator import evaluate
    from tpu_yolo.models import yolov11

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        img_dir = os.path.join(td, "images", "val2017")
        lbl_dir = os.path.join(td, "labels", "val2017")
        os.makedirs(img_dir)
        os.makedirs(lbl_dir)
        paths = make_jpegs(img_dir, args.images, rng)
        for p in paths:
            n = int(rng.integers(1, 8))
            rows = []
            for _ in range(n):
                w, h = rng.uniform(0.05, 0.4, 2)
                x, y = rng.uniform(w / 2, 1 - w / 2), rng.uniform(
                    h / 2, 1 - h / 2)
                rows.append(f"{int(rng.integers(0, 80))} "
                            f"{x:.6f} {y:.6f} {w:.6f} {h:.6f}")
            base = os.path.splitext(os.path.basename(p))[0]
            with open(os.path.join(lbl_dir, base + ".txt"), "w") as f:
                f.write("\n".join(rows) + "\n")

        cfg = get_model_config(args.model)
        params = yolov11.fold_batchnorm(
            yolov11.init_params(jax.random.PRNGKey(0), cfg))
        # the bias init puts every class sigmoid ~1e-5 (< eval conf), so
        # a random-init eval emits ZERO detections and the loop skips
        # all NMS-candidate/TP-matching host work — jitter the final cls
        # biases to a realistic score spread so the measured wall time
        # includes the real per-image matching cost
        for lvl in params["head"]["cls"]:
            b = np.asarray(lvl[4]["b"])
            lvl[4]["b"] = rng.normal(-4.0, 2.0, b.shape).astype(b.dtype)
        hyp = load_hyperparams()
        ds = DetectionDataset(paths, args.size, hyp, augment=False)

        results = {"native": [], "python": []}
        metrics = {}
        for rnd in range(max(args.epochs, 1)):
            for mode in ("native", "python"):
                loader = make_val_loader(
                    ds, args.batch, num_workers=args.workers,
                    native="on" if mode == "native" else "off")
                t0 = time.perf_counter()
                m = evaluate(params, loader, cfg, args.size)
                dt = time.perf_counter() - t0
                results[mode].append(dt)
                key = tuple(round(float(v), 6) for v in m)
                metrics.setdefault(mode, key)
                assert metrics[mode] == key, (mode, metrics[mode], key)
        drift = max(abs(a - b) for a, b in
                    zip(metrics["native"], metrics["python"]))
        assert drift < 0.02, metrics   # JPEG decoder tolerance
        for mode in ("native", "python"):
            dt = min(results[mode])
            print(json.dumps({
                "mode": f"eval_{mode}", "images": len(paths),
                "batch": args.batch, "workers": args.workers,
                "wall_s": round(dt, 2),
                "img_per_s": round(len(paths) / dt, 1),
                "metric_drift_vs_other": round(drift, 6),
                "map": metrics[mode][0],
                "backend": jax.default_backend(),
                "ncpu": os.cpu_count(),
            }))
    return 0


def _write_label_files(lbl_dir, paths, rng):
    for p in paths:
        n = int(rng.integers(1, 8))
        rows = []
        for _ in range(n):
            w, h = rng.uniform(0.05, 0.4, 2)
            x, y = rng.uniform(w / 2, 1 - w / 2), rng.uniform(
                h / 2, 1 - h / 2)
            rows.append(f"{int(rng.integers(0, 80))} "
                        f"{x:.6f} {y:.6f} {w:.6f} {h:.6f}")
        base = os.path.splitext(os.path.basename(p))[0]
        with open(os.path.join(lbl_dir, base + ".txt"), "w") as f:
            f.write("\n".join(rows) + "\n")


def train_ab(args):
    """Train-loader A/B (VERDICT r4 item 1's measurement): the native
    NativeTrainLoader (C++ decode + host cv2 augment,
    data/native_train.py) vs the Python DataLoader over the augmenting
    DetectionDataset, on synthetic COCO-layout JPEGs. Interleaved
    rounds; reports per-loader standalone img/s AND the host-ahead-of-
    device overlap proof: a second pass sleeps --consume-ms per batch
    (a stand-in device step) — with working prefetch the wall time is
    max(loader, consumer) + pipeline fill, so `overlap_overhead_ms`
    (wall - n_batches*consume) stays near one batch's staging latency
    instead of the full loader time. With --trainer, additionally A/Bs
    `main.py --train` end-to-end (1 epoch, eval skipped by omitting
    val2017.txt) on the default backend — the production trainer path
    through both loaders."""
    import subprocess

    from tpu_yolo.core.config import load_hyperparams
    from tpu_yolo.data.dataset import DetectionDataset
    from tpu_yolo.data.loader import DataLoader
    from tpu_yolo.data.native_train import NativeTrainLoader

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        img_dir = os.path.join(td, "images", "train2017")
        lbl_dir = os.path.join(td, "labels", "train2017")
        os.makedirs(img_dir)
        os.makedirs(lbl_dir)
        paths = make_jpegs(img_dir, args.images, rng)
        _write_label_files(lbl_dir, paths, rng)
        with open(os.path.join(td, "train2017.txt"), "w") as f:
            f.write("\n".join(paths) + "\n")

        hyp = load_hyperparams()
        consume = args.consume_ms / 1e3

        def make_loader(mode):
            if mode == "native":
                return NativeTrainLoader(paths, args.size, hyp,
                                         batch_size=args.batch,
                                         threads=args.workers)
            ds = DetectionDataset(paths, args.size, hyp, augment=True)
            return DataLoader(ds, args.batch, shuffle=True,
                              num_workers=args.workers, drop_last=True)

        walls = {"native": [], "python": []}
        overlap = {"native": [], "python": []}
        for rnd in range(max(args.epochs, 1)):
            for mode in ("native", "python"):
                loader = make_loader(mode)
                t0 = time.perf_counter()
                n_img = n_batch = 0
                for images, _ in loader:
                    n_img += images.shape[0]
                    n_batch += 1
                walls[mode].append((time.perf_counter() - t0, n_img))
                if consume > 0:
                    loader = make_loader(mode)
                    t0 = time.perf_counter()
                    for _ in loader:
                        time.sleep(consume)
                    wall = time.perf_counter() - t0
                    overlap[mode].append(wall - n_batch * consume)

        for mode in ("native", "python"):
            dt, n_img = min(walls[mode])
            row = {
                "mode": f"train_loader_{mode}", "images": n_img,
                "batch": args.batch, "workers": args.workers,
                "size": args.size, "wall_s": round(dt, 2),
                "img_per_s": round(n_img / dt, 1),
                "ncpu": os.cpu_count(),
            }
            if consume > 0:
                row["consume_ms_per_batch"] = args.consume_ms
                row["overlap_overhead_ms"] = round(
                    min(overlap[mode]) * 1e3, 1)
            print(json.dumps(row))

        if args.trainer:
            env = dict(os.environ)
            root = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            for rnd in range(2):
                for mode in ("native", "python"):
                    save = os.path.join(td, f"w_{mode}_{rnd}")
                    cmd = [sys.executable, "main.py", "--train",
                           "--model-size", args.model,
                           "--input-size", str(args.size),
                           "--batch-size", str(args.batch),
                           "--epochs", "1", "--data-dir", td,
                           "--save-dir", save,
                           "--workers", str(args.workers)]
                    if mode == "native":
                        cmd += ["--native-train", "on"]
                    t0 = time.perf_counter()
                    r = subprocess.run(cmd, cwd=root, env=env,
                                       capture_output=True, text=True)
                    dt = time.perf_counter() - t0
                    if r.returncode:
                        print(json.dumps({"mode": f"trainer_{mode}",
                                          "error": r.stderr[-500:]}))
                        continue
                    print(json.dumps({
                        "mode": f"trainer_{mode}", "round": rnd,
                        "images": args.images, "batch": args.batch,
                        "epoch_wall_s": round(dt, 2),
                        "img_per_s": round(args.images / dt, 1),
                    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--eval-ab", action="store_true",
                    help="full evaluate() wall-time A/B: native C++ "
                         "eval loader vs Python cv2 loader on synthetic "
                         "COCO-layout JPEGs (identical metrics asserted)")
    ap.add_argument("--model", default="n")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--train-ab", action="store_true",
                    help="train-loader A/B: NativeTrainLoader vs the "
                         "Python DataLoader, standalone + overlap "
                         "proof; --trainer adds a main.py --train e2e "
                         "A/B on the default backend")
    ap.add_argument("--consume-ms", type=float, default=0.0,
                    help="with --train-ab: per-batch consumer sleep "
                         "(device-step stand-in) for the overlap proof")
    ap.add_argument("--trainer", action="store_true")
    args = ap.parse_args()

    from tpu_yolo.data import native_loader
    if not native_loader.available():
        print(json.dumps({"error": "native library unavailable; "
                                   "run `make -C native`"}))
        return 1

    if args.eval_ab:
        return eval_ab(args)
    if args.train_ab:
        return train_ab(args)

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
