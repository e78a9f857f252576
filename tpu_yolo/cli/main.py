#!/usr/bin/env python
"""tpu-yolo CLI: train / test / profile / export / benchmark.

Counterpart of reference main.py:324-367 (main()), with the same flag
surface (--train/--test/--weights/--resume/--input-size/--batch-size/
--epochs) plus the TPU-relevant knobs. There is no launcher script and
no per-GPU process spawn (reference main.sh:1-2 + NCCL env rendezvous,
main.py:338-344): one SPMD process per host drives every local chip via
a jax.sharding.Mesh, and multi-host runs call jax.distributed.initialize.
"""
from __future__ import annotations

import argparse
import os
import random

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("tpu-yolo")
    p.add_argument("--model-size", default="n", choices=list("ntsmlx"))
    p.add_argument("--input-size", default=640, type=int)
    p.add_argument("--batch-size", default=32, type=int,
                   help="global batch across all chips")
    p.add_argument("--val-batch-size", default=32, type=int)
    p.add_argument("--epochs", default=600, type=int)
    p.add_argument("--train", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--coco-metrics", action="store_true",
                   help="with --test: also compute the COCO-API "
                        "12-metric table (AP/AP50/AP75, AP by area, "
                        "AR@1/10/100 — first-party protocol, "
                        "eval/coco_eval.py) in original-image space")
    p.add_argument("--export", nargs="?", const="stablehlo", default="",
                   choices=["stablehlo", "onnx", "both"],
                   help="export format (bare --export = stablehlo; onnx "
                        "emits a stock opset-17 .onnx artifact)")
    p.add_argument("--profile", action="store_true",
                   help="print params + GFLOPs (XLA cost model) and exit")
    p.add_argument("--weights", default="", help=".pt/.npz/.ckpt to load")
    p.add_argument("--resume", default="", help="checkpoint to resume from")
    p.add_argument("--data-dir", default="./COCO")
    p.add_argument("--save-dir", default="./weights")
    p.add_argument("--hyp", default="", help="hyperparameter yaml override")
    p.add_argument("--workers", default=8, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--plot", action="store_true", help="save eval curves")
    p.add_argument("--tensorboard", action="store_true",
                   help="also log scalars to save-dir/tb (CSV always written)")
    p.add_argument("--max-nms", default=2048, type=int,
                   help="eval NMS candidate budget K (capped at 8192). "
                        "The K-budget output is an exact prefix of the "
                        "reference's max_nms=30000 output (prefix "
                        "theorem, ops/nms.py); every eval prints a "
                        "per-run spill certificate and says when to "
                        "raise this")
    p.add_argument("--native-eval", default="auto",
                   choices=["auto", "on", "off"],
                   help="eval data loader: native C++ pipeline when the "
                        ".so exists (auto, the default), required (on), "
                        "or the Python cv2 loader (off — the parity "
                        "oracle path; identical geometry either way)")
    p.add_argument("--native-train", default="off",
                   choices=["auto", "on", "off"],
                   help="train data loader: decode + prescale in the "
                        "native C++ pipeline, augmentation as the host "
                        "cv2 path (data/native_train.py). off (default) "
                        "keeps the Python cv2 loader — the parity "
                        "oracle; auto uses native when the .so exists; "
                        "on requires it. Label geometry is identical; "
                        "the prescale interp is standardized to "
                        "bilinear (PARITY.md)")
    p.add_argument("--device-augment", action="store_true",
                   help="run mosaic/affine/HSV/flip augmentation on "
                        "device (ops/augment_device.py); host only "
                        "decodes + samples draws")
    def _nonneg(v):
        iv = int(v)
        if iv < 0:
            raise argparse.ArgumentTypeError(
                f"--gt-bucket must be >= 0, got {iv}")
        return iv

    p.add_argument("--gt-bucket", default=0, type=_nonneg,
                   help="pin the per-step GT pad bucket (0 = adaptive). "
                        "Multi-host: a fixed bucket removes the per-step "
                        "host allgather that otherwise synchronizes the "
                        "pad shape across hosts (a DCN sync point)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in backward (less "
                        "activation memory, ~1/3 more FLOPs)")
    p.add_argument("--remat-level", default="stage",
                   choices=("stage", "blocks"),
                   help="with --remat: checkpoint granularity — per "
                        "model stage (default), or additionally per "
                        "CSP/PSA inner block (lowest peak memory, "
                        "interiors recompute twice)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    return p.parse_args()


def setup_seed(seed: int):
    """Deterministic host-side RNG (reference util.py:12-20); device-side
    determinism is JAX-native (explicit PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)


def load_model_params(args, cfg, for_inference: bool):
    import jax

    from tpu_yolo.io import checkpoint as ckpt_io
    from tpu_yolo.io.weights import load_checkpoint_params
    from tpu_yolo.models import yolov11

    template = yolov11.init_params(jax.random.PRNGKey(args.seed), cfg)
    path = args.weights or os.path.join(args.save_dir, "best.ckpt")
    if path.endswith(".ckpt"):
        payload = ckpt_io.load_checkpoint(path)
        params = payload.get("ema_params") or payload["params"]
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), params)
    else:
        params = load_checkpoint_params(path, template)
    if for_inference:
        params = yolov11.fold_batchnorm(params)
    return params


def run_test(args, hyp, cfg, max_images: int | None = None):
    """The --test body (reference main.py:224-304 test()): load weights,
    build the val2017 loader, run the DP-sharded eval pass. Factored out
    so tools/parity_check.py drives the identical code path. Returns the
    reference tuple (mAP, mAP50, recall, precision)."""
    import math

    import jax

    from tpu_yolo.data.dataset import DetectionDataset
    from tpu_yolo.data.loader import DataLoader
    from tpu_yolo.eval.evaluator import evaluate
    from tpu_yolo.parallel import DataParallel, make_mesh

    params = load_model_params(args, cfg, for_inference=True)
    with open(os.path.join(args.data_dir, "val2017.txt")) as f:
        filenames = [
            os.path.join(args.data_dir, "images", "val2017",
                         os.path.basename(line.strip()))
            for line in f if line.strip()]
    cache = os.path.join(args.data_dir, "val2017.cache.npy")
    if max_images is not None:
        filenames = filenames[:max_images]
        # the label cache stores the full dict it was built with, so a
        # truncated run must not share the full-set cache
        cache = os.path.join(args.data_dir,
                             f"val2017.first{max_images}.cache.npy")
    dataset = DetectionDataset(
        filenames, args.input_size, hyp, augment=False, cache_path=cache)
    from tpu_yolo.data.loader import make_val_loader
    loader = make_val_loader(dataset, args.val_batch_size,
                             num_workers=args.workers,
                             native=getattr(args, "native_eval", "auto"))

    # Shard eval batches across local chips (as many as divide the
    # batch; no-op on one chip).
    n_data = max(math.gcd(args.val_batch_size, len(jax.devices())), 1)
    dp = DataParallel(make_mesh(n_data=n_data))
    params = dp.replicate(params)

    coco_ctx = None
    if getattr(args, "coco_metrics", False):
        from tpu_yolo.eval.evaluator import build_coco_ctx
        coco_ctx = build_coco_ctx(dataset, args.input_size)

    result = evaluate(
        params, loader, cfg, args.input_size,
        plot_dir=args.save_dir if args.plot else None,
        names=[v for _, v in sorted(hyp["names"].items())],
        device_put_fn=(dp.shard_batch if dp.num_data_shards > 1 else None),
        progress=True, coco_ctx=coco_ctx,
        max_nms=getattr(args, "max_nms", 2048))

    if coco_ctx is not None:
        from tpu_yolo.eval.coco_eval import summarize
        print(summarize(coco_ctx[0].accumulate()))
    return result


def main():
    args = parse_args()
    setup_seed(args.seed)

    # Honor JAX_PLATFORMS=cpu even where a site plugin force-registers a
    # TPU backend and would silently override the env var (this is how
    # tests/e2e drive the CLI on the virtual CPU mesh).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    # Persistent XLA compile cache (entries are keyed by platform, so
    # TPU runs and CPU test runs coexist); JAX_COMPILATION_CACHE_DIR
    # overrides, e.g. the e2e tests pointing every CLI subprocess at
    # one shared dir.
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache"))

    if args.distributed:
        import jax
        jax.distributed.initialize()

    from tpu_yolo.core.config import get_model_config, load_hyperparams

    hyp = load_hyperparams(args.hyp or None)
    cfg = get_model_config(args.model_size, num_classes=len(hyp["names"]))

    if args.profile:
        import jax

        from tpu_yolo.models import yolov11
        from tpu_yolo.utils.profiler import print_profile
        params = yolov11.fold_batchnorm(
            yolov11.init_params(jax.random.PRNGKey(args.seed), cfg))
        print_profile(params, cfg, args.input_size)
        return

    if args.train:
        import jax

        from tpu_yolo.parallel import DataParallel, make_mesh
        from tpu_yolo.train.trainer import train

        # Startup profile banner (reference main.py:356).
        from tpu_yolo.models import yolov11
        from tpu_yolo.utils.profiler import print_profile
        params = yolov11.init_params(jax.random.PRNGKey(args.seed), cfg)
        print_profile(yolov11.fold_batchnorm(params), cfg, args.input_size)
        del params

        # Data axis sizing (reference DDP likewise requires
        # batch % world_size == 0, main.sh). Single-host: largest local
        # device count dividing the batch. Multi-host: each host feeds a
        # per-host slice (mesh.py shard_batch assembles the global
        # array), so the axis must be process_count * (a divisor of the
        # per-host batch) to keep every host's rows on its own chips.
        import math
        pc = max(jax.process_count(), 1)
        per_host = max(args.batch_size // pc, 1)
        n_data = pc * math.gcd(per_host, len(jax.local_devices()))
        dp = DataParallel(make_mesh(n_data=max(n_data, 1)))
        train(args, hyp, cfg, dp)

    if args.test:
        m_ap, m_ap50, recall, precision = run_test(args, hyp, cfg)
        print(f"mAP: {m_ap:.3f}  mAP@50: {m_ap50:.3f}  "
              f"Recall: {recall:.3f}  Precision: {precision:.3f}")

    if args.export:
        params = load_model_params(args, cfg, for_inference=True)
        out_dir = os.path.join(args.save_dir, f"export_{args.model_size}")
        if args.export in ("stablehlo", "both"):
            from tpu_yolo.utils.export import export_stablehlo

            manifest = export_stablehlo(params, cfg, args.input_size, out_dir)
            print(f"exported: {manifest}")
        if args.export in ("onnx", "both"):
            from tpu_yolo.utils.onnx import export_onnx

            os.makedirs(out_dir, exist_ok=True)
            meta = export_onnx(params, cfg, args.input_size,
                               os.path.join(out_dir, "model.onnx"))
            print(f"exported: {meta}")


if __name__ == "__main__":
    main()
