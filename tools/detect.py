#!/usr/bin/env python
"""Run detection on image files and save annotated copies.

Inference front-end over tpu_yolo.serve.Detector + utils/viz (the
reference has no single-image inference CLI; its only entry is the COCO
eval loop, main.py:224-304).

Usage:
  python tools/detect.py --weights yolo11n.pt --size n \
      --out /tmp/annotated img1.jpg img2.jpg ...
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("images", nargs="+", help="image paths")
    p.add_argument("--weights", required=True, help=".pt/.npz/.ckpt")
    p.add_argument("--size", default="n", choices=list("ntsmlx"))
    p.add_argument("--input-size", default=640, type=int)
    p.add_argument("--conf", default=0.25, type=float)
    p.add_argument("--iou", default=0.65, type=float)
    p.add_argument("--batch-size", default=16, type=int)
    p.add_argument("--out", default="./detections", help="output dir")
    p.add_argument("--int8", action="store_true",
                   help="quantize (calibrates on the inputs)")
    p.add_argument("--device-letterbox", action="store_true",
                   help="host only decodes; resize+pad runs on device "
                        "(ops/letterbox.py)")
    p.add_argument("--latency-mode", action="store_true",
                   help="the measured low-latency preset (single-label "
                        "ranking, K=256; serve.py latency_mode) + "
                        "detect_one per image instead of batched "
                        "streaming")
    args = p.parse_args()

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")  # site plugin override

    import cv2

    from tpu_yolo.core.config import COCO_NAMES
    from tpu_yolo.serve import Detector
    from tpu_yolo.utils.viz import draw_detections

    det = Detector.from_checkpoint(args.weights, size=args.size,
                                   input_size=args.input_size,
                                   conf_thres=args.conf, iou_thres=args.iou,
                                   device_letterbox=args.device_letterbox,
                                   latency_mode=args.latency_mode)
    if args.int8:
        det.quantize(args.images[: args.batch_size])

    os.makedirs(args.out, exist_ok=True)
    n_boxes = 0
    results = ((det.detect_one(p) for p in args.images)
               if args.latency_mode
               else det.stream(args.images, batch_size=args.batch_size))
    for r in results:
        if r.get("error"):
            print(f"{r['path']}: decode failed", file=sys.stderr)
            continue
        img = cv2.imread(r["path"])
        img = draw_detections(img, r["boxes"], r["scores"], r["classes"],
                              names=COCO_NAMES)
        dst = os.path.join(args.out, os.path.basename(r["path"]))
        cv2.imwrite(dst, img)
        n_boxes += len(r["boxes"])
        print(f"{r['path']}: {len(r['boxes'])} detections -> {dst}")
    print(f"done: {n_boxes} detections over {len(args.images)} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
