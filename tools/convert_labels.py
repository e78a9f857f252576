#!/usr/bin/env python
"""Convert COCO polygon-segmentation label files to YOLO bbox format.

Counterpart of reference convert_labels.py:1-83
(convert_segmentation_to_bbox): each input line is
`cls x1 y1 x2 y2 ... xn yn` (normalized polygon); the output line is
`cls cx cy w h` (normalized bbox) — the enclosing axis-aligned box of
the polygon, clipped to [0, 1].
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def polygon_line_to_bbox(line: str) -> str | None:
    parts = line.split()
    if len(parts) < 7 or len(parts) % 2 == 0:
        # already a bbox line (5 fields) or malformed; keep bbox lines
        return line.strip() if len(parts) == 5 else None
    cls = parts[0]
    pts = np.asarray(parts[1:], dtype=np.float64).reshape(-1, 2)
    x1, y1 = pts.min(0)
    x2, y2 = pts.max(0)
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    w, h = x2 - x1, y2 - y1
    if w <= 0 or h <= 0:
        return None
    vals = np.clip([cx, cy, w, h], 0.0, 1.0)
    return f"{cls} " + " ".join(f"{v:.6f}" for v in vals)


def convert_file(src: str, dst: str) -> int:
    out_lines = []
    with open(src) as f:
        for line in f:
            if line.strip():
                converted = polygon_line_to_bbox(line)
                if converted:
                    out_lines.append(converted)
    with open(dst, "w") as f:
        f.write("\n".join(out_lines) + ("\n" if out_lines else ""))
    return len(out_lines)


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("src_dir", help="directory of segmentation .txt labels")
    p.add_argument("dst_dir", help="output directory for bbox labels")
    args = p.parse_args()

    os.makedirs(args.dst_dir, exist_ok=True)
    files = [f for f in os.listdir(args.src_dir) if f.endswith(".txt")]
    total = 0
    for name in files:
        total += convert_file(os.path.join(args.src_dir, name),
                              os.path.join(args.dst_dir, name))
    print(f"converted {len(files)} files, {total} boxes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
