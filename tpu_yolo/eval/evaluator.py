"""COCO-val evaluation loop: device forward + batched NMS -> host AP.

Counterpart of reference main.py:224-304 (test()). Differences are the
TPU-native inversions, not behavior:

  * the model runs in bfloat16 (reference runs .half(), main.py:251);
  * normalization (/255) happens on device from raw uint8 batches
    (reference main.py:265-267 converts on device too, but from float
    host tensors — we ship 4x fewer bytes over PCIe/DCN);
  * NMS is the batched fixed-shape on-device kernel (ops/nms.py), not a
    per-image torchvision call, so the whole batch returns in one
    device->host transfer;
  * the TP-matrix match and AP integration stay host-side numpy exactly
    like the reference (utils/util.py:99-120, 225-300) — they are tiny.

mAP is computed in letterboxed pixel space (GT scaled by the letterboxed
w/h, reference main.py:269,291) — a frozen contract for parity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.eval.metrics import average_precision, match_predictions
from tpu_yolo.models import yolov11

IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)


@functools.partial(jax.jit, static_argnames=("cfg", "compute_dtype", "conf_thres",
                                             "iou_thres", "max_det", "max_nms"))
def predict_step(params, images, *, cfg: ModelConfig,
                 compute_dtype=jnp.bfloat16, conf_thres: float = 0.001,
                 iou_thres: float = 0.65, max_det: int = 300,
                 max_nms: int = 2048):
    """uint8 NHWC batch -> NMS'd detections, entirely on device (fused
    decode+NMS path, models.forward_nms).

    envelope=True adds the per-image above-conf candidate count so the
    eval loop certifies the NMS candidate budget against the reference's
    max_nms=30000 (util.py:125,134) on every run — see the prefix
    theorem in ops/nms.py and BENCH.md "Eval NMS candidate envelope"."""
    x = images.astype(compute_dtype) / compute_dtype(255)
    return yolov11.forward_nms(params, x, cfg, conf_thres=conf_thres,
                               iou_thres=iou_thres, max_det=max_det,
                               max_nms=max_nms, envelope=True)


def _gt_pixel_boxes(targets: dict, image_index: int, input_hw) -> np.ndarray:
    """One image's GT as (M, 5) [cls, x1, y1, x2, y2] letterboxed pixels
    (reference main.py:269,286-291)."""
    idx = np.asarray(targets["idx"]).reshape(-1)
    rows = idx == image_index
    cls = np.asarray(targets["cls"], np.float32).reshape(-1, 1)[rows]
    box = np.asarray(targets["box"], np.float32).reshape(-1, 4)[rows]
    if box.shape[0] == 0:
        return np.zeros((0, 5), np.float32)
    h, w = input_hw
    scale = np.array([w, h, w, h], np.float32)
    px = box * scale
    xyxy = np.concatenate([px[:, :2] - px[:, 2:] / 2,
                           px[:, :2] + px[:, 2:] / 2], axis=1)
    return np.concatenate([cls, xyxy], axis=1)


def build_coco_ctx(dataset, input_size: int):
    """(CocoEvaluator, geoms) for evaluate(coco_ctx=...): per dataset
    image, the original->letterbox geometry (header-only PIL size read)
    and the GT in original-image pixels — the space the COCO protocol's
    area buckets are defined in."""
    from PIL import Image

    from tpu_yolo.data.image import eval_geometry
    from tpu_yolo.eval.coco_eval import CocoEvaluator

    geoms = []
    for path, label in zip(dataset.filenames, dataset.labels):
        with Image.open(path) as im:
            ow, oh = im.size
        gain, pad = eval_geometry((oh, ow), input_size)
        if label.size:
            px = label[:, 1:] * np.array([ow, oh, ow, oh], np.float32)
            gt = np.concatenate(
                [label[:, :1], px[:, :2] - px[:, 2:] / 2,
                 px[:, :2] + px[:, 2:] / 2], axis=1).astype(np.float32)
        else:
            gt = np.zeros((0, 5), np.float32)
        geoms.append((gain, pad, gt, (ow, oh)))
    return CocoEvaluator(), geoms


def evaluate(params, loader, cfg: ModelConfig, input_size: int,
             plot_dir: str | None = None, names=(),
             compute_dtype=jnp.bfloat16, device_put_fn=None,
             progress: bool = False, coco_ctx=None,
             envelope_stats: dict | None = None, max_nms: int = 2048):
    """Run the full eval pass.

    Args:
      params: (BN-folded or raw) param pytree.
      loader: yields (images uint8 (B,H,W,3), targets dict) batches.
      device_put_fn: optional fn(array)->sharded device array for DP eval.
      coco_ctx: optional (eval.coco_eval.CocoEvaluator, geoms) to also
        accumulate the COCO-protocol metrics; geoms is a dataset-order
        list of ((gx, gy), (pad_w, pad_h), gt_orig (M,5), (ow, oh)) per
        image (data/image.py::eval_geometry + original-space labels) —
        the loader must iterate the dataset unshuffled (val loaders do).
      envelope_stats: optional dict filled with the candidate-envelope
        certificate {images, at_risk, max_above_conf, budget}: at_risk
        counts images where MORE than `budget` candidates cleared conf
        AND fewer than max_det detections survived — the only case the
        K-budget NMS output can differ from the reference's
        max_nms=30000 budget (prefix theorem, ops/nms.py). at_risk == 0
        certifies the run's detection sets bit-exact vs that budget.
    Returns:
      (mAP, mAP50, recall, precision) — the reference test() tuple.
      COCO results are read from the collector by the caller.
    """
    step = functools.partial(predict_step, cfg=cfg,
                             compute_dtype=compute_dtype, max_nms=max_nms)

    all_tp, all_conf, all_pcls, all_tcls = [], [], [], []
    env = {"images": 0, "at_risk": 0, "max_above_conf": 0, "budget": 0}
    it = loader
    if progress:
        import tqdm
        it = tqdm.tqdm(loader, total=len(loader), desc="eval")

    def consume(out, targets, n, base):
        out = jax.device_get(out)
        if "n_above_conf" in out and n:
            env["budget"] = int(out["candidate_budget"])
            na = np.asarray(out["n_above_conf"])[:n]
            cnt_b = np.asarray(out["count"])[:n]
            max_det = out["valid"].shape[1]
            env["images"] += n
            env["max_above_conf"] = max(env["max_above_conf"], int(na.max()))
            env["at_risk"] += int(((na > env["budget"])
                                   & (cnt_b < max_det)).sum())
        for b in range(n):
            cnt = int(out["count"][b])
            det = np.zeros((cnt, 6), np.float32)
            det[:, :4] = out["boxes"][b][:cnt]
            det[:, 4] = out["scores"][b][:cnt]
            det[:, 5] = out["classes"][b][:cnt]
            if coco_ctx is not None:
                coll, geoms = coco_ctx
                (gx, gy), (pw, ph), gt_orig, (ow, oh) = geoms[base + b]
                d = det.copy()
                d[:, [0, 2]] = np.clip((d[:, [0, 2]] - pw) / gx, 0, ow)
                d[:, [1, 3]] = np.clip((d[:, [1, 3]] - ph) / gy, 0, oh)
                coll.add_image(d, gt_orig)
            gt = _gt_pixel_boxes(targets, b, (input_size, input_size))
            if cnt == 0:
                if gt.shape[0]:
                    all_tcls.append(gt[:, 0])
                continue
            tp = match_predictions(det, gt, IOU_THRESHOLDS)
            all_tp.append(tp)
            all_conf.append(det[:, 4])
            all_pcls.append(det[:, 5])
            all_tcls.append(gt[:, 0])

    # Double-buffered: dispatch batch i+1 (async) before the host runs
    # the TP-matrix matching for batch i, so per-image numpy matching
    # overlaps device compute (reference test() is fully serial,
    # main.py:263-294).
    batch_size = None
    seen = 0
    pending = None  # (device result, targets, real batch count, base idx)
    for images, targets in it:
        if batch_size is None:
            batch_size = images.shape[0]
        n = images.shape[0]
        if n < batch_size:  # pad final batch to keep one compiled shape
            pad = np.zeros((batch_size - n, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad], axis=0)
        x = device_put_fn(images) if device_put_fn else images
        out = step(params, x)
        if pending is not None:
            consume(*pending)
        pending = (out, targets, n, seen)
        seen += n
    if pending is not None:
        consume(*pending)

    if envelope_stats is not None:
        envelope_stats.update(env)
    if env["images"] and (progress or env["at_risk"]):
        ok = ("BIT-EXACT vs the reference's 30k budget"
              if env["at_risk"] == 0 else
              "possible missed tail detections — raise --max-nms")
        print(f"[eval] candidate envelope: {env['at_risk']}/{env['images']}"
              f" images at spill risk (budget K={env['budget']}, max "
              f"above-conf count {env['max_above_conf']}): selection {ok}")

    if not all_tp:
        return 0.0, 0.0, 0.0, 0.0

    tp = np.concatenate(all_tp, 0)
    conf = np.concatenate(all_conf, 0)
    pcls = np.concatenate(all_pcls, 0)
    tcls = np.concatenate(all_tcls, 0) if all_tcls else np.zeros(0)

    res = average_precision(tp, conf, pcls, tcls, plot_dir=plot_dir, names=names)
    return res["map"], res["map50"], res["recall"], res["precision"]
