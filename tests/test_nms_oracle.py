"""Property-style oracle tests for batched_nms.

The NMS implementation keeps being reworked for throughput (matrix
fixpoint, 2-tile decomposition, selection-matrix compaction, pre-gate,
per-level decode, single-label ranking), always with a bit-identical
claim. The reference-captured goldens (tests/test_ops_parity.py) pin
fixed inputs; this file pins the CONTRACT on seeded random and
tie-adversarial scenes against a transparent numpy sorted-greedy
reference (the semantics of reference utils/util.py:123-169: rank all
(anchor, class) candidates by score, greedily keep those not
same-class-IoU-suppressed by an earlier kept one, emit the first
max_det), across the path variants: pregate on/off, suppression
single-block vs 2-tile, multi- vs single-label.

The oracle mirrors the device arithmetic exactly: f32 IoU with the
+1e-12 denominator, strict > comparisons for both IoU and conf, and
the (score desc, flat index a*nc+c asc) tie order (numpy stable
argsort of the negated scores over the flat index order).
"""
import numpy as np
import pytest


def _iou_f32(box, others):
    """IoU of one xyxy box vs (N, 4), f32 arithmetic like the device
    (_pair_iou_mask: inter / (area_a + area_b - inter + 1e-12))."""
    box = box.astype(np.float32)
    others = others.astype(np.float32)
    x1 = np.maximum(box[0], others[:, 0])
    y1 = np.maximum(box[1], others[:, 1])
    x2 = np.minimum(box[2], others[:, 2])
    y2 = np.minimum(box[3], others[:, 3])
    inter = np.maximum(x2 - x1, np.float32(0)) * \
        np.maximum(y2 - y1, np.float32(0))
    area = np.maximum(box[2] - box[0], np.float32(0)) * \
        np.maximum(box[3] - box[1], np.float32(0))
    areas = np.maximum(others[:, 2] - others[:, 0], np.float32(0)) * \
        np.maximum(others[:, 3] - others[:, 1], np.float32(0))
    return inter / (area + areas - inter + np.float32(1e-12))


def oracle_nms_image(boxes_xyxy, scores2d, conf, iou_thr, max_det,
                     multi_label=True):
    """Sorted-greedy NMS for one image.

    boxes_xyxy: (A, 4); scores2d: (A, nc).
    Returns (boxes (M,4), scores (M,), classes (M,)) of the kept
    detections in score order, M <= max_det."""
    a, nc = scores2d.shape
    if multi_label:
        flat = scores2d.reshape(-1)                      # a*nc, flat order
        order = np.argsort(-flat, kind="stable")         # ties: flat asc
        anchor_idx = order // nc
        cls_idx = order % nc
        cand_scores = flat[order]
    else:
        cls = scores2d.argmax(-1)                        # ties: lower cls
        best = scores2d[np.arange(a), cls]
        order = np.argsort(-best, kind="stable")         # ties: anchor asc
        anchor_idx = order
        cls_idx = cls[order]
        cand_scores = best[order]

    kept_boxes, kept_scores, kept_cls = [], [], []
    for i in range(len(order)):
        s = cand_scores[i]
        if not (s > conf):
            continue
        b = boxes_xyxy[anchor_idx[i]]
        c = cls_idx[i]
        suppressed = False
        same = [j for j in range(len(kept_cls)) if kept_cls[j] == c]
        if same:
            ious = _iou_f32(np.asarray(b), np.asarray(
                [kept_boxes[j] for j in same], np.float32))
            suppressed = bool((ious > np.float32(iou_thr)).any())
        if not suppressed:
            kept_boxes.append(np.asarray(b, np.float32))
            kept_scores.append(np.float32(s))
            kept_cls.append(int(c))
            if len(kept_cls) == max_det:
                break
    if not kept_cls:
        return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int32))
    return (np.stack(kept_boxes), np.asarray(kept_scores, np.float32),
            np.asarray(kept_cls, np.int32))


def _scene(rng, b, a, nc, *, clusters, tie_levels=None):
    """Clustered xywh scenes: `clusters` ladders of heavily-overlapping
    boxes per image (long suppression chains), the rest background.
    tie_levels quantizes scores so many candidates tie exactly."""
    cxy = rng.uniform(60, 580, (b, a, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (b, a, 2)).astype(np.float32)
    for img in range(b):
        free = rng.permutation(a)
        off = 0
        for _ in range(clusters):
            n = int(rng.integers(4, 12))
            idx = free[off:off + n]
            off += n
            base_xy = rng.uniform(100, 540, 2)
            base_wh = rng.uniform(40, 110, 2)
            # ladder: each box shifted a little from the previous ->
            # chains where k suppresses k+1 which would suppress k+2
            step = rng.uniform(2, 8, 2)
            for t, j in enumerate(idx):
                cxy[img, j] = base_xy + step * t
                wh[img, j] = base_wh * np.exp(rng.normal(0, 0.04, 2))
    scores = rng.uniform(0, 1, (b, a, nc)).astype(np.float32) ** 3
    if tie_levels:
        scores = np.round(scores * tie_levels) / np.float32(tie_levels)
    return cxy, wh, scores


def _run_and_compare(preds, cfg_kwargs, multi_label):
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms

    res = batched_nms(jnp.asarray(preds), multi_label=multi_label,
                      **cfg_kwargs)
    boxes = np.asarray(res["boxes"])
    scores = np.asarray(res["scores"])
    classes = np.asarray(res["classes"])
    count = np.asarray(res["count"])
    valid = np.asarray(res["valid"])

    b = preds.shape[0]
    xy, wh = preds[..., :2], preds[..., 2:4]
    xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)
    for img in range(b):
        ob, osc, ocl = oracle_nms_image(
            xyxy[img], preds[img, :, 4:],
            cfg_kwargs["conf_thres"], cfg_kwargs["iou_thres"],
            cfg_kwargs["max_det"], multi_label=multi_label)
        n = int(count[img])
        assert n == len(ocl), (img, n, len(ocl))
        assert valid[img, :n].all() and not valid[img, n:].any()
        np.testing.assert_array_equal(classes[img, :n], ocl, err_msg=str(img))
        np.testing.assert_allclose(scores[img, :n], osc, rtol=0, atol=0)
        np.testing.assert_allclose(boxes[img, :n], ob, rtol=1e-6, atol=1e-3)


def test_oracle_multilabel_full_budget():
    """Exact multi-label flat ranking at a budget covering every
    candidate, vs the numpy greedy oracle on clustered scenes with
    quantized (tie-heavy) scores."""
    rng = np.random.default_rng(42)
    b, a, nc = 3, 160, 6
    cxy, wh, scores = _scene(rng, b, a, nc, clusters=6, tie_levels=9)
    preds = np.concatenate([cxy, wh, scores], -1)
    _run_and_compare(
        preds,
        dict(conf_thres=0.10, iou_thres=0.5, max_det=50, max_nms=a * nc,
             ranking="exact", pregate=False),
        multi_label=True)


@pytest.mark.parametrize("pregate", [True, False])
def test_oracle_multilabel_capped_budget(pregate):
    """K < A (so pregate=True actually takes the pre-gated path) but
    K >= the above-conf candidate count, where capped selection still
    equals the reference semantics. Quantized scores put exact ties on
    both sides of the K cut."""
    rng = np.random.default_rng(42)
    b, a, nc = 3, 160, 6
    cxy, wh, scores = _scene(rng, b, a, nc, clusters=6, tie_levels=9)
    preds = np.concatenate([cxy, wh, scores], -1)
    k, conf = 140, 0.729
    # oracle ranks everything; equality needs every above-conf
    # candidate inside the budget
    assert (scores > conf).sum(axis=(1, 2)).max() <= k
    _run_and_compare(
        preds,
        dict(conf_thres=conf, iou_thres=0.5, max_det=50, max_nms=k,
             ranking="exact", pregate=pregate),
        multi_label=True)


def test_oracle_tiled_suppression():
    """K large enough for the 2-tile block decomposition (k//2 >= 256):
    the cross-tile mask-dot + per-tile fixpoint must equal the oracle's
    single sequential greedy."""
    rng = np.random.default_rng(7)
    b, a, nc = 2, 300, 7
    cxy, wh, scores = _scene(rng, b, a, nc, clusters=10)
    preds = np.concatenate([cxy, wh, scores], -1)
    k, conf = 1024, 0.35  # min(max_nms, a*nc=2100, 8192) -> 1024, tile=512
    assert (scores > conf).sum(axis=(1, 2)).max() <= k
    _run_and_compare(
        preds,
        dict(conf_thres=conf, iou_thres=0.45, max_det=80, max_nms=k,
             ranking="exact", pregate=False),
        multi_label=True)


def test_oracle_single_label():
    """multi_label=False vs the per-anchor-argmax oracle, ties included."""
    rng = np.random.default_rng(3)
    b, a, nc = 3, 200, 5
    cxy, wh, scores = _scene(rng, b, a, nc, clusters=8, tie_levels=7)
    preds = np.concatenate([cxy, wh, scores], -1)
    _run_and_compare(
        preds,
        dict(conf_thres=0.10, iou_thres=0.5, max_det=40, max_nms=a,
             ranking="exact"),
        multi_label=False)
