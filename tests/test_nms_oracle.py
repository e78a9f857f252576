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
                     multi_label=True, max_nms=None):
    """Sorted-greedy NMS for one image.

    boxes_xyxy: (A, 4); scores2d: (A, nc).
    max_nms: optional candidate budget with the REFERENCE's semantics
    (util.py:125,134): above-conf candidates are sorted by score and
    only the first max_nms enter NMS at all — the oracle for the
    candidate-envelope study. None ranks everything.
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

    if max_nms is not None:
        above = cand_scores > conf
        keep_n = np.flatnonzero(above)[:max_nms]
        order, anchor_idx = order[keep_n], anchor_idx[keep_n]
        cls_idx, cand_scores = cls_idx[keep_n], cand_scores[keep_n]

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


def _spill_scene():
    """One image built to spill a K=256 budget: a 300-candidate
    same-class cluster monopolizes the top ranks (greedy keeps 1 of it),
    while 200 spread-out lower-scored objects sit entirely BELOW rank
    256 — the reference's 30k budget finds them, a K=256 budget cannot.
    This is the dense-scene shape VERDICT r4 flagged as unmeasured:
    heavy same-class duplication up top + an above-conf tail."""
    a, nc = 600, 3
    conf = 0.1
    rng = np.random.default_rng(11)
    boxes = np.zeros((a, 4), np.float32)                  # xywh
    scores = np.zeros((a, nc), np.float32)
    # cluster: 300 near-identical class-0 boxes, scores 0.9 -> 0.8
    boxes[:300, :2] = 300.0 + rng.normal(0, 0.5, (300, 2))
    boxes[:300, 2:] = 80.0
    scores[:300, 0] = np.linspace(0.9, 0.8, 300)
    # spread: 200 disjoint class-1 boxes on a grid, scores 0.5 -> 0.3
    gx, gy = np.meshgrid(np.arange(20), np.arange(10))
    boxes[300:500, 0] = 40 + gx.ravel()[:200] * 60
    boxes[300:500, 1] = 40 + gy.ravel()[:200] * 60
    boxes[300:500, 2:] = 20.0
    scores[300:500, 1] = np.linspace(0.5, 0.3, 200)
    # the rest: below conf, must count for nothing
    boxes[500:, :2] = rng.uniform(0, 600, (100, 2)).astype(np.float32)
    boxes[500:, 2:] = 10.0
    scores[500:, 2] = 0.05
    return np.concatenate([boxes, scores], -1)[None], conf


def _oracle_30k(preds, conf, iou_thr, max_det):
    xy, wh = preds[0, :, :2], preds[0, :, 2:4]
    xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], -1).astype(np.float32)
    return oracle_nms_image(xyxy, preds[0, :, 4:], conf, iou_thr, max_det,
                            multi_label=True, max_nms=30000)


def test_envelope_prefix_property():
    """The candidate-envelope theorem (ops/nms.py module docstring), on
    the adversarial spill scene: (a) the K=256 output is an EXACT prefix
    of the reference-budget (max_nms=30000) oracle output even while
    spilling hard; (b) the envelope certificate flags exactly the spill
    condition (n_above_conf > K and count < max_det); (c) raising K
    above the above-conf population restores full equality and clears
    the flag. This is VERDICT r4 item 2's measurement."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms

    preds, conf = _spill_scene()
    iou_thr, max_det = 0.65, 50
    ob, osc, ocl = _oracle_30k(preds, conf, iou_thr, max_det)
    assert len(ocl) == max_det  # reference budget fills max_det here

    res = batched_nms(jnp.asarray(preds), conf_thres=conf,
                      iou_thres=iou_thr, max_det=max_det, max_nms=256,
                      ranking="exact", envelope=True)
    n = int(res["count"][0])
    n_above = int(res["n_above_conf"][0])
    budget = int(res["candidate_budget"])
    assert budget == 256
    assert n_above == 500                      # 300 cluster + 200 spread
    # the K budget sees only the cluster -> keeps exactly its top box
    assert n == 1
    # spill condition flagged: more candidates than budget AND the kept
    # set did not fill max_det
    assert n_above > budget and n < max_det
    # PREFIX: everything the capped path emits equals the head of the
    # full-budget reference output, bit for bit
    np.testing.assert_array_equal(np.asarray(res["classes"][0][:n]), ocl[:n])
    np.testing.assert_allclose(np.asarray(res["scores"][0][:n]), osc[:n],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(res["boxes"][0][:n]), ob[:n],
                               rtol=1e-6, atol=1e-3)

    # K above the above-conf population: full equality, flag clear
    res2 = batched_nms(jnp.asarray(preds), conf_thres=conf,
                       iou_thres=iou_thr, max_det=max_det, max_nms=512,
                       ranking="exact", envelope=True)
    n2 = int(res2["count"][0])
    assert n2 == max_det
    assert not (int(res2["n_above_conf"][0]) > int(res2["candidate_budget"]))
    np.testing.assert_array_equal(np.asarray(res2["classes"][0][:n2]), ocl)
    np.testing.assert_allclose(np.asarray(res2["scores"][0][:n2]), osc,
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(res2["boxes"][0][:n2]), ob,
                               rtol=1e-6, atol=1e-3)


def test_envelope_safe_when_max_det_filled():
    """The other arm of the theorem: with MORE above-conf candidates
    than the budget but max_det detections surviving inside the top K,
    the capped output equals the 30k-budget reference exactly and the
    certificate does not flag."""
    import jax.numpy as jnp

    from tpu_yolo.ops.nms import batched_nms

    a, nc = 600, 2
    conf, iou_thr, max_det = 0.1, 0.65, 100
    boxes = np.zeros((a, 4), np.float32)
    scores = np.zeros((a, nc), np.float32)
    gx, gy = np.meshgrid(np.arange(25), np.arange(20))
    boxes[:500, 0] = 30 + gx.ravel()[:500] * 55
    boxes[:500, 1] = 30 + gy.ravel()[:500] * 55
    boxes[:500, 2:] = 18.0
    scores[:500, 0] = np.linspace(0.9, 0.3, 500)   # disjoint: all survive
    boxes[500:, :2] = 200.0
    boxes[500:, 2:] = 10.0
    scores[500:, 1] = 0.05                          # below conf
    preds = np.concatenate([boxes, scores], -1)[None]

    ob, osc, ocl = _oracle_30k(preds, conf, iou_thr, max_det)
    res = batched_nms(jnp.asarray(preds), conf_thres=conf,
                      iou_thres=iou_thr, max_det=max_det, max_nms=256,
                      ranking="exact", envelope=True)
    n = int(res["count"][0])
    assert int(res["n_above_conf"][0]) == 500 > 256  # budget exceeded...
    assert n == max_det                              # ...but max_det filled
    np.testing.assert_array_equal(np.asarray(res["classes"][0][:n]), ocl)
    np.testing.assert_allclose(np.asarray(res["scores"][0][:n]), osc,
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(res["boxes"][0][:n]), ob,
                               rtol=1e-6, atol=1e-3)


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
