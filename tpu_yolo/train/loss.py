"""Task-aligned assignment + detection loss (BCE cls / CIoU box / DFL).

Functional JAX counterpart of reference utils/util.py:643-735 (Assigner)
and 798-930 (BoxLoss, ComputeLoss). The reference leans on boolean
fancy-indexing and scatter_add_ over dynamic shapes; here everything is
full-shape masked arithmetic over static (B, N, A) tensors — the same
tensors the reference materializes anyway — so the whole loss jits into
one XLA program with zero host sync.

Semantics parity notes:
  * align metric = score^0.5 * CIoU^6, top-k 10, k-duplicate zeroing via
    scatter-count (util.py:682-696) including the quirk that padded GT
    rows scatter all ten hits onto anchor 0 (count>1 -> zeroed);
  * multi-GT anchors resolved to the max-overlap GT (util.py:698-707);
  * target scores one-hot * normalized align metric (util.py:710-733);
  * DFL is weighted two-hot cross-entropy over 16 bins with targets
    clamped to reg_max-1-0.01 (util.py:810-828, BoxLoss(m.ch-1));
  * losses are sum-reduced / max(target_scores.sum(), 1) with gains
    box 7.5 / cls 0.5 / dfl 1.5 (utils/args.yaml:6-8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.ops.anchors import make_anchors
from tpu_yolo.ops.boxes import ciou


def build_padded_targets(targets: dict, batch_size: int, max_gt: int,
                         input_hw) -> np.ndarray:
    """Host-side: flat ragged targets -> padded (B, max_gt, 5) array of
    [cls, x1, y1, x2, y2] in pixels (reference util.py:879-900).

    `targets` is the collate output: cls (T,1), box (T,4) normalized
    cxcywh, idx (T,). Rows beyond an image's count are zero (mask by
    box-sum>0, as the reference does).
    """
    h, w = input_hw
    out = np.zeros((batch_size, max_gt, 5), dtype=np.float32)
    idx = np.asarray(targets["idx"]).astype(np.int32).reshape(-1)
    cls = np.asarray(targets["cls"], dtype=np.float32).reshape(-1)
    box = np.asarray(targets["box"], dtype=np.float32).reshape(-1, 4)
    if len(idx) == 0:
        return out
    scale = np.array([w, h, w, h], dtype=np.float32)
    px = box * scale
    xy1 = px[:, :2] - px[:, 2:] / 2
    xy2 = px[:, :2] + px[:, 2:] / 2
    for b in range(batch_size):
        rows = np.nonzero(idx == b)[0][:max_gt]
        n = len(rows)
        out[b, :n, 0] = cls[rows]
        out[b, :n, 1:3] = xy1[rows]
        out[b, :n, 3:5] = xy2[rows]
    return out


# Memory governor for the assigner's dense (B, N, A) planes: above this
# many elements per plane (f32: 640 MB at the 160M threshold; ~6 planes
# live inside one fused assign), the batch is processed in image chunks
# via lax.map — identical results (the assignment is per-image), bounded
# peak HBM. 160M keeps bs128/N64/A8400 (68.8M) in the fast unchunked
# path (chunking cost two serialized lax.map chunks ~8.6 ms/step,
# BENCH.md) while bs128/N512 (550M, the round-1 memory cliff,
# PARITY.md) still runs chunked and bs256+remat still fits.
ASSIGN_ELEM_BUDGET = 160 * 1024 * 1024


def _topk_mask_by_argmax(x, k: int):
    """Bool mask of the k largest entries along the last axis (ties ->
    lower index, as lax.top_k breaks them) — computed as k argmax+mask
    passes, which XLA executes as cheap reduce-maxes instead of the
    full sort it lowers top_k to. The selected set IS the scan's ban
    carry, so no index materialization/scatter is needed."""
    def body(ban, _):
        # carry a bool ban-mask (1 byte/elem) instead of rewriting the
        # f32 values each pass: the where fuses into the argmax reduce,
        # so a pass reads vals+ban and writes only the ban update —
        # ~2x less HBM traffic than masking the values (profiled
        # 2026-08-17, the scan was ~24 ms/step at bs128)
        idx = jnp.argmax(jnp.where(ban, -jnp.inf, x), axis=-1)
        hit = jax.nn.one_hot(idx, x.shape[-1], dtype=bool)
        return ban | hit, None

    ban, _ = jax.lax.scan(body, jnp.zeros(x.shape, bool), None, length=k)
    return ban


def task_aligned_assigner(pd_scores, pd_bboxes, anchors_px, gt_labels,
                          gt_bboxes, mask_gt, *, num_classes: int,
                          top_k: int = 10, alpha: float = 0.5,
                          beta: float = 6.0, eps: float = 1e-9,
                          elem_budget: int | None = None):
    """Assign GT boxes to anchors by task-aligned metric.

    Args:
      pd_scores: (B, A, nc) sigmoid class scores.
      pd_bboxes: (B, A, 4) predicted xyxy, pixels.
      anchors_px: (A, 2) anchor centers, pixels.
      gt_labels: (B, N, 1); gt_bboxes: (B, N, 4) xyxy pixels (zero rows pad);
      mask_gt: (B, N, 1) 1.0 for real boxes.
      elem_budget: override ASSIGN_ELEM_BUDGET (tests force tiny values
        to exercise the chunked path on small shapes).
    Returns:
      target_bboxes (B, A, 4), target_scores (B, A, nc), fg_mask (B, A) bool.
    """
    b, n, _ = gt_bboxes.shape
    a = anchors_px.shape[0]

    budget = ASSIGN_ELEM_BUDGET if elem_budget is None else elem_budget
    if b * n * a > budget:
        chunk = max(min(budget // (n * a), b), 1)
        while b % chunk:  # largest divisor of b under the budget
            chunk -= 1
        kw = dict(num_classes=num_classes, top_k=top_k, alpha=alpha,
                  beta=beta, eps=eps, elem_budget=b * n * a)  # no re-chunk
        split = lambda t: t.reshape(b // chunk, chunk, *t.shape[1:])
        outs = jax.lax.map(
            lambda c: task_aligned_assigner(c[0], c[1], anchors_px,
                                            c[2], c[3], c[4], **kw),
            (split(pd_scores), split(pd_bboxes), split(gt_labels),
             split(gt_bboxes), split(mask_gt)))
        return jax.tree_util.tree_map(
            lambda t: t.reshape(b, *t.shape[2:]), outs)

    # anchors strictly inside each gt box
    lt = gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:]
    deltas = jnp.concatenate((anchors_px[None, None] - lt,
                              rb - anchors_px[None, None]), axis=-1)
    mask_in_gts = deltas.min(-1) > eps                        # (B, N, A)
    gt_mask = mask_in_gts & (mask_gt > 0)                     # (B, N, A)

    # per-gt class scores at every anchor
    labels = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, num_classes - 1)
    scores_t = jnp.swapaxes(pd_scores, 1, 2)                  # (B, nc, A)
    bbox_scores = jnp.take_along_axis(scores_t, labels[:, :, None], axis=1)
    bbox_scores = jnp.where(gt_mask, bbox_scores, 0.0)        # (B, N, A)

    # CIoU overlap of every (gt, anchor-pred) pair, clamped to >= 0
    overlaps = ciou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :])[..., 0]
    overlaps = jnp.where(gt_mask, jnp.clip(overlaps, 0.0), 0.0)

    align = (bbox_scores ** alpha) * (overlaps ** beta)       # (B, N, A)

    # top-k anchors per gt. Selection is k iterated argmax+mask passes
    # rather than jax.lax.top_k: XLA lowers top_k to a full O(A log A)
    # sort that measured 36.5 ms/step at bs64 (the single most
    # expensive op in the train step, profiler trace 2026-08-16); k
    # reduce-max passes are ~10x cheaper and bit-identical (argmax and
    # top_k both break ties toward the lower index).
    #
    # The reference's duplicate-count rule (util.py:682-696: scatter
    # the k indices, zero counts > 1) reduces to masking the scan's own
    # ban carry by row validity: for a real GT row the k picks are
    # necessarily DISTINCT (picked entries are banned to -inf and
    # A > k), so every count is exactly 1 and the count==1 set IS the
    # ban mask; for a padded row the reference quirk forces all k
    # indices to 0, making count==k>1 at anchor 0 and 0 elsewhere —
    # an all-zero row, i.e. exactly `& mask_gt`. Replacing the
    # (B, N, A) s32 scatter+compare with the carry reuse therefore
    # selects the identical mask (loss goldens + 4-step trajectory pin
    # this; scalar loss sums can still drift in the last ulps because
    # the new program fuses/reassociates reductions differently) and
    # deletes a full-plane materialization: interleaved A/B 1,023 vs
    # 1,012 img/s at bs128 (+1.1%, 2026-08-18).
    from tpu_yolo.ops.topk_pallas import topk_mask, use_pallas_topk
    if use_pallas_topk():
        # One-read fused kernel: identical selection (comparisons only,
        # argmax tie-break reproduced exactly), ~k x less HBM traffic
        # than the scan (ops/topk_pallas.py).
        selected = topk_mask(align, top_k)
    else:
        selected = _topk_mask_by_argmax(align, top_k)
    mask_topk = (selected & (mask_gt > 0)).astype(align.dtype)

    mask_pos = mask_topk * mask_in_gts.astype(align.dtype) * mask_gt  # (B, N, A)

    # anchors claimed by several gts -> keep the max-overlap gt
    fg_count = mask_pos.sum(-2)                               # (B, A)
    best_gt = jnp.argmax(overlaps, axis=1)                    # (B, A)
    is_best = jax.nn.one_hot(best_gt, n, axis=1, dtype=mask_pos.dtype)
    mask_pos = jnp.where((fg_count[:, None, :] > 1), is_best, mask_pos)
    fg_mask = mask_pos.sum(-2) > 0                            # (B, A) bool

    # Gather each anchor's assigned gt by contracting against mask_pos
    # (exactly one 1.0 per fg anchor after the best-gt resolution above)
    # instead of argmax + take_along_axis: those lowered to scalar-core
    # gathers (4.4 ms/step at bs64, profiler trace 2026-08-16); the
    # contraction is a VPU/MXU reduce over N. fg values are exact
    # (x*1 + zeros); non-fg anchors get 0s where the gather fetched gt
    # row 0 — both are masked out by fg_mask everywhere downstream, and
    # all-zero boxes are already the padded-row domain ciou handles.
    tgt_labels = (mask_pos * labels[:, :, None].astype(mask_pos.dtype)) \
        .sum(-2).astype(jnp.int32)                            # (B, A)
    # HIGHEST precision: the TPU default matmul path multiplies in bf16,
    # which would quantize pixel coordinates (~2.5px at 640)
    target_bboxes = jnp.einsum("bna,bnc->bac", mask_pos, gt_bboxes,
                               precision=jax.lax.Precision.HIGHEST)

    target_scores = jax.nn.one_hot(tgt_labels, num_classes, dtype=jnp.float32)
    target_scores = jnp.where(fg_mask[..., None], target_scores, 0.0)

    # normalize by per-gt peak alignment (util.py:729-733)
    align = align * mask_pos
    pos_align = align.max(-1, keepdims=True)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align * pos_overlap / (pos_align + eps)).max(-2)[..., None]  # (B, A, 1)
    target_scores = target_scores * norm

    return target_bboxes, target_scores, fg_mask


def _dfl_loss(dist_logits, target, reg_max: int):
    """Weighted two-hot cross-entropy over distance bins.

    dist_logits: (B, A, 4, reg_max); target: (B, A, 4) in [0, reg_max-1).
    Returns (B, A) mean over the 4 coordinates.
    """
    # f32 here regardless of the caller's compute dtype (the convert
    # fuses into the log-softmax kernel; loss math is f32 everywhere)
    logp = jax.nn.log_softmax(dist_logits.astype(jnp.float32), axis=-1)
    tl = jnp.floor(target).astype(jnp.int32)
    wr = target - tl
    wl = 1.0 - wr
    # Two-hot weights as a dense (B, A, 4, reg_max) mask-and-reduce
    # instead of two take_along_axis gathers: XLA executed those as
    # scalar-core gathers (2x 35.7 ms/step at bs64 — the top cost in the
    # whole train step, profiler trace 2026-08-16); the dense form is a
    # VPU elementwise+reduce over only reg_max=16 lanes. Weights are the
    # same wl/wr values at the same bins, and summing the 14 exact zeros
    # is exact, so the loss is bit-identical.
    k = jnp.arange(reg_max, dtype=jnp.int32)
    w = (wl[..., None] * (tl[..., None] == k)
         + wr[..., None] * (tl[..., None] + 1 == k))
    return -(logp * w).sum(-1).mean(-1)


def detection_loss(raw_maps, gt, hyp: dict, cfg: ModelConfig):
    """Full training loss from raw per-level maps.

    Args:
      raw_maps: list of 3 NHWC maps (B, H/s, W/s, 4*reg_max + nc).
      gt: (B, N, 5) padded [cls, x1, y1, x2, y2] pixel targets.
      hyp: dict with 'box'/'cls'/'dfl' gains.
    Returns:
      (loss_box, loss_cls, loss_dfl) scalars (per-reference scaling:
      sum / max(target_scores_sum, 1), gains applied).
    """
    nc, reg = cfg.num_classes, cfg.reg_max
    bsz = raw_maps[0].shape[0]
    input_hw = (raw_maps[0].shape[1] * cfg.strides[0],
                raw_maps[0].shape[2] * cfg.strides[0])

    # Split in compute dtype (one shared .astype(f32) on `flat`
    # materialized the (B, A, 144) f32 copy in HBM, 619 MB at bs128),
    # then ONE f32 cast per half. The cast must be shared, not fused
    # into each consumer: pred_dist fans out to dfl_expectation AND
    # _dfl_loss, and with per-consumer casts their backward cotangents
    # are each rounded to bf16 and summed in bf16 at the fan-out —
    # measured to destabilize training (toy SPMD run diverges 16 → 74
    # in 5 steps; BENCH.md round-3 note). A shared cast keeps that
    # cotangent sum in f32 (1,005 vs 1,018 img/s, the stability price).
    # Slice each level BEFORE concatenating: the single (B, A, 144)
    # bf16 `flat` intermediate forced per-level layout-copy pairs
    # around its concat (profiled ~7.5 ms for concat+split+casts at
    # bs128); per-half concats let XLA fuse reshape+slice+cast into
    # the two f32 writes the loss needs anyway.
    #
    # Measured and REJECTED (interleaved A/B, train_bench bs128,
    # 2026-08-19): a fully PER-LEVEL pipeline — per-level shared f32
    # dist casts feeding per-level dfl_expectation + DFL partial sums,
    # cls kept bf16 with the BCE casting on the fly per level and the
    # assigner input built once under stop_gradient — deleted this
    # block's concats and f32 materializations (profiled at ~9.3
    # ms/step together) yet measured 1,058/1,061 img/s vs 1,070/1,075
    # for this form: the three narrow per-level programs lose more to
    # worse fusion/layout choices than the deleted copies cost. Same
    # lesson as the mask_in_gts rejection: per-line profile
    # attributions include fused neighbors — deleting the op does not
    # delete the time.
    # named_scope tags are trace-time metadata only (profiler
    # attribution for the BENCH.md train-step bound table); they change
    # no compiled code.
    with jax.named_scope("loss/prep"):
        levels = [m.reshape(bsz, -1, cfg.no) for m in raw_maps]
        nd = 4 * reg
        pred_dist = jnp.concatenate([m[..., :nd] for m in levels],
                                    axis=1).astype(jnp.float32)
        pred_cls = jnp.concatenate([m[..., nd:] for m in levels],
                                   axis=1).astype(jnp.float32)

    anchors, stride_t = make_anchors(input_hw, cfg.strides)
    anchors = jnp.asarray(anchors)                            # (A, 2) grid units
    stride_t = jnp.asarray(stride_t)                          # (A, 1)

    # decode boxes in grid units (expectation over the bin distribution)
    # via the fused Σe·j/Σe form — softmax @ arange is a dot, which
    # forces the (B, A, 4, reg) f32 prob tensor through HBM (275 MB at
    # bs128/640, and again in the backward); same math as
    # ops/boxes.py::dfl_expectation
    from tpu_yolo.ops.boxes import dfl_expectation
    with jax.named_scope("loss/decode"):
        dist = dfl_expectation(pred_dist.reshape(bsz, -1, 4, reg), reg)
        lt, rb = jnp.split(dist, 2, axis=-1)
        pred_boxes = jnp.concatenate((anchors - lt, anchors + rb), axis=-1)  # (B, A, 4)

    gt_labels = gt[..., :1]
    gt_bboxes = gt[..., 1:5]
    mask_gt = (gt_bboxes.sum(-1, keepdims=True) > 0).astype(jnp.float32)

    with jax.named_scope("loss/assign"):
        target_bboxes, target_scores, fg_mask = task_aligned_assigner(
            jax.nn.sigmoid(jax.lax.stop_gradient(pred_cls)),
            jax.lax.stop_gradient(pred_boxes) * stride_t,
            anchors * stride_t,
            gt_labels, gt_bboxes, mask_gt, num_classes=nc)

    tss = jnp.maximum(target_scores.sum(), 1.0)

    # classification: BCE with logits, sum over everything
    with jax.named_scope("loss/cls"):
        bce = jnp.maximum(pred_cls, 0) - pred_cls * target_scores + \
            jnp.log1p(jnp.exp(-jnp.abs(pred_cls)))
        loss_cls = bce.sum() / tss

    # box + dfl on foreground anchors (masked; zero when no fg)
    fg = fg_mask.astype(jnp.float32)
    weight = target_scores.sum(-1) * fg                       # (B, A)
    tb_grid = target_bboxes / stride_t                        # grid units

    with jax.named_scope("loss/boxdfl"):
        iou = ciou(pred_boxes, tb_grid)[..., 0]               # (B, A)
        loss_box = (jnp.where(fg_mask, (1.0 - iou), 0.0)
                    * weight).sum() / tss

        tlt = anchors[None] - tb_grid[..., :2]
        trb = tb_grid[..., 2:] - anchors[None]
        dfl_target = jnp.clip(jnp.concatenate((tlt, trb), -1), 0,
                              reg - 1 - 0.01)
        dfl = _dfl_loss(pred_dist.reshape(bsz, -1, 4, reg), dfl_target,
                        reg)
        loss_dfl = (jnp.where(fg_mask, dfl, 0.0) * weight).sum() / tss

    return loss_box * hyp["box"], loss_cls * hyp["cls"], loss_dfl * hyp["dfl"]
