"""Batched, fixed-shape, on-device non-max suppression.

TPU-native replacement for reference utils/util.py:123-169, which loops
over images in Python and calls the torchvision C++/CUDA NMS kernel with
a host wall-clock bail-out. Here the whole batch is suppressed on device
with static shapes (XLA-compatible):

  1. multi-label expansion: every (anchor, class) pair is a candidate
     (reference util.py:147-148); candidates are ranked by one top_k over
     the flattened (A*nc) score matrix, budget `max_nms`, which also
     yields the score-descending order greedy NMS needs. The exact/eval
     path ranks through a provably-identical per-anchor pre-gate
     (_rank_candidates_pregated, 2.02x e2e); approx/serving ranks flat;
  2. suppression is matrix-form: one (K, K) boolean mask
     `mask[j, i] = IoU(j, i) > thr  and  j < i` over class-offset boxes
     (offset trick, reference util.py:160-161), then a Jacobi fixpoint
     of the greedy recurrence
        keep[i] = valid[i] and not any_j (mask[j, i] and keep[j]).
     The dependency graph is acyclic (strictly upper-triangular), so the
     iteration converges to the EXACT sorted-greedy solution in at most
     longest-suppression-chain steps (~5-15 in practice, vs the 300
     sequential argmax/suppress steps of a selection loop — this is the
     difference between 84 ms and a few ms per batch of 64);
  3. output is the first `max_det` kept candidates in score order, as a
     padded (B, max_det, 6)-equivalent struct + validity mask — no host
     sync, no data-dependent shapes, no time limit needed.

Selection equals the reference's whenever the candidate budget covers
all above-threshold candidates; any divergence is confined to boxes
ranked below the `max_nms`-th score (~0 effect on mAP: those sit at
conf ≈ threshold).

Candidate-envelope theorem (prefix property). Rank candidates by
(score desc, flat index asc). Suppression flows only from higher- to
lower-ranked candidates, so for every candidate inside the top-K the
keep decision depends exclusively on higher-ranked (hence also top-K)
candidates: the K-budget output is ALWAYS an exact prefix of the
reference's max_nms=30000-budget output (tests/test_nms_oracle.py::
test_envelope_prefix_property). The outputs are fully identical unless
BOTH (a) the image has more than K above-conf candidates AND (b) fewer
than max_det survive greedy suppression inside the top K — the
`envelope=True` flag emits the per-image above-conf count so callers
(eval/evaluator.py) can certify condition (a)&(b) per run instead of
assuming it (BENCH.md "Eval NMS candidate envelope").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_yolo.ops.boxes import xywh_to_xyxy

MAX_WH = 7680.0  # class-offset spacing (reference util.py:124)


def _split_candidate_index(top_idx, nc: int):
    """(anchor, class) from the flattened (A*nc) candidate index.

    s32 divide/modulo lower to the TPU scalar core (profiled 3.2 ms per
    bs128 batch for the 262k divisions); the f32 floor form runs on the
    VPU and is exact: i + 0.5 keeps the quotient ≥ 0.00625/nc away from
    every integer boundary, while the f32 rounding error is ≤ ~1e-3 for
    i < 2^23 — so floor() always lands on the true quotient."""
    f = jnp.floor((top_idx.astype(jnp.float32) + 0.5)
                  * jnp.float32(1.0 / nc))
    anchor_idx = f.astype(jnp.int32)
    cls_idx = top_idx - anchor_idx * nc
    return anchor_idx, cls_idx.astype(jnp.int32)


def _rank_candidates(flat, k: int, ranking: str, recall: float = 0.95):
    """Top-K candidate ranking over the flattened (B, A*nc) score matrix.

    Candidate ranking is the NMS cost center (full top_k over ~672k
    pairs is an O(n log n) device sort, ~83 ms at bs64 on v5e).

    ranking="exact"  — jax.lax.top_k: bit-exact candidate set; the
        default, so the eval/parity path (reference utils/util.py:123-169
        semantics) never depends on an approximation.
    ranking="approx" — TPU's bucketed jax.lax.approx_max_k: the opt-in
        serving knob (~3.6x NMS-path throughput at bs256, BENCH.md).
        Misses are confined to near-threshold candidates; measured
        final-detection agreement vs exact is recorded in BENCH.md
        ("approx vs exact ranking"). Falls back to exact off-TPU
        (approx_max_k only pays there) and for small candidate sets.
        `recall` is approx_max_k's recall_target; it sets the bucketed
        reduction's intermediate size, and the O(m log m) sort of that
        intermediate is the dominant ranking cost (2.9 ms/batch of the
        bs128 step at 0.95/K2048, profiler 2026-08-17): 0.95 -> m=42112,
        0.9 -> 21120, 0.8 -> 10624 for A*nc=672k. Object-level recall
        on clustered scenes at each setting is recorded in BENCH.md.
    """
    if ranking not in ("exact", "approx"):
        raise ValueError(f"ranking must be 'exact' or 'approx': {ranking!r}")
    n = flat.shape[-1]
    if ranking == "approx" and n > 4 * k and jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(flat, k, recall_target=recall)
    return jax.lax.top_k(flat, k)  # (B, K) desc


def _rank_candidates_pregated(scores3, k: int, ranking: str,
                              recall: float = 0.95):
    """Top-K (score, anchor, class) candidate ranking over a (B, A, nc)
    score tensor via a per-anchor pre-gate — the ranking cost center
    shrunk nc-fold before the expensive multi-label sort.

    Theorem (exact, ties included): rank candidates by
    (score desc, flat index asc) with flat index a*nc + c, and anchors
    by (max-class score desc, anchor index asc). If candidate (a, c) is
    among the global top-K candidates, then anchor a is among the top-K
    anchors: every anchor strictly preceding a in anchor order holds a
    candidate that strictly precedes (a, c) in candidate order — a
    higher max-score anchor holds a strictly higher-scored candidate,
    and an equal-max lower-index anchor holds an equal-scored candidate
    with a smaller flat index (b < a ⟹ b*nc + c' < a*nc + c for any
    c', c) — so a's anchor rank is bounded by (a, c)'s candidate rank.
    Selecting the top-K anchors (lax.top_k breaks ties toward the lower
    index, matching the anchor order above), re-sorting their ids
    ascending (so local flat order is order-isomorphic to global flat
    order), gathering their nc-wide score rows, and ranking the K*nc
    local candidates therefore reproduces the global top-K candidate
    selection EXACTLY, bit for bit, at ~1/nc of the sort input
    (672k → 82k for A=8400, nc=80, K=1024).

    With ranking="approx" both stages use approx_max_k (serving knob):
    an anchor-stage miss drops all nc candidates of that anchor, so the
    miss unit coarsens from candidate to anchor.

    Measured policy (bs128/640 v11-n, interleaved best-of-3 A/B via
    tools/infer_bench.py --no-pregate, 2026-08-18): the default is
    pregate for ranking="exact" ONLY. Exact/eval (K=2048): 873 → 1,768
    img/s e2e (+2.02x — the full 672k-candidate f32 sort becomes an
    8400-anchor sort + a 164k local sort). Approx/serving (K=1024):
    6,510 → 5,555 (-15% — approx_max_k's bucketed reduce is already
    cheap, and the (B, K, nc) row gather costs more than the smaller
    second reduce saves), so serving keeps the flat ranking.

    Returns (scores, anchor_idx, cls_idx), each (B, K), score-desc."""
    b, a, nc = scores3.shape
    anchor_max = jnp.max(scores3, axis=-1)                  # (B, A)
    if ranking == "approx" and a > 4 * k and \
            jax.default_backend() == "tpu":
        _, aidx = jax.lax.approx_max_k(anchor_max, k,
                                       recall_target=recall)
    else:
        _, aidx = jax.lax.top_k(anchor_max, k)
    aidx = jnp.sort(aidx, axis=-1)                          # (B, K) asc
    rows = jnp.take_along_axis(scores3, aidx[..., None], axis=1)
    # Measured and REJECTED (infer_bench exact A/B, 2026-08-18): carrying
    # the GLOBAL candidate index through the local sort as a custom
    # payload (stable ascending lax.sort on negated bf16 keys — same
    # (value desc, index asc) order as top_k) to remove the 262k-row
    # aidx[slot] gather below: 1,648 vs 2,084 img/s (-21%) — top_k's
    # specialized lowering beats a general stable two-operand sort by
    # far more than the 2.7 ms gather costs.
    scores, local_idx = _rank_candidates(rows.reshape(b, k * nc), k,
                                         ranking, recall)
    slot, cls_idx = _split_candidate_index(local_idx, nc)
    anchor_idx = jnp.take_along_axis(aidx, slot, axis=1)
    return scores, anchor_idx, cls_idx


def _rank_candidates_singlelabel(scores3, k: int, ranking: str,
                                 recall: float = 0.95):
    """One candidate per anchor — its argmax class — ranked by that
    class's score: the `multi_label=False` serving knob.

    The reference expands every (anchor, class) pair above conf into a
    candidate (util.py:147-148) and eval keeps that contract; standard
    production detectors instead emit each anchor's best class only.
    This drops the (B, A*nc) candidate ranking (the serving NMS cost
    center: bucketed reduce + 672k-element sort) to one fused
    max+argmax pass over (B, A, nc) plus an A-wide rank — and, unlike
    the per-anchor pre-gate (whose (B, K, nc) row gather made it a
    measured -15% on the approx path), gathers only the (B, K) argmax
    classes.

    Tie-breaks mirror the multi-label order: argmax picks the lowest
    class index, top_k/approx_max_k the lowest anchor index, exactly
    the (score desc, a*nc+c asc) candidate order restricted to one
    candidate per anchor.

    Returns (scores, anchor_idx, cls_idx), each (B, K), score-desc."""
    anchor_max = jnp.max(scores3, axis=-1)                  # (B, A)
    cls = jnp.argmax(scores3, axis=-1).astype(jnp.int32)    # (B, A)
    top, aidx = _rank_anchor_plane(anchor_max, k, ranking, recall)
    cls_idx = jnp.take_along_axis(cls, aidx, axis=1)
    return top, aidx, cls_idx


def _rank_anchor_plane(anchor_max, k: int, ranking: str, recall: float):
    """Top-K anchors of a (B, A) per-anchor score plane (ties -> lower
    anchor index; approx_max_k on TPU for the serving knob)."""
    a = anchor_max.shape[-1]
    if ranking == "approx" and a > 4 * k and \
            jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(anchor_max, k, recall_target=recall)
    return jax.lax.top_k(anchor_max, k)


@functools.partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "ranking", "approx_recall", "pregate", "multi_label", "envelope"))
def batched_nms(preds,
                conf_thres: float = 0.001,
                iou_thres: float = 0.65,
                max_det: int = 300,
                max_nms: int = 2048,
                ranking: str = "exact",
                approx_recall: float = 0.95,
                pregate: bool | None = None,
                multi_label: bool = True,
                envelope: bool = False):
    """NMS over decoded predictions.

    Args:
      preds: (B, A, 4+nc) — pixel xywh boxes + per-class scores in [0,1].
      ranking: "exact" (default, parity path) | "approx" (serving knob —
        see _rank_candidates).
      multi_label: True (default) keeps the reference's (anchor, class)
        candidate expansion (util.py:147-148) — the parity contract;
        False emits one candidate per anchor (its argmax class), the
        production-serving simplification (_rank_candidates_singlelabel).
      envelope: also emit "n_above_conf" (B,) int32 — the full candidate
        population above conf_thres — and "candidate_budget" () int32
        (the K actually ranked), so callers can certify the prefix
        theorem's spill condition (module docstring) per image.
    Returns dict of:
      boxes:  (B, max_det, 4) xyxy pixels
      scores: (B, max_det)
      classes:(B, max_det) int32
      valid:  (B, max_det) bool
      count:  (B,) int32 — number of valid detections
    """
    b, a, no = preds.shape
    nc = no - 4
    # The (K, K) suppression mask is the memory envelope; 8192² bool =
    # 64 MB/image. Capping is safe by the prefix theorem (module
    # docstring): the output is an exact prefix of the full-budget
    # reference output, identical unless >K candidates clear conf AND
    # <max_det survive inside the top K — certified per image via
    # envelope=True.
    k = min(max_nms, a * nc if multi_label else a, 8192)

    boxes_xywh = preds[..., :4]
    scores_all = preds[..., 4:]

    if pregate is None:
        pregate = ranking == "exact"   # measured policy — see
        # _rank_candidates_pregated docstring (2x exact, -15% approx)
    if not multi_label:
        top_scores, anchor_idx, cls_idx = _rank_candidates_singlelabel(
            scores_all, k, ranking, approx_recall)
    elif pregate and a > k:
        # Per-anchor pre-gate: provably the same top-K candidate set
        # (see _rank_candidates_pregated), ranked at 1/nc the sort size.
        top_scores, anchor_idx, cls_idx = _rank_candidates_pregated(
            scores_all, k, ranking, approx_recall)
    else:
        flat = scores_all.reshape(b, a * nc)
        top_scores, top_idx = _rank_candidates(flat, k, ranking,
                                               approx_recall)
        anchor_idx, cls_idx = _split_candidate_index(top_idx, nc)

    cand_boxes = jnp.take_along_axis(boxes_xywh, anchor_idx[..., None], axis=1)
    cand_boxes = xywh_to_xyxy(cand_boxes)                 # (B, K, 4)

    # Class-offset IoU mask + Jacobi fixpoint of the greedy recurrence
    # (exact on the acyclic suppression DAG) + compaction.
    res = _suppress(cand_boxes, top_scores, cls_idx, k,
                    conf_thres=conf_thres, iou_thres=iou_thres,
                    max_det=max_det)
    if envelope:
        pop = scores_all if multi_label else jnp.max(scores_all, axis=-1)
        res["n_above_conf"] = jnp.sum(
            pop > jnp.float32(conf_thres),
            axis=tuple(range(1, pop.ndim))).astype(jnp.int32)
        res["candidate_budget"] = jnp.full((), k, jnp.int32)
    return res


def nms_from_raw(raw_maps, cfg, input_hw,
                 conf_thres: float = 0.001,
                 iou_thres: float = 0.65,
                 max_det: int = 300,
                 max_nms: int = 2048,
                 ranking: str = "exact",
                 approx_recall: float = 0.95,
                 pregate: bool | None = None,
                 multi_label: bool = True,
                 envelope: bool = False):
    """Fused decode+NMS from raw per-level head maps — the production
    inference tail (models.forward_nms). Output semantics are identical
    to batched_nms(decode_predictions(raw)); the structure is shaped by
    a bs128 serving profile (2026-08-17, tools/infer_bench.py):

      * candidates are ranked on the raw class LOGITS, not on sigmoid
        scores: sigmoid is strictly increasing, so the top-K by logit IS
        the top-K by score (with strictly finer tie resolution where f32
        sigmoid saturates), and the (B, A, nc) f32 sigmoid
        materialization (344 MB at bs128/640) disappears — sigmoid runs
        on the K winners only. Both rankings run on the bf16 head maps
        directly: bf16 -> f32 is a monotone injection, so even "exact"
        selection (ties included) is identical to ranking an f32 cast
        at half the sort-key bytes (the pregated path; the rarely-hit
        small-A flat path still casts, where the cast is free anyway);
      * dist/cls are flattened per level, so the (B, A, 4*reg_max+nc)
        concat of the two-stage path is never materialized;
      * boxes are bulk-decoded for all anchors and then gathered per
        candidate: gathering (B, K, 4) decoded boxes beats gathering
        (B, K, 4*reg_max) logits and decoding candidates (~12% e2e,
        BENCH.md) — the gather cost is per-ROW (scalar core), so narrow
        rows win. The bulk decode runs PER LEVEL (round 4): the DFL
        expectation reduces 64 -> 4 lanes, so each level's result is
        small and the (B, A, 64) dist concat is never materialized
        (+1.5-2.5% serving, bit-identical — BENCH.md).

    Measured and rejected (bench.py A/B, 2026-08-17): ranking each head
    level separately with approx_max_k and merging the 3*K survivors
    with one small exact top_k — meant to skip the (B, A*nc) concat —
    dropped bs128 serving from 4,835 to 3,016 img/s: three narrower
    sorts + the index merge/gather cost far more than the concat copy
    they avoid, and the per-level slices break the head-map fusion the
    single flatten enjoys. The single global ranking stays.
    """
    from tpu_yolo.ops.anchors import make_anchors
    from tpu_yolo.ops.boxes import dfl_decode

    b = raw_maps[0].shape[0]
    nc = cfg.num_classes
    reg4 = 4 * cfg.reg_max
    a = sum(m.shape[1] * m.shape[2] for m in raw_maps)

    k = min(max_nms, a * nc if multi_label else a, 8192)
    if pregate is None:
        pregate = ranking == "exact"   # measured policy — see
        # _rank_candidates_pregated docstring (2x exact, -15% approx)
    if not multi_label:
        # One candidate per anchor (argmax class) on the raw bf16
        # logits — monotone in the sigmoid scores, ties as in the
        # multi-label order (_rank_candidates_singlelabel docstring).
        # Computed PER LEVEL straight off the head maps: the nc-wide
        # max/argmax fuses with each level's minor-axis slice, so the
        # multi-label path's (B, A*nc) ranking-operand concat (172 MB
        # at bs128/640) is never materialized — the levels only meet
        # at the tiny (B, A) planes. Bit-identical to reducing the
        # concatenated tensor (same values, same order, same
        # tie-breaks).
        maxs, args = [], []
        for m in raw_maps:
            c = m[..., reg4:].reshape(b, -1, nc)
            maxs.append(jnp.max(c, axis=-1))
            args.append(jnp.argmax(c, axis=-1).astype(jnp.int32))
        anchor_max = jnp.concatenate(maxs, axis=1)             # (B, A)
        cls_map = jnp.concatenate(args, axis=1)                # (B, A)
        top_logits, anchor_idx = _rank_anchor_plane(
            anchor_max, k, ranking, approx_recall)
        cls_idx = jnp.take_along_axis(cls_map, anchor_idx, axis=1)
    else:
        # Flatten each level's class block to 2D FIRST and concat on
        # the minor axis — element order is identical to
        # concat(level maps, axis=1).reshape(b, a*nc) (anchor-major,
        # class-minor, levels in order), but the 3D (B, A, nc) concat +
        # reshape lowered to a separate {0,1}->{1,0} transpose copy of
        # the 172 MB score matrix (profiled 0.5 ms/batch at bs128,
        # copy.185); the 2D concat writes the ranking operand in its
        # final layout.
        flat = jnp.concatenate([m[..., reg4:].reshape(b, -1)
                                for m in raw_maps], axis=1)   # (B, A*nc)
    if multi_label and pregate and a > k:
        # Per-anchor pre-gate: provably the same top-K candidate set
        # (see _rank_candidates_pregated), ranked at 1/nc the sort
        # size — the (B, A, nc) view of the 2D concat is a free
        # minor-axis split, so the single-flatten layout win above is
        # kept. The bf16 head logits are ranked DIRECTLY even for
        # "exact": bf16 -> f32 is a monotone injection, so comparisons
        # (ties included) are identical to ranking the f32 cast while
        # the sort keys move half the bytes; sigmoid runs in f32 on
        # the winners below.
        top_logits, anchor_idx, cls_idx = _rank_candidates_pregated(
            flat.reshape(b, a, nc), k, ranking, approx_recall)
    elif multi_label:
        if ranking == "exact":
            flat = flat.astype(jnp.float32)
        top_logits, top_idx = _rank_candidates(flat, k, ranking,
                                               approx_recall)
        anchor_idx, cls_idx = _split_candidate_index(top_idx, nc)
    top_scores = jax.nn.sigmoid(top_logits.astype(jnp.float32))

    n_above = None
    if envelope:
        # Above-conf candidate population, counted on the logits against
        # the exact sigmoid preimage log(c/(1-c)) — monotone-equivalent
        # to sigmoid(x) > c up to one f32 ulp at the boundary, which is
        # noise against the >K spill comparison this certifies (module
        # docstring / prefix theorem). One compare+reduce fused over the
        # already-materialized ranking operand: free next to the sort.
        import math
        c = min(max(conf_thres, 1e-12), 1.0 - 1e-12)
        thr = jnp.float32(math.log(c / (1.0 - c)))
        pop = flat if multi_label else anchor_max
        n_above = jnp.sum(pop.astype(jnp.float32) > thr,
                          axis=-1).astype(jnp.int32)

    anchors, stride_t = make_anchors(input_hw, cfg.strides)
    anchors = jnp.asarray(anchors, jnp.float32)          # (A, 2)
    stride_t = jnp.asarray(stride_t, jnp.float32)        # (A, 1)

    # Bulk-decode boxes PER LEVEL: the DFL expectation is a reduce over
    # reg_max bins, so each level's result is a small (B, A_l, 4) f32 —
    # the (B, A, 64) dist concat that used to feed one global decode
    # (86 MB bf16 write+read at bs128/640) is never materialized, and
    # the bin reduce fuses with the level's minor-axis slice (the same
    # per-level-reduction rule as the single-label ranking;
    # ARCHITECTURE §4). Bit-identical: same values, same per-anchor
    # arithmetic, same concat order.
    boxes, off = [], 0
    for m in raw_maps:
        al = m.shape[1] * m.shape[2]
        d = m[..., :reg4].reshape(b, al, reg4)
        boxes.append(dfl_decode(d, anchors[off:off + al], cfg.reg_max,
                                xywh=False) * stride_t[off:off + al])
        off += al
    boxes = jnp.concatenate(boxes, axis=1)               # (B, A, 4) f32
    cand_boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)

    res = _suppress(cand_boxes, top_scores, cls_idx, k,
                    conf_thres=conf_thres, iou_thres=iou_thres,
                    max_det=max_det)
    if envelope:
        res["n_above_conf"] = n_above
        res["candidate_budget"] = jnp.full((), k, jnp.int32)
    return res


def _pair_iou_mask(boxes_kill, cls_kill, boxes_vic, cls_vic, iou_thres):
    """(B, Kk, Kv) bf16 0/1 plane: killer k suppresses victim v
    (IoU > thr and same class). Per-axis overlap on raw boxes +
    class-equality (equivalent to the class-offset trick, reference
    util.py:160-161, without inflating coordinates): scalar planes
    only — no (B,K,K,2) vector intermediates for XLA to spill."""
    ax1, ay1, ax2, ay2 = (boxes_kill[..., i] for i in range(4))
    bx1, by1, bx2, by2 = (boxes_vic[..., i] for i in range(4))
    iw = jnp.clip(jnp.minimum(ax2[:, :, None], bx2[:, None, :])
                  - jnp.maximum(ax1[:, :, None], bx1[:, None, :]), 0)
    ih = jnp.clip(jnp.minimum(ay2[:, :, None], by2[:, None, :])
                  - jnp.maximum(ay1[:, :, None], by1[:, None, :]), 0)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0) * jnp.clip(ay2 - ay1, 0)
    area_b = jnp.clip(bx2 - bx1, 0) * jnp.clip(by2 - by1, 0)
    iou = inter / (area_a[:, :, None] + area_b[:, None, :] - inter + 1e-12)
    same_cls = cls_kill[:, :, None] == cls_vic[:, None, :]
    return ((iou > iou_thres) & same_cls)


def _tri_fixpoint(cand_boxes, cls_idx, valid, *, iou_thres):
    """Jacobi fixpoint of the greedy recurrence within one
    score-descending block: keep[i] = valid[i] and no kept j < i
    suppresses i. Exact on the acyclic (strictly upper-triangular)
    suppression DAG; converges in longest-chain iterations."""
    k = cand_boxes.shape[1]
    tri = jnp.arange(k)
    mask = (_pair_iou_mask(cand_boxes, cls_idx, cand_boxes, cls_idx,
                           iou_thres)
            & (tri[:, None] < tri[None, :]) & valid[:, :, None]
            ).astype(jnp.bfloat16)

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    def body(state):
        keep, _, it = state
        # any(mask & keep) as a 0/1 matmul: the reduction over K rides
        # the MXU instead of a VPU any-reduce over the (B, K, K) mask
        # (profiled 2.8 ms/iter -> sub-ms at bs128/K2048). Exact:
        # products are 0/1 in bf16 and the f32 accumulator is exact for
        # K <= 2048 terms, so >0 is precisely the original any().
        suppressed = jnp.einsum(
            "bk,bkj->bj", keep.astype(jnp.bfloat16), mask,
            preferred_element_type=jnp.float32) > 0
        new_keep = valid & ~suppressed
        return new_keep, jnp.any(new_keep != keep), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.asarray(True), jnp.asarray(0)))
    return keep


import os as _os

# Block count of the suppression decomposition (_greedy_keep). 2 is the
# measured default (round 3: the 8-tile sequential variant lost to
# per-tile overhead; 2 was the knee). Env-overridable for interleaved
# A/B sweeps (bit-identical at any value — the decomposition theorem in
# _greedy_keep's docstring holds per block count).
_SUPPRESS_TILES = int(_os.environ.get("TPU_YOLO_SUPPRESS_TILES", "2"))


def _greedy_keep(cand_boxes, cls_idx, valid, *, iou_thres, tiles=None):
    """Exact sorted-greedy keep mask, block-decomposed.

    Suppression only flows from higher-ranked to lower-ranked
    candidates, so the keep solution of the top tile is independent of
    everything below it; each later tile first applies the (now final)
    kept sets of all earlier tiles in ONE rectangular mask-dot per
    pair, then runs its own triangular fixpoint. Bit-identical to the
    single-block fixpoint (same pairwise IoU arithmetic, same
    thresholds) while doing roughly half the quadratic IoU work at
    tiles=2: the fixpoint re-evaluates its (K_t, K_t) block every
    iteration, and blocks are (K/t)^2 instead of K^2. The earlier
    8-tile sequential-greedy variant lost to per-tile while overhead
    (BENCH.md, 34.6 ms); two tiles is the overhead/coverage knee.
    Falls back to one block when K is small or indivisible.

    The cross-tile pass compiles to a fused IoU+select+reduce kLoop
    (select_reduce_fusion, 0.97 ms/batch at bs128/K2048). Measured and
    REJECTED against it (infer_bench A/B, 2026-08-17, control 5,508
    img/s): an optimization_barrier before the einsum to force a clean
    MXU dot (5,389 — materializing the 256 MB cross block costs more
    than the MXU saves), and folding keep_j into the killer boxes
    (non-kept -> degenerate (0,0,0,0), IoU exactly 0) with a plain
    jnp.any reduce instead of the dot (5,275 — the (B,t,t) any-reduce
    over the sublane axis is slower than the dot-shaped fusion)."""
    k = cand_boxes.shape[1]
    tiles = _SUPPRESS_TILES if tiles is None else tiles
    if tiles < 2 or k % tiles or (k // tiles) < 256:
        return _tri_fixpoint(cand_boxes, cls_idx, valid,
                             iou_thres=iou_thres)
    t = k // tiles
    keeps = []
    for i in range(tiles):
        sl = slice(i * t, (i + 1) * t)
        v = valid[:, sl]
        for j in range(i):
            slj = slice(j * t, (j + 1) * t)
            cross = _pair_iou_mask(
                cand_boxes[:, slj], cls_idx[:, slj],
                cand_boxes[:, sl], cls_idx[:, sl],
                iou_thres).astype(jnp.bfloat16)
            sup = jnp.einsum(
                "bk,bkj->bj", keeps[j].astype(jnp.bfloat16), cross,
                preferred_element_type=jnp.float32) > 0
            v = v & ~sup
        keeps.append(_tri_fixpoint(cand_boxes[:, sl], cls_idx[:, sl], v,
                                   iou_thres=iou_thres))
    return jnp.concatenate(keeps, axis=1)


def _suppress(cand_boxes, top_scores, cls_idx, k, *, conf_thres, iou_thres,
              max_det):
    """Shared suppression tail: class-offset mask + Jacobi fixpoint +
    compaction. cand_boxes are xyxy (B, K, 4), score-descending.

    Variants measured and rejected on the bs128/K2048 serving bench
    (2026-08-17): materializing the (B, K, K) bf16 mask once behind an
    optimization_barrier (29.0 ms vs 26.6 — XLA's choice to recompute
    the IoU inside the loop body wins at the few-iteration counts real
    ranking produces), and a tiled sequential-greedy scan that visits
    each pair exactly once (34.6 ms — eight sequential tile steps +
    per-tile while overhead dominate when suppression chains are
    short)."""
    # nan_to_num: identity for the finite values this path produces, but
    # without it a single non-finite candidate (diverged checkpoint,
    # corrupt input) would 0*inf=NaN-poison EVERY output row of its
    # image through the compaction matmul — the gather it replaced only
    # corrupted the one row that selected the bad box.
    cand_boxes = jnp.nan_to_num(cand_boxes, nan=0.0, posinf=0.0,
                                neginf=0.0)
    top_scores = jnp.nan_to_num(top_scores, nan=0.0, posinf=0.0,
                                neginf=0.0)
    valid = top_scores > conf_thres

    from tpu_yolo.ops.nms_pallas import greedy_keep_pallas, use_pallas_nms
    if use_pallas_nms(k):
        # Opt-in VMEM-resident kernel (force_pallas_nms(True)): builds
        # the (K, K) mask ONCE on-chip and iterates the fixpoint as MXU
        # matvecs. Bit-exact (interpret-mode equality tests + on-chip
        # np.array_equal via infer_bench --check-pallas-nms) but
        # measured ~-1.6% vs this XLA fixpoint at the serving config —
        # the default stays off (ops/nms_pallas.py use_pallas_nms).
        keep = greedy_keep_pallas(cand_boxes, cls_idx, valid, iou_thres)
    else:
        keep = _greedy_keep(cand_boxes, cls_idx, valid,
                            iou_thres=iou_thres)

    # Compaction (kept rows to the front, score order preserved) as a
    # selection-matrix matmul instead of a stable argsort over K: the
    # j-th output is the row whose running kept-count equals j+1, i.e.
    # sel[b, i, j] = (cumsum(keep)[b, i] == j+1) & keep[b, i] — at most
    # one hit per row, so the f32 matmul (HIGHEST precision on the MXU)
    # reproduces take_along_axis exactly. The full-K sort measured
    # ~4 ms/step at bs128/K2048 (profiler 2026-08-17). Built (B, K, M)
    # with the slot axis MINOR: the (B, M, K) orientation lowered to a
    # scalar-core fusion with T(1,128) layout costing 3.2 ms/batch
    # (profiler 2026-08-17); K-major puts the compare on the VPU and
    # feeds the dot's contracting dimension directly.
    cum = jnp.cumsum(keep.astype(jnp.int32), axis=1)          # (B, K)
    slots = jnp.arange(1, max_det + 1, dtype=jnp.int32)
    sel = ((cum[:, :, None] == slots[None, None, :])
           & keep[:, :, None]).astype(jnp.float32)            # (B, K, M)
    out_valid = slots[None, :] <= cum[:, -1:]
    # Boxes, score and class ride ONE selection matmul as 6 channels
    # (verified in the optimized HLO: a single f32[B,300,6] dot replaces
    # the three separate picks). Throughput-neutral on the bs128 bench
    # (4,842 vs 4,835 img/s — the picks were already sub-0.2 ms), kept
    # for the smaller program. Products are identical (≤1 hit per slot,
    # f32 HIGHEST), so outputs are bit-exact vs the separate picks;
    # the int32 class survives the f32 round-trip exactly (nc < 2^24).
    payload = jnp.concatenate(
        [cand_boxes, top_scores[..., None],
         cls_idx.astype(jnp.float32)[..., None]], axis=-1)    # (B, K, 6)
    out = jnp.einsum("bkj,bkc->bjc", sel, payload,
                     precision=jax.lax.Precision.HIGHEST)     # (B, M, 6)

    return {
        "boxes": out[..., :4],
        "scores": out[..., 4],
        "classes": jnp.where(out_valid,
                             out[..., 5].astype(jnp.int32), -1),
        "valid": out_valid,
        "count": out_valid.sum(axis=1).astype(jnp.int32),
    }


def nms_to_numpy(result, image_index: int):
    """Extract one image's detections as a dense (N, 6) array
    [x1, y1, x2, y2, score, cls] — the reference's per-image output shape
    (util.py:143)."""
    import numpy as np

    n = int(result["count"][image_index])
    out = np.zeros((n, 6), dtype=np.float32)
    out[:, :4] = np.asarray(result["boxes"][image_index][:n])
    out[:, 4] = np.asarray(result["scores"][image_index][:n])
    out[:, 5] = np.asarray(result["classes"][image_index][:n])
    return out
