"""Pallas VMEM-resident greedy-keep kernel for batched NMS.

The XLA suppression path (ops/nms.py::_greedy_keep) runs a Jacobi
fixpoint of the greedy recurrence in which XLA chooses to RECOMPUTE the
(K, K) IoU mask inside every fixpoint iteration (materializing it once
in HBM was measured slower — BENCH.md round-3 rejections: the mask is
256 MB at bs128/K2048, so recompute beats an HBM round-trip). On-chip
the trade inverts: a K<=1024 bf16 mask is 2 MB — it fits VMEM — so this
kernel builds each image's mask ONCE in a VMEM scratch and runs the
fixpoint as (1, K) x (K, K) MXU matvecs over it, paying the O(K^2) IoU
arithmetic once instead of once per iteration (~5-15 iterations on real
scenes).

Exactness: identical keep set to _greedy_keep/_tri_fixpoint, bit for
bit. The mask entries use the same f32 per-axis-overlap IoU arithmetic
and the same `iou > thr & same_class & j < i & valid[j]` predicate; the
fixpoint step computes any(mask & keep) as a 0/1 bf16 matvec with f32
accumulation (exact for K <= 2048 terms, so `> 0` is precisely `any`),
which is the same formulation the XLA path uses; and both iterate to
convergence of the same monotone recurrence, whose fixpoint is the
unique exact sorted-greedy solution (suppression flows only from
higher-ranked to lower-ranked candidates, so the dependency DAG is
acyclic). Reference semantics: utils/util.py:123-169 (torchvision
class-offset greedy NMS, expressed here without the coordinate-offset
trick — class equality is tested directly).

Layout notes: the kernel wants killer coordinates as (bk, 1) columns
and victim coordinates as (1, K) rows. In-kernel transposes of vector
rows are awkward on TPU, so the caller ships the candidate geometry
TWICE — boxes as (B, 4, K) for victim rows and (B, K, 4) for killer
columns, cls/valid as (B, K) rows plus (B, K, 1) columns. The duplicate
transfer is ~16 KB/image — noise against the 2 MB mask build it feeds.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mask rows built per pass: bounds the (bk, K) f32 elementwise
# intermediates of the IoU build to ~1 MB each at K=1024.
_ROW_BLOCK = 256


def _nms_keep_kernel(boxes_r, boxes_c, cls_r, cls_c, valid_r, valid_c,
                     keep_out, mask_s, keep_s, *, k: int, bk: int,
                     iou_thres: float):
    """One image per grid cell.

    boxes_r: (1, 4, K) f32   victim coordinates as rows
    boxes_c: (1, K, 4) f32   killer coordinates as columns
    cls_r:   (1, 1, K) i32   victim classes
    cls_c:   (1, K, 1) i32   killer classes
    valid_r: (1, 1, K) u8    above-conf candidates
    valid_c: (1, K, 1) u8    killer validity
    keep_out:(1, 1, K) u8    (row dims of rank-2 (B, K) blocks would
                             violate Mosaic's 8/128 block tiling rule;
                             a leading singleton makes every blocked
                             dim equal its array dim)
    mask_s:  (K, K)   bf16   VMEM scratch — suppression mask
    keep_s:  (1, K)   bf16   VMEM scratch — fixpoint iterate
    """
    vx1 = boxes_r[0, 0:1, :]                       # (1, K) victim x1
    vy1 = boxes_r[0, 1:2, :]
    vx2 = boxes_r[0, 2:3, :]
    vy2 = boxes_r[0, 3:4, :]
    varea = jnp.clip(vx2 - vx1, 0) * jnp.clip(vy2 - vy1, 0)
    vcls = cls_r[0, 0:1, :]                        # (1, K) i32
    vvalid = valid_r[0, 0:1, :]                    # (1, K) u8

    col = jax.lax.broadcasted_iota(jnp.int32, (bk, k), 1)

    # Build the mask once, bk killer rows at a time (Python-unrolled:
    # k, bk are static). mask[j, i] = killer j suppresses victim i.
    for rb in range(k // bk):
        s = slice(rb * bk, (rb + 1) * bk)
        kx1 = boxes_c[0, s, 0:1]                   # (bk, 1) killer x1
        ky1 = boxes_c[0, s, 1:2]
        kx2 = boxes_c[0, s, 2:3]
        ky2 = boxes_c[0, s, 3:4]
        iw = jnp.clip(jnp.minimum(kx2, vx2) - jnp.maximum(kx1, vx1), 0)
        ih = jnp.clip(jnp.minimum(ky2, vy2) - jnp.maximum(ky1, vy1), 0)
        inter = iw * ih                            # (bk, K) f32
        karea = jnp.clip(kx2 - kx1, 0) * jnp.clip(ky2 - ky1, 0)
        iou = inter / (karea + varea - inter + 1e-12)
        # j < i over GLOBAL ranks: killer j = rb*bk + row, victim i = col
        tri = col > (jax.lax.broadcasted_iota(
            jnp.int32, (bk, k), 0) + rb * bk)
        hit = (iou > iou_thres) & (cls_c[0, s, :] == vcls) & tri \
            & (valid_c[0, s, :] != 0)
        mask_s[s, :] = hit.astype(jnp.bfloat16)

    # Jacobi fixpoint on the VMEM-resident mask. Scalar-only carry
    # (Mosaic cannot legalize vector loop carries — topk_pallas note);
    # the iterate lives in the keep_s scratch ref.
    keep_s[0:1, :] = (vvalid != 0).astype(jnp.bfloat16)

    def cond(state):
        changed, it = state
        return changed & (it < k)

    def body(state):
        _, it = state
        keep = keep_s[0:1, :]                      # (1, K) bf16 0/1
        sup = jnp.dot(keep, mask_s[:, :],
                      preferred_element_type=jnp.float32)  # (1, K)
        new = jnp.where(sup > 0, jnp.bfloat16(0), (vvalid != 0)
                        .astype(jnp.bfloat16))
        # convergence flag as an f32 |delta| sum (exact on 0/1 values):
        # Mosaic cannot legalize an any() reduction of an i1 vector to
        # a scalar ("invalid relayout ... vector<1x1024xi1>")
        delta = jnp.sum(jnp.abs(new.astype(jnp.float32)
                                - keep.astype(jnp.float32)))
        keep_s[0:1, :] = new
        return delta > 0, it + 1

    jax.lax.while_loop(cond, body,
                       (jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    # f32 cast before the compare: Mosaic rejects bf16 comparisons on
    # this target ("Target does not support this comparison")
    keep_out[0, 0:1, :] = (keep_s[0:1, :].astype(jnp.float32)
                           > 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def greedy_keep_pallas(cand_boxes, cls_idx, valid, iou_thres: float,
                       interpret: bool = False):
    """Exact sorted-greedy keep mask, one VMEM-resident kernel per image.

    Args:
      cand_boxes: (B, K, 4) f32 xyxy, score-descending.
      cls_idx: (B, K) int32.
      valid: (B, K) bool.
    Returns:
      keep: (B, K) bool — bit-identical to ops/nms.py::_greedy_keep.
    """
    b, k, _ = cand_boxes.shape
    bk = min(_ROW_BLOCK, k)
    boxes_r = jnp.swapaxes(cand_boxes, 1, 2)       # (B, 4, K)
    cls_c = cls_idx[..., None]                     # (B, K, 1)
    valid_u8 = valid.astype(jnp.uint8)
    keep = pl.pallas_call(
        functools.partial(_nms_keep_kernel, k=k, bk=bk,
                          iou_thres=iou_thres),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.uint8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, k), jnp.bfloat16),
            pltpu.VMEM((1, k), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * (20 * k * k + 10 * 2 * k * k),
            bytes_accessed=b * (k * 4 * 4 * 2 + k * 16),
            transcendentals=0,
        ),
        interpret=interpret,
    )(boxes_r, cand_boxes, cls_idx[:, None, :], cls_c,
      valid_u8[:, None, :], valid_u8[..., None])
    return keep[:, 0, :] != 0


# Opt-in control (tools/infer_bench.py --pallas-nms / --check-pallas-nms):
# None = default policy (OFF — measured and rejected, see use_pallas_nms);
# True = force the kernel on (subject to shape/backend constraints);
# False = explicit off. Read at trace time, so set it before the jitted
# callable's first call.
_FORCE: bool | None = None


def force_pallas_nms(mode: bool | None) -> None:
    global _FORCE
    _FORCE = mode


def use_pallas_nms(k: int) -> bool:
    """Default OFF — measured and REJECTED as the production policy
    (2026-08-19, interleaved best-of-3 A/B at the bs128/K1024 serving
    config, tools/infer_bench.py [--no-pallas-nms]): 6,329/6,491 img/s
    with the kernel vs 6,485/6,597 with the XLA fixpoint (~-1.6%). The
    premise was wrong: a serving-step profile shows the two tiled
    fixpoint while-loops cost only ~0.5 ms/batch at K=1024 (while.4 +
    while.5, 0.506 ms/batch — convergence takes few iterations and
    XLA's recompute-the-IoU-per-iteration schedule is cheap at 512-wide
    tiles), so there was never multi-ms mask-rebuild work to save, and
    the kernel's per-image grid serialization (128 sequential cells vs
    one batched program) costs more than VMEM residency returns. Kept
    as an opt-in (force_pallas_nms(True)) with on-chip bit-parity
    asserted by tools/infer_bench.py --check-pallas-nms; re-measure if
    a deployment raises iteration counts (dense same-class scenes) or
    drops batch size.

    When forced on, still gated to single-device TPU programs (same
    rationale as topk_pallas.use_pallas_topk: pallas_call has no SPMD
    partitioning rule, so multi-chip programs keep the XLA
    formulation) and to where the (K, K) bf16 mask scratch plus the
    IoU-build intermediates fit comfortably in ~16 MB VMEM: K <= 1024
    covers the serving default; the K = 2048 eval envelope's 8 MB mask
    leaves too little for the (256, K) build blocks. K must also tile
    the row-block loop evenly."""
    if _FORCE is not True:
        return False
    return (k <= 1024 and k >= 256 and k % _ROW_BLOCK == 0
            and jax.default_backend() == "tpu"
            and len(jax.devices()) == 1)
