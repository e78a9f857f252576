"""Pallas one-read top-k selection mask for the TAL assigner.

The assigner needs the set of the k=10 highest-metric anchors per GT
row (reference util.py:682-696). The XLA path (_topk_mask_by_argmax in
train/loss.py) runs k iterated argmax+ban passes; each pass re-reads
the full (B, N, A) f32 metric from HBM, so the loop costs ~k full-plane
reads (~9.5 ms/step at bs128/N64/A8400 — the largest single item in
the loss pipeline, BENCH.md roofline). This kernel DMAs each row block
into VMEM once and runs the same k argmax+ban iterations on-chip:
HBM traffic drops from ~k·|x| to |x| + |mask|.

Exactness: per iteration the kernel computes the row max of the
ban-masked values and selects the FIRST index attaining it
(min over `where(v == max, iota, A)`), which is jnp.argmax's
tie-break; the selected set is therefore bit-identical to the scan's
(and to lax.top_k's lower-index tie preference). No arithmetic is
performed on the metric values — comparisons only — so there is no
rounding concern. (NaN metrics would diverge from argmax semantics;
the align metric is a product of clipped finite terms, and the
trainer's divergence guard owns the NaN case.)

The assigner sits entirely under stop_gradient (train/loss.py:274-278),
so the kernel needs no VJP. CPU/tests use the XLA scan (or
interpret=True here); the compiled kernel runs on TPU backends only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_block(n: int, a: int) -> int:
    """Rows per grid cell: keep the f32 block near ~1 MiB of VMEM
    (the working set is ~3x the block: values, iota, masked plane)."""
    target = max(1, (1 << 20) // (4 * a))
    if target >= n:
        return n
    bn = max(8, (target // 8) * 8)
    return min(bn, n)


def _topk_mask_kernel(x_ref, o_ref, *, k: int):
    x = x_ref[0]                                       # (bn, A) f32
    bn, a = x.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (bn, a), 1)

    # Python-unrolled (k is static, 10): Mosaic cannot legalize an
    # scf.for whose carry is a full (bn, a) vector; straight-line
    # code keeps everything in registers/VMEM.
    ban = jnp.zeros((bn, a), jnp.bool_)
    for _ in range(k):
        v = jnp.where(ban, -jnp.inf, x)
        m = jnp.max(v, axis=-1, keepdims=True)
        first = jnp.min(jnp.where(v == m, iota, a), axis=-1, keepdims=True)
        ban = ban | (iota == first)
    o_ref[0] = ban.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_mask(x, k: int, interpret: bool = False):
    """Bool mask of the k largest entries along the last axis of a
    (B, N, A) f32 array; ties break toward the lower index (argmax /
    lax.top_k semantics). One HBM read of x total.

    Args:
      x: (B, N, A) float32 metric.
      interpret: run in the Pallas interpreter (CPU testing only).
    Returns:
      (B, N, A) bool.
    """
    b, n, a = x.shape
    bn = _row_block(n, a)
    grid = (b, pl.cdiv(n, bn))
    out = pl.pallas_call(
        functools.partial(_topk_mask_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((b, n, a), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec((1, bn, a), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bn, a), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=5 * k * x.size,
            bytes_accessed=x.size * x.dtype.itemsize + x.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return out != 0


def use_pallas_topk() -> bool:
    """Compiled kernel only on single-device TPU programs (same
    allowlist rationale as attention_pallas.use_pallas_attention, plus
    a pjit constraint): CPU tests and any other backend use the XLA
    scan, and a multi-chip mesh must too — pallas_call lowers to a
    custom call with no SPMD partitioning rule, so inside a pjit
    program over >1 device the partitioner would replicate its
    operands (an all-gather of the (B, N, A) metric) or reject the
    program outright. Single chip is where the serving/train bench
    path runs; the pod-scale train step keeps the scan formulation."""
    return jax.default_backend() == "tpu" and len(jax.devices()) == 1
