"""Pallas fused attention for the C2PSA/PSA block.

The PSA attention (reference nets/nn.py:97-123) runs on the stride-32
feature map: T = (H/32)·(W/32) tokens (400 at 640px, 1600 at 1280px),
per-head dims dk = C/heads/2, dh = C/heads. The XLA path materializes
the (B, h, T, T) score tensor in HBM between the two matmuls; this
kernel keeps scores in VMEM and fuses QK^T -> softmax -> PV into one
pass per (batch·head, q-block) grid cell — the whole working set
(K, V, one q-block of scores) fits VMEM comfortably at every supported
resolution (<= ~6 MB at 1600px).

At these sequence lengths a full-row softmax per q-block is optimal:
no online-softmax bookkeeping (flash-style running max/sum) is needed
because the entire K/V fits on-chip; tiling is only over queries.

Used on the inference path (TPU backends); training and CPU fall back
to the einsum formulation in ops/blocks.py, which XLA differentiates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_q_block(t: int) -> int:
    for bq in (512, 400, 256, 128, 64, 32, 16, 8):
        if t % bq == 0 and bq <= t:
            return bq
    return t


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q: (1, bq, dk)  k: (1, T, dk)  v: (1, T, dh)  o: (1, bq, dh)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (bq, T)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(q, k, v, scale: float, interpret: bool = False):
    """softmax(q @ k^T * scale) @ v, fused in VMEM.

    Args:
      q, k: (BH, T, dk); v: (BH, T, dh). BH = batch * heads.
      interpret: run in the Pallas interpreter (CPU testing only).
    Returns:
      (BH, T, dh) in v.dtype.
    """
    bh, t, dk = q.shape
    dh = v.shape[-1]
    bq = _pick_q_block(t)

    grid = (bh, t // bq)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, dh), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * t * t * (dk + dh),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + bh * t * dh * v.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
        interpret=interpret,
    )(q, k, v)


def use_pallas_attention() -> bool:
    """Fused kernel only on single-device TPU programs (allowlist: a
    GPU or other backend must fall back to the XLA einsum path rather
    than crash in pltpu); CPU tests and the differentiable training
    path use the XLA einsum formulation. The axon relay reports
    backend=="tpu". Multi-device programs also fall back: pallas_call
    lowers to a custom call with no SPMD partitioning rule, so a pjit
    data-parallel forward over >1 chip would replicate the operands
    (all-gather) or reject the program (same gate as
    topk_pallas.use_pallas_topk)."""
    return jax.default_backend() == "tpu" and len(jax.devices()) == 1
