"""Low-level NHWC primitives: conv+BN(+SiLU), pooling, upsampling.

TPU-first design notes:
  * Layout is NHWC / HWIO so XLA tiles convs straight onto the MXU.
  * BatchNorm is algebraic, not a module: in eval it is a per-channel
    scale/bias fused by XLA into the convolution; checkpoints loaded for
    inference fold it into the conv weights entirely (see io/weights.py),
    so the jitted graph never contains BN (reference fuses at runtime via
    nets/nn.py:8-25,299-305).
  * Batch-stat updates are collected functionally through a `Context`
    object during tracing and applied to the param tree outside the
    gradient, replacing torch's in-module mutable running stats.
  * Under pjit with the batch sharded over the data mesh axis, the batch
    statistics below are computed over the *global* batch — XLA inserts
    the cross-chip reduction — which gives SyncBatchNorm semantics
    (reference: torch SyncBatchNorm, main.py:81-84) for free.

BN hyperparameters eps=1e-3, momentum=0.03 match the reference
(nets/nn.py:32) for checkpoint fold-parity.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-3
BN_MOMENTUM = 0.03


def silu(x):
    return x * jax.nn.sigmoid(x)


def identity(x):
    return x


@dataclasses.dataclass
class Context:
    """Carries trace-time state through the functional forward pass.

    `updates` maps a param-tree path ("net/p1/0") to its new BN running
    stats; the train step applies them to the param tree after grad.
    `absmax` records each conv input's max|x| when `calibrate` is set
    (int8 calibration pass, tpu_yolo/quant.py).
    """

    train: bool = False
    calibrate: bool = False
    updates: dict = dataclasses.field(default_factory=dict)
    absmax: dict = dataclasses.field(default_factory=dict)
    # When a list is installed (tools/roofline.py), every conv/dot in
    # the forward appends its exact shapes here at trace time — the
    # analytic per-stage FLOPs/bytes roofline is derived from these, so
    # it can never drift from the real graph.
    convs: list | None = None

    def put(self, path: str, mean, var):
        if self.train:
            self.updates[path] = {"mean": mean, "var": var}

    def note_conv(self, path: str, x, w, y, stride: int, groups: int):
        if self.convs is not None:
            self.convs.append({
                "path": path, "kind": "conv", "in": tuple(x.shape),
                "w": tuple(w.shape), "out": tuple(y.shape),
                "stride": stride, "groups": groups})

    def note_dot(self, path: str, flops: int, nbytes: int):
        """Non-conv MXU work (attention QK^T / AV) for the roofline."""
        if self.convs is not None:
            self.convs.append({"path": path, "kind": "dot",
                               "flops": int(flops), "bytes": int(nbytes)})

    def observe(self, path: str, x):
        if self.calibrate:
            m = jnp.max(jnp.abs(x.astype(jnp.float32)))
            prev = self.absmax.get(path)
            self.absmax[path] = m if prev is None else jnp.maximum(prev, m)


def sub(path: str, *parts) -> str:
    return "/".join([path, *map(str, parts)]) if path else "/".join(map(str, parts))


def conv2d(x, w, stride: int = 1, padding=0, groups: int = 1,
           preferred_element_type=None):
    """NHWC x HWIO convolution. `padding` is an int (symmetric) or an
    explicit ((top, bottom), (left, right)) pair."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred_element_type,
    )


def conv_bn(p, x, ctx: Context, path: str, *, stride: int = 1, padding=0,
            groups: int = 1, act=silu):
    """Conv (+BatchNorm unless folded) (+activation).

    Param forms:
      {'w','gamma','beta','mean','var'} — unfolded (training / raw load)
      {'w','b'}                         — BN folded in, or a plain conv
      {'w_q','s_w','s_in','b'}          — int8 W8A8 (tpu_yolo/quant.py):
        quantize input -> int8 conv (int32 accum on the MXU) -> dequant
        by s_in*s_w -> +bias; the q/dq elementwise ops fuse into
        neighbors so only the conv itself runs int8.
    """
    # named_scope is trace-time metadata only: it tags the lowered HLO
    # (and thus profiler events) of the conv AND its BN/activation with
    # the param-tree path so a trace can be aggregated per stage
    # (tools/roofline.py --profile).
    with jax.named_scope(path):
        return _conv_bn(p, x, ctx, path, stride=stride, padding=padding,
                        groups=groups, act=act)


def _conv_bn(p, x, ctx: Context, path: str, *, stride, padding, groups, act):
    if "w_q" in p:
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / p["s_in"]),
                      -127, 127).astype(jnp.int8)
        y = conv2d(xq, p["w_q"], stride=stride, padding=padding,
                   groups=groups, preferred_element_type=jnp.int32)
        ctx.note_conv(path, xq, p["w_q"], y, stride, groups)
        y = y.astype(jnp.float32) * (p["s_in"] * p["s_w"]) + p["b"]
        return act(y).astype(x.dtype)

    ctx.observe(path, x)
    w = p["w"].astype(x.dtype)
    y = conv2d(x, w, stride=stride, padding=padding, groups=groups)
    ctx.note_conv(path, x, w, y, stride, groups)

    if "b" in p:
        return act(y + p["b"].astype(y.dtype))

    if ctx.train:
        # Batch statistics and the normalize run in f32; the activation
        # is cast back to x.dtype so downstream convs (fwd AND bwd) stay
        # on the bf16 MXU path — the reference's CUDA-AMP-equivalent
        # (main.py:88-94). Re-measured round 2 via tools/train_bench.py
        # (distinct-input batches, relay-elision-safe): see BENCH.md
        # training section. Round 1's "bf16-IO BN: no gain" reading
        # predates that harness and is superseded.
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
        n = yf.shape[0] * yf.shape[1] * yf.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        ctx.put(
            path,
            (1.0 - BN_MOMENTUM) * p["mean"] + BN_MOMENTUM * mean,
            (1.0 - BN_MOMENTUM) * p["var"] + BN_MOMENTUM * unbiased,
        )
        scale = lax.rsqrt(var + BN_EPS) * p["gamma"]
        return act(yf * scale + (p["beta"] - mean * scale)).astype(x.dtype)

    scale = p["gamma"] * lax.rsqrt(p["var"] + BN_EPS)
    bias = p["beta"] - p["mean"] * scale
    return act(y * scale.astype(y.dtype) + bias.astype(y.dtype))


def max_pool(x, k: int, stride: int = 1, padding: int | None = None):
    if padding is None:
        padding = k // 2
    # -inf (not finfo.min) so JAX recognizes the reduce_window as a
    # max-pool and applies its reverse-mode gradient rule.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def upsample2x(x):
    """Nearest-neighbour 2x upsample (reference torch.nn.Upsample, nn.py:195)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def ckpt_region(fn, p, args, ctx):
    """Run `fn(p, args, ctx)` under `jax.checkpoint`, saving only its
    boundary activations (the backward recomputes the region interior).

    BN batch-stat updates must be routed through the checkpointed
    function's OUTPUTS — a `Context` mutated by the closure would leak
    tracers out of the remat region — so the region gets a fresh
    Context and returns its `updates` dict, merged into the caller's.
    Regions nest: an inner region checkpointed inside an outer one
    bounds the outer region's backward-recompute liveness at the cost
    of recomputing the inner interior twice.
    """
    @jax.checkpoint
    def run(pp, aa):
        c = Context(train=ctx.train)
        out = fn(pp, aa, c)
        return out, c.updates

    out, ups = run(p, args)
    ctx.updates.update(ups)
    return out


def apply_stat_updates(params, updates: dict):
    """Write collected BN running-stat updates back into the param pytree."""
    for path, new in updates.items():
        node = params
        keys = path.split("/")
        for k in keys[:-1]:
            node = node[int(k)] if k.isdigit() else node[k]
        leaf_key = keys[-1]
        leaf = node[int(leaf_key)] if leaf_key.isdigit() else node[leaf_key]
        leaf["mean"] = new["mean"]
        leaf["var"] = new["var"]
    return params
