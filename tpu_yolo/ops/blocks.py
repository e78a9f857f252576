"""YOLOv11 composite blocks as pure functions over param pytrees.

Functional counterparts of reference nets/nn.py:42-148 (Residual,
CSPModule, CSP, SPP, Attention, PSABlock, PSA). Channel counts are
implied by the param shapes; only topology flags are static arguments.
All tensors are NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_yolo.ops.nn import Context, ckpt_region, conv_bn, identity, max_pool, sub


def residual(p, x, ctx: Context, path: str):
    """Two 3x3 convs with a skip (reference Residual, nn.py:42-49)."""
    y = conv_bn(p["conv1"], x, ctx, sub(path, "conv1"), padding=1)
    y = conv_bn(p["conv2"], y, ctx, sub(path, "conv2"), padding=1)
    with jax.named_scope(sub(path, "add")):    # stage attribution
        return x + y


def csp_module(p, x, ctx: Context, path: str):
    """C3k-style inner module (reference CSPModule, nn.py:52-63)."""
    y = conv_bn(p["conv1"], x, ctx, sub(path, "conv1"))
    for i, rp in enumerate(p["m"]):
        y = residual(rp, y, ctx, sub(path, "m", i))
    z = conv_bn(p["conv2"], x, ctx, sub(path, "conv2"))
    with jax.named_scope(sub(path, "cat")):    # stage attribution
        yz = jnp.concatenate((y, z), axis=-1)
    return conv_bn(p["conv3"], yz, ctx, sub(path, "conv3"))


def csp(p, x, ctx: Context, path: str, use_csp_module: bool,
        remat: bool = False):
    """C3k2-style CSP stage (reference CSP, nn.py:66-80).

    conv1 -> split 2 -> n chained inner blocks on the tail -> concat(2+n)
    -> conv2. remat=True checkpoints each inner block (the CSP interior
    is the bulk of a backbone stage's activation memory — see
    yolov11.forward_raw remat="blocks").
    """
    y = conv_bn(p["conv1"], x, ctx, sub(path, "conv1"))
    parts = list(jnp.split(y, 2, axis=-1))
    inner = csp_module if use_csp_module else residual
    for i, mp in enumerate(p["m"]):
        if remat:
            fn = lambda pp, aa, c, _pth=sub(path, "m", i): inner(pp, aa, c, _pth)
            parts.append(ckpt_region(fn, mp, parts[-1], ctx))
        else:
            parts.append(inner(mp, parts[-1], ctx, sub(path, "m", i)))
    with jax.named_scope(sub(path, "cat")):    # stage attribution
        cat = jnp.concatenate(parts, axis=-1)
    return conv_bn(p["conv2"], cat, ctx, sub(path, "conv2"))


def sppf(p, x, ctx: Context, path: str, k: int = 5):
    """Spatial pyramid pooling - fast (reference SPP, nn.py:83-94)."""
    x = conv_bn(p["conv1"], x, ctx, sub(path, "conv1"))
    with jax.named_scope(sub(path, "pool")):   # stage attribution
        y1 = max_pool(x, k)
        y2 = max_pool(y1, k)
        y3 = max_pool(y2, k)
        cat = jnp.concatenate((x, y1, y2, y3), axis=-1)
    return conv_bn(p["conv2"], cat, ctx, sub(path, "conv2"))


def attention(p, x, ctx: Context, path: str, num_head: int):
    """Single-level self-attention with depthwise positional branch
    (reference Attention, nn.py:97-123).

    Channel split per head is [dk | dk | dh] with dk = dh/2, matching the
    reference's head-major torch .view/.split layout — in NHWC the channel
    axis is last, so the same contiguous grouping applies.
    """
    b, h, w, c = x.shape
    dh = c // num_head
    dk = dh // 2
    t = h * w

    qkv = conv_bn(p["qkv"], x, ctx, sub(path, "qkv"), act=identity)
    qkv = qkv.reshape(b, t, num_head, 2 * dk + dh)
    q, k, v = jnp.split(qkv, (dk, 2 * dk), axis=-1)

    from tpu_yolo.ops.attention_pallas import fused_attention, use_pallas_attention

    with jax.named_scope(sub(path, "attn")):   # stage attribution
        if not ctx.train and use_pallas_attention():
            # Fused Pallas path: scores never touch HBM (inference only;
            # the training path needs XLA's autodiff through the einsums).
            to_heads = lambda a, d: a.transpose(0, 2, 1, 3).reshape(b * num_head, t, d)
            out = fused_attention(to_heads(q, dk), to_heads(k, dk),
                                  to_heads(v, dh), dk ** -0.5)
            out = out.reshape(b, num_head, t, dh).transpose(0, 2, 1, 3)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                              preferred_element_type=jnp.float32) * (dk ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                             preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, h, w, c)
    # roofline accounting for the two attention dots (QK^T and AV):
    # 2·b·nh·t²·dk + 2·b·nh·t²·dh FLOPs; bytes = q/k/v reads + out write
    # (+ the t×t score plane twice unless the Pallas path keeps it VMEM)
    ctx.note_dot(
        sub(path, "attn"),
        flops=2 * b * num_head * t * t * (dk + dh),
        nbytes=2 * (b * t * c * 2          # q,k,v in ≈ c channels total
                    + b * t * dh * num_head))

    v_img = v.reshape(b, h, w, c)
    pos = conv_bn(p["pe"], v_img, ctx, sub(path, "pe"), padding=1, groups=c, act=identity)
    return conv_bn(p["proj"], out + pos, ctx, sub(path, "proj"), act=identity)


def psa_block(p, x, ctx: Context, path: str, num_head: int):
    """Residual attention + 2-layer conv MLP (reference PSABlock, nn.py:126-136)."""
    x = x + attention(p["attn"], x, ctx, sub(path, "attn"), num_head)
    y = conv_bn(p["ffn"][0], x, ctx, sub(path, "ffn", 0))
    y = conv_bn(p["ffn"][1], y, ctx, sub(path, "ffn", 1), act=identity)
    return x + y


def psa(p, x, ctx: Context, path: str, num_head: int,
        remat: bool = False):
    """Partial self-attention wrapper (reference PSA, nn.py:139-148):
    split channels, attend on half, concat, project. remat=True
    checkpoints each PSA block (the train-path attention materializes
    its (B, heads, hw, hw) score maps)."""
    y = conv_bn(p["conv1"], x, ctx, sub(path, "conv1"))
    a, bperm = jnp.split(y, 2, axis=-1)
    for i, bp in enumerate(p["m"]):
        if remat:
            fn = lambda pp, aa, c, _pth=sub(path, "m", i): psa_block(
                pp, aa, c, _pth, num_head)
            bperm = ckpt_region(fn, bp, bperm, ctx)
        else:
            bperm = psa_block(bp, bperm, ctx, sub(path, "m", i), num_head)
    return conv_bn(p["conv2"], jnp.concatenate((a, bperm), axis=-1), ctx, sub(path, "conv2"))
