"""YOLOv11 (n/t/s/m/l/x) as pure functions: backbone -> FPN -> head.

Functional rebuild of reference nets/nn.py:151-347 (DarkNet, DarkFPN,
Head, YOLO). Params are an explicit nested pytree whose keys mirror the
architecture (net/p1..p5, fpn/h1..h6, head/box|cls), NHWC activations,
static strides (8, 16, 32) — no dummy-forward construction
(cf. nets/nn.py:288-290) and no mutating fuse() method (BN folding is an
offline param transform, see `fold_batchnorm`).

Forward entry points:
  forward_raw(params, x, cfg, ctx)   -> 3 per-level maps (B,H,W,4*reg_max+nc)
  decode_predictions(raw, cfg, hw)   -> (B, A, 4+nc) pixel xywh + class probs
  forward(params, x, cfg, train=..) -> raw maps (train) or decoded (eval)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.ops import blocks
from tpu_yolo.ops.anchors import make_anchors
from tpu_yolo.ops.boxes import dfl_decode
from tpu_yolo.ops.nn import (Context, ckpt_region, conv_bn, identity, sub,
                             upsample2x)

# ---------------------------------------------------------------------------
# Initialization (torch-default kaiming-uniform so training matches the
# reference's statistical starting point). Host-side numpy throughout:
# per-layer jax.random calls would each dispatch a tiny device program
# (~hundreds of round-trips — minutes over a remote-TPU tunnel); one
# device_put of the finished tree is the TPU-friendly pattern.
# ---------------------------------------------------------------------------


def _init_conv(rng: np.random.Generator, in_ch, out_ch, k=1, groups=1, bias=False):
    fan_in = (in_ch // groups) * k * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": rng.uniform(-bound, bound,
                          (k, k, in_ch // groups, out_ch)).astype(np.float32)}
    if bias:
        p["b"] = rng.uniform(-bound, bound, out_ch).astype(np.float32)
    return p


def _init_conv_bn(rng, in_ch, out_ch, k=1, groups=1):
    p = _init_conv(rng, in_ch, out_ch, k, groups)
    p.update(
        gamma=np.ones(out_ch, np.float32),
        beta=np.zeros(out_ch, np.float32),
        mean=np.zeros(out_ch, np.float32),
        var=np.ones(out_ch, np.float32),
    )
    return p


class _KeyGen:
    """Yields the shared numpy Generator (kept for call-site symmetry)."""

    def __init__(self, key):
        # Accepts a jax PRNG key (old or new style) or a plain int seed.
        if isinstance(key, (int, np.integer)):
            seed = int(key)
        else:
            try:
                data = jax.random.key_data(key)
            except Exception:
                data = key
            seed = int(np.asarray(data).ravel()[-1])
        self.rng = np.random.default_rng(seed)

    def __call__(self):
        return self.rng


def _init_residual(kg, ch, e=0.5):
    mid = int(ch * e)
    return {"conv1": _init_conv_bn(kg(), ch, mid, k=3),
            "conv2": _init_conv_bn(kg(), mid, ch, k=3)}


def _init_csp_module(kg, in_ch, out_ch):
    half = out_ch // 2
    return {
        "conv1": _init_conv_bn(kg(), in_ch, half),
        "conv2": _init_conv_bn(kg(), in_ch, half),
        "conv3": _init_conv_bn(kg(), 2 * half, out_ch),
        "m": [_init_residual(kg, half, e=1.0), _init_residual(kg, half, e=1.0)],
    }


def _init_csp(kg, in_ch, out_ch, n, use_csp_module, r):
    hidden = out_ch // r
    return {
        "conv1": _init_conv_bn(kg(), in_ch, 2 * hidden),
        "conv2": _init_conv_bn(kg(), (2 + n) * hidden, out_ch),
        "m": [(_init_csp_module(kg, hidden, hidden) if use_csp_module
               else _init_residual(kg, hidden)) for _ in range(n)],
    }


def _init_sppf(kg, in_ch, out_ch):
    return {"conv1": _init_conv_bn(kg(), in_ch, in_ch // 2),
            "conv2": _init_conv_bn(kg(), in_ch * 2, out_ch)}


def _init_attention(kg, ch, num_head):
    dh = ch // num_head
    dk = dh // 2
    return {
        "qkv": _init_conv_bn(kg(), ch, ch + 2 * dk * num_head),
        "pe": _init_conv_bn(kg(), ch, ch, k=3, groups=ch),
        "proj": _init_conv_bn(kg(), ch, ch),
    }


def _init_psa_block(kg, ch, num_head):
    return {
        "attn": _init_attention(kg, ch, num_head),
        "ffn": [_init_conv_bn(kg(), ch, ch * 2), _init_conv_bn(kg(), ch * 2, ch)],
    }


def _init_psa(kg, ch, n):
    half = ch // 2
    return {
        "conv1": _init_conv_bn(kg(), ch, 2 * half),
        "conv2": _init_conv_bn(kg(), 2 * half, ch),
        "m": [_init_psa_block(kg, half, max(ch // 128, 1)) for _ in range(n)],
    }


def init_params(key, cfg: ModelConfig):
    """Build the full parameter pytree for one model size."""
    kg = _KeyGen(key)
    w, d, csp_flags = cfg.width, cfg.depth, cfg.csp

    net = {
        "p1": [_init_conv_bn(kg(), w[0], w[1], k=3)],
        "p2": [_init_conv_bn(kg(), w[1], w[2], k=3),
               _init_csp(kg, w[2], w[3], d[0], csp_flags[0], r=4)],
        "p3": [_init_conv_bn(kg(), w[3], w[3], k=3),
               _init_csp(kg, w[3], w[4], d[1], csp_flags[0], r=4)],
        "p4": [_init_conv_bn(kg(), w[4], w[4], k=3),
               _init_csp(kg, w[4], w[4], d[2], csp_flags[1], r=2)],
        "p5": [_init_conv_bn(kg(), w[4], w[5], k=3),
               _init_csp(kg, w[5], w[5], d[3], csp_flags[1], r=2),
               _init_sppf(kg, w[5], w[5]),
               _init_psa(kg, w[5], d[4])],
    }
    fpn = {
        "h1": _init_csp(kg, w[4] + w[5], w[4], d[5], csp_flags[0], r=2),
        "h2": _init_csp(kg, w[4] + w[4], w[3], d[5], csp_flags[0], r=2),
        "h3": _init_conv_bn(kg(), w[3], w[3], k=3),
        "h4": _init_csp(kg, w[3] + w[4], w[4], d[5], csp_flags[0], r=2),
        "h5": _init_conv_bn(kg(), w[4], w[4], k=3),
        "h6": _init_csp(kg, w[4] + w[5], w[5], d[5], csp_flags[1], r=2),
    }

    nc, reg = cfg.num_classes, cfg.reg_max
    filters = cfg.head_filters
    box_ch = max(64, filters[0] // 4)
    cls_ch = max(80, filters[0], nc)
    head = {"box": [], "cls": []}
    for i, f in enumerate(filters):
        head["box"].append([
            _init_conv_bn(kg(), f, box_ch, k=3),
            _init_conv_bn(kg(), box_ch, box_ch, k=3),
            _init_conv(kg(), box_ch, 4 * reg, bias=True),
        ])
        head["cls"].append([
            _init_conv_bn(kg(), f, f, k=3, groups=f),
            _init_conv_bn(kg(), f, cls_ch),
            _init_conv_bn(kg(), cls_ch, cls_ch, k=3, groups=cls_ch),
            _init_conv_bn(kg(), cls_ch, cls_ch),
            _init_conv(kg(), cls_ch, nc, bias=True),
        ])
        # Prior-aware bias init (reference Head.initialize_biases, nn.py:272-279).
        s = cfg.strides[i]
        head["box"][i][2]["b"] = np.ones(4 * reg, np.float32)
        head["cls"][i][4]["b"] = np.full(nc, math.log(5 / nc / (640 / s) ** 2),
                                         np.float32)

    return {"net": net, "fpn": fpn, "head": head}


# ---------------------------------------------------------------------------
# Forward pass.
# ---------------------------------------------------------------------------


def _space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel layout (di, dj, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _remat_flags(remat):
    """Normalize a remat spec to (wrap_stages, wrap_inner_blocks).

    False -> no checkpointing; True/"stage" -> per-stage regions;
    "blocks" -> per-stage regions PLUS nested per-inner-block regions
    inside CSP/PSA (lowest peak memory, interiors recompute twice).
    """
    if not remat:
        return False, False
    return True, remat == "blocks"


def _backbone(p, x, ctx, cfg: ModelConfig, remat=False):
    csp0, csp1 = cfg.csp
    stage_ckpt, inner = _remat_flags(remat)

    def s1(pp, xx, c):
        stem_w = pp[0].get("w", pp[0].get("w_q"))
        if stem_w.shape[0] == 2 and stem_w.shape[2] == 4 * cfg.width[0]:
            # space-to-depth stem (fold_stem_space_to_depth):
            # mathematically identical to the 3x3/s2 conv, but the conv
            # runs stride-1 on a (H/2, W/2, 4C) layout that tiles far
            # better on the MXU at the network's 3-channel input. If the
            # input already arrives in s2d layout (host/native-loader
            # staging ships the same bytes permuted — no on-device
            # transpose pass), use it directly.
            if xx.shape[-1] != 4 * cfg.width[0]:
                xx = _space_to_depth2(xx)
            return conv_bn(pp[0], xx, c, "net/p1/0", padding=((1, 0), (1, 0)))
        return conv_bn(pp[0], xx, c, "net/p1/0", stride=2, padding=1)

    def s2(pp, xx, c):
        xx = conv_bn(pp[0], xx, c, "net/p2/0", stride=2, padding=1)
        return blocks.csp(pp[1], xx, c, "net/p2/1", csp0, remat=inner)

    def s3(pp, xx, c):
        xx = conv_bn(pp[0], xx, c, "net/p3/0", stride=2, padding=1)
        return blocks.csp(pp[1], xx, c, "net/p3/1", csp0, remat=inner)

    def s4(pp, xx, c):
        xx = conv_bn(pp[0], xx, c, "net/p4/0", stride=2, padding=1)
        return blocks.csp(pp[1], xx, c, "net/p4/1", csp1, remat=inner)

    def s5(pp, xx, c):
        xx = conv_bn(pp[0], xx, c, "net/p5/0", stride=2, padding=1)
        xx = blocks.csp(pp[1], xx, c, "net/p5/1", csp1, remat=inner)
        xx = blocks.sppf(pp[2], xx, c, "net/p5/2")
        return blocks.psa(pp[3], xx, c, "net/p5/3",
                          max(cfg.width[5] // 128, 1), remat=inner)

    run = ckpt_region if stage_ckpt else (lambda f, pp, aa, c: f(pp, aa, c))
    x = run(s1, p["p1"], x, ctx)
    x = run(s2, p["p2"], x, ctx)
    p3 = run(s3, p["p3"], x, ctx)
    p4 = run(s4, p["p4"], p3, ctx)
    p5 = run(s5, p["p5"], p4, ctx)
    return p3, p4, p5


def _fpn(p, feats, ctx, cfg: ModelConfig, remat=False):
    csp0, csp1 = cfg.csp
    stage_ckpt, inner = _remat_flags(remat)

    def top_down(pp, ff, c):
        p3, p4, p5 = ff
        with jax.named_scope("fpn/h1/up"):   # stage attribution (roofline)
            u5 = jnp.concatenate((upsample2x(p5), p4), -1)
        h4 = blocks.csp(pp["h1"], u5, c, "fpn/h1", csp0, remat=inner)
        with jax.named_scope("fpn/h2/up"):
            u4 = jnp.concatenate((upsample2x(h4), p3), -1)
        h3 = blocks.csp(pp["h2"], u4, c, "fpn/h2", csp0, remat=inner)
        return h3, h4

    def bottom_up(pp, ff, c):
        h3, h4, p5 = ff
        d3 = conv_bn(pp["h3"], h3, c, "fpn/h3", stride=2, padding=1)
        with jax.named_scope("fpn/h4/cat"):  # stage attribution
            c4 = jnp.concatenate((d3, h4), -1)
        h4b = blocks.csp(pp["h4"], c4, c, "fpn/h4", csp0, remat=inner)
        d4 = conv_bn(pp["h5"], h4b, c, "fpn/h5", stride=2, padding=1)
        with jax.named_scope("fpn/h6/cat"):
            c5 = jnp.concatenate((d4, p5), -1)
        h5b = blocks.csp(pp["h6"], c5, c, "fpn/h6", csp1, remat=inner)
        return h4b, h5b

    run = ckpt_region if stage_ckpt else (lambda f, pp, aa, c: f(pp, aa, c))
    p3, p4, p5 = feats
    h3, h4 = run(top_down, p, (p3, p4, p5), ctx)
    h4b, h5b = run(bottom_up, p, (h3, h4, p5), ctx)
    return h3, h4b, h5b


def _head(p, feats, ctx, cfg: ModelConfig, remat=False):
    def level(pp, xx, c, i):
        bp, cp = pp
        b = conv_bn(bp[0], xx, c, sub("head/box", i, 0), padding=1)
        b = conv_bn(bp[1], b, c, sub("head/box", i, 1), padding=1)
        b = conv_bn(bp[2], b, c, sub("head/box", i, 2), act=identity)
        g = xx.shape[-1]
        cc = conv_bn(cp[0], xx, c, sub("head/cls", i, 0), padding=1, groups=g)
        cc = conv_bn(cp[1], cc, c, sub("head/cls", i, 1))
        cc = conv_bn(cp[2], cc, c, sub("head/cls", i, 2), padding=1,
                     groups=cc.shape[-1])
        cc = conv_bn(cp[3], cc, c, sub("head/cls", i, 3))
        cc = conv_bn(cp[4], cc, c, sub("head/cls", i, 4), act=identity)
        with jax.named_scope(sub("head/out", i)):  # stage attribution
            return jnp.concatenate((b, cc), axis=-1)

    stage_ckpt, _ = _remat_flags(remat)
    run = ckpt_region if stage_ckpt else (lambda f, pp, aa, c: f(pp, aa, c))
    outs = []
    for i, x in enumerate(feats):
        fn = lambda pp, aa, c, _i=i: level(pp, aa, c, _i)
        outs.append(run(fn, (p["box"][i], p["cls"][i]), x, ctx))
    return outs


def forward_raw(params, x, cfg: ModelConfig, ctx: Context | None = None,
                remat=False):
    """Full graph -> list of 3 NHWC maps (B, H/s, W/s, 4*reg_max + nc).

    remat=True (or "stage") checkpoints the graph PER STAGE (5 backbone
    stages, 2 FPN halves, 3 head levels): the forward saves only
    stage-boundary activations and the backward recomputes each stage's
    interior (~1 extra forward of FLOPs). remat="blocks" additionally
    nests a checkpoint region around every CSP inner block and PSA
    block, bounding the stage recompute's own liveness — lowest peak
    memory, interiors recompute twice. A single whole-forward
    jax.checkpoint is near-useless here — during the backward its
    recompute re-materializes every residual of the region at once, so
    peak HBM barely drops (measured: v11-l @1280 bs32 needs 24.94 GB
    plain and still 23.53 GB with whole-forward remat — BENCH.md round
    4). The reference has no remat; the torch equivalent would be
    torch.utils.checkpoint per stage/block.
    Calibration/roofline Contexts (calibrate/convs) are forward-only
    analyses with no gradient memory to save; remat is ignored for them
    so their trace-time side channels stay intact.
    """
    ctx = ctx or Context(train=False)
    if ctx.calibrate or ctx.convs is not None:
        remat = False
    feats = _backbone(params["net"], x, ctx, cfg, remat)
    feats = _fpn(params["fpn"], feats, ctx, cfg, remat)
    return _head(params["head"], feats, ctx, cfg, remat)


def decode_predictions(raw_maps, cfg: ModelConfig, input_hw):
    """Eval-path decode (reference Head eval branch, nets/nn.py:261-270).

    Returns (B, A, 4+nc): pixel-space xywh boxes + sigmoid class scores.
    """
    b = raw_maps[0].shape[0]
    no = cfg.no
    flat = jnp.concatenate([m.reshape(b, -1, no) for m in raw_maps], axis=1)
    dist, cls = jnp.split(flat, (4 * cfg.reg_max,), axis=-1)

    anchors, stride_t = make_anchors(input_hw, cfg.strides)
    anchors = jnp.asarray(anchors, dtype=jnp.float32)
    stride_t = jnp.asarray(stride_t, dtype=jnp.float32)

    box = dfl_decode(dist, anchors, cfg.reg_max, xywh=True) * stride_t
    return jnp.concatenate((box, jax.nn.sigmoid(cls.astype(jnp.float32))), axis=-1)


def _input_hw(x, cfg: ModelConfig):
    """Image-space (H, W) of a model input: a pre-rearranged s2d batch
    (space_to_depth_host staging, 4*C_in channels) covers 2x its array
    dims per axis."""
    if x.shape[-1] == 4 * cfg.width[0]:
        return 2 * x.shape[1], 2 * x.shape[2]
    return x.shape[1], x.shape[2]


def forward(params, x, cfg: ModelConfig, train: bool = False, ctx: Context | None = None):
    """Train -> raw per-level maps; eval -> decoded (B, A, 4+nc)."""
    if train:
        return forward_raw(params, x, cfg, ctx or Context(train=True))
    raw = forward_raw(params, x, cfg)
    return decode_predictions(raw, cfg, _input_hw(x, cfg))


def forward_nms(params, x, cfg: ModelConfig, **nms_kwargs):
    """One-call inference: forward -> fused decode+NMS.

    The tail is ops/nms.py::nms_from_raw: candidates ranked on raw
    class logits (sigmoid only on the K winners — monotone, so the
    selection is score order), per-level flattening (no (B, A, 144)
    concat), bulk DFL box decode + narrow (B, K, 4) gather. Matches
    batched_nms(decode_predictions(...)) —
    tests/test_ops_parity.py::test_fused_nms_matches_two_stage.
    """
    from tpu_yolo.ops.nms import nms_from_raw

    raw = forward_raw(params, x, cfg)
    return nms_from_raw(raw, cfg, _input_hw(x, cfg), **nms_kwargs)


# ---------------------------------------------------------------------------
# BN folding (offline param transform; replaces reference YOLO.fuse,
# nets/nn.py:299-305, which mutates modules at runtime).
# ---------------------------------------------------------------------------


def fold_input_scale(params, scale: float = 1.0 / 255.0):
    """Fold the input normalization into the stem conv: conv(s·x, W) ==
    conv(x, s·W), so callers can feed raw uint8-valued bf16 images and
    skip the full-image /255 elementwise pass. Exact (BN already folded
    or not — the conv is linear either way)."""
    out = _copy_params(params)
    stem = out["net"]["p1"][0]
    key = "w" if "w" in stem else None
    if key is None:
        raise ValueError("fold_input_scale requires an unquantized stem")
    stem[key] = stem[key] * scale
    return out


def fold_stem_space_to_depth(params):
    """Rewrite the stem's 3x3/s2 conv as an exactly-equivalent 2x2/s1
    conv over a space-to-depth(2) input (inference-graph transform; see
    _backbone). Output position (i, j) of the original conv reads input
    pixels 2i-1..2i+1; in s2d coordinates those live in cells i-1..i at
    offsets di in {0, 1}, giving W2[a, b, (di, dj, c)] = W3[2a+di-1,
    2b+dj-1, c] (zero where the index falls outside the 3x3 kernel) with
    top/left padding 1. Apply after fold_batchnorm / weight load."""
    w3 = np.asarray(params["net"]["p1"][0]["w"])  # (3, 3, C, O)
    if w3.shape[0] != 3:
        return params  # already transformed or non-standard stem
    cin, cout = w3.shape[2], w3.shape[3]
    w2 = np.zeros((2, 2, 4 * cin, cout), w3.dtype)
    for a in range(2):
        for b in range(2):
            for di in range(2):
                for dj in range(2):
                    ki, kj = 2 * a + di - 1, 2 * b + dj - 1
                    if 0 <= ki < 3 and 0 <= kj < 3:
                        ch = (di * 2 + dj) * cin
                        w2[a, b, ch:ch + cin] = w3[ki, kj]
    out = _copy_params(params)
    out["net"]["p1"][0]["w"] = jnp.asarray(w2)
    return out


def space_to_depth_host(x):
    """Host-side (numpy) mirror of _space_to_depth2: (B, H, W, C) uint8
    -> (B, H/2, W/2, 4C), channel layout (di, dj, c). Lets the staging
    side (native loader / serve) ship batches already in the s2d-stem
    layout — same bytes, permuted on host — so the fold_stem_space_to_
    depth forward needs no on-device transpose pass."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return np.ascontiguousarray(
        x.transpose(0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)


def _copy_params(tree):
    if isinstance(tree, dict):
        return {k: _copy_params(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_copy_params(v) for v in tree]
    return tree


def fold_batchnorm(params):
    """Fold every {'w',gamma,beta,mean,var} conv into {'w','b'}.

    W' = W * gamma/sqrt(var+eps) (per output channel);
    b' = beta - mean*gamma/sqrt(var+eps)   (reference fuse math, nn.py:17-23).
    """
    from tpu_yolo.ops.nn import BN_EPS

    def _fold(node):
        if isinstance(node, dict):
            if "gamma" in node:
                scale = node["gamma"] / np.sqrt(np.asarray(node["var"]) + BN_EPS)
                w = np.asarray(node["w"]) * np.asarray(scale)[None, None, None, :]
                b = np.asarray(node["beta"]) - np.asarray(node["mean"]) * np.asarray(scale)
                return {"w": jnp.asarray(w), "b": jnp.asarray(b)}
            return {k: _fold(v) for k, v in node.items()}
        if isinstance(node, list):
            return [_fold(v) for v in node]
        return node

    return _fold(params)
