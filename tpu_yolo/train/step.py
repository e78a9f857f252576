"""The jitted SPMD training step: forward + loss + grad + SGD + EMA.

One XLA program per (apply/accumulate) variant replaces the reference's
per-step Python sequence (main.py:120-169: autocast forward, loss scale,
backward with DDP all-reduce hooks, optimizer step, EMA update):

  * compute dtype is bfloat16 end-to-end (reference-AMP parity,
    main.py:88-94): BatchNorm statistics and the normalize run in f32
    but the activation is cast back to bf16 (ops/nn.py conv_bn), so
    every conv — forward and backward — stays on the bf16 MXU path.
    Re-measured round 2 with tools/train_bench.py (relay-safe distinct
    inputs): 292 vs 241 img/s at bs64 (+21%); convergence verified
    (tests/test_convergence.py). Full f32 remains available via
    compute_dtype=jnp.float32. No GradScaler needed — the reference's
    CUDA AMP + GradScaler (main.py:152-163) exists solely because fp16
    underflows; bf16 does not;
  * the batch arrives sharded over the mesh `data` axis and params are
    replicated, so jax.grad's reduction over the batch compiles into the
    gradient psum DDP does with NCCL (reference main.py:344);
  * BatchNorm statistics are computed over the global (sharded) batch —
    SyncBatchNorm semantics (reference main.py:81-84) with no extra code
    — and flow out through the Context side-channel, applied to the
    param tree after the gradient;
  * gradient accumulation (reference `accumulate` micro-batching,
    main.py:44,158-169) is a summed-grad buffer in optimizer state,
    applied every k-th call;
  * EMA update (reference util.py:599-627) runs on-device over the full
    float state (params + BN buffers) after each optimizer step.

Loss-scale parity note: the reference multiplies each loss by
batch_size*world_size to undo DDP grad-averaging (main.py:143-148);
here the loss is already a global-batch sum/Σ(target_scores), so the
equivalent scale is the *global* batch size, applied once.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_yolo.core.config import ModelConfig
from tpu_yolo.models import yolov11
from tpu_yolo.ops.nn import Context, apply_stat_updates
from tpu_yolo.train import optim
from tpu_yolo.train.loss import detection_loss


def init_train_state(params, ema: bool = True, accumulate: int = 1):
    """Plain-dict train state (class-free for checkpointing)."""
    state = {
        "params": params,
        "opt": optim.init_sgd_state(params, use_accum=accumulate > 1),
        "step": jnp.zeros((), jnp.int32),
        "ema_updates": jnp.zeros((), jnp.int32),
    }
    # Real copies, not aliases: train_step donates the whole state, and
    # XLA rejects donating the same buffer twice (params + ema sharing).
    state["ema_params"] = (
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        if ema else None)
    return state


def loss_and_grads(params, images, gt, hyp_gains, *, cfg: ModelConfig,
                   compute_dtype=jnp.float32):
    """Losses and parameter gradients of one training forward/backward —
    exactly train_step's loss_fn (loss scaled by the global batch,
    reference main.py:142-144) without the optimizer/EMA tail. Debug /
    parity surface: tests/test_train_trajectory.py checks these grads
    against the reference's torch autograd."""
    x = images.astype(compute_dtype) / compute_dtype(255)
    global_bs = images.shape[0]

    def loss_fn(p):
        ctx = Context(train=True)
        raw = yolov11.forward_raw(p, x, cfg, ctx)
        hyp = {"box": hyp_gains[0], "cls": hyp_gains[1], "dfl": hyp_gains[2]}
        lb, lc, ld = detection_loss(raw, gt, hyp, cfg)
        return (lb + lc + ld) * global_bs, (lb, lc, ld)

    grads, losses = jax.grad(loss_fn, has_aux=True)(params)
    return losses, grads


def _copy_tree(tree):
    """Fresh containers so in-place dict writes don't leak to the caller."""
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_copy_tree(v) for v in tree]
    return tree


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "accumulate", "apply_update", "compute_dtype",
                     "remat"),
    donate_argnames=("state",),
)
def train_step(state, images, gt, lr, hyp_gains, wd, momentum, *,
               cfg: ModelConfig, accumulate: int = 1,
               apply_update: bool = True, compute_dtype=jnp.bfloat16,
               remat: bool = False):
    """One micro-step. Returns (new_state, metrics dict).

    Args:
      state: from init_train_state (replicated over the mesh).
      images: (B, H, W, 3) uint8, sharded on the data axis.
      gt: (B, N, 5) padded [cls, x1, y1, x2, y2] pixel targets, sharded.
      lr: scalar learning rate for this micro-step (host schedule lookup,
        reference util.py:594-596).
      hyp_gains: (3,) float32 [box, cls, dfl] loss gains.
      wd, momentum: scalar weight decay (pre-scaled by global batch,
        reference main.py:45) and SGD momentum.
      accumulate/apply_update: grad-accumulation window and whether this
        call performs the parameter update (host decides by step index,
        reference main.py:158).
      remat: rematerialize the forward per stage in the backward
        (jax.checkpoint around each backbone stage / FPN half / head
        level — yolov11.forward_raw(remat=True)) — ~1/3 more FLOPs for
        a large activation-memory cut; unlocks models/batches/input
        sizes whose plain compile exceeds HBM. Per-stage beats one
        whole-forward checkpoint, whose backward recompute
        re-materializes every residual at once (BENCH.md round 4).
        BN-stat updates are routed through each checkpointed stage's
        outputs (a traced side-channel escaping a remat region would
        leak tracers).
    """
    params = _copy_tree(state["params"])
    # step/* named_scope tags: trace metadata only, for the BENCH.md
    # train-step bound table (profiler attribution of the non-model ms)
    with jax.named_scope("step/cast"):
        x = images.astype(compute_dtype) / compute_dtype(255)
    global_bs = images.shape[0]

    def fwd(p, xx):
        ctx = Context(train=True)
        raw = yolov11.forward_raw(p, xx, cfg, ctx, remat=remat)
        return raw, ctx.updates

    def loss_fn(p):
        raw, bn_updates = fwd(p, x)
        hyp = {"box": hyp_gains[0], "cls": hyp_gains[1], "dfl": hyp_gains[2]}
        lb, lc, ld = detection_loss(raw, gt, hyp, cfg)
        total = (lb + lc + ld) * global_bs
        return total, ((lb, lc, ld), bn_updates)

    grads, ((lb, lc, ld), bn_updates) = jax.grad(loss_fn, has_aux=True)(params)

    # BN running stats update every micro-step (torch module semantics).
    with jax.named_scope("step/bnstats"):
        params = apply_stat_updates(params, bn_updates)

    opt = dict(state["opt"])
    if accumulate > 1:
        with jax.named_scope("step/accum"):
            grads = jax.tree_util.tree_map(jnp.add, opt["accum"], grads)

    if apply_update:
        with jax.named_scope("step/opt"):
            masks = (optim.trainable_mask(params),
                     optim.decay_mask(params))
            params, new_momentum = optim.sgd_update(
                params, grads, opt, lr=lr, momentum=momentum,
                weight_decay=wd, masks=masks)
            opt["momentum"] = new_momentum
            if accumulate > 1:
                opt["accum"] = jax.tree_util.tree_map(jnp.zeros_like,
                                                      grads)

        ema_params = state["ema_params"]
        ema_updates = state["ema_updates"]
        if ema_params is not None:
            ema_updates = ema_updates + 1
            with jax.named_scope("step/ema"):
                ema_params = optim.ema_update(ema_params, params,
                                              ema_updates)
    else:
        opt["accum"] = grads
        ema_params = state["ema_params"]
        ema_updates = state["ema_updates"]

    new_state = {
        "params": params,
        "opt": opt,
        "step": state["step"] + 1,
        "ema_updates": ema_updates,
        "ema_params": ema_params,
    }
    metrics = {"loss_box": lb, "loss_cls": lc, "loss_dfl": ld}
    return new_state, metrics
