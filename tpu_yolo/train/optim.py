"""SGD(+Nesterov) with param-group weight decay, LR schedules, and EMA.

Functional counterparts of reference utils/util.py:519-534 (set_params
param groups), 537-596 (CosineLR / LinearLR precomputed arrays + plot),
599-627 (EMA). Optimizer state is a plain dict of numpy-convertible
pytrees so checkpoints stay class-free (see io/checkpoint.py) — no
optax state objects to unpickle.

Group rule (set_params): biases and norm scale/offset get no weight
decay; conv/linear weights do. In the pytree that is leaf-name-based:
'w' leaves decay, {'b','gamma','beta'} do not, {'mean','var'} are
buffers (not touched by the optimizer at all — BN stats flow through
the Context side-channel, ops/nn.py).

torch-SGD parity: grad' = grad + wd*p; buf = mu*buf + grad';
nesterov step d = grad' + mu*buf; p -= lr*d.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _is_trainable(path_leaf: str) -> bool:
    return path_leaf in ("w", "b", "gamma", "beta")


def _leaf_name(path) -> str:
    """Last dict key of a jax tree_util key-path."""
    last = path[-1]
    return getattr(last, "key", getattr(last, "idx", last))


def decay_mask(params):
    """Pytree of {True: weight-decayed, False: no-decay} over trainable
    leaves (reference set_params, util.py:519-534). BN running stats get
    False (they are never given gradients)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _leaf_name(p) == "w", params)


def trainable_mask(params):
    """True for leaves the optimizer updates (excludes BN running stats)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _is_trainable(_leaf_name(p)), params)


def init_sgd_state(params, use_accum: bool = False):
    state = {"momentum": jax.tree_util.tree_map(jnp.zeros_like, params)}
    if use_accum:
        state["accum"] = jax.tree_util.tree_map(jnp.zeros_like, params)
    return state


def sgd_update(params, grads, state, *, lr, momentum: float,
               weight_decay: float, masks):
    """One parameter update. `masks` = (trainable_mask, decay_mask) pytrees.

    Returns (new_params, new_momentum).
    """
    t_mask, d_mask = masks

    def upd(p, g, buf, train, dec):
        if not train:
            return p, buf
        g = g + weight_decay * p if dec else g
        buf = momentum * buf + g
        step = g + momentum * buf  # nesterov
        return p - lr * step, buf

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat = [
        upd(p, g, b, t, d)
        for p, g, b, t, d in zip(
            flat_p,
            jax.tree_util.tree_leaves(grads),
            jax.tree_util.tree_leaves(state["momentum"]),
            jax.tree_util.tree_leaves(t_mask),
            jax.tree_util.tree_leaves(d_mask),
        )
    ]
    new_p = jax.tree_util.tree_unflatten(treedef, [f[0] for f in flat])
    new_m = jax.tree_util.tree_unflatten(treedef, [f[1] for f in flat])
    return new_p, new_m


# ---------------------------------------------------------------------------
# LR schedules — precomputed per-microstep arrays (reference util.py:537-596).
# ---------------------------------------------------------------------------


def linear_lr(epochs: int, num_steps: int, hyp: dict) -> np.ndarray:
    """Linear warmup (>=100 steps or warmup_epochs) then linear decay
    (reference LinearLR, util.py:581-596)."""
    max_lr, min_lr = hyp["max_lr"], hyp["min_lr"]
    warmup = int(max(hyp["warmup_epochs"] * num_steps, 100))
    decay = max(int(epochs * num_steps - warmup), 1)
    return np.concatenate([
        np.linspace(min_lr, max_lr, warmup, endpoint=False),
        np.linspace(max_lr, min_lr, decay),
    ]).astype(np.float32)


def cosine_lr(epochs: int, num_steps: int, hyp: dict) -> np.ndarray:
    """Linear warmup then cosine decay (reference CosineLR, util.py:559-578)."""
    max_lr, min_lr = hyp["max_lr"], hyp["min_lr"]
    warmup = int(max(hyp["warmup_epochs"] * num_steps, 100))
    decay = max(int(epochs * num_steps - warmup), 1)
    steps = np.arange(1, decay + 1)
    cos = min_lr + 0.5 * (max_lr - min_lr) * (1 + np.cos(np.pi * steps / decay))
    return np.concatenate([
        np.linspace(min_lr, max_lr, warmup), cos]).astype(np.float32)


def plot_lr(schedule: np.ndarray, out_path: str):
    """LR curve PNG (reference plot_lr, util.py:537-556)."""
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot

    pyplot.plot(schedule, ".-", label="LR")
    pyplot.xlabel("step")
    pyplot.ylabel("LR")
    pyplot.grid()
    pyplot.xlim(0, len(schedule))
    pyplot.ylim(0)
    pyplot.savefig(out_path, dpi=200)
    pyplot.close()


# ---------------------------------------------------------------------------
# EMA over the full float state (params + BN buffers) —
# reference EMA, util.py:599-627.
# ---------------------------------------------------------------------------


def ema_decay(updates, decay: float = 0.9999, tau: float = 2000.0):
    """Exponential ramp so early epochs track the live model."""
    return decay * (1.0 - jnp.exp(-updates / tau))


def ema_update(ema_params, params, updates):
    """ema = d*ema + (1-d)*param for every float leaf; `updates` is the
    running update count *after* increment (torch EMA.update order)."""
    d = ema_decay(updates.astype(jnp.float32))

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * p.astype(e.dtype)
        return e

    return jax.tree_util.tree_map(upd, ema_params, params)
