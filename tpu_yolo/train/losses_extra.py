"""Alternative classification losses: focal, quality-focal, varifocal.

Counterparts of reference utils/util.py:738-796 (FocalLoss, QFL, VFL) —
defined there but unused by the main loss path; provided here for the
same capability surface (swap into detection_loss's BCE slot for
experiments). All take raw logits and return elementwise losses of the
input shape; reduction is the caller's business, matching how
ComputeLoss sums/normalizes (util.py:912-924).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Numerically stable elementwise binary cross-entropy."""
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 1.5):
    """Focal loss (reference FocalLoss, util.py:771-796): BCE modulated by
    (1 - p_t)^gamma with alpha class balancing."""
    loss = bce_with_logits(logits, targets)
    prob = jax.nn.sigmoid(logits)
    p_t = targets * prob + (1.0 - targets) * (1.0 - prob)
    loss = loss * (1.0 - p_t) ** gamma
    if alpha > 0:
        alpha_t = targets * alpha + (1.0 - targets) * (1.0 - alpha)
        loss = loss * alpha_t
    return loss


def quality_focal_loss(logits, targets, beta: float = 2.0):
    """Quality focal loss (reference QFL, util.py:738-751): BCE weighted by
    |target - sigmoid(logit)|^beta, for IoU-soft targets."""
    prob = jax.nn.sigmoid(logits)
    return bce_with_logits(logits, targets) * jnp.abs(targets - prob) ** beta


def varifocal_loss(logits, targets, alpha: float = 0.75, gamma: float = 2.0):
    """Varifocal loss (reference VFL, util.py:754-768): positives weighted
    by the target quality, negatives by alpha * p^gamma."""
    prob = jax.nn.sigmoid(logits)
    weight = jnp.where(targets > 0, targets,
                       alpha * prob ** gamma)
    return bce_with_logits(logits, targets) * weight
