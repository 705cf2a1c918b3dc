"""Segmentation losses (pure jnp, jit/grad-friendly).

Same math as the reference (``light_unet/models/losses.py``):

* Focal Tversky loss — FN weight ``alpha`` (default 0.7), FP weight ``beta``
  (0.3), focal ``gamma`` (0.75); ``alpha + beta`` must equal 1
  (``losses.py:28``).
* Combined loss — 0.8 * FTL + 0.2 * BCE (``losses.py:57-85``).
* Dice loss (``losses.py:88-113``).

All losses operate on **probabilities** (sigmoid lives inside the model,
``unet3d.py:221``) and flatten across the whole batch before reducing
(``losses.py:40-41``) — i.e. TP/FP/FN are global sums, not per-sample means.
Reductions run in float32 for stability under bfloat16 activations.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

_BCE_EPS = 1e-7  # clamp for log() on probabilities


def focal_tversky_loss(pred, target, alpha=0.7, beta=0.3, gamma=0.75, smooth=1e-6):
    """Focal Tversky loss on probabilities; global flatten over batch."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    tp = jnp.sum(pred * target)
    fp = jnp.sum(pred * (1.0 - target))
    fn = jnp.sum((1.0 - pred) * target)
    tversky = (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)
    return (1.0 - tversky) ** gamma


def bce_loss(pred, target):
    """Binary cross-entropy on probabilities (torch ``nn.BCELoss`` mean)."""
    pred = jnp.clip(pred.reshape(-1).astype(jnp.float32), _BCE_EPS, 1.0 - _BCE_EPS)
    target = target.reshape(-1).astype(jnp.float32)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log(1.0 - pred))


def combined_loss(pred, target, ftl_weight=0.8, bce_weight=0.2, alpha=0.7, beta=0.3, gamma=0.75):
    """ftl_weight * FocalTversky + bce_weight * BCE."""
    ftl = focal_tversky_loss(pred, target, alpha=alpha, beta=beta, gamma=gamma)
    return ftl_weight * ftl + bce_weight * bce_loss(pred, target)


def dice_loss(pred, target, smooth=1e-6):
    """1 - soft Dice, global flatten over batch."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target)
    return 1.0 - (2.0 * intersection + smooth) / (union + smooth)


def get_loss_function(loss_cfg) -> Callable:
    """Factory from a ``LossConfig`` (mirrors ``losses.py:116-147``)."""
    if loss_cfg.use_combined_loss:
        w = loss_cfg.combined_loss_weights

        def _combined(pred, target):
            return combined_loss(
                pred,
                target,
                ftl_weight=w["focal_tversky"],
                bce_weight=w["bce"],
                alpha=loss_cfg.alpha,
                beta=loss_cfg.beta,
                gamma=loss_cfg.gamma,
            )

        return _combined
    if loss_cfg.name == "FocalTverskyLoss":

        def _ftl(pred, target):
            return focal_tversky_loss(
                pred, target, alpha=loss_cfg.alpha, beta=loss_cfg.beta, gamma=loss_cfg.gamma
            )

        return _ftl
    if loss_cfg.name == "DiceLoss":
        return dice_loss
    raise ValueError(f"Unknown loss function: {loss_cfg.name}")
