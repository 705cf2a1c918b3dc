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


def _focal_pow(base, gamma):
    """``base ** gamma`` with a finite gradient at ``base == 0``.

    ``d/dx x**g = g * x**(g-1)`` diverges at x = 0 for g < 1, and the focal
    term hits base == 0 exactly whenever a batch is predicted perfectly:
    bf16 sigmoids saturate to exact 0.0/1.0, so an easy batch gives
    tp == |target|, fp == fn == 0, tversky == 1 — and the inf gradient
    poisons the params with nan from that step on (observed at epoch 12 of
    the 2026-08-19 whole-body hard run).  The forward value is unchanged
    (x**g for x > 0; 0 for x == 0 == the 0**0.75 limit); the subgradient at
    the loss's minimum is defined as 0.  The reference (f32 torch) has the
    same hazard, just a smaller trigger surface.
    """
    pos = base > 0.0
    return jnp.where(pos, jnp.where(pos, base, 1.0) ** gamma, 0.0)


def focal_tversky_loss(pred, target, alpha=0.7, beta=0.3, gamma=0.75, smooth=1e-6):
    """Focal Tversky loss on probabilities; global flatten over batch."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    tp = jnp.sum(pred * target)
    fp = jnp.sum(pred * (1.0 - target))
    fn = jnp.sum((1.0 - pred) * target)
    tversky = (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)
    return _focal_pow(1.0 - tversky, gamma)


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


def masked_loss(pred, target, valid_mask, *, name, alpha, beta, gamma,
                use_combined, ftl_weight, bce_weight):
    """The configured loss restricted to ``valid_mask`` — equals the plain
    loss on the cropped arrays (up to f32 reassociation), so bucket-padded
    device volumes can be consumed without a per-case-shape recompile.

    FTL/Dice sums are already padding-invariant when pred and target are
    zero in the padding; BCE is NOT (its mean divides by the voxel count and
    the eps-clip makes even a (0, 0) voxel contribute ~1e-7), hence the
    explicit mask.  Used by the trainer's real validation loss — the
    reference hardcodes ``val_loss = 0.0`` (``trainer.py:445``)."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    m = valid_mask.reshape(-1).astype(jnp.float32)
    pred = pred * m
    target = target * m

    def ftl():
        tp = jnp.sum(pred * target)
        fp = jnp.sum(pred * (1.0 - target) * m)
        fn = jnp.sum((1.0 - pred) * target)
        tversky = (tp + 1e-6) / (tp + alpha * fn + beta * fp + 1e-6)
        return _focal_pow(1.0 - tversky, gamma)

    def bce():
        p = jnp.clip(pred, _BCE_EPS, 1.0 - _BCE_EPS)
        terms = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
        return jnp.sum(terms * m) / jnp.maximum(jnp.sum(m), 1.0)

    if use_combined:
        return ftl_weight * ftl() + bce_weight * bce()
    if name == "FocalTverskyLoss":
        return ftl()
    if name == "DiceLoss":
        intersection = jnp.sum(pred * target)
        union = jnp.sum(pred) + jnp.sum(target)
        return 1.0 - (2.0 * intersection + 1e-6) / (union + 1e-6)
    raise ValueError(f"Unknown loss function: {name}")


def get_masked_loss_function(loss_cfg) -> Callable:
    """``fn(pred, target, valid_mask)`` for the configured loss — the
    padding-safe companion of ``get_loss_function`` (see ``masked_loss``)."""
    w = loss_cfg.combined_loss_weights if loss_cfg.use_combined_loss else {}

    def _fn(pred, target, valid_mask):
        return masked_loss(
            pred, target, valid_mask,
            name=loss_cfg.name, alpha=loss_cfg.alpha, beta=loss_cfg.beta,
            gamma=loss_cfg.gamma, use_combined=loss_cfg.use_combined_loss,
            ftl_weight=w.get("focal_tversky", 0.8),
            bce_weight=w.get("bce", 0.2),
        )

    return _fn


def host_val_loss(pred, target, loss_cfg) -> float:
    """Numpy mirror of the configured loss (f32 math) for the host-fallback
    validation path — the probability map was already fetched for metrics,
    so re-uploading 24 MB over the link just to run the jnp loss would cost
    more than the whole fallback; tolerance vs the device path is f32
    reassociation only (pinned by ``tests/unit/test_val_loss.py``)."""
    import numpy as np

    pred = np.asarray(pred, np.float32).reshape(-1)
    target = np.asarray(target, np.float32).reshape(-1)

    def ftl():
        tp = np.float32((pred * target).sum(dtype=np.float32))
        fp = np.float32((pred * (1.0 - target)).sum(dtype=np.float32))
        fn = np.float32(((1.0 - pred) * target).sum(dtype=np.float32))
        tversky = (tp + np.float32(1e-6)) / (
            tp + np.float32(loss_cfg.alpha) * fn + np.float32(loss_cfg.beta) * fp + np.float32(1e-6)
        )
        return float((1.0 - tversky) ** np.float32(loss_cfg.gamma))

    def bce():
        p = np.clip(pred, _BCE_EPS, 1.0 - _BCE_EPS).astype(np.float32)
        terms = -(target * np.log(p) + (1.0 - target) * np.log(1.0 - p))
        return float(terms.mean(dtype=np.float32))

    if loss_cfg.use_combined_loss:
        w = loss_cfg.combined_loss_weights
        return w["focal_tversky"] * ftl() + w["bce"] * bce()
    if loss_cfg.name == "FocalTverskyLoss":
        return ftl()
    if loss_cfg.name == "DiceLoss":
        inter = np.float32((pred * target).sum(dtype=np.float32))
        union = np.float32(pred.sum(dtype=np.float32)) + np.float32(target.sum(dtype=np.float32))
        return float(1.0 - (2.0 * inter + np.float32(1e-6)) / (union + np.float32(1e-6)))
    raise ValueError(f"Unknown loss function: {loss_cfg.name}")


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
