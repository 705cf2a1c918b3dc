"""Loss golden tests against straightforward numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_unet_tpu.config import LossConfig
from light_unet_tpu.models import losses


@pytest.fixture
def data(rng):
    pred = rng.random((2, 8, 8, 8, 1)).astype(np.float32)
    target = (rng.random((2, 8, 8, 8, 1)) > 0.7).astype(np.float32)
    return pred, target


def _ftl_numpy(pred, target, alpha=0.7, beta=0.3, gamma=0.75, smooth=1e-6):
    p, t = pred.ravel().astype(np.float64), target.ravel().astype(np.float64)
    tp = (p * t).sum()
    fp = (p * (1 - t)).sum()
    fn = ((1 - p) * t).sum()
    ti = (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)
    return (1 - ti) ** gamma


def test_focal_tversky_golden(data):
    pred, target = data
    ours = float(losses.focal_tversky_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, _ftl_numpy(pred, target), rtol=1e-5)


def test_ftl_perfect_prediction_is_zero():
    t = np.zeros((1, 4, 4, 4, 1), np.float32)
    t[0, 1:3, 1:3, 1:3, 0] = 1.0
    loss = float(losses.focal_tversky_loss(jnp.asarray(t), jnp.asarray(t)))
    assert loss < 1e-3


def test_ftl_alpha_weights_fn_heavier_than_fp():
    """alpha=0.7 penalizes misses more than false alarms of equal mass."""
    target = np.zeros((1, 4, 4, 4, 1), np.float32)
    target[0, :2] = 1.0
    miss = target * 0.5  # under-segmentation -> FN mass
    spill = np.clip(target + 0.5 * (1 - target), 0, 1)  # over-segmentation -> FP mass
    l_miss = float(losses.focal_tversky_loss(jnp.asarray(miss), jnp.asarray(target)))
    l_spill = float(losses.focal_tversky_loss(jnp.asarray(spill), jnp.asarray(target)))
    assert l_miss > l_spill


def test_bce_golden(data):
    pred, target = data
    p = np.clip(pred.ravel().astype(np.float64), 1e-7, 1 - 1e-7)
    t = target.ravel().astype(np.float64)
    expected = -(t * np.log(p) + (1 - t) * np.log(1 - p)).mean()
    ours = float(losses.bce_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_combined_weights(data):
    pred, target = data
    ftl = float(losses.focal_tversky_loss(jnp.asarray(pred), jnp.asarray(target)))
    bce = float(losses.bce_loss(jnp.asarray(pred), jnp.asarray(target)))
    comb = float(losses.combined_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(comb, 0.8 * ftl + 0.2 * bce, rtol=1e-5)


def test_dice_golden(data):
    pred, target = data
    p, t = pred.ravel().astype(np.float64), target.ravel().astype(np.float64)
    expected = 1 - (2 * (p * t).sum() + 1e-6) / (p.sum() + t.sum() + 1e-6)
    ours = float(losses.dice_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_factory(data):
    pred, target = data
    pred, target = jnp.asarray(pred), jnp.asarray(target)
    fn = losses.get_loss_function(LossConfig())
    np.testing.assert_allclose(float(fn(pred, target)), float(losses.focal_tversky_loss(pred, target)))
    fn = losses.get_loss_function(LossConfig(use_combined_loss=True))
    np.testing.assert_allclose(float(fn(pred, target)), float(losses.combined_loss(pred, target)))
    fn = losses.get_loss_function(LossConfig(name="DiceLoss"))
    np.testing.assert_allclose(float(fn(pred, target)), float(losses.dice_loss(pred, target)))


def test_factory_unknown_raises():
    cfg = LossConfig()
    cfg.name = "Nope"
    with pytest.raises(ValueError):
        losses.get_loss_function(cfg)


def test_losses_differentiable(data):
    import jax

    pred, target = data
    g = jax.grad(lambda p: losses.focal_tversky_loss(p, jnp.asarray(target)))(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()


def test_ftl_grad_finite_at_perfect_prediction():
    """tversky == 1 exactly (bf16 sigmoids saturate to 0/1 on easy batches)
    must NOT produce an inf gradient: d/dx x**0.75 diverges at x == 0, which
    poisoned the 2026-08-19 whole-body run with nan params at epoch 12."""
    import jax

    t = np.zeros((1, 4, 4, 4, 1), np.float32)
    t[0, 1:3, 1:3, 1:3, 0] = 1.0
    pred = jnp.asarray(t)  # pred == target exactly -> tp=|t|, fp=fn=0
    loss, g = jax.value_and_grad(
        lambda p: losses.focal_tversky_loss(p, jnp.asarray(t))
    )(pred)
    assert float(loss) == 0.0  # forward value unchanged by the safe pow
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_array_equal(np.asarray(g), 0.0)  # subgradient at the min

    # the masked variant has the same pow
    m = jnp.ones_like(pred)
    loss_m, g_m = jax.value_and_grad(
        lambda p: losses.masked_loss(
            p, jnp.asarray(t), m, name="FocalTverskyLoss",
            alpha=0.7, beta=0.3, gamma=0.75,
            use_combined=False, ftl_weight=0.8, bce_weight=0.2,
        )
    )(pred)
    assert float(loss_m) == 0.0
    assert np.isfinite(np.asarray(g_m)).all()
