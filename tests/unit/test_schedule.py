"""LR scheduler parity with torch semantics (stepped per epoch)."""

import math

import pytest

from light_unet_tpu.config import SchedulerConfig
from light_unet_tpu.core.schedule import LRScheduler


def test_cosine_matches_torch_formula():
    cfg = SchedulerConfig(name="CosineAnnealingLR", T_max=10, eta_min=1e-6)
    sched = LRScheduler(cfg, base_lr=1e-4)
    lrs = []
    for _ in range(11):
        lrs.append(sched.current_lr())
        sched.step()
    for e, lr in enumerate(lrs):
        expected = 1e-6 + (1e-4 - 1e-6) * (1 + math.cos(math.pi * e / 10)) / 2
        assert lr == pytest.approx(expected, rel=1e-9), f"epoch {e}"
    assert lrs[0] == pytest.approx(1e-4)
    assert lrs[10] == pytest.approx(1e-6)


def test_warmup_then_cosine():
    cfg = SchedulerConfig(name="CosineAnnealingLR", T_max=200, eta_min=1e-6)
    sched = LRScheduler(cfg, base_lr=1e-4, use_warmup=True, warmup_epochs=5)
    warm = []
    for _ in range(5):
        warm.append(sched.current_lr())
        sched.step()
    assert warm == pytest.approx([2e-5, 4e-5, 6e-5, 8e-5, 1e-4])
    after = sched.current_lr()
    expected = 1e-6 + (1e-4 - 1e-6) * (1 + math.cos(math.pi * 5 / 200)) / 2
    assert after == pytest.approx(expected)


def test_plateau_reduces_after_patience():
    cfg = SchedulerConfig(name="ReduceLROnPlateau", mode="max", factor=0.5, patience=2, min_lr=1e-6)
    sched = LRScheduler(cfg, base_lr=1e-3)
    sched.step(0.5)  # best
    assert sched.current_lr() == pytest.approx(1e-3)
    sched.step(0.4)  # stale 1
    sched.step(0.4)  # stale 2
    assert sched.current_lr() == pytest.approx(1e-3)
    sched.step(0.4)  # stale 3 > patience -> reduce
    assert sched.current_lr() == pytest.approx(5e-4)
    sched.step(0.9)  # new best resets
    assert sched.current_lr() == pytest.approx(5e-4)


def test_plateau_min_lr_floor():
    cfg = SchedulerConfig(name="ReduceLROnPlateau", mode="max", factor=0.1, patience=0, min_lr=1e-5)
    sched = LRScheduler(cfg, base_lr=1e-4)
    sched.step(0.5)
    for _ in range(10):
        sched.step(0.1)
    assert sched.current_lr() == pytest.approx(1e-5)


def test_state_roundtrip():
    cfg = SchedulerConfig(name="ReduceLROnPlateau", mode="max", factor=0.5, patience=1)
    a = LRScheduler(cfg, base_lr=1e-3)
    a.step(0.5)
    a.step(0.3)
    a.step(0.3)
    b = LRScheduler(cfg, base_lr=1e-3)
    b.load_state_dict(a.state_dict())
    assert b.current_lr() == a.current_lr()
    assert b.epoch == a.epoch
