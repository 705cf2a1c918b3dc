"""Tracing hooks: StageTimer accounting and maybe_profile no-op/active paths."""

import json

import jax.numpy as jnp

from light_unet_tpu.utils.tracing import StageTimer, maybe_profile


def test_stage_timer_accumulates(tmp_path):
    t = StageTimer()
    with t.time("decode"):
        pass
    with t.time("decode"):
        pass
    with t.time("infer"):
        pass
    s = t.summary()
    assert s["decode"]["calls"] == 2
    assert s["infer"]["calls"] == 1
    assert s["decode"]["total_seconds"] >= 0
    t.save(tmp_path / "stages.json")
    assert json.load(open(tmp_path / "stages.json"))["infer"]["calls"] == 1


def test_maybe_profile_noop(monkeypatch):
    monkeypatch.delenv("LIGHT_UNET_PROFILE", raising=False)
    with maybe_profile(None) as d:
        assert d is None


def test_maybe_profile_writes_trace(tmp_path, monkeypatch):
    monkeypatch.delenv("LIGHT_UNET_PROFILE", raising=False)
    with maybe_profile(str(tmp_path / "trace")) as d:
        (jnp.ones((8, 8)) * 2).block_until_ready()
        assert d is not None
    assert any((tmp_path / "trace").rglob("*"))  # plugin dir created
