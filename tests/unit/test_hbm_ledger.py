"""Joint HBM budget accounting (VERDICT r3 #5): one ledger sums params/opt
state + training corpus + GT id maps (+ padded variants) + cached validation
inputs against the chip's HBM, logs the ledger at startup, and degrades
gracefully (val caches shrink / corpus falls back to host streaming) instead
of oversubscribing silently."""

import numpy as np
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.utils.hbm_ledger import HbmLedger, tree_nbytes


GB = 1 << 30


def test_ledger_accounting_and_reserve():
    led = HbmLedger(capacity_bytes=10 * GB, reserve_frac=0.1)
    assert led.remaining() == 9 * GB
    led.charge("params", 2 * GB)
    assert led.used() == 2 * GB and led.remaining() == 7 * GB
    assert led.try_charge("corpus", 6 * GB)
    assert led.remaining() == 1 * GB
    # refusal: recorded, not applied
    assert not led.try_charge("val_inputs", 2 * GB)
    assert led.used() == 8 * GB
    assert led.denied == {"val_inputs": 2 * GB}
    # smaller request still fits
    assert led.try_charge("val_inputs", GB // 2)
    s = led.summary()
    assert "degraded: val_inputs" in s and "corpus=6.00" in s
    led.release("corpus")
    assert led.remaining() == 6 * GB + GB // 2


def test_unconditional_charge_can_overshoot_but_remaining_floors_at_zero():
    led = HbmLedger(capacity_bytes=GB, reserve_frac=0.0)
    led.charge("params", 2 * GB)  # training is impossible without them
    assert led.remaining() == 0
    assert not led.try_charge("corpus", 1)


def test_env_override_sets_capacity(monkeypatch):
    monkeypatch.setenv("LIGHT_UNET_HBM_GB", "3.5")
    led = HbmLedger()
    assert led.capacity == int(3.5 * GB)


def test_tree_nbytes_counts_leaves():
    tree = {"a": np.zeros((4, 4), np.float32), "b": [np.zeros(10, np.uint8)]}
    assert tree_nbytes(tree) == 4 * 4 * 4 + 10


def test_priority_order_val_shrinks_before_corpus():
    """The trainer's integration order: params unconditional, corpus next,
    val caches last — so under pressure the val cache is refused while the
    corpus stays resident."""
    led = HbmLedger(capacity_bytes=10 * GB, reserve_frac=0.0)
    led.charge("params+opt_state", 1 * GB)
    corpus_budget = min(6.0, led.remaining_gb())
    assert corpus_budget == 6.0
    led.charge("train_corpus", 6 * GB)
    assert led.try_charge("val_gt_ids", 2 * GB)
    assert not led.try_charge("val_inputs", 2 * GB)  # shrinks first
    assert "train_corpus" in led.entries and "val_inputs" in led.denied


def test_trainer_oversubscription_degrades_gracefully(tmp_path, monkeypatch, capsys):
    """With a deliberately tiny HBM capacity: the corpus budget is capped to
    ~0 (host streaming fallback), GT id maps and val-input caches are
    refused (host metrics fallback), the startup ledger line is printed —
    and training/validation still runs correctly."""
    import jax

    from light_unet_tpu.core.trainer import Trainer
    from tests.synthetic import build_raw_dataset, write_split_files

    # ~= params+opt_state bytes: everything else must be refused
    monkeypatch.setenv("LIGHT_UNET_HBM_GB", "0.002")

    ids = [f"{i:04d}" for i in range(1, 5)]
    build_raw_dataset(tmp_path / "proc", ids, shape=(20, 20, 24), seed=3)
    write_split_files(tmp_path / "splits", ids[:3], ids[3:])

    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.training.batch_size = 2
    cfg.training.epochs = 1
    cfg.tpu.patch_batch = 8
    cfg.tpu.z_bucket = 8
    cfg.data.body_mask.enabled = False
    cfg.data_dir = str(tmp_path / "proc")
    cfg.splits_dir = str(tmp_path / "splits")

    trainer = Trainer(cfg, workdir=str(tmp_path))
    out = capsys.readouterr().out
    assert "HBM ledger" in out  # startup ledger line
    assert "budget capped" in out  # corpus budget shrunk by the ledger
    assert trainer.corpus is None  # graceful host-streaming fallback
    assert trainer.ledger.remaining() == 0

    _, metrics = trainer.validate(0)
    assert np.isfinite(metrics["lesion_wise_recall"])
    # device-side caches were refused -> exact host fallback did the work
    fb = trainer.val_fallback_history[0]
    assert fb["host"] >= 1 and fb["device"] == 0
    assert fb["host_fetch_bytes"] > 0 and fb["wall_seconds"] > 0
    assert trainer._val_prep_cache == {}
    assert "val_gt_ids" in trainer.ledger.denied or "val_inputs" in trainer.ledger.denied
    trainer.writer.close()


def test_trainer_ledger_admits_everything_at_normal_capacity(tmp_path, monkeypatch):
    """Same tiny run with a roomy ledger: corpus resident, val inputs and GT
    maps cached, device sweep handles every case."""
    from light_unet_tpu.core.trainer import Trainer
    from tests.synthetic import build_raw_dataset, write_split_files

    monkeypatch.setenv("LIGHT_UNET_HBM_GB", "16")

    ids = [f"{i:04d}" for i in range(1, 5)]
    build_raw_dataset(tmp_path / "proc", ids, shape=(20, 20, 24), seed=3)
    write_split_files(tmp_path / "splits", ids[:3], ids[3:])

    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.training.batch_size = 2
    cfg.training.epochs = 1
    cfg.tpu.patch_batch = 8
    cfg.tpu.z_bucket = 8
    cfg.data.body_mask.enabled = False
    cfg.data_dir = str(tmp_path / "proc")
    cfg.splits_dir = str(tmp_path / "splits")

    trainer = Trainer(cfg, workdir=str(tmp_path))
    assert trainer.corpus is not None
    assert "train_corpus" in trainer.ledger.entries

    _, metrics = trainer.validate(0)
    fb = trainer.val_fallback_history[0]
    assert fb["device"] >= 1 and fb["host"] == 0
    assert "val_gt_ids" in trainer.ledger.entries
    assert "val_inputs" in trainer.ledger.entries
    assert trainer.ledger.denied == {}
    trainer.writer.close()
