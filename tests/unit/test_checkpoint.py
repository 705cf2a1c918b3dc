"""Checkpoint save/restore, rotation, optax state round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from light_unet_tpu.core.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
)


def _small_state():
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)
    return params, tx, opt_state


def test_roundtrip_params_and_opt_state(tmp_path):
    params, tx, opt_state = _small_state()
    # take one update so opt state is non-trivial
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    meta = {"epoch": 3, "best_recall": 0.75, "history": {"train_loss": [1.0, 0.5]}}
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, {"params": params, "opt_state": opt_state}, meta)

    t_params, t_tx, t_opt = _small_state()
    arrays, meta2 = load_checkpoint(path, {"params": t_params, "opt_state": t_opt})
    assert meta2["epoch"] == 3 and meta2["best_recall"] == 0.75
    np.testing.assert_array_equal(np.asarray(arrays["params"]["w"]), np.asarray(params["w"]))
    # optimizer moments restored
    flat_a = jax.tree_util.tree_leaves(arrays["opt_state"])
    flat_b = jax.tree_util.tree_leaves(opt_state)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored state is usable for another update
    updates, _ = t_tx.update(grads, arrays["opt_state"], arrays["params"])
    assert jax.tree_util.tree_leaves(updates)


def test_rejects_non_checkpoint(tmp_path):
    p = tmp_path / "junk.ckpt"
    p.write_bytes(b"garbage file")
    with pytest.raises(ValueError, match="not a light_unet_tpu checkpoint"):
        load_checkpoint(p)


def test_rotation_and_latest(tmp_path):
    params, _, opt_state = _small_state()
    for epoch in (10, 20, 30, 40):
        save_checkpoint(
            tmp_path / f"checkpoint_epoch_{epoch:03d}.ckpt",
            {"params": params},
            {"epoch": epoch},
        )
    rotate_checkpoints(tmp_path, keep_last_n=2)
    remaining = sorted(p.name for p in tmp_path.glob("checkpoint_epoch_*.ckpt"))
    assert remaining == ["checkpoint_epoch_030.ckpt", "checkpoint_epoch_040.ckpt"]
    assert latest_checkpoint(tmp_path).name == "checkpoint_epoch_040.ckpt"


def test_load_without_template_returns_raw(tmp_path):
    params, _, _ = _small_state()
    save_checkpoint(tmp_path / "x.ckpt", {"params": params}, {"epoch": 0})
    arrays, _ = load_checkpoint(tmp_path / "x.ckpt")
    assert isinstance(arrays, dict)
    np.testing.assert_array_equal(arrays["params"]["w"], np.asarray(params["w"]))


def test_rotation_numeric_past_epoch_999(tmp_path):
    """ADVICE r1: rotation must sort numerically — lexicographic order puts
    checkpoint_epoch_1000 before ..._999 and deletes the newest files."""
    params, _, _ = _small_state()
    for epoch in (998, 999, 1000, 1001):
        save_checkpoint(
            tmp_path / f"checkpoint_epoch_{epoch:03d}.ckpt",
            {"params": params},
            {"epoch": epoch},
        )
    rotate_checkpoints(tmp_path, keep_last_n=2)
    remaining = sorted(p.name for p in tmp_path.glob("checkpoint_epoch_*.ckpt"))
    assert remaining == ["checkpoint_epoch_1000.ckpt", "checkpoint_epoch_1001.ckpt"]
    assert latest_checkpoint(tmp_path).name == "checkpoint_epoch_1001.ckpt"
