"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.models.losses import focal_tversky_loss
from light_unet_tpu.models.unet3d import Lightweight3DUNet, init_params
from light_unet_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    mesh_from_config,
    replicate,
    shard_batch,
)


def test_virtual_devices_present():
    assert jax.device_count() >= 8


def test_create_mesh_and_shardings():
    mesh = create_mesh()
    assert mesh.axis_names == ("data",)
    assert int(np.prod(mesh.devices.shape)) == jax.device_count()
    s = batch_sharding(mesh)
    x = np.zeros((16, 4, 4), np.float32)
    arr = jax.device_put(x, s)
    assert len(arr.sharding.device_set) == jax.device_count()


def test_mesh_from_config_uses_all_devices():
    cfg = Config()
    mesh = mesh_from_config(cfg.tpu)
    assert mesh is not None
    assert int(np.prod(mesh.devices.shape)) == jax.device_count()


def test_shard_batch_and_replicate_roundtrip(rng):
    mesh = create_mesh()
    imgs = rng.random((8, 6, 6, 6, 1)).astype(np.float32)
    sharded = shard_batch(imgs, mesh)
    np.testing.assert_array_equal(np.asarray(sharded), imgs)
    params = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(params, mesh)
    np.testing.assert_array_equal(np.asarray(rep["w"]), params["w"])


def test_data_parallel_grad_matches_single_device(rng):
    """Sharded-batch grad must equal the single-device grad (XLA inserts the
    cross-device reduction because the loss is a global sum)."""
    model = Lightweight3DUNet(encoder_channels=(4, 8, 16, 32), dropout_p=0.0)
    params = init_params(model, jax.random.PRNGKey(0), (8, 8, 8))
    imgs = rng.random((8, 8, 8, 8, 1)).astype(np.float32)
    lbls = (rng.random((8, 8, 8, 8, 1)) > 0.8).astype(np.float32)

    def loss_fn(p, x, y):
        return focal_tversky_loss(model.apply(p, x), y)

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_single = grad_fn(params, jnp.asarray(imgs), jnp.asarray(lbls))

    mesh = create_mesh()
    p_rep = replicate(params, mesh)
    x_sh, y_sh = shard_batch((imgs, lbls), mesh)
    g_sharded = grad_fn(p_rep, x_sh, y_sh)

    for a, b in zip(jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_data_parallel_train_step_runs(rng):
    """Full AdamW step over the mesh: params stay replicated and in sync."""
    model = Lightweight3DUNet(encoder_channels=(4, 8, 16, 32), dropout_p=0.0)
    params = init_params(model, jax.random.PRNGKey(0), (8, 8, 8))
    tx = optax.adamw(1e-3)
    mesh = create_mesh()
    params = replicate(params, mesh)
    opt_state = replicate(tx.init(params), mesh)

    @jax.jit
    def step(p, o, x, y):
        loss, grads = jax.value_and_grad(
            lambda q: focal_tversky_loss(model.apply(q, x), y)
        )(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    imgs = rng.random((8, 8, 8, 8, 1)).astype(np.float32)
    lbls = (rng.random((8, 8, 8, 8, 1)) > 0.8).astype(np.float32)
    x_sh, y_sh = shard_batch((imgs, lbls), mesh)
    p1, o1, loss1 = step(params, opt_state, x_sh, y_sh)
    p2, _, loss2 = step(p1, o1, x_sh, y_sh)
    assert float(loss2) < float(loss1)  # optimizing
    leaf = jax.tree_util.tree_leaves(p2)[0]
    assert np.isfinite(np.asarray(leaf)).all()
