"""Non-finite-update guard (core/trainer.py:_guarded_apply).

One inf/nan gradient step must not poison the params — the reference has no
guard (``light_unet/core/trainer.py:229-236``) and the failure mode is real:
the 2026-08-19 whole-body hard run went nan at epoch 12 from a saturated
focal-pow gradient and never recovered.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import optax

from light_unet_tpu.core.trainer import Trainer, _all_finite, _guarded_apply, _NullWriter


def _setup():
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-2, weight_decay=1e-4)
    return params, tx, tx.init(params)


def test_finite_grads_apply():
    params, tx, opt_state = _setup()
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    new_params, new_opt, ok = _guarded_apply(tx, params, opt_state, grads, jnp.float32(0.5))
    assert float(ok) == 1.0
    assert not np.allclose(np.asarray(new_params["w"]), np.asarray(params["w"]))
    assert int(new_opt.inner_state[0].count) == 1
    assert np.isfinite(
        np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(new_params)])
    ).all()


def test_nonfinite_grads_skip_update_entirely():
    params, tx, opt_state = _setup()
    grads = {"w": jnp.full((4,), jnp.nan), "b": jnp.ones((2,))}
    new_params, new_opt, ok = _guarded_apply(tx, params, opt_state, grads, jnp.float32(0.5))
    assert float(ok) == 0.0
    # params, Adam moments AND the step count are all untouched
    for new, old in zip(
        jax.tree_util.tree_leaves(new_params), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
    for new, old in zip(
        jax.tree_util.tree_leaves(new_opt), jax.tree_util.tree_leaves(opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
    assert int(new_opt.inner_state[0].count) == 0


def test_nonfinite_loss_with_finite_grads_skips():
    params, tx, opt_state = _setup()
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, _, ok = _guarded_apply(tx, params, opt_state, grads, jnp.float32(jnp.inf))
    assert float(ok) == 0.0


def test_guard_recovers_after_one_bad_step():
    """bad step -> skip; the NEXT finite step applies normally."""
    params, tx, opt_state = _setup()
    bad = {"w": jnp.full((4,), jnp.inf), "b": jnp.ones((2,))}
    params, opt_state, ok = _guarded_apply(tx, params, opt_state, bad, jnp.float32(1.0))
    assert float(ok) == 0.0
    good = jax.tree_util.tree_map(jnp.ones_like, params)
    params, opt_state, ok = _guarded_apply(tx, params, opt_state, good, jnp.float32(1.0))
    assert float(ok) == 1.0
    assert np.isfinite(
        np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(params)])
    ).all()
    assert int(opt_state.inner_state[0].count) == 1


def test_guard_under_jit_and_scan():
    """compiles inside jit + lax.scan (the chained-dispatch shape)."""
    params, tx, opt_state = _setup()

    @jax.jit
    def run(params, opt_state, scale_k):
        def body(carry, scale):
            p, o = carry
            grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * scale, p)
            p, o, ok = _guarded_apply(tx, p, o, grads, scale)
            return (p, o), ok

        (params, opt_state), oks = jax.lax.scan(body, (params, opt_state), scale_k)
        return params, opt_state, oks

    scales = jnp.asarray([1.0, jnp.nan, 1.0], jnp.float32)
    params, opt_state, oks = run(params, opt_state, scales)
    np.testing.assert_array_equal(np.asarray(oks), [1.0, 0.0, 1.0])
    assert int(opt_state.inner_state[0].count) == 2
    assert np.isfinite(
        np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(params)])
    ).all()


def test_all_finite_flag():
    assert bool(_all_finite(jnp.float32(1.0), {"a": jnp.ones(3)}))
    assert not bool(_all_finite(jnp.float32(jnp.nan), {"a": jnp.ones(3)}))
    assert not bool(_all_finite(jnp.float32(1.0), {"a": jnp.asarray([1.0, jnp.inf])}))


def test_drain_skipped_counts_and_accumulates(capsys):
    fake = types.SimpleNamespace(
        _epoch_oks=[jnp.asarray([1.0, 0.0, 1.0]), jnp.float32(0.0)],
        skipped_steps_total=0,
        writer=_NullWriter(),
    )
    skipped = Trainer._drain_skipped(fake, epoch=3)
    assert skipped == 2
    assert fake.skipped_steps_total == 2
    assert fake._epoch_oks == []
    assert "skipped 2 non-finite update(s)" in capsys.readouterr().out
    # no flags queued -> no-op
    assert Trainer._drain_skipped(fake, epoch=4) == 0


def test_finite_mean_filters_nan():
    assert Trainer._finite_mean([1.0, float("nan"), 3.0]) == 2.0
    assert Trainer._finite_mean([]) == 0.0
    assert np.isnan(Trainer._finite_mean([float("inf"), float("nan")]))
