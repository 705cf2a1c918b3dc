"""Fused InstanceNorm+LeakyReLU kernel: numerics, fallbacks, model wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_unet_tpu.config import ModelConfig
from light_unet_tpu.models.unet3d import build_model, init_params
from light_unet_tpu.ops.pallas_kernels import (
    fused_instance_norm_leaky_relu,
    pallas_layout_ok,
    reference_instance_norm_leaky_relu,
)

ON_TPU = jax.default_backend() == "tpu"


def test_layout_contract():
    f32 = jnp.float32
    if ON_TPU:
        assert pallas_layout_ok((2, 24, 24, 24, 32), f32)  # level-2 shape
        assert pallas_layout_ok((2, 12, 12, 12, 64), f32)
        assert not pallas_layout_ok((2, 6, 6, 6, 128), f32)  # D*H=36 unaligned
        assert not pallas_layout_ok((2, 8, 8, 7, 16), f32)  # W*C % 128 != 0
        assert not pallas_layout_ok((2, 48, 48), f32)  # not 5-D
    else:
        # on CPU the kernel must never be selected
        assert not pallas_layout_ok((2, 24, 24, 24, 32), f32)


def test_fallback_matches_reference(rng):
    """Off-contract shapes route through jnp and must be exactly the oracle."""
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 6, 128)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    got = fused_instance_norm_leaky_relu(x, s, b)
    want = reference_instance_norm_leaky_relu(x, s, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel requires a TPU")
def test_kernel_matches_reference_on_tpu(rng):
    for (d, h, w, c) in [(24, 24, 24, 32), (12, 12, 12, 64)]:
        x = jnp.asarray(rng.standard_normal((2, d, h, w, c)).astype(np.float32)) * 3 + 1
        s = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(c).astype(np.float32))
        got = np.asarray(fused_instance_norm_leaky_relu(x, s, b))
        want = np.asarray(reference_instance_norm_leaky_relu(x, s, b))
        assert np.abs(got - want).max() < 1e-4


def test_model_wiring_use_pallas_flag(rng):
    """use_pallas=True must produce the same params and (on CPU, where the
    guard forces the jnp path) identical outputs."""
    x = jnp.asarray(rng.random((1, 16, 16, 16, 1), np.float32))
    outs = {}
    for up in (False, True):
        model = build_model(ModelConfig(), compute_dtype=jnp.float32, inference=True,
                            precision="highest", use_pallas=up)
        params = init_params(model, jax.random.PRNGKey(0), (16, 16, 16))
        outs[up] = np.asarray(model.apply(params, x, train=False))
    if ON_TPU:
        assert np.abs(outs[True] - outs[False]).max() < 5e-2  # bf16-level noise
    else:
        np.testing.assert_array_equal(outs[True], outs[False])
