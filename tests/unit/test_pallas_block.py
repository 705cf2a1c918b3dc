"""Fused residual-block Pallas kernel: numerics vs the flax oracle, the
layout contract, and the whole-model fused forward.

CPU runs exercise the kernel in interpret mode (bit-for-bit the same
program Mosaic compiles on a chip, minus the DMA overlap); the TPU job in
``scripts/bench_fused_block.py`` provides the compiled-path A/B.

Reference parity: ``/root/reference/light_unet/models/unet3d.py:37-93``
(ResidualBlock) and ``:146-229`` (Lightweight3DUNet).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_unet_tpu.config import ModelConfig
from light_unet_tpu.models.fused_forward import make_fused_apply
from light_unet_tpu.models.unet3d import ResidualBlock, build_model
from light_unet_tpu.ops.pallas_block import (
    fused_block_supported,
    fused_residual_block,
)


def _block_pair(rng, shape, c, dtype):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    mod = ResidualBlock(
        c, use_depthwise_separable=True, use_grouped=False, groups=4,
        dropout_p=0.0, dtype=dtype, precision=None,
    )
    params = mod.init(jax.random.PRNGKey(7), x.astype(dtype), train=False)["params"]
    ref = mod.apply({"params": params}, x.astype(dtype), train=False)
    return x, params, np.asarray(ref, np.float32)


def test_layout_contract_serving_shapes():
    """Every block of the 217K U-Net qualifies at the 48^3 serving patch."""
    ch = ModelConfig().encoder_channels
    serving = [
        ((1, 48, 48, 48, 1), 1, ch[0]),
        ((1, 24, 24, 24, ch[0]), ch[0], ch[1]),
        ((1, 12, 12, 12, ch[1]), ch[1], ch[2]),
        ((1, 6, 6, 6, ch[2]), ch[2], ch[3]),
        ((1, 6, 6, 6, ch[3]), ch[3], ch[3]),
        ((1, 12, 12, 12, 2 * ch[2]), 2 * ch[2], ch[2]),
        ((1, 24, 24, 24, 2 * ch[1]), 2 * ch[1], ch[1]),
        ((1, 48, 48, 48, 2 * ch[0]), 2 * ch[0], ch[0]),
    ]
    for shape, cin, c in serving:
        assert fused_block_supported(shape, cin, c, jnp.bfloat16), (shape, cin, c)
    # off-contract: W*C not a lane multiple / 4-D input
    assert not fused_block_supported((1, 8, 8, 7, 16), 16, 16, jnp.bfloat16)
    assert not fused_block_supported((1, 8, 8, 8), 8, 16, jnp.bfloat16)


@pytest.mark.parametrize(
    "shape,cin,c",
    [
        ((1, 12, 12, 12, 32), 32, 32),   # identity shortcut
        ((1, 12, 12, 12, 32), 32, 64),   # projection shortcut
        ((2, 8, 12, 48, 1), 1, 16),      # cin=1 (init_conv layout), batch 2
        ((1, 6, 6, 6, 128), 128, 128),   # bottleneck: H=6 sublane-pad path
    ],
)
def test_block_matches_flax_f32(rng, shape, cin, c):
    x, params, ref = _block_pair(rng, shape, c, jnp.float32)
    assert fused_block_supported(shape, cin, c, jnp.float32)
    got = np.asarray(
        fused_residual_block(x, params, dtype=jnp.float32, interpret=True),
        np.float32,
    )
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 5e-5, np.abs(got - ref).max()


def test_block_matches_flax_bf16(rng):
    shape, c = (1, 12, 12, 12, 64), 64
    x, params, ref = _block_pair(rng, shape, c, jnp.bfloat16)
    got = np.asarray(
        fused_residual_block(x, params, dtype=jnp.bfloat16, interpret=True),
        np.float32,
    )
    # both paths round intermediates to bf16 at the same points; residual
    # bf16 noise bounds the difference at a few ulps of the output range
    scale = max(np.abs(ref).max(), 1.0)
    assert np.abs(got - ref).max() / scale < 2e-2, np.abs(got - ref).max()


def test_fused_model_matches_model_apply(rng):
    """Whole-model fused forward == model.apply where blocks qualify, and
    exactly the flax modules where they don't (fallback by construction)."""
    mc = ModelConfig()
    model = build_model(mc, jnp.float32, inference=True)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(3), x, train=False)
    ref = np.asarray(model.apply(params, x, train=False), np.float32)
    fused = make_fused_apply(mc, compute_dtype=jnp.float32, interpret=True)
    got = np.asarray(fused(params, x), np.float32)
    assert np.abs(got - ref).max() < 1e-4, np.abs(got - ref).max()


def test_block_fallback_is_bitwise_flax(rng):
    """An off-contract block must route through the flax module unchanged —
    bitwise equal, because it IS the flax module."""
    from light_unet_tpu.models.fused_forward import _block

    mc = ModelConfig()
    shape, c = (1, 8, 8, 7, 16), 16  # W*C = 112, not a lane multiple
    assert not fused_block_supported(shape, 16, c, jnp.float32)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    mod = ResidualBlock(
        c,
        use_depthwise_separable=True,
        use_grouped=bool(mc.use_grouped_conv),
        groups=mc.groups,
        dropout_p=0.0,
        dtype=jnp.float32,
        precision=None,
    )
    params = mod.init(jax.random.PRNGKey(7), x, train=False)["params"]
    ref = np.asarray(mod.apply({"params": params}, x, train=False))
    got = np.asarray(_block(params, x, c, mc, jnp.float32, None, False))
    np.testing.assert_array_equal(got, ref)
