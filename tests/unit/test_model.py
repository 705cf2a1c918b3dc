"""Model architecture tests: parameter count, shapes, conv semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from light_unet_tpu.config import ModelConfig
from light_unet_tpu.models.unet3d import (
    InstanceNorm,
    Lightweight3DUNet,
    build_model,
    count_parameters,
    init_params,
)


@pytest.fixture(scope="module")
def model_and_params():
    # param count is spatial-size independent; init small for CPU test speed
    model = Lightweight3DUNet()
    params = init_params(model, jax.random.PRNGKey(0), (16, 16, 16))
    return model, params


def test_parameter_count_exact(model_and_params):
    """Reference spec: 217,228 parameters (README.md:10, unet3d.py:225-229)."""
    _, params = model_and_params
    counts = count_parameters(params)
    assert counts == {"total": 217228, "trainable": 217228}


def test_forward_shape_and_range(model_and_params):
    """Patch-sized (48^3) forward: shape-preserving, sigmoid range."""
    model, params = model_and_params
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 48, 48, 1))
    y = model.apply(params, x)
    assert y.shape == (1, 48, 48, 48, 1)
    assert y.dtype == jnp.float32
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_forward_nontrivial(model_and_params):
    model, params = model_and_params
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 16, 1))
    y0 = model.apply(params, jnp.zeros_like(x))
    y1 = model.apply(params, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_dropout_only_in_train_mode(model_and_params):
    model, params = model_and_params
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 16, 16, 16, 1))
    a = model.apply(params, x)
    b = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eval deterministic
    c = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(4)})
    d = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_instance_norm_matches_torch(rng):
    """Our InstanceNorm must match torch.nn.functional.instance_norm."""
    x = rng.standard_normal((2, 6, 7, 5, 3)).astype(np.float32)  # NDHWC
    norm = InstanceNorm()
    params = norm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    scale = rng.standard_normal(3).astype(np.float32)
    bias = rng.standard_normal(3).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    ours = np.asarray(norm.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
    theirs = F.instance_norm(
        xt, weight=torch.from_numpy(scale), bias=torch.from_numpy(bias), eps=1e-5
    ).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_grouped_conv_matches_torch(rng, groups):
    """lax grouped 3x3x3 conv (SAME) vs torch Conv3d(padding=1, groups=g)."""
    import flax.linen as nn

    in_ch, out_ch = 4, 8
    x = rng.standard_normal((1, 5, 6, 7, in_ch)).astype(np.float32)
    conv = nn.Conv(out_ch, (3, 3, 3), padding="SAME", feature_group_count=groups, use_bias=False)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])  # [3,3,3, in/groups, out]
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    # torch kernel layout: [out, in/groups, kd, kh, kw]
    wt = torch.from_numpy(np.transpose(kernel, (4, 3, 0, 1, 2)).copy())
    theirs = F.conv3d(xt, wt, padding=1, groups=groups).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_transposed_conv_matches_torch(rng):
    """flax ConvTranspose k2 s2 VALID vs torch ConvTranspose3d(k2, s2)."""
    import flax.linen as nn

    in_ch, out_ch = 4, 2
    x = rng.standard_normal((1, 3, 4, 5, in_ch)).astype(np.float32)
    convt = nn.ConvTranspose(out_ch, (2, 2, 2), strides=(2, 2, 2), padding="VALID", use_bias=False)
    params = convt.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])  # [2,2,2, in, out]
    ours = np.asarray(convt.apply(params, jnp.asarray(x)))
    assert ours.shape == (1, 6, 8, 10, out_ch)

    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    # torch layout [in, out, kd, kh, kw]; flax stores the spatially-flipped
    # kernel relative to torch's gradient-of-conv convention
    wt = torch.from_numpy(np.transpose(kernel[::-1, ::-1, ::-1], (3, 4, 0, 1, 2)).copy())
    theirs = F.conv_transpose3d(xt, wt, stride=2).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_build_model_from_config():
    cfg = ModelConfig()
    model = build_model(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    assert count_parameters(params)["total"] == 217228
    inf_model = build_model(cfg, inference=True)
    assert inf_model.dropout_p == 0.0


def test_bfloat16_compute_keeps_f32_params_and_output():
    model = Lightweight3DUNet(dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), (16, 16, 16))
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
    y = model.apply(params, jnp.ones((1, 16, 16, 16, 1)))
    assert y.dtype == jnp.float32

    f32 = Lightweight3DUNet(dtype=jnp.float32)
    y32 = f32.apply(params, jnp.ones((1, 16, 16, 16, 1)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y32), atol=0.05)
