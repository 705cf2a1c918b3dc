"""Lightweight 3D U-Net, TPU-native (flax.linen, NDHWC layout).

Capability parity with the reference architecture
(``light_unet/models/unet3d.py:146-229``): a 4-level encoder/decoder
(16->32->64->128) of residual blocks built from depthwise-separable or
grouped 3x3x3 convolutions, InstanceNorm (affine) + LeakyReLU(0.01),
2x max-pool downsampling, 2x transposed-conv upsampling with skip
concatenation, and a 1x1x1 conv + sigmoid head.  217,228 parameters.

TPU-first design choices (not a port):

* channels-last ``[B, D, H, W, C]`` layout so the channel dim maps to TPU
  lanes and XLA tiles convs onto the MXU;
* compute dtype is configurable (bfloat16 by default) while parameters and
  normalization statistics stay float32;
* everything is a pure function of ``(params, x)`` — trainable under
  ``jax.grad``/``jit`` and shardable with ``jax.sharding``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LEAKY_SLOPE = 0.01
IN_EPS = 1e-5  # torch InstanceNorm3d default


class InstanceNorm(nn.Module):
    """Affine instance normalization over spatial dims of ``[B,D,H,W,C]``.

    Matches torch ``InstanceNorm3d(C, affine=True)``: per-sample, per-channel
    mean/variance (biased) over the spatial volume, eps 1e-5.  Statistics are
    computed in float32 regardless of compute dtype.

    Call-time flags: ``use_pallas`` routes through the fused single-HBM-pass
    Pallas kernel (inference only — it has no VJP), optionally folding the
    following LeakyReLU in via ``fuse_leaky`` (the kernel with slope=1 is a
    plain InstanceNorm).  The parameter tree is identical either way.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_pallas: bool = False, fuse_leaky: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if use_pallas:
            from light_unet_tpu.ops.pallas_kernels import fused_instance_norm_leaky_relu

            slope = LEAKY_SLOPE if fuse_leaky else 1.0
            y = fused_instance_norm_leaky_relu(
                x, scale, bias, eps=IN_EPS, negative_slope=slope
            )
            return y.astype(self.dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + IN_EPS)
        y = y * scale + bias
        if fuse_leaky:
            y = nn.leaky_relu(y, negative_slope=LEAKY_SLOPE)
        return y.astype(self.dtype)


def _leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


class DepthwiseSeparableConv(nn.Module):
    """3x3x3 depthwise conv followed by 1x1x1 pointwise conv (both bias-free)."""

    features: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            features=in_ch,
            kernel_size=(3, 3, 3),
            padding="SAME",
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            precision=self.precision,
            name="depthwise",
        )(x)
        x = nn.Conv(
            features=self.features,
            kernel_size=(1, 1, 1),
            use_bias=False,
            dtype=self.dtype,
            precision=self.precision,
            name="pointwise",
        )(x)
        return x


class ResidualBlock(nn.Module):
    """conv -> IN -> LeakyReLU -> (channel dropout) -> conv -> IN -> +res -> LeakyReLU."""

    features: int
    use_depthwise_separable: bool = True
    use_grouped: bool = True
    groups: int = 8
    dropout_p: float = 0.1
    dtype: Any = jnp.float32
    precision: Any = None
    use_pallas: bool = False

    def _conv(self, x, features: int, name: str):
        in_ch = x.shape[-1]
        if self.use_depthwise_separable:
            return DepthwiseSeparableConv(
                features, dtype=self.dtype, precision=self.precision, name=name
            )(x)
        groups = self.groups
        if self.use_grouped and groups > 1 and in_ch >= groups and features >= groups:
            return nn.Conv(
                features,
                kernel_size=(3, 3, 3),
                padding="SAME",
                feature_group_count=groups,
                use_bias=False,
                dtype=self.dtype,
                precision=self.precision,
                name=name,
            )(x)
        return nn.Conv(
            features,
            kernel_size=(3, 3, 3),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            precision=self.precision,
            name=name,
        )(x)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        if in_ch != self.features:
            residual = nn.Conv(
                self.features,
                kernel_size=(1, 1, 1),
                use_bias=False,
                dtype=self.dtype,
                precision=self.precision,
                name="shortcut_conv",
            )(x)
            residual = InstanceNorm(dtype=self.dtype, name="shortcut_norm")(
                residual, use_pallas=self.use_pallas and not train
            )
        else:
            residual = x

        pallas = self.use_pallas and not train  # the fused kernel has no VJP
        out = self._conv(x, self.features, "conv1")
        out = InstanceNorm(dtype=self.dtype, name="norm1")(
            out, use_pallas=pallas, fuse_leaky=True
        )
        if self.dropout_p > 0:
            # channel dropout (torch Dropout3d): drop whole channels per sample
            out = nn.Dropout(
                rate=self.dropout_p, broadcast_dims=(1, 2, 3), deterministic=not train
            )(out)
        out = self._conv(out, self.features, "conv2")
        out = InstanceNorm(dtype=self.dtype, name="norm2")(out, use_pallas=pallas)
        out = out + residual
        return _leaky_relu(out)


class DownBlock(nn.Module):
    """2x max-pool then residual block."""

    features: int
    use_depthwise_separable: bool = True
    use_grouped: bool = True
    groups: int = 8
    dropout_p: float = 0.1
    dtype: Any = jnp.float32
    precision: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
        return ResidualBlock(
            self.features,
            self.use_depthwise_separable,
            self.use_grouped,
            self.groups,
            self.dropout_p,
            self.dtype,
            self.precision,
            use_pallas=self.use_pallas,
            name="res_block",
        )(x, train=train)


class UpBlock(nn.Module):
    """2x transposed conv, pad-to-skip, concat [up, skip], residual block."""

    features: int
    use_depthwise_separable: bool = True
    use_grouped: bool = True
    groups: int = 8
    dropout_p: float = 0.1
    dtype: Any = jnp.float32
    precision: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        in_ch = x.shape[-1]
        x = nn.ConvTranspose(
            features=in_ch // 2,
            kernel_size=(2, 2, 2),
            strides=(2, 2, 2),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            precision=self.precision,
            name="up",
        )(x)
        # pad (centered) if the upsampled volume is smaller than the skip
        pads = []
        for axis in (1, 2, 3):
            diff = skip.shape[axis] - x.shape[axis]
            pads.append((diff // 2, diff - diff // 2))
        if any(p != (0, 0) for p in pads):
            x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
        x = jnp.concatenate([x, skip], axis=-1)
        return ResidualBlock(
            self.features,
            self.use_depthwise_separable,
            self.use_grouped,
            self.groups,
            self.dropout_p,
            self.dtype,
            self.precision,
            use_pallas=self.use_pallas,
            name="res_block",
        )(x, train=train)


class Lightweight3DUNet(nn.Module):
    """217,228-parameter 3D U-Net head-to-toe on TPU.

    Input  ``[B, D, H, W, in_channels]`` -> output probabilities (sigmoid)
    ``[B, D, H, W, out_channels]``.
    """

    in_channels: int = 1
    out_channels: int = 1
    encoder_channels: Sequence[int] = (16, 32, 64, 128)
    use_depthwise_separable: bool = True
    use_grouped: bool = True
    groups: int = 8
    dropout_p: float = 0.1
    dtype: Any = jnp.float32
    precision: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        ch = list(self.encoder_channels)
        kw = dict(
            use_depthwise_separable=self.use_depthwise_separable,
            use_grouped=self.use_grouped,
            groups=self.groups,
            dropout_p=self.dropout_p,
            dtype=self.dtype,
            precision=self.precision,
            use_pallas=self.use_pallas,
        )
        x = x.astype(self.dtype)
        # first block never uses grouped conv (depthwise-separable still allowed)
        x1 = ResidualBlock(ch[0], **{**kw, "use_grouped": False}, name="init_conv")(x, train=train)
        x2 = DownBlock(ch[1], **kw, name="down1")(x1, train=train)
        x3 = DownBlock(ch[2], **kw, name="down2")(x2, train=train)
        x4 = DownBlock(ch[3], **kw, name="down3")(x3, train=train)

        y = ResidualBlock(ch[3], **kw, name="bottleneck")(x4, train=train)

        y = UpBlock(ch[2], **kw, name="up1")(y, x3, train=train)
        y = UpBlock(ch[1], **kw, name="up2")(y, x2, train=train)
        y = UpBlock(ch[0], **kw, name="up3")(y, x1, train=train)

        y = nn.Conv(
            self.out_channels,
            kernel_size=(1, 1, 1),
            use_bias=True,
            precision=self.precision,
            name="out_conv",
        )(y)
        return nn.sigmoid(y.astype(jnp.float32))


def build_model(
    model_cfg, compute_dtype=jnp.float32, inference: bool = False, precision=None,
    use_pallas: bool = False,
) -> Lightweight3DUNet:
    """Construct the model from a ``ModelConfig`` (same switches as the
    reference ctor at ``light_unet/core/trainer.py:57-66``).

    ``precision``: lax.Precision for convs.  With float32 compute, pass
    "highest" for full-f32 MXU passes (parity mode); None lets the platform
    default (fast bf16 passes) apply.
    """
    dropout = model_cfg.dropout_p if (model_cfg.use_dropout and not inference) else 0.0
    return Lightweight3DUNet(
        in_channels=1,
        out_channels=model_cfg.output_channels,
        encoder_channels=tuple(model_cfg.encoder_channels),
        use_depthwise_separable=model_cfg.use_depthwise_separable,
        use_grouped=model_cfg.use_grouped_conv,
        groups=model_cfg.groups,
        dropout_p=dropout,
        dtype=compute_dtype,
        precision=precision,
        use_pallas=use_pallas,
    )


def init_params(model: Lightweight3DUNet, rng: jax.Array, patch_size=(48, 48, 48)):
    """Initialize parameters with a dummy forward on one patch."""
    dummy = jnp.zeros((1, *patch_size, model.in_channels), jnp.float32)
    return model.init({"params": rng}, dummy)


def count_parameters(params) -> dict:
    """Total/trainable parameter counts (all params are trainable)."""
    total = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return {"total": total, "trainable": total}
