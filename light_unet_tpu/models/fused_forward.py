"""Whole-model inference forward with fused Pallas residual blocks.

``make_fused_apply`` builds a pure ``fn(params, x)`` that mirrors
``Lightweight3DUNet.__call__`` (``models/unet3d.py``) reading the param
tree directly: every residual block runs through the single-HBM-pass
Pallas kernel (``ops/pallas_block.py``) when its layout qualifies, and
through the regular flax module otherwise; max-pool / transposed-conv /
head stay flax ops applied with the extracted subtrees, so their numerics
are the lax path's by construction.

Inference-only (the Pallas kernel has no VJP); the training step keeps
``model.apply``.  The param tree is the standard checkpoint tree — no
re-packing, so reference ``.pth`` imports work unchanged.

Reference parity: ``/root/reference/light_unet/models/unet3d.py:146-229``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from light_unet_tpu.models.unet3d import ResidualBlock
from light_unet_tpu.ops.pallas_block import fused_block_supported, fused_residual_block


def _block(p_blk, x, features: int, model_cfg, dtype, precision, interpret,
           grouped: bool | None = None):
    cin = x.shape[-1]
    use_dws = bool(model_cfg.use_depthwise_separable)
    if use_dws and fused_block_supported(x.shape, cin, features, dtype):
        return fused_residual_block(
            x, p_blk, dtype=dtype, precision=precision, interpret=interpret
        )
    return ResidualBlock(
        features,
        use_depthwise_separable=use_dws,
        use_grouped=bool(model_cfg.use_grouped_conv) if grouped is None else grouped,
        groups=model_cfg.groups,
        dropout_p=0.0,
        dtype=dtype,
        precision=precision,
    ).apply({"params": p_blk}, x, train=False)


def _up(p_up, x, dtype, precision):
    in_ch = x.shape[-1]
    return nn.ConvTranspose(
        features=in_ch // 2,
        kernel_size=(2, 2, 2),
        strides=(2, 2, 2),
        padding="VALID",
        use_bias=True,
        dtype=dtype,
        precision=precision,
    ).apply({"params": p_up}, x)


def _pad_concat(x, skip):
    pads = []
    for axis in (1, 2, 3):
        diff = skip.shape[axis] - x.shape[axis]
        pads.append((diff // 2, diff - diff // 2))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
    return jnp.concatenate([x, skip], axis=-1)


def make_fused_apply(
    model_cfg, compute_dtype=jnp.bfloat16, precision: Any = None,
    interpret: bool = False,
):
    """Return ``fn(params, x)`` equivalent to
    ``build_model(model_cfg, compute_dtype, inference=True).apply(params, x,
    train=False)`` with fused-block acceleration."""
    ch = list(model_cfg.encoder_channels)
    out_channels = model_cfg.output_channels

    def apply_fn(params, x):
        p = params["params"]
        kw = dict(
            model_cfg=model_cfg, dtype=compute_dtype, precision=precision,
            interpret=interpret,
        )
        x = x.astype(compute_dtype)
        # the model's first block never uses grouped conv (unet3d.py:285)
        x1 = _block(p["init_conv"], x, ch[0], **kw, grouped=False)
        x2 = _block(
            p["down1"]["res_block"],
            nn.max_pool(x1, (2, 2, 2), strides=(2, 2, 2)), ch[1], **kw,
        )
        x3 = _block(
            p["down2"]["res_block"],
            nn.max_pool(x2, (2, 2, 2), strides=(2, 2, 2)), ch[2], **kw,
        )
        x4 = _block(
            p["down3"]["res_block"],
            nn.max_pool(x3, (2, 2, 2), strides=(2, 2, 2)), ch[3], **kw,
        )
        y = _block(p["bottleneck"], x4, ch[3], **kw)

        y = _pad_concat(_up(p["up1"]["up"], y, compute_dtype, precision), x3)
        y = _block(p["up1"]["res_block"], y, ch[2], **kw)
        y = _pad_concat(_up(p["up2"]["up"], y, compute_dtype, precision), x2)
        y = _block(p["up2"]["res_block"], y, ch[1], **kw)
        y = _pad_concat(_up(p["up3"]["up"], y, compute_dtype, precision), x1)
        y = _block(p["up3"]["res_block"], y, ch[0], **kw)

        y = nn.Conv(
            out_channels, kernel_size=(1, 1, 1), use_bias=True, precision=precision,
        ).apply({"params": p["out_conv"]}, y)
        return nn.sigmoid(y.astype(jnp.float32))

    return apply_fn
