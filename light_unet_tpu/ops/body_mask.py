"""Body-mask generation, fused on device.

Equivalent of the reference's scipy pipeline
(``scripts/preprocess_data.py:91-174``): threshold the normalized PET volume
(default 0.02), binary closing with an L1 ball of radius ``closing_voxels``,
keep the largest connected component, dilate ``dilate_voxels``.  Here the
whole chain — threshold, 30 shifted-min/max sweeps, CCL, component-size
argmax, dilation — is a single jit-compiled XLA program; only the bbox and
metadata assembly run on host.

Metadata schema matches the reference (voxel_counts at each stage + bbox).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_unet_tpu.ops.ccl import keep_largest_component
from light_unet_tpu.ops.morphology import binary_closing, binary_dilation


def body_mask_core(normalized, valid, threshold, closing_voxels, keep_largest, dilate_voxels):
    """Traceable core shared with the fused per-volume programs (ops/fused.py)."""
    mask = (normalized > threshold).astype(jnp.float32) * valid
    initial = jnp.sum(mask)
    if closing_voxels > 0:
        mask = binary_closing(mask, closing_voxels, valid)
    after_closing = jnp.sum(mask)
    after_largest = after_closing
    if keep_largest:
        mask = keep_largest_component(mask)
        after_largest = jnp.sum(mask)
    if dilate_voxels > 0:
        mask = binary_dilation(mask, dilate_voxels, valid)
    final = jnp.sum(mask)
    counts = jnp.stack([initial, after_closing, after_largest, final]).astype(jnp.int32)
    return mask, counts


@partial(jax.jit, static_argnames=("threshold", "closing_voxels", "keep_largest", "dilate_voxels"))
def _body_mask_jit(
    normalized,  # [Dp,Hp,Wp] f32 (padded region must be 0)
    valid,  # [Dp,Hp,Wp] f32 validity mask
    *,
    threshold: float,
    closing_voxels: int,
    keep_largest: bool,
    dilate_voxels: int,
):
    return body_mask_core(normalized, valid, threshold, closing_voxels, keep_largest, dilate_voxels)


def generate_body_mask(
    normalized_image: np.ndarray, body_mask_config, z_bucket: int = 1
) -> Tuple[np.ndarray, dict]:
    """(bool mask, metadata) for a normalized [D,H,W] volume.

    ``body_mask_config`` is a ``BodyMaskConfig`` or a dict with the same keys.
    """
    get = body_mask_config.get if isinstance(body_mask_config, dict) else (
        lambda k, d=None: getattr(body_mask_config, k, d)
    )
    threshold = float(get("threshold", 0.02))
    closing_voxels = int(get("closing_voxels", 5))
    keep_largest = bool(get("keep_largest_component", True))
    dilate_voxels = int(get("dilate_voxels", 3))

    img = np.asarray(normalized_image, dtype=np.float32)
    shape = img.shape
    pshape = list(shape)
    if z_bucket > 1:
        pshape[2] = ((shape[2] + z_bucket - 1) // z_bucket) * z_bucket
    padded = np.zeros(pshape, dtype=np.float32)
    padded[tuple(slice(0, s) for s in shape)] = img
    valid = np.zeros(pshape, dtype=np.float32)
    valid[tuple(slice(0, s) for s in shape)] = 1.0

    mask_dev, counts = _body_mask_jit(
        jnp.asarray(padded),
        jnp.asarray(valid),
        threshold=threshold,
        closing_voxels=closing_voxels,
        keep_largest=keep_largest,
        dilate_voxels=dilate_voxels,
    )
    mask = np.asarray(mask_dev)[tuple(slice(0, s) for s in shape)] > 0.5
    counts = np.asarray(counts)

    coords = np.argwhere(mask)
    if len(coords) > 0:
        bbox_min = coords.min(axis=0).tolist()
        bbox_max = coords.max(axis=0).tolist()
    else:
        bbox_min = [0, 0, 0]
        bbox_max = list(mask.shape)

    metadata = {
        "threshold": threshold,
        "closing_voxels": closing_voxels,
        "keep_largest_component": keep_largest,
        "dilate_voxels": dilate_voxels,
        "voxel_counts": {
            "initial": int(counts[0]),
            "after_closing": int(counts[1]),
            "after_largest_component": int(counts[2]),
            "final": int(counts[3]),
        },
        "bbox": {"min": bbox_min, "max": bbox_max},
    }
    return mask, metadata
