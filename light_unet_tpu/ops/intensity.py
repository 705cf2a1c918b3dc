"""Intensity preprocessing (percentile clip + min-max normalize), on device.

Parity with the reference's host-numpy ``clip_and_normalize``
(``scripts/preprocess_data.py:21-59``): clip to the [low, high] percentiles
(linear interpolation, numpy default) then rescale to ``target_range``.

TPU-first: percentiles are computed with a masked sort so volumes padded to a
compile bucket reuse one XLA program regardless of their true Z extent — the
padding is excluded from the statistics, so results equal the unpadded
computation bit-for-bit in float32.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def masked_percentile(flat: jnp.ndarray, n_valid, q: float) -> jnp.ndarray:
    """Percentile (linear interpolation) over ``flat[:n_valid]`` where the
    tail is padded with +inf.  ``flat`` must be 1-D; ``n_valid`` may be traced."""
    s = jnp.sort(flat)
    pos = (n_valid - 1).astype(jnp.float32) * (q / 100.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    return s[lo] * (1.0 - frac) + s[hi] * frac


@partial(jax.jit, static_argnames=("low_pct", "high_pct", "range_min", "range_max"))
def _clip_normalize_jit(
    volume,  # [Dp,Hp,Wp] f32, padded region arbitrary
    n_valid,  # scalar i32: number of true voxels
    valid,  # [Dp,Hp,Wp] f32 1/0 validity mask
    *,
    low_pct: float,
    high_pct: float,
    range_min: float,
    range_max: float,
):
    flat = jnp.where(valid.reshape(-1) > 0, volume.reshape(-1), jnp.inf)
    lo = masked_percentile(flat, n_valid, low_pct)
    hi = masked_percentile(flat, n_valid, high_pct)
    clipped = jnp.clip(volume, lo, hi)
    scale = (range_max - range_min) / jnp.where(hi > lo, hi - lo, 1.0)
    normalized = jnp.where(
        hi > lo, (clipped - lo) * scale + range_min, jnp.full_like(volume, range_min)
    )
    return normalized * valid, lo, hi


def clip_and_normalize(
    image: np.ndarray,
    low_percentile: float = 0.5,
    high_percentile: float = 99.5,
    target_range: Tuple[float, float] = (0.0, 1.0),
    z_bucket: int = 1,
) -> Tuple[np.ndarray, dict]:
    """Device-accelerated clip+normalize.  Returns (normalized f32 volume,
    metadata dict matching ``preprocess_data.py:49-57``)."""
    image = np.asarray(image, dtype=np.float32)
    shape = image.shape
    pshape = list(shape)
    if z_bucket > 1 and image.ndim == 3:
        pshape[2] = ((shape[2] + z_bucket - 1) // z_bucket) * z_bucket
    padded = np.zeros(pshape, dtype=np.float32)
    padded[tuple(slice(0, s) for s in shape)] = image
    valid = np.zeros(pshape, dtype=np.float32)
    valid[tuple(slice(0, s) for s in shape)] = 1.0

    normalized, lo, hi = _clip_normalize_jit(
        jnp.asarray(padded),
        jnp.asarray(image.size, jnp.int32),
        jnp.asarray(valid),
        low_pct=float(low_percentile),
        high_pct=float(high_percentile),
        range_min=float(target_range[0]),
        range_max=float(target_range[1]),
    )
    out = np.asarray(normalized)[tuple(slice(0, s) for s in shape)]
    metadata = {
        "clip_values": {
            "min": float(lo),
            "max": float(hi),
            "low_percentile": low_percentile,
            "high_percentile": high_percentile,
        },
        "normalization_range": list(target_range),
    }
    return out, metadata
