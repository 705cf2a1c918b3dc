"""Binary morphology on device (jit-compiled shifted-max/min sweeps).

TPU-native equivalents of the scipy morphology used by body-mask generation
(``scripts/preprocess_data.py:124-144``):

* ``iterate_structure(generate_binary_structure(3,1), k)`` is the L1 ball
  (diamond) of radius k, and dilation/erosion by it decomposes into k
  iterated 6-neighborhood (cross) dilations/erosions — each of which is six
  shifted elementwise max/min ops that XLA fuses into a single pass;
* border semantics match scipy's ``border_value=0``: a ``valid`` mask clamps
  every dilation so compile-bucket padding behaves exactly like the array
  edge of the un-padded volume.

All functions take/return float32 {0,1} arrays of shape [D,H,W].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _neighbor(x: jnp.ndarray, axis: int, delta: int, fill: float) -> jnp.ndarray:
    """Value of the neighbor ``delta`` steps along ``axis`` (out-of-bounds -> fill)."""
    size = x.shape[axis]
    pad_width = [(0, 0)] * x.ndim
    if delta > 0:
        pad_width[axis] = (delta, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, size)
    else:
        pad_width[axis] = (0, -delta)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-delta, size - delta)
    return jnp.pad(x, pad_width, constant_values=fill)[tuple(sl)]


def dilate_cross(x: jnp.ndarray) -> jnp.ndarray:
    """One 6-connectivity binary dilation (zero border)."""
    out = x
    for axis in range(3):
        out = jnp.maximum(out, _neighbor(x, axis, 1, 0.0))
        out = jnp.maximum(out, _neighbor(x, axis, -1, 0.0))
    return out


def erode_cross(x: jnp.ndarray) -> jnp.ndarray:
    """One 6-connectivity binary erosion (zero border, scipy border_value=0)."""
    out = x
    for axis in range(3):
        out = jnp.minimum(out, _neighbor(x, axis, 1, 0.0))
        out = jnp.minimum(out, _neighbor(x, axis, -1, 0.0))
    return out


def binary_dilation(x: jnp.ndarray, iterations: int, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """k iterated cross dilations == dilation by the L1 ball of radius k.
    ``valid`` clamps growth so bucket padding acts as the true array edge."""
    for _ in range(iterations):
        x = dilate_cross(x)
        if valid is not None:
            x = x * valid
    return x


def binary_erosion(x: jnp.ndarray, iterations: int) -> jnp.ndarray:
    for _ in range(iterations):
        x = erode_cross(x)
    return x


def binary_closing(x: jnp.ndarray, radius: int, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Closing by the L1 ball of radius ``radius`` (scipy
    ``binary_closing(structure=iterate_structure(cross, radius))`` parity,
    including its zero-border erosion behavior)."""
    return binary_erosion(binary_dilation(x, radius, valid), radius)
