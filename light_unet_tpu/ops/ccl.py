"""Connected-component labeling: jit device kernel + scipy host path.

TPU-native equivalent of ``scipy.ndimage.label`` (6-connectivity) used at
``light_unet/models/metrics.py:50``, ``scripts/preprocess_data.py:133`` and
``light_unet/core/inferencer.py:70``.

Device algorithm (static shapes, ``lax.while_loop``): seed every foreground
voxel with ``flat_index + 1``, then run *directional sweeps* — a masked
running-max ``lax.scan`` forward and backward along each axis — until a full
round changes nothing.  One sweep propagates a label across an entire
straight run in a single pass, so convergence takes O(component tortuosity)
rounds (a handful for anatomical blobs) instead of O(diameter) as with naive
3^3 max-pool propagation.

The resulting labels partition identically to scipy's (same equivalence
classes, different numbering).  ``label_components`` renumbers on host in
first-voxel scan order, matching scipy's numbering exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy import ndimage


# ---------------------------------------------------------------------------
# device path


def _axis_sweep(labels: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """Masked running max along one axis (mask is implicit: label>0).

    Deliberately a sequential ``lax.scan``: a segmented max-scan via
    ``lax.associative_scan`` (log2(n) passes instead of n dependent steps)
    was tried and measured 2.4x SLOWER on a v5e for whole-body volumes
    (2.64 s vs ~1.1 s steady-state) — each of its ~9 levels re-streams the
    full volume through HBM with slice/pad traffic, while the sequential
    scan's per-step slice is a tiny [H,W] plane that stays in VMEM
    (docs/PERFORMANCE.md, negative results)."""
    moved = jnp.moveaxis(labels, axis, 0)

    def step(prev, cur):
        # propagate only into foreground voxels from foreground predecessors
        prop = jnp.where(cur > 0, jnp.maximum(cur, prev), 0)
        return prop, prop

    _, out = lax.scan(step, jnp.zeros_like(moved[0]), moved, reverse=reverse)
    return jnp.moveaxis(out, 0, axis)


@jax.jit
def label_propagate(mask: jnp.ndarray) -> jnp.ndarray:
    """Label a [D,H,W] {0,1} mask on device.

    Returns int32 labels where each component carries the max flat-index+1
    of its voxels; background is 0.
    """
    mask_i = (mask > 0).astype(jnp.int32)
    n = mask.size
    seeds = (jnp.arange(1, n + 1, dtype=jnp.int32).reshape(mask.shape)) * mask_i

    def round_fn(labels):
        for axis in range(3):
            labels = _axis_sweep(labels, axis, reverse=False)
            labels = _axis_sweep(labels, axis, reverse=True)
        return labels

    def cond(state):
        labels, prev, _ = state
        return jnp.any(labels != prev)

    def body(state):
        labels, _, it = state
        return round_fn(labels), labels, it + 1

    first = round_fn(seeds)
    labels, _, _ = lax.while_loop(cond, body, (first, seeds, jnp.int32(1)))
    return labels


@jax.jit
def keep_largest_component(mask: jnp.ndarray) -> jnp.ndarray:
    """Largest 6-connected component of a {0,1} mask, fully on device
    (CCL + bincount over flat labels + compare)."""
    labels = label_propagate(mask)
    counts = jnp.bincount(labels.reshape(-1), length=mask.size + 1)
    counts = counts.at[0].set(0)
    largest = jnp.argmax(counts)
    has_fg = counts[largest] > 0
    return jnp.where(has_fg, (labels == largest).astype(jnp.float32), jnp.zeros(mask.shape))


# ---------------------------------------------------------------------------
# host path + unified API


def _renumber_scan_order(raw: np.ndarray) -> Tuple[np.ndarray, int]:
    """Renumber arbitrary positive labels to 1..n in first-voxel scan order
    (scipy numbering)."""
    flat = raw.reshape(-1)
    uniq, first_idx, inverse = np.unique(flat, return_index=True, return_inverse=True)
    # map each unique raw label -> rank of its first occurrence among foreground
    order = np.argsort(first_idx)
    new_ids = np.empty_like(order)
    rank = 1
    new_vals = np.zeros(len(uniq), dtype=np.int32)
    for u in order:
        if uniq[u] == 0:
            new_vals[u] = 0
        else:
            new_vals[u] = rank
            rank += 1
    out = new_vals[inverse].reshape(raw.shape)
    return out, rank - 1


def label_components(mask: np.ndarray, backend: str = "host") -> Tuple[np.ndarray, int]:
    """6-connectivity CCL with scipy-compatible output.

    backend="host" uses scipy's fused C pass (best for the small volumes in
    the metrics path); backend="jax" runs the jit sweep kernel on device and
    renumbers on host.
    """
    if backend == "host":
        labeled, n = ndimage.label(np.asarray(mask) > 0)
        return labeled.astype(np.int32), int(n)
    raw = np.asarray(label_propagate(jnp.asarray(np.asarray(mask, dtype=np.float32))))
    return _renumber_scan_order(raw)
