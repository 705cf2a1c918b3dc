"""Device-side candidate extraction: threshold -> CCL -> component table.

TPU-native fusion of the reference's bbox pipeline
(``light_unet/core/inferencer.py:62-111``: threshold, scipy CCL, min-size
filter, per-component voxel bbox + volume + max-prob confidence) and of
``scipy.ndimage.center_of_mass`` / ``ndimage.sum``
(``light_unet/models/metrics.py:89-120``) as segment reductions
(SURVEY §2b).

Everything runs inside one jitted program on the device-resident probability
map; only a compact ``[K, 12]`` component table is fetched (vs ~24 MB for a
whole-body f32 prob map), so serving candidates costs one tiny D2H.

Labels come from ``ops.ccl.label_propagate`` (arbitrary per-component label
values); compaction to dense segment ids uses a sized ``jnp.unique`` capped
at ``max_components``.  The cap is NOT silent: the exact component count is
computed alongside (one voxel per component satisfies ``label == seed``),
so callers detect overflow and fall back to the host path.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_unet_tpu.ops.ccl import label_propagate

_BIG = jnp.int32(2**31 - 1)


@partial(jax.jit, static_argnames=("max_components",))
def component_table_device(
    prob: jnp.ndarray, threshold: jnp.ndarray, max_components: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(table[K+1, 12], n_components) for ``prob >= threshold`` components.

    Table columns: size, bbox_min(z,y,x), bbox_max(z,y,x), max_prob,
    center(z,y,x), first_voxel_flat_index (scipy scan-order key).
    Row 0 is background; rows are ordered by raw label value — host code
    sorts by the scan-order key for scipy-compatible numbering.
    ``n_components`` is the EXACT count (detects cap overflow).
    """
    mask = prob >= threshold
    labels = label_propagate(mask.astype(jnp.int32))
    shape = labels.shape
    n = labels.size
    flat_labels = labels.ravel()
    mask_flat = mask.ravel()

    # exact component count: each component's label is the max flat-index+1
    # over its voxels, so exactly one voxel per component has label == seed
    seeds = jnp.arange(1, n + 1, dtype=jnp.int32)
    n_components = jnp.sum((flat_labels == seeds) & mask_flat).astype(jnp.int32)

    # compact ids: sorted unique label values (fill sorts after any real id)
    uniq = jnp.unique(flat_labels, size=max_components + 1, fill_value=_BIG)
    ids = jnp.searchsorted(uniq, flat_labels).astype(jnp.int32)
    num_seg = max_components + 1

    ones = mask_flat.astype(jnp.int32)
    sizes = jax.ops.segment_sum(ones, ids, num_segments=num_seg)

    coords = [
        jax.lax.broadcasted_iota(jnp.int32, shape, a).ravel() for a in range(3)
    ]
    bbox_min = [
        jax.ops.segment_min(jnp.where(mask_flat, c, _BIG), ids, num_segments=num_seg)
        for c in coords
    ]
    bbox_max = [
        jax.ops.segment_max(jnp.where(mask_flat, c, -1), ids, num_segments=num_seg)
        for c in coords
    ]
    max_prob = jax.ops.segment_max(
        jnp.where(mask_flat, prob.ravel(), -1.0), ids, num_segments=num_seg
    )
    centers = [
        jax.ops.segment_sum(jnp.where(mask_flat, c, 0).astype(jnp.float32), ids, num_segments=num_seg)
        / jnp.maximum(sizes, 1).astype(jnp.float32)
        for c in coords
    ]
    first_voxel = jax.ops.segment_min(
        jnp.where(mask_flat, jnp.arange(n, dtype=jnp.int32), _BIG), ids, num_segments=num_seg
    )

    table = jnp.stack(
        [
            sizes.astype(jnp.float32),
            *[b.astype(jnp.float32) for b in bbox_min],
            *[b.astype(jnp.float32) for b in bbox_max],
            max_prob.astype(jnp.float32),
            *centers,
            first_voxel.astype(jnp.float32),
        ],
        axis=1,
    )
    return table, n_components


def bboxes_from_table(
    table: np.ndarray,
    n_components: int,
    volume_shape,
    min_volume_cc: float,
    spacing,
    expansion_voxels: int,
    max_components: int = 64,
):
    """Host post-processing of the device table -> reference bbox dicts
    (same schema/ordering as ``core.inferencer.extract_bboxes``).

    Returns None when the component count overflowed the device cap — the
    caller falls back to the host scipy path (never silently truncates).
    """
    if int(n_components) > max_components:
        return None
    table = np.asarray(table)
    voxel_volume_cc = (spacing[0] * spacing[1] * spacing[2]) / 1000.0
    min_voxels = int(np.ceil(min_volume_cc / voxel_volume_cc))
    shape = np.asarray(volume_shape)

    # background/padding rows have size 0 (sub-threshold voxels contribute
    # nothing to the masked segment sums); any size>0 row is a real component.
    # Size-filter BEFORE numbering: get_connected_components renumbers the
    # surviving components 1..n in scan order, and mask_id follows that.
    rows = [
        row for row in table
        if int(row[0]) >= min_voxels and row[11] < 2**31 - 1
    ]
    rows.sort(key=lambda r: r[11])  # scipy scan-order numbering

    bboxes = []
    for cid, row in enumerate(rows, start=1):
        size = int(row[0])
        mins = row[1:4].astype(int)
        maxs = row[4:7].astype(int)
        lo = np.maximum(0, mins - expansion_voxels)
        hi = np.minimum(shape - 1, maxs + expansion_voxels)
        bboxes.append(
            {
                "mask_id": int(cid),
                "bbox_voxel": [int(lo[0]), int(hi[0]), int(lo[1]), int(hi[1]), int(lo[2]), int(hi[2])],
                "bbox_mm": [
                    float(lo[0] * spacing[0]),
                    float(hi[0] * spacing[0]),
                    float(lo[1] * spacing[1]),
                    float(hi[1] * spacing[1]),
                    float(lo[2] * spacing[2]),
                    float(hi[2] * spacing[2]),
                ],
                "volume_cc": float(size * voxel_volume_cc),
                "confidence": float(row[7]),
            }
        )
    return bboxes


def center_of_mass_device(mask: jnp.ndarray, labeled: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-component centers of mass via segment sums — device equivalent of
    ``scipy.ndimage.center_of_mass(mask, labeled, range(1, n+1))``
    (``light_unet/models/metrics.py:116-120``).  ``labeled`` must use dense
    ids ``1..n`` (scipy numbering); returns ``[n, 3]`` float32."""
    shape = labeled.shape
    ids = labeled.ravel().astype(jnp.int32)
    w = (mask.ravel() > 0).astype(jnp.float32)
    counts = jax.ops.segment_sum(w, ids, num_segments=n + 1)
    centers = [
        jax.ops.segment_sum(
            jax.lax.broadcasted_iota(jnp.int32, shape, a).ravel().astype(jnp.float32) * w,
            ids,
            num_segments=n + 1,
        )
        / jnp.maximum(counts, 1.0)
        for a in range(3)
    ]
    return jnp.stack(centers, axis=1)[1:]
