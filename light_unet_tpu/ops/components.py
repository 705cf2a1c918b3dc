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
    seed_mask = (flat_labels == seeds) & mask_flat
    n_components = jnp.sum(seed_mask).astype(jnp.int32)

    # compact ids WITHOUT a full-volume sort or binary search (jnp.unique's
    # sort cost ~1 s and searchsorted's 7-level gathers ~0.3 s on a
    # whole-body volume): the label VALUE of a component is its seed voxel's
    # flat index + 1, and sized nonzero returns seed indices ascending — so
    # the sorted unique labels are just seed_idx + 1.  Dense ids then come
    # from a 64-element scatter into a length-(n+1) lookup table plus one
    # memory-bound gather (background label 0 -> id 0 stays 0 in the LUT).
    seed_idx = jnp.nonzero(seed_mask, size=max_components, fill_value=n)[0]
    ranks = jnp.arange(1, max_components + 1, dtype=jnp.int32)
    lut = jnp.zeros((n + 2,), jnp.int32).at[seed_idx + 1].set(
        ranks, mode="drop"
    )
    ids = lut[flat_labels]
    num_seg = max_components + 1

    # all 12 per-component statistics in TWO segment passes over the volume
    # (the per-call cost is dominated by processing the 5.9M ids, so stacking
    # columns amortizes it ~4.5x vs one call per statistic):
    #   pass 1 (sum):  count, Σz, Σy, Σx
    #   pass 2 (max):  -min(z,y,x), max(z,y,x), max prob, -first_voxel
    coords = [
        jax.lax.broadcasted_iota(jnp.int32, shape, a).ravel().astype(jnp.float32)
        for a in range(3)
    ]
    fg = mask_flat.astype(jnp.float32)
    sum_cols = jnp.stack([fg, coords[0] * fg, coords[1] * fg, coords[2] * fg], axis=1)
    sums = jax.ops.segment_sum(sum_cols, ids, num_segments=num_seg)
    sizes = sums[:, 0]
    centers = sums[:, 1:4] / jnp.maximum(sizes, 1.0)[:, None]

    _BIGF = jnp.float32(3e9)  # > int32 max: empty rows fail the <2^31-1 guard
    neg = jnp.where(mask_flat, 0.0, -_BIGF)[:, None]
    flat_idx = jnp.arange(n, dtype=jnp.float32)
    max_cols = (
        jnp.stack(
            [-coords[0], -coords[1], -coords[2], coords[0], coords[1], coords[2],
             prob.ravel(), -flat_idx],
            axis=1,
        )
        + neg
    )
    maxes = jax.ops.segment_max(max_cols, ids, num_segments=num_seg)
    bbox_min = -maxes[:, 0:3]
    bbox_max = maxes[:, 3:6]
    max_prob = jnp.maximum(maxes[:, 6], -1.0)  # empty rows: -1 like before
    first_voxel = -maxes[:, 7]

    table = jnp.concatenate(
        [sizes[:, None], bbox_min, bbox_max, max_prob[:, None], centers,
         first_voxel[:, None]],
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

    Returns None when the component count overflowed the device cap, or when
    the volume exceeds the f32 exactness envelope (flat scan-order keys and
    integer-valued f32 sums are exact only below 2^24 voxels) — the caller
    falls back to the host scipy path (never silently truncates).
    """
    if int(n_components) > max_components:
        return None
    if int(np.prod(volume_shape)) >= 2**24:
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
