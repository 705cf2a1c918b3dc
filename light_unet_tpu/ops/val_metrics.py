"""Device-resident validation metrics: the full threshold sweep on TPU.

The reference validates by fetching every probability map to the host and
running scipy CCL + matching per (case, threshold)
(``light_unet/core/trainer.py:349-445`` + ``models/metrics.py``).  Per
whole-body case that is a ~24 MB D2H fetch plus ~7 s of host work on this
1-core host — and neither the validation volume, the ground truth, nor the
sweep thresholds change across epochs.

TPU-native restructuring:

* the ground truth is labeled ONCE per case (host scipy, exact reference
  numbering) and the dense id map uploaded ONCE, staying device-resident
  across epochs;
* each epoch, the device runs — for every threshold in one jitted program —
  threshold → CCL (``ops.ccl.label_propagate``) → dense ids (seed-identity
  compaction, no sort) → component sizes / centers / scan-order keys and the
  (pred, gt) pair-intersection table as segment reductions;
* only ``[T, C+1, 6]`` + ``[T, C+1, G+1]`` tables cross D2H (kilobytes);
* the host rebuilds IoU / center-distance matrices from the EXACT integer
  counts and runs the reference's greedy one-to-one matcher
  (``models/metrics.py``) on those tiny matrices.

Voxel DSC comes from the same tables exactly: every pred-positive voxel
belongs to a pred component and every GT voxel to a GT component, so
``pred_sum = Σ sizes``, ``inter = Σ pair-table`` — no probability map ever
leaves the device.

Exactness: EVERYTHING is integer.  Sizes, scan-order keys, and pair
intersections are int32 segment reductions; coordinate sums are accumulated
as two int32 parts (low 7 bits / high bits of each coordinate, exact for
any component smaller than 2^23 voxels on volumes with extents < 4096) and
recombined in float64 on host — so pred centers equal scipy's
``center_of_mass`` bit-for-bit, not merely to f32 tolerance.  Component-count
overflow (> ``max_components``, default 4096 — early-training maps at low
thresholds are legitimately speckled with thousands of components) and the
(degenerate) >=2^23-voxel-component case are detected exactly and the
caller falls back to the host path for that case — never a silent
truncation.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_unet_tpu.ops.ccl import label_propagate

# table columns (per pred component row; ALL int32)
_COL_SIZE = 0
# coordinate sums, split so each int32 accumulator stays exact: for axis a,
# sum(coord) == 128 * col[hi_a] + col[lo_a] (recombined in f64 on host)
_COL_ZLO, _COL_ZHI = 1, 2
_COL_YLO, _COL_YHI = 3, 4
_COL_XLO, _COL_XHI = 5, 6
_COL_FIRST = 7
_N_COLS = 8

# per-component size bound for exact int32 split-coordinate sums:
# lo-part sum <= 127 * size, hi-part sum <= (max_extent/128) * size; with
# extents < 4096 both fit int32 iff size < 2^23 (8.4M voxels — larger than
# any whole volume this pipeline currently sees)
_MAX_EXACT_COMPONENT = 1 << 23


@partial(jax.jit, static_argnames=("max_components", "n_gt_cap"))
def sweep_tables_device(
    prob: jnp.ndarray,          # [D,H,W] f32 (or uint16-quantized, see below)
    gt_ids: jnp.ndarray,        # [D,H,W] int32 dense GT component ids (0=bg)
    thresholds: jnp.ndarray,    # [T] f32
    *,
    max_components: int = 4096,
    n_gt_cap: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-threshold pred component tables + pair intersections, on device.

    Returns ``(tables [T, C+1, 8] i32, inter [T, C+1, G+1] i32,
    n_components [T] i32)`` where C=max_components, G=n_gt_cap.  Row 0 of
    each table is background; rows are in arbitrary compact order — sort by
    the scan-order key (column ``_COL_FIRST``) on host for scipy numbering.
    ``n_components`` is EXACT, so overflow (> C) is detectable.  All
    statistics are int32 and exact while every component is smaller than
    ``_MAX_EXACT_COMPONENT`` voxels (checked on host from the exact sizes).
    """
    if prob.dtype == jnp.uint16:
        prob = prob.astype(jnp.float32) * (1.0 / 65535.0)
    shape = prob.shape
    n = prob.size
    gt_flat = gt_ids.ravel().astype(jnp.int32)
    num_pairs = (max_components + 1) * (n_gt_cap + 1)
    seeds = jnp.arange(1, n + 1, dtype=jnp.int32)
    flat_idx = jnp.arange(n, dtype=jnp.int32)
    coords = [
        jax.lax.broadcasted_iota(jnp.int32, shape, a).ravel() for a in range(3)
    ]

    def one_threshold(t):
        mask = prob >= t
        labels = label_propagate(mask.astype(jnp.int32))
        flat_labels = labels.ravel()
        mask_flat = mask.ravel()

        seed_mask = (flat_labels == seeds) & mask_flat
        n_comp = jnp.sum(seed_mask).astype(jnp.int32)
        # dense ids via the seed-identity (see ops/components.py): sized
        # nonzero yields sorted unique labels; a scatter LUT + one gather
        # produces compact ids without any full-volume sort
        seed_idx = jnp.nonzero(seed_mask, size=max_components, fill_value=n)[0]
        ranks = jnp.arange(1, max_components + 1, dtype=jnp.int32)
        lut = jnp.zeros((n + 2,), jnp.int32).at[seed_idx + 1].set(ranks, mode="drop")
        ids = lut[flat_labels]
        # background voxels carry id 0, so they only ever pollute row 0 of
        # every segment reduction below — no fg masking of the values needed

        ones = jnp.ones((n,), jnp.int32)
        sum_cols = jnp.stack(
            [ones]
            + [part for c in coords for part in (c & 127, c >> 7)],
            axis=1,
        )
        sums = jax.ops.segment_sum(sum_cols, ids, num_segments=max_components + 1)

        # scan-order key: first (minimum) flat index of each component
        first = jax.ops.segment_min(
            jnp.where(mask_flat, flat_idx, jnp.int32(2**31 - 1)),
            ids,
            num_segments=max_components + 1,
        )

        # pair intersections: one segment_sum over joint (pred, gt) ids
        joint = ids * (n_gt_cap + 1) + jnp.minimum(gt_flat, n_gt_cap)
        inter = jax.ops.segment_sum(
            ones, joint, num_segments=num_pairs
        ).reshape(max_components + 1, n_gt_cap + 1)

        table = jnp.concatenate([sums, first[:, None]], axis=1)
        return table, inter, n_comp

    tables, inters, counts = jax.lax.map(one_threshold, thresholds)
    return tables, inters, counts


def prepare_gt(label_volume: np.ndarray) -> Dict:
    """Host-side one-time GT prep (scipy numbering — exact reference
    semantics): dense labeled map + per-component sizes and centers."""
    from light_unet_tpu.models.metrics import (  # local import: avoid cycle
        _component_centers,
        get_connected_components,
    )

    target_bin = (np.asarray(label_volume) >= 0.5).astype(np.int32)
    labeled, n_gt = get_connected_components(target_bin)
    sizes = np.bincount(labeled.ravel(), minlength=n_gt + 1).astype(np.int64)
    centers = _component_centers(labeled, n_gt)  # [n_gt, 3] voxel coords
    return {
        "labeled": labeled.astype(np.int32),
        "n_gt": int(n_gt),
        "sizes": sizes,
        "centers": centers,
        "gt_sum": int(target_bin.sum()),
    }


def metrics_from_tables(
    table: np.ndarray,       # [C+1, 8] one threshold's pred table (int32)
    inter: np.ndarray,       # [C+1, G+1] (int32)
    n_components: int,
    gt: Dict,
    spacing: Sequence[float],
    iou_threshold: float = 0.1,
    distance_threshold_mm: float = 10.0,
) -> Dict:
    """Per-case (threshold-specific) lesion TP/FP/FN + voxel sums from the
    device tables — same greedy matcher semantics as
    ``models.metrics._match_against``."""
    n_gt = gt["n_gt"]
    # real component rows: nonzero size; scipy numbering = scan-order sort
    rows = np.flatnonzero(table[:, _COL_SIZE] > 0)
    rows = rows[rows != 0]  # background row
    rows = rows[np.argsort(table[rows, _COL_FIRST], kind="stable")]
    n_pred = len(rows)

    pred_sum = int(table[rows, _COL_SIZE].sum()) if n_pred else 0
    inter_total = int(inter[rows, 1 : n_gt + 1].sum()) if (n_pred and n_gt) else 0

    out = {
        "pred_sum": pred_sum,
        "gt_sum": gt["gt_sum"],
        "inter_sum": inter_total,
    }
    if n_gt == 0:
        out.update(
            {"tp": 0, "fp": n_pred, "fn": 0}
            if n_pred
            else {"tp": 0, "fp": 0, "fn": 0}
        )
        return out
    if n_pred == 0:
        out.update({"tp": 0, "fp": 0, "fn": n_gt})
        return out

    pred_sizes = table[rows, _COL_SIZE].astype(np.int64)
    pair_inter = inter[rows, 1 : n_gt + 1].astype(np.int64)  # [n_pred, n_gt]
    union = pred_sizes[:, None] + gt["sizes"][None, 1 : n_gt + 1] - pair_inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, pair_inter / np.maximum(union, 1), 0.0)

    sp = np.asarray(spacing, dtype=np.float64)
    # recombine the split int32 coordinate sums exactly and divide in f64 —
    # identical to scipy.ndimage.center_of_mass on the same component
    coord_sums = np.stack(
        [
            128.0 * table[rows, hi].astype(np.int64) + table[rows, lo].astype(np.int64)
            for lo, hi in ((_COL_ZLO, _COL_ZHI), (_COL_YLO, _COL_YHI), (_COL_XLO, _COL_XHI))
        ],
        axis=1,
    ).astype(np.float64)
    pc = coord_sums / pred_sizes[:, None].astype(np.float64) * sp
    tc = np.asarray(gt["centers"], dtype=np.float64) * sp
    dist = np.linalg.norm(pc[:, None, :] - tc[None, :, :], axis=2)

    # greedy per-pred best-IoU, one-to-one (models/metrics.py semantics)
    taken = np.zeros(n_gt, dtype=bool)
    tp = 0
    for i in range(n_pred):
        ok = (~taken) & ((iou[i] >= iou_threshold) | (dist[i] <= distance_threshold_mm))
        if not ok.any():
            continue
        best = int(np.argmax(np.where(ok, iou[i], -np.inf)))
        taken[best] = True
        tp += 1
    out.update({"tp": tp, "fp": n_pred - tp, "fn": n_gt - int(taken.sum())})
    return out


class DeviceValidationSweep:
    """Per-epoch validation metrics with device-resident cases.

    ``add_case`` uploads the GT id map once; ``case_metrics`` consumes a
    DEVICE-RESIDENT probability map (e.g. the un-fetched output of the
    sliding-window engine) and returns per-threshold count dicts.  Returns
    None when a threshold overflows ``max_components`` — the caller then
    falls back to the host path for that case (never silently truncates).
    """

    def __init__(self, thresholds: Sequence[float], max_components: int = 4096,
                 n_gt_cap: int = 64, ledger=None):
        self.thresholds = [float(t) for t in thresholds]
        self._thr_dev = jnp.asarray(np.asarray(self.thresholds, np.float32))
        self.max_components = int(max_components)
        self.n_gt_cap = int(n_gt_cap)
        self._gt: Dict[str, Dict] = {}
        # why the last case_metrics call returned None: "components" (a
        # bigger cap would fix it — escalation-worthy), "envelope" /
        # "component_size" (cap-independent int32-exactness limits — only a
        # host fetch stays exact, escalating would compile a 4x program
        # just to fail the same check).  None after a successful call.
        self.last_overflow_reason = None
        # optional joint HBM accounting (utils/hbm_ledger.py): GT id maps and
        # their bucket-padded variants are charged per allocation; when the
        # ledger refuses, the case degrades gracefully (host metrics path /
        # uncached padded variant) instead of oversubscribing HBM
        self.ledger = ledger

    def add_case(self, case_id: str, label_volume: np.ndarray) -> bool:
        """Host-label the GT once and keep the id map device-resident
        (uint8 — ids are <= n_gt_cap <= 255, a quarter of the int32 bytes).
        Returns False (case not added) when n_gt exceeds the cap or the
        joint HBM ledger has no room for the id map."""
        gt = prepare_gt(label_volume)
        if gt["n_gt"] > min(self.n_gt_cap, 255):
            return False
        ids_u8 = gt.pop("labeled").astype(np.uint8)
        if self.ledger is not None and not self.ledger.try_charge(
            "val_gt_ids", int(ids_u8.nbytes)
        ):
            return False
        gt["device_ids"] = {}  # padded variants keyed by shape
        gt["base_ids"] = jax.device_put(jnp.asarray(ids_u8))
        self._gt[case_id] = gt
        return True

    def has_case(self, case_id: str) -> bool:
        return case_id in self._gt

    def release_case(self, case_id: str) -> None:
        """Drop a case's device-resident GT (id map + padded variants) —
        evaluate-stage hygiene: one sweep serves a whole split, but each
        case's GT is needed only while that case is being scored."""
        self._gt.pop(case_id, None)

    def gt_ids_padded(self, case_id: str, shape):
        """The case's device GT id map, zero-padded to ``shape`` (cached per
        shape under the joint ledger — always derived from the UNPADDED base
        map).  Shared by the metrics sweep and the trainer's validation-loss
        program: padding voxels are id 0 = background, so both consumers see
        exact semantics on bucket-padded probability maps."""
        gt = self._gt[case_id]
        gt_ids = gt["base_ids"]
        if tuple(shape) == tuple(gt_ids.shape):
            return gt_ids
        cached = gt["device_ids"].get(tuple(shape))
        if cached is None:
            pads = [(0, p - s) for p, s in zip(shape, gt_ids.shape)]
            cached = jnp.pad(gt_ids, pads)
            # cache the padded variant only if the joint ledger has room;
            # otherwise recompute per epoch (cheap device pad) instead of
            # accumulating unaccounted copies per bucket shape
            if self.ledger is None or self.ledger.try_charge(
                "val_gt_ids_padded", int(cached.nbytes)
            ):
                gt["device_ids"][tuple(shape)] = cached
        return cached

    def case_metrics(
        self, case_id: str, prob_dev, spacing: Sequence[float],
        iou_threshold: float = 0.1, distance_threshold_mm: float = 10.0,
        pad_shape=None,
    ):
        """[{tp, fp, fn, pred_sum, gt_sum, inter_sum} per threshold] or None
        on component overflow.  ``prob_dev`` may be bucket-padded; pass the
        GT's (unpadded) shape via the stored id map — padding voxels are
        zero and threshold>0 keeps them background, so the padded program
        is exact as long as the id map is padded the same way."""
        gt = self._gt[case_id]
        gt_ids = self.gt_ids_padded(case_id, prob_dev.shape)
        # int32 exactness envelope: flat indices / joint pair ids must fit
        # int32, and extents < 4096 keep the split coordinate sums exact
        # (see _MAX_EXACT_COMPONENT).  Out-of-envelope volumes take the host
        # path — exact, never truncated.
        if prob_dev.size >= 2**31 or max(prob_dev.shape) >= 4096:
            self.last_overflow_reason = "envelope"
            return None
        tables, inters, counts = sweep_tables_device(
            prob_dev, gt_ids, self._thr_dev,
            max_components=self.max_components, n_gt_cap=self.n_gt_cap,
        )
        counts = np.asarray(counts)
        if (counts > self.max_components).any():
            self.last_overflow_reason = "components"
            return None
        tables = np.asarray(tables)
        if tables[:, 1:, _COL_SIZE].max(initial=0) >= _MAX_EXACT_COMPONENT:
            # a >=2^23-voxel component: host fallback stays exact
            self.last_overflow_reason = "component_size"
            return None
        inters = np.asarray(inters)
        self.last_overflow_reason = None
        return [
            metrics_from_tables(
                tables[i], inters[i], int(counts[i]), gt, spacing,
                iou_threshold, distance_threshold_mm,
            )
            for i in range(len(self.thresholds))
        ]
