"""Lesion-detection metrics (host numpy/scipy path).

Semantics match the reference engine (``light_unet/models/metrics.py``):

* voxel-wise DSC, micro (global voxel sums) and macro (mean per-case DSC);
* connected components via 6-connectivity labeling with optional min-size
  filtering and relabeling (``metrics.py:38-63``);
* lesion matching: a prediction matches a target when IoU >= 0.1 **or**
  center-of-mass distance <= 10 mm; greedy per-prediction best-IoU,
  one-to-one (``metrics.py:127-213``);
* aggregate lesion recall / precision / F1 and FP-per-case with per-case
  spacing normalization (``metrics.py:290-404``).

This module is deliberately host-side: component counts are tiny (tens) and
``scipy.ndimage.label`` is a fused C pass.  The TPU path produces probability
maps; thresholding + components on a few-MB volume is not the bottleneck.
A jit-compiled on-device labeling kernel lives in ``ops/ccl.py`` for the
preprocessing stage where it fuses with morphology.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy import ndimage

DEFAULT_SPACING = (4.0, 4.0, 4.0)
SMOOTH = 1e-6


def calculate_dsc(pred: np.ndarray, target: np.ndarray, smooth: float = SMOOTH) -> float:
    """Dice similarity coefficient over flattened binary masks."""
    p = np.ravel(pred)
    t = np.ravel(target)
    inter = float((p * t).sum())
    denom = float(p.sum() + t.sum())
    return (2.0 * inter + smooth) / (denom + smooth)


def get_connected_components(mask: np.ndarray, min_size: int = 0) -> Tuple[np.ndarray, int]:
    """6-connected components; drop components smaller than ``min_size`` voxels
    and relabel the survivors contiguously."""
    labeled, n = ndimage.label(mask)
    if min_size > 0 and n > 0:
        sizes = np.bincount(labeled.ravel())
        too_small = sizes < min_size
        too_small[0] = False
        labeled[too_small[labeled]] = 0
        labeled, n = ndimage.label(labeled > 0)
    return labeled, n


def calculate_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union > 0 else 0.0


def _component_centers(labeled: np.ndarray, n: int) -> np.ndarray:
    """Centers of mass for labels 1..n, shape [n, 3] (voxel coords)."""
    if n == 0:
        return np.zeros((0, 3), dtype=np.float64)
    centers = ndimage.center_of_mass(
        np.ones(labeled.shape, dtype=np.float32), labels=labeled, index=np.arange(1, n + 1)
    )
    return np.atleast_2d(np.asarray(centers, dtype=np.float64))[:, :3]


def _pairwise_intersections(pred_labeled: np.ndarray, target_labeled: np.ndarray,
                            n_pred: int, n_target: int) -> np.ndarray:
    """Intersection voxel counts for every (pred, target) label pair via a
    single bincount over encoded joint labels."""
    pf = pred_labeled.ravel().astype(np.int64)
    tf = target_labeled.ravel().astype(np.int64)
    width = np.int64(n_target + 1)
    joint = pf * width + tf
    counts = np.bincount(joint, minlength=int((n_pred + 1) * width))
    inter = counts.reshape(n_pred + 1, n_target + 1)
    inter = inter.copy()
    inter[0, :] = 0
    inter[:, 0] = 0
    return inter


def match_components(
    pred_labeled: np.ndarray,
    target_labeled: np.ndarray,
    iou_threshold: float = 0.1,
    distance_threshold_mm: float = 10.0,
    spacing: Sequence[float] = DEFAULT_SPACING,
) -> Tuple[List[Tuple[int, int]], List[int], List[int]]:
    """Greedy one-to-one matching of predicted to target components.

    Returns ``(matches, unmatched_pred_ids, unmatched_target_ids)`` with
    1-based component ids.
    """
    n_pred = int(pred_labeled.max())
    n_target = int(target_labeled.max())
    if n_pred == 0 or n_target == 0:
        return [], list(range(1, n_pred + 1)), list(range(1, n_target + 1))

    inter = _pairwise_intersections(pred_labeled, target_labeled, n_pred, n_target)
    pred_sizes = np.bincount(pred_labeled.ravel(), minlength=n_pred + 1)
    target_sizes = np.bincount(target_labeled.ravel(), minlength=n_target + 1)
    union = pred_sizes[:, None] + target_sizes[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / np.maximum(union, 1), 0.0)

    sp = np.asarray(spacing, dtype=np.float64)
    pc = _component_centers(pred_labeled, n_pred) * sp
    tc = _component_centers(target_labeled, n_target) * sp
    dist = np.linalg.norm(pc[:, None, :] - tc[None, :, :], axis=2)

    matches: List[Tuple[int, int]] = []
    target_taken = np.zeros(n_target, dtype=bool)
    for pid in range(1, n_pred + 1):
        iou_row = iou[pid, 1:]
        ok = (~target_taken) & ((iou_row >= iou_threshold) | (dist[pid - 1] <= distance_threshold_mm))
        if not ok.any():
            continue
        best = int(np.argmax(np.where(ok, iou_row, -np.inf)))
        matches.append((pid, best + 1))
        target_taken[best] = True

    matched_pred = {p for p, _ in matches}
    unmatched_pred = [i for i in range(1, n_pred + 1) if i not in matched_pred]
    unmatched_target = [i + 1 for i in range(n_target) if not target_taken[i]]
    return matches, unmatched_pred, unmatched_target


def _squeeze_to_3d(x: np.ndarray) -> np.ndarray:
    if x.ndim == 5:
        x = x[:, 0]
    if x.ndim == 4 and x.shape[0] == 1:
        x = x[0]
    return x


def calculate_lesion_metrics(
    pred: np.ndarray,
    target: np.ndarray,
    threshold: float = 0.5,
    min_size_voxels: int = 0,
    iou_threshold: float = 0.1,
    distance_threshold_mm: float = 10.0,
    spacing: Sequence[float] = DEFAULT_SPACING,
) -> Dict[str, float]:
    """Per-case lesion recall/precision/F1 and TP/FP/FN counts."""
    pred = _squeeze_to_3d(np.asarray(pred))
    target = _squeeze_to_3d(np.asarray(target))

    pred_bin = (pred >= threshold).astype(np.int32)
    target_bin = (target >= 0.5).astype(np.int32)

    pred_labeled, n_pred = get_connected_components(pred_bin, min_size=min_size_voxels)
    target_labeled, n_target = get_connected_components(target_bin, min_size=min_size_voxels)

    if n_target == 0:
        if n_pred == 0:
            return {"recall": 1.0, "precision": 1.0, "f1": 1.0, "tp": 0, "fp": 0, "fn": 0}
        return {"recall": 0.0, "precision": 0.0, "f1": 0.0, "tp": 0, "fp": n_pred, "fn": 0}
    if n_pred == 0:
        return {"recall": 0.0, "precision": 0.0, "f1": 0.0, "tp": 0, "fp": 0, "fn": n_target}

    matches, unmatched_pred, unmatched_target = match_components(
        pred_labeled,
        target_labeled,
        iou_threshold=iou_threshold,
        distance_threshold_mm=distance_threshold_mm,
        spacing=spacing,
    )
    tp, fp, fn = len(matches), len(unmatched_pred), len(unmatched_target)
    recall = tp / (tp + fn) if tp + fn else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"recall": recall, "precision": precision, "f1": f1, "tp": tp, "fp": fp, "fn": fn}


def _spacing_per_case(spacing, num_cases: int) -> List[Tuple[float, float, float]]:
    """Broadcast a single spacing tuple or pass through a per-case list."""
    if num_cases == 0:
        return []
    if isinstance(spacing, np.ndarray):
        spacing = spacing.tolist()
    if isinstance(spacing, (list, tuple)) and len(spacing) > 0:
        first = spacing[0]
        if len(spacing) == num_cases and isinstance(first, (list, tuple, np.ndarray)):
            return [tuple(float(v) for v in s) for s in spacing]
        if len(spacing) == 3 and all(isinstance(s, (int, float, np.floating)) for s in spacing):
            return [tuple(float(v) for v in spacing)] * num_cases
    return [tuple(map(float, DEFAULT_SPACING))] * num_cases


def calculate_metrics(predictions, labels, threshold: float = 0.5, spacing=DEFAULT_SPACING) -> Dict:
    """Aggregate metrics over a set of cases (list of [D,H,W] arrays or a
    batched array).  Returns the same key set as the reference
    (``metrics.py:389-404``), including backward-compat aliases."""
    pred_list = list(predictions) if isinstance(predictions, (list, tuple)) else [
        predictions[i] for i in range(predictions.shape[0])
    ]
    label_list = list(labels) if isinstance(labels, (list, tuple)) else [
        labels[i] for i in range(labels.shape[0])
    ]
    num_cases = len(pred_list)
    spacings = _spacing_per_case(spacing, num_cases)

    tp = fp = fn = 0
    inter_sum = 0.0
    union_sum = 0.0
    per_case_dsc = []
    for pred, target, sp in zip(pred_list, label_list, spacings):
        pred = np.asarray(pred)
        target = np.asarray(target)
        pred_bin = (pred >= threshold).astype(np.int32)
        target_bin = (target >= 0.5).astype(np.int32)
        inter_sum += float((pred_bin * target_bin).sum())
        union_sum += float(pred_bin.sum() + target_bin.sum())
        per_case_dsc.append(calculate_dsc(pred_bin, target_bin))

        lm = calculate_lesion_metrics(pred, target, threshold=threshold, spacing=sp)
        tp += lm["tp"]
        fp += lm["fp"]
        fn += lm["fn"]

    dsc_micro = (2.0 * inter_sum + SMOOTH) / (union_sum + SMOOTH)
    dsc_macro = float(np.mean(per_case_dsc)) if per_case_dsc else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "lesion_wise_recall": recall,
        "lesion_wise_precision": precision,
        "lesion_wise_f1": f1,
        "voxel_wise_dsc_micro": dsc_micro,
        "voxel_wise_dsc_macro": dsc_macro,
        "fp_per_case": fp / num_cases if num_cases else 0.0,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        # backward-compat aliases (reference metrics.py:400-403)
        "dsc": dsc_micro,
        "recall": recall,
        "precision": precision,
    }
