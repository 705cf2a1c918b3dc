"""Metrics engine tests: DSC, CCL filtering, matching rules, aggregation."""

import numpy as np
import pytest

from light_unet_tpu.models import metrics as M


def _blob(shape, center, radius):
    vol = np.zeros(shape, np.float32)
    zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
    d = (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    vol[d <= radius**2] = 1.0
    return vol


def test_dsc_perfect_and_empty():
    a = _blob((32, 32, 32), (16, 16, 16), 5)
    assert M.calculate_dsc(a, a) == pytest.approx(1.0, abs=1e-5)
    zeros = np.zeros_like(a)
    assert M.calculate_dsc(zeros, zeros) == pytest.approx(1.0)  # smooth/smooth
    assert M.calculate_dsc(a, zeros) < 1e-4


def test_connected_components_min_size():
    vol = np.zeros((20, 20, 20), np.int32)
    vol[2:5, 2:5, 2:5] = 1  # 27 voxels
    vol[10, 10, 10] = 1  # 1 voxel
    labeled, n = M.get_connected_components(vol)
    assert n == 2
    labeled, n = M.get_connected_components(vol, min_size=5)
    assert n == 1
    assert labeled[3, 3, 3] == 1 and labeled[10, 10, 10] == 0


def test_match_by_iou():
    t = _blob((32, 32, 32), (16, 16, 16), 6)
    p = _blob((32, 32, 32), (17, 16, 16), 6)  # heavy overlap
    tl, _ = M.get_connected_components(t)
    pl, _ = M.get_connected_components(p)
    matches, up, ut = M.match_components(pl, tl, spacing=(4, 4, 4))
    assert matches == [(1, 1)] and up == [] and ut == []


def test_match_by_distance_only():
    """Zero IoU but centers within 10mm must still match (metrics.py:194-197)."""
    t = np.zeros((32, 32, 32), np.float32)
    t[10:12, 10:12, 10:12] = 1
    p = np.zeros_like(t)
    p[13:15, 10:12, 10:12] = 1  # 3 voxels away -> 3mm at 1mm spacing
    tl, _ = M.get_connected_components(t)
    pl, _ = M.get_connected_components(p)
    matches, _, _ = M.match_components(pl, tl, spacing=(1, 1, 1))
    assert matches == [(1, 1)]
    # at 4mm spacing the same gap is 12mm -> no match
    matches, up, ut = M.match_components(pl, tl, spacing=(4, 4, 4))
    assert matches == [] and up == [1] and ut == [1]


def test_one_to_one_greedy():
    """Two predictions near one target: only one may match."""
    t = _blob((40, 40, 40), (20, 20, 20), 5)
    p = np.maximum(
        _blob((40, 40, 40), (20, 20, 18), 4), _blob((40, 40, 40), (20, 20, 26), 3)
    )
    tl, _ = M.get_connected_components(t)
    pl, np_ = M.get_connected_components(p)
    assert np_ == 1 or np_ == 2
    if np_ == 2:
        matches, up, _ = M.match_components(pl, tl, spacing=(1, 1, 1))
        assert len(matches) == 1 and len(up) == 1


def test_lesion_metrics_edge_cases():
    empty = np.zeros((16, 16, 16), np.float32)
    blob = _blob((16, 16, 16), (8, 8, 8), 3)
    both_empty = M.calculate_lesion_metrics(empty, empty)
    assert both_empty["recall"] == 1.0 and both_empty["precision"] == 1.0
    fp_only = M.calculate_lesion_metrics(blob, empty)
    assert fp_only["recall"] == 0.0 and fp_only["fp"] == 1
    fn_only = M.calculate_lesion_metrics(empty, blob)
    assert fn_only["fn"] == 1 and fn_only["recall"] == 0.0


def test_calculate_metrics_aggregation():
    t1 = _blob((24, 24, 24), (12, 12, 12), 4)
    p1 = t1.copy()
    t2 = _blob((24, 24, 24), (8, 8, 8), 3)
    p2 = np.zeros_like(t2)  # miss
    out = M.calculate_metrics([p1, p2], [t1, t2], threshold=0.5, spacing=(4, 4, 4))
    assert out["tp"] == 1 and out["fn"] == 1 and out["fp"] == 0
    assert out["lesion_wise_recall"] == pytest.approx(0.5)
    assert out["voxel_wise_dsc_macro"] == pytest.approx(
        (1.0 + M.calculate_dsc(p2 >= 0.5, t2 >= 0.5)) / 2, abs=1e-4
    )
    # compat aliases
    assert out["recall"] == out["lesion_wise_recall"]
    assert out["dsc"] == out["voxel_wise_dsc_micro"]


def test_calculate_metrics_per_case_spacing():
    t = np.zeros((32, 32, 32), np.float32)
    t[10:12, 10:12, 10:12] = 1
    p = np.zeros_like(t)
    p[13:15, 10:12, 10:12] = 1
    # case 0 spacing 1mm (match), case 1 spacing 4mm (no match)
    out = M.calculate_metrics([p, p], [t, t], threshold=0.5, spacing=[(1, 1, 1), (4, 4, 4)])
    assert out["tp"] == 1 and out["fn"] == 1 and out["fp"] == 1


def test_batched_array_input():
    t = np.stack([_blob((16, 16, 16), (8, 8, 8), 3)] * 2)[:, None]  # [B,1,D,H,W]
    out = M.calculate_metrics(t, t, threshold=0.5)
    assert out["lesion_wise_recall"] == 1.0
    assert out["voxel_wise_dsc_micro"] == pytest.approx(1.0, abs=1e-5)


def test_sweep_matches_per_threshold_calls():
    """calculate_metrics_sweep / lesion_metrics_sweep must equal the
    per-threshold API exactly (the sweep only caches target-side work)."""
    rng = np.random.default_rng(9)
    preds, targets = [], []
    for _ in range(3):
        t = np.zeros((28, 28, 30), np.float32)
        for _ in range(3):
            c = rng.integers(5, 23, 3)
            t[c[0]-2:c[0]+2, c[1]-2:c[1]+2, c[2]-2:c[2]+2] = 1
        p = np.clip(t * rng.uniform(0.4, 1.0) + rng.random(t.shape) * 0.35, 0, 1)
        preds.append(p.astype(np.float32))
        targets.append(t)
    thresholds = [0.1, 0.3, 0.5, 0.7]
    spacings = [(4.0, 4.0, 4.0)] * 3

    sweep = M.calculate_metrics_sweep(preds, targets, thresholds, spacing=spacings)
    for t in thresholds:
        single = M.calculate_metrics(preds, targets, threshold=t, spacing=spacings)
        assert sweep[t] == single, f"threshold {t}"

    lm_sweep = M.lesion_metrics_sweep(preds[0], targets[0], thresholds)
    for t in thresholds:
        assert lm_sweep[t] == M.calculate_lesion_metrics(preds[0], targets[0], threshold=t)
