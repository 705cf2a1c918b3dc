"""Artifact-level A/B parity against the REFERENCE's own pipeline code.

``test_port_torch.py`` proves the composed flax forward equals the reference
torch network at identical weights.  This file runs the last rung of the
proof ladder (VERDICT r2 "What's missing" #1): the reference's own
``Inferencer.infer_case`` (``light_unet/core/inferencer.py:113-183``) and
``scripts/evaluate.py`` chain execute IN THIS ENVIRONMENT (nibabel shimmed
over our codec, the reference's broken ``light_unet.metrics`` import aliased
— see ``tools/ref_harness.py``) on the same synthetic cases with the same
ported weights as our pipeline, and the ARTIFACTS are diffed:

* probability maps: max |Δ| within float tolerance;
* ``{id}_bboxes.json``: exact schema, ordering, voxel boxes, volumes;
* metrics TP/FP/FN: exact integer equality (cross-evaluated on identical
  maps so no fp-boundary voxel can flip a count), plus own-map evaluation
  equality.

Skips when the reference tree or torch is unavailable.
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from light_unet_tpu.config import Config
from light_unet_tpu.tools.ref_harness import load_reference, reference_available
from light_unet_tpu.utils import nifti

if not reference_available():
    pytest.skip("reference tree not available", allow_module_level=True)

CASES = ["0001", "0002", "0003", "0017"]
SHAPE = (48, 48, 56)
SPACING = (4.0, 4.0, 4.0)


def _synth_case(rng, shape=SHAPE):
    """Normalized ([0,1]) PET-like phantom + label + body mask."""
    zz, yy, xx = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    c = [s / 2.0 for s in shape]
    body = (
        ((zz - c[0]) / (0.46 * shape[0])) ** 2
        + ((yy - c[1]) / (0.42 * shape[1])) ** 2
        + ((xx - c[2]) / (0.44 * shape[2])) ** 2
    ) <= 1.0
    img = rng.uniform(0.0, 0.01, shape).astype(np.float32)
    img[body] = 0.25 + rng.normal(0.0, 0.03, int(body.sum())).astype(np.float32)
    label = np.zeros(shape, np.float32)
    for _ in range(int(rng.integers(1, 4))):
        p = [int(rng.integers(int(0.3 * s), int(0.7 * s))) for s in shape]
        r = int(rng.integers(2, 4))
        m = (zz - p[0]) ** 2 + (yy - p[1]) ** 2 + (xx - p[2]) ** 2 <= r * r
        img[m] = 0.9
        label[m] = 1.0
    return np.clip(img, 0.0, 1.0), label, body.astype(np.float32)


@pytest.fixture(scope="module")
def ab(tmp_path_factory):
    """Build the shared cohort + checkpoint, run BOTH pipelines once."""
    td = tmp_path_factory.mktemp("ref_parity")
    data_dir = td / "processed"
    for sub in ("images", "labels", "body_masks"):
        (data_dir / sub).mkdir(parents=True)
    aff = np.diag([*SPACING, 1.0])
    rng = np.random.default_rng(1234)
    for cid in CASES:
        img, lab, mask = _synth_case(rng)
        nifti.save(nifti.Nifti1Image(img, aff), data_dir / "images" / f"{cid}_0000.nii.gz")
        nifti.save(nifti.Nifti1Image(lab, aff), data_dir / "labels" / f"{cid}.nii.gz")
        nifti.save(nifti.Nifti1Image(mask, aff), data_dir / "body_masks" / f"{cid}.nii.gz")
    split_file = td / "val_list.txt"
    split_file.write_text("\n".join(CASES) + "\n")

    ref = load_reference()

    # --- one set of weights for both sides --------------------------------
    torch.manual_seed(7)
    tmodel = ref.unet3d.Lightweight3DUNet(
        in_channels=1, out_channels=1, encoder_channels=[16, 32, 64, 128],
        use_depthwise_separable=True, use_grouped=True, groups=8, dropout_p=0.0,
    )
    tmodel.eval()
    pth = td / "best_model.pth"
    torch.save(
        {"epoch": 1, "model_state_dict": tmodel.state_dict(),
         "best_metric": 0.5, "best_recall": 0.5, "best_dsc": 0.5, "best_epoch": 1},
        pth,
    )

    # --- config: identical dict, only output dirs differ ------------------
    base = Config()
    base.tpu.compute_dtype = "float32"
    base.tpu.transfer_dtype = "float32"
    base.tpu.fetch_dtype = "float32"
    base.tpu.compilation_cache_dir = ""
    # conftest exposes 8 virtual CPU devices for the sharding tests; the
    # shard_map sliding-window path on ONE host core would multiply padded
    # patch work 8x — parity numerics are mesh-independent (pinned by
    # test_sliding_window), so run single-device here
    base.tpu.mesh_shape = [1]
    cfg_dict = base.to_dict()

    ref_cfg = json.loads(json.dumps(cfg_dict))
    ref_cfg["output"]["prob_maps_dir"] = str(td / "ref" / "prob_maps")
    ref_cfg["output"]["bboxes_dir"] = str(td / "ref" / "bboxes")

    # --- reference pipeline (its own torch code) ---------------------------
    ref_inf = ref.Inferencer(ref_cfg, str(pth))
    for cid in CASES:
        assert ref_inf.infer_case(cid, str(data_dir), threshold=0.3)

    # --- our pipeline ------------------------------------------------------
    ours_cfg = Config.from_dict(json.loads(json.dumps(cfg_dict)))
    ours_cfg.output.prob_maps_dir = str(td / "ours" / "prob_maps")
    ours_cfg.output.bboxes_dir = str(td / "ours" / "bboxes")
    from light_unet_tpu.core.inferencer import Inferencer

    our_inf = Inferencer(ours_cfg, pth, workdir=str(td))
    for cid in CASES:
        assert our_inf.infer_case(cid, data_dir, threshold=0.3)

    return dict(
        td=td, data_dir=data_dir, split_file=split_file, ref=ref,
        cfg_dict=cfg_dict, ours_cfg=ours_cfg,
        ref_prob=td / "ref" / "prob_maps", ref_bbox=td / "ref" / "bboxes",
        our_prob=td / "ours" / "prob_maps", our_bbox=td / "ours" / "bboxes",
    )


def test_prob_maps_match_within_float_tolerance(ab):
    """Same weights, same cases -> same Gaussian-blended probability maps.
    Catches divergence in window grids, edge snapping, padding, blending."""
    worst = 0.0
    for cid in CASES:
        ref_map = nifti.load(ab["ref_prob"] / f"{cid}_prob.nii.gz").get_fdata()
        our_map = nifti.load(ab["our_prob"] / f"{cid}_prob.nii.gz").get_fdata()
        assert ref_map.shape == our_map.shape == SHAPE
        d = float(np.abs(ref_map.astype(np.float64) - our_map.astype(np.float64)).max())
        worst = max(worst, d)
    print(f"prob-map max|delta| across {len(CASES)} cases: {worst:.3e}")
    assert worst < 2e-4, worst  # f32 convs, different-but-valid summation orders


def test_bboxes_json_schema_and_content_match(ab):
    """{id}_bboxes.json: exact schema/ordering; voxel boxes + integer-derived
    volumes equal; confidences within float tolerance."""
    for cid in CASES:
        ref_j = json.loads((ab["ref_bbox"] / f"{cid}_bboxes.json").read_text())
        our_j = json.loads((ab["our_bbox"] / f"{cid}_bboxes.json").read_text())
        assert set(ref_j) == set(our_j)
        for key in ("case_id", "processing_path", "threshold", "num_candidates"):
            assert ref_j[key] == our_j[key], (cid, key)
        assert ref_j["orig_spacing"] == pytest.approx(our_j["orig_spacing"])
        assert len(ref_j["candidates"]) == len(our_j["candidates"])
        for rc, oc in zip(ref_j["candidates"], our_j["candidates"]):
            assert set(rc) == set(oc)
            assert rc["mask_id"] == oc["mask_id"]
            assert rc["bbox_voxel"] == oc["bbox_voxel"], (cid, rc["mask_id"])
            assert rc["bbox_mm"] == pytest.approx(oc["bbox_mm"])
            assert rc["volume_cc"] == pytest.approx(oc["volume_cc"], abs=1e-9)
            assert rc["confidence"] == pytest.approx(oc["confidence"], abs=2e-4)


def test_cross_evaluation_integer_exact(ab):
    """Both evaluate chains on the SAME (reference-generated) prob maps:
    TP/FP/FN must be exactly equal per threshold — the only fp left is the
    map itself, which is identical, so any count difference is a real
    matcher/CCL divergence."""
    from light_unet_tpu.pipeline.evaluate import evaluate_split as ours_evaluate

    ref = ab["ref"]
    ref_summary, ref_cases = ref.evaluate.evaluate_split(
        str(ab["split_file"]), str(ab["ref_prob"]), str(ab["data_dir"]), ab["cfg_dict"]
    )
    our_summary, our_cases = ours_evaluate(
        ab["split_file"], ab["ref_prob"], ab["data_dir"],
        Config.from_dict(ab["cfg_dict"]),
    )
    assert set(map(float, ref_summary)) == set(map(float, our_summary))
    for t, ref_row in ref_summary.items():
        our_row = our_summary[t]
        for key in ("tp", "fp", "fn", "num_cases"):
            assert int(ref_row[key]) == int(our_row[key]), (t, key, ref_row, our_row)
        for key in ("recall", "precision", "f1", "fp_per_case"):
            assert ref_row[key] == pytest.approx(our_row[key], abs=1e-12)
        assert ref_row["dsc"] == pytest.approx(our_row["dsc"], abs=1e-9)
    # per-case rows too
    for cid in CASES:
        for t in ref_cases[cid]:
            for key in ("tp", "fp", "fn"):
                assert int(ref_cases[cid][t][key]) == int(our_cases[cid][t][key]), (cid, t, key)


def test_own_map_evaluation_matches(ab):
    """End-to-end: each side evaluates its OWN prob maps; integer counts must
    still agree (deterministic fixed-seed cohort; a mismatch means a voxel
    sits within f32 noise of a threshold — inspect before relaxing)."""
    from light_unet_tpu.pipeline.evaluate import evaluate_split as ours_evaluate

    ref = ab["ref"]
    ref_summary, _ = ref.evaluate.evaluate_split(
        str(ab["split_file"]), str(ab["ref_prob"]), str(ab["data_dir"]), ab["cfg_dict"]
    )
    our_summary, _ = ours_evaluate(
        ab["split_file"], ab["our_prob"], ab["data_dir"],
        Config.from_dict(ab["cfg_dict"]),
    )
    for t, ref_row in ref_summary.items():
        our_row = our_summary[t]
        for key in ("tp", "fp", "fn"):
            assert int(ref_row[key]) == int(our_row[key]), (t, key)
