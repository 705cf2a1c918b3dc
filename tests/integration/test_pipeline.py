"""End-to-end pipeline integration: split -> preprocess -> train -> inference
-> evaluate on a synthetic raw dataset, checking the on-disk artifact
contract (same filenames as the reference, SURVEY §3.1/§5)."""

import json
from pathlib import Path

import numpy as np
import pytest

from light_unet_tpu.cli import run as cli_run
from light_unet_tpu.config import Config
from tests.synthetic import build_raw_dataset

CASE_IDS = [f"{i:04d}" for i in range(1, 11)]  # 10 FL cases -> 7/1/2 split


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    build_raw_dataset(root / "data/raw", CASE_IDS, shape=(28, 28, 34), seed=7)

    cfg = Config()
    cfg.experiment.seed = 42
    cfg.data.patch_size = [16, 16, 16]
    cfg.training.batch_size = 2
    cfg.training.epochs = 2
    cfg.training.scheduler.T_max = 2
    cfg.training.use_warmup = False
    cfg.validation.threshold_sensitivity_range = [0.3, 0.5]
    cfg.output.save_every_n_epochs = 1
    cfg.tpu.patch_batch = 8
    cfg.tpu.z_bucket = 8
    cfg.tpu.compute_dtype = "float32"
    cfg.save(root / "config.yaml")
    return root


def _cli(root, mode, *extra):
    argv = [
        "--mode", mode,
        "--config", str(root / "config.yaml"),
        "--data_root", str(root / "data/raw"),
        "--processed_dir", str(root / "data/processed"),
        "--splits_dir", str(root / "data/splits"),
        "--workdir", str(root),
        *extra,
    ]
    assert cli_run(argv) == 0


@pytest.mark.integration
def test_full_pipeline(workspace):
    root = workspace

    # --- stage 1: split -------------------------------------------------
    _cli(root, "split")
    splits = root / "data/splits"
    train_ids = (splits / "train_list.txt").read_text().split()
    val_ids = (splits / "val_list.txt").read_text().split()
    test_ids = (splits / "test_list.txt").read_text().split()
    assert len(train_ids) + len(val_ids) + len(test_ids) == 10
    assert len(train_ids) == 7  # int(10*0.7)
    assert len(val_ids) == 1
    manifest = json.loads((root / "data" / "split_manifest.json").read_text())
    assert manifest["seed"] == 42
    assert manifest["split_sizes"]["train"] == len(train_ids)
    assert sorted(train_ids + val_ids + test_ids) == CASE_IDS

    # --- stage 2: preprocess ----------------------------------------------
    _cli(root, "preprocess")
    processed = root / "data/processed"
    for cid in train_ids + val_ids:
        assert (processed / "images" / f"{cid}_0000.nii.gz").exists()
        assert (processed / "labels" / f"{cid}.nii.gz").exists()
        assert (processed / "body_masks" / f"{cid}.nii.gz").exists()
        meta = json.loads((processed / "metadata" / f"{cid}.json").read_text())
        assert meta["case_id"] == cid
        assert meta["orig_spacing"] == [4.0, 4.0, 4.0]
        assert meta["processing_path"] == "B"
        assert "body_mask" in meta and "voxel_thresholds" in meta
        assert meta["voxel_thresholds"]["0.5cc"]["voxel_count"] == 8  # 0.5cc/0.064cc
    # test split untouched (black box)
    for cid in test_ids:
        assert not (processed / "images" / f"{cid}_0000.nii.gz").exists()
    assert (processed / "preprocessing_summary.json").exists()
    # normalized range
    from light_unet_tpu.utils import nifti

    img = nifti.load(processed / "images" / f"{train_ids[0]}_0000.nii.gz").get_fdata()
    assert img.min() >= 0.0 and img.max() <= 1.0

    # --- stage 3: train ------------------------------------------------------
    _cli(root, "train")
    assert (root / "models/best_model.pth").exists()
    ckpts = list((root / "models/checkpoints").glob("checkpoint_epoch_*.ckpt"))
    assert len(ckpts) == 2  # save_every_n_epochs=1, 2 epochs
    history = json.loads((root / "logs/training_history.json").read_text())
    assert len(history["train_loss"]) == 2
    assert len(history["val_recall"]) == 2
    assert all(np.isfinite(history["train_loss"]))
    assert list((root / "logs/tensorboard").glob("events*"))  # TB scalars written

    # --- stage 4: inference ---------------------------------------------------
    _cli(root, "inference")
    for cid in val_ids:
        prob_path = root / "inference/prob_maps" / f"{cid}_prob.nii.gz"
        assert prob_path.exists()
        prob = nifti.load(prob_path).get_fdata()
        assert prob.shape == (28, 28, 34)
        assert prob.min() >= 0.0 and prob.max() <= 1.0
        bbox = json.loads((root / "inference/bboxes" / f"{cid}_bboxes.json").read_text())
        assert bbox["case_id"] == cid
        assert bbox["orig_spacing"] == [4.0, 4.0, 4.0]
        assert bbox["num_candidates"] == len(bbox["candidates"])
        for cand in bbox["candidates"]:
            assert set(cand) == {"mask_id", "bbox_voxel", "bbox_mm", "volume_cc", "confidence"}
            assert cand["volume_cc"] >= 0.5  # min inference volume threshold

    # --- stage 5: evaluate -----------------------------------------------------
    _cli(root, "evaluate")
    metrics_csv = root / "inference/metrics.csv"
    assert metrics_csv.exists()
    import pandas as pd

    df = pd.read_csv(metrics_csv, index_col="threshold")
    assert set(df.index) == {0.3, 0.5}
    assert {"recall", "precision", "f1", "dsc", "fp_per_case", "tp", "fp", "fn"} <= set(df.columns)
    detailed = json.loads((root / "inference/detailed_results.json").read_text())
    assert set(detailed) == {"summary", "per_case"}
    assert set(detailed["per_case"]) == set(val_ids)


@pytest.mark.integration
def test_resume_training(workspace):
    """Real checkpoint resume (capability the reference lacks, SURVEY §5)."""
    root = workspace
    from light_unet_tpu.config import Config
    from light_unet_tpu.core.trainer import Trainer

    cfg = Config.load(root / "config.yaml")
    cfg.data_dir = str(root / "data/processed")
    cfg.splits_dir = str(root / "data/splits")
    cfg.training.epochs = 3  # one more than already trained
    trainer = Trainer(cfg, workdir=str(root))
    assert trainer.resume() is True
    assert trainer.start_epoch == 2
    # instrumentation survives resume like history does
    assert trainer.selection_events, "selection events lost on resume"
    assert trainer.val_fallback_history, "fallback history lost on resume"
    result = trainer.train()  # runs exactly epoch 3
    assert len(result["history"]["train_loss"]) == 3
    assert len(result["val_fallback_history"]) == 3


@pytest.mark.integration
def test_preprocess_test_split_guard(workspace):
    root = workspace
    with pytest.raises(PermissionError, match="black box"):
        from light_unet_tpu.pipeline.preprocess import run_preprocess

        cfg = Config.load(root / "config.yaml")
        run_preprocess(cfg, root / "data/raw", root / "data/processed", root / "data/splits",
                       split="test", allow_test=False)
