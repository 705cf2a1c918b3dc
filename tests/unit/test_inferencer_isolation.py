"""Split inference must isolate per-case failures (ADVICE r1 medium).

One corrupt NIfTI in the split — decode explodes inside the prefetch pool —
must be recorded in ``failed`` while every other case completes, matching
the reference's collected-not-fatal contract
(``light_unet/core/inferencer.py:148-159,196-200``).
"""

import jax
import numpy as np
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.core.checkpoint import save_checkpoint
from light_unet_tpu.core.inferencer import Inferencer
from light_unet_tpu.models.unet3d import build_model, init_params
from light_unet_tpu.utils import nifti
from tests.synthetic import make_phantom, write_split_files


@pytest.fixture
def workspace(tmp_path):
    rng = np.random.default_rng(11)
    ids = ["0001", "0002", "0003"]
    data_dir = tmp_path / "proc"
    (data_dir / "images").mkdir(parents=True)
    (data_dir / "labels").mkdir(parents=True)
    aff = np.diag([4.0, 4.0, 4.0, 1.0])
    for cid in ids:
        img, lab = make_phantom(rng, shape=(20, 20, 24))
        nifti.save(nifti.Nifti1Image(img, aff), data_dir / f"images/{cid}_0000.nii.gz")
        nifti.save(
            nifti.Nifti1Image(lab.astype(np.uint8), aff), data_dir / f"labels/{cid}.nii.gz"
        )
    # corrupt the middle case's image: valid gzip, garbage NIfTI payload
    import gzip

    with gzip.open(data_dir / "images/0002_0000.nii.gz", "wb") as f:
        f.write(b"\x00" * 500)
    write_split_files(tmp_path / "splits", ids, ids)

    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.tpu.patch_batch = 8
    cfg.tpu.z_bucket = 8
    cfg.data.body_mask.enabled = False
    cfg.data_dir = str(data_dir)
    cfg.splits_dir = str(tmp_path / "splits")

    model = build_model(cfg.model, inference=True)
    params = init_params(model, jax.random.PRNGKey(0), (16, 16, 16))
    ckpt = tmp_path / "model.ckpt"
    save_checkpoint(ckpt, {"params": params}, {"epoch": 0})
    return tmp_path, data_dir, cfg, ckpt


def test_corrupt_case_is_collected_not_fatal(workspace):
    tmp_path, data_dir, cfg, ckpt = workspace
    inf = Inferencer(cfg, ckpt, workdir=str(tmp_path))
    result = inf.infer_split(tmp_path / "splits/val_list.txt", data_dir)
    assert result["failed"] == ["0002"]
    assert result["successful"] == 2
    assert (tmp_path / "inference/prob_maps/0001_prob.nii.gz").exists()
    assert (tmp_path / "inference/prob_maps/0003_prob.nii.gz").exists()
    assert not (tmp_path / "inference/prob_maps/0002_prob.nii.gz").exists()


def test_no_prob_maps_mode(workspace):
    tmp_path, data_dir, cfg, ckpt = workspace
    inf = Inferencer(cfg, ckpt, workdir=str(tmp_path), save_prob_maps=False)
    result = inf.infer_split(tmp_path / "splits/val_list.txt", data_dir)
    assert result["successful"] == 2
    assert not list((tmp_path / "inference/prob_maps").glob("*.nii.gz"))
    import json

    bb = json.loads((tmp_path / "inference/bboxes/0001_bboxes.json").read_text())
    assert bb["num_candidates"] == len(bb["candidates"])
