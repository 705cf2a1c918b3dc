"""Dataset layer: index/domain filter, patch sampling, loaders."""

import numpy as np
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.datasets import (
    CaseDataset,
    MixedPatchSampler,
    PatchSampler,
    PrefetchLoader,
    VolumeCache,
    build_case_index,
    filter_cases_by_domain,
    find_case_files,
    get_data_loader,
)
from tests.synthetic import build_raw_dataset, write_split_files


@pytest.fixture
def case_tree(tmp_path, rng):
    """4 FL + 2 DLBCL cases with split files."""
    ids = ["0001", "0002", "0003", "0004", "1001", "1002"]
    build_raw_dataset(tmp_path / "data", ids, shape=(24, 24, 30), seed=1)
    write_split_files(tmp_path / "splits", train=ids, val=["0001"])
    return tmp_path


def test_find_case_files(case_tree):
    imgs = find_case_files(case_tree / "data", "0001", "image")
    assert len(imgs) == 1 and imgs[0].name == "0001_0000.nii.gz"
    lbls = find_case_files(case_tree / "data", "0001", "label")
    assert len(lbls) == 1 and lbls[0].name == "0001.nii.gz"
    assert find_case_files(case_tree / "data", "9999", "image") == []
    with pytest.raises(ValueError):
        find_case_files(case_tree / "data", "0001", "bogus")


def test_domain_filter():
    ids = ["0001", "0122", "0123", "1000", "1422", "1423"]
    assert filter_cases_by_domain(ids, {"domain": "fl"}) == ["0001", "0122"]
    assert filter_cases_by_domain(ids, {"domain": "dlbcl"}) == ["1000", "1422"]
    assert filter_cases_by_domain(ids, None) == ids
    with pytest.warns(UserWarning):
        out = filter_cases_by_domain(["abcd"], {"domain": "fl"})
    assert out == ["abcd"]  # non-numeric ids pass through


def test_build_case_index_skips_missing(case_tree):
    write_split_files(case_tree / "splits2", train=["0001", "9999"], val=[])
    with pytest.warns(UserWarning):
        records = build_case_index(case_tree / "data", case_tree / "splits2" / "train_list.txt")
    assert [r.case_id for r in records] == ["0001"]


def test_patch_sampler_locations_and_draw(case_tree):
    sampler = PatchSampler(
        case_tree / "data",
        case_tree / "splits" / "train_list.txt",
        patch_size=(16, 16, 16),
        seed=42,
        domain_config={"domain": "fl"},
    )
    assert len(sampler.cases) == 4
    # min 10 lesion + min 10 bg locations per case
    assert len(sampler.lesion_locations) >= 40
    assert len(sampler.background_locations) >= 40
    img, lbl = sampler.draw()
    assert img.shape == (16, 16, 16) and lbl.shape == (16, 16, 16)
    assert img.dtype == np.float32
    imgs, lbls = sampler.sample_batch(3)
    assert imgs.shape == (3, 16, 16, 16, 1) and lbls.shape == (3, 16, 16, 16, 1)


def test_patch_sampler_border_clamp(case_tree):
    sampler = PatchSampler(
        case_tree / "data",
        case_tree / "splits" / "train_list.txt",
        patch_size=(16, 16, 16),
        seed=0,
    )
    image = np.arange(24 * 24 * 30, dtype=np.float32).reshape(24, 24, 30)
    label = np.zeros_like(image)
    img, lbl = sampler._extract_patch(image, label, np.array([0, 0, 29]))
    assert img.shape == (16, 16, 16)
    # clamped start z=0,y=0; x start = min requirement: 29-8=21, end=min(30,37)=30 -> 9 wide, padded to 16
    assert img[0, 0, 0] == image[0, 0, 21]
    assert img[0, 0, 9:].sum() == 0  # zero padding


def test_patch_sampler_determinism(case_tree):
    mk = lambda: PatchSampler(
        case_tree / "data", case_tree / "splits" / "train_list.txt",
        patch_size=(16, 16, 16), seed=7,
    )
    a, b = mk(), mk()
    ia, la = a.sample_batch(4)
    ib, lb = b.sample_batch(4)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(la, lb)


def test_lesion_ratio_extremes(case_tree):
    kwargs = dict(patch_size=(16, 16, 16), seed=3)
    lesion_only = PatchSampler(
        case_tree / "data", case_tree / "splits" / "train_list.txt",
        lesion_patch_ratio=1.0, **kwargs,
    )
    for _ in range(5):
        _, lbl = lesion_only.draw()
        assert lbl.sum() > 0  # lesion-centered patches contain the lesion voxel


def test_mixed_sampler_counts(case_tree):
    mixed = MixedPatchSampler(
        case_tree / "data",
        case_tree / "splits" / "train_list.txt",
        patch_size=(16, 16, 16),
        seed=42,
        fl_ratio=1.0,
    )
    assert len(mixed.fl_sampler.cases) == 4
    assert len(mixed.dlbcl_sampler.cases) == 2
    mixed.sample_batch(6)
    counts = mixed.get_sample_counts()
    assert counts["fl_samples"] == 6 and counts["dlbcl_samples"] == 0
    mixed.reset_sample_counts()
    assert mixed.get_sample_counts()["total_samples"] == 0


def test_case_dataset(case_tree):
    ds = CaseDataset(case_tree / "data", case_tree / "splits" / "val_list.txt",
                     return_body_mask=True)
    assert len(ds) == 1
    sample = ds.load_case(0)
    assert sample.case_id == "0001"
    assert sample.image.shape == (24, 24, 30)
    assert sample.spacing == (4.0, 4.0, 4.0)
    # no body_masks dir -> fallback all-ones (case_dataset.py:77-88 parity)
    np.testing.assert_array_equal(sample.body_mask, np.ones_like(sample.label))


def test_body_mask_required_raises(case_tree):
    with pytest.raises(FileNotFoundError, match="Body mask is required"):
        CaseDataset(case_tree / "data", case_tree / "splits" / "val_list.txt",
                    return_body_mask=True, body_mask_required=True)


def test_prefetch_loader(case_tree):
    sampler = PatchSampler(case_tree / "data", case_tree / "splits" / "train_list.txt",
                           patch_size=(16, 16, 16), seed=1)
    loader = PrefetchLoader(sampler, batch_size=4, prefetch_depth=2)
    n = len(loader)
    assert n == len(sampler) // 4
    batches = list(loader)
    assert len(batches) == n
    assert batches[0][0].shape == (4, 16, 16, 16, 1)


def test_loader_factory_modes(case_tree):
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.enabled = False
    cfg.training.batch_size = 2

    out = get_data_loader(case_tree / "data", case_tree / "splits" / "train_list.txt", cfg, True)
    assert out["mode"] == "standard"

    cfg.training.mixed_domains.enabled = True
    cfg.training.mixed_domains.mode = "probabilistic"
    out = get_data_loader(case_tree / "data", case_tree / "splits" / "train_list.txt", cfg, True)
    assert out["mode"] == "probabilistic" and "train_dataset" in out

    cfg.training.mixed_domains.mode = "fl_epoch_plus_dlbcl"
    out = get_data_loader(case_tree / "data", case_tree / "splits" / "train_list.txt", cfg, True)
    assert out["mode"] == "fl_epoch_plus_dlbcl"
    assert len(out["fl_dataset"].cases) == 4
    assert len(out["dlbcl_dataset"].cases) == 2

    val = get_data_loader(case_tree / "data", case_tree / "splits" / "val_list.txt", cfg, False)
    assert val["mode"] == "validation"
    # mixed enabled -> FL-only validation (loader.py:83-86 parity)
    assert all(c.case_id.startswith("0") for c in val["val_loader"].cases)


def test_volume_cache_lru(case_tree):
    cache = VolumeCache(max_items=2)
    paths = [str(case_tree / "data" / "images" / f"{cid}_0000.nii.gz")
             for cid in ("0001", "0002", "0003")]
    for p in paths:
        cache.get(p)
    assert len(cache) == 2  # LRU evicted the first
    a = cache.get(paths[2])
    b = cache.get(paths[2])
    assert a is b  # cached object identity


def test_reference_compatible_aliases():
    """The reference's class names and legacy models-package re-exports
    (light_unet/models/__init__.py:18-24) must keep working."""
    from light_unet_tpu.datasets import CaseDataset, MixedPatchDataset, PatchDataset
    from light_unet_tpu.datasets.patch_sampler import MixedPatchSampler, PatchSampler
    from light_unet_tpu import models

    assert PatchDataset is PatchSampler
    assert MixedPatchDataset is MixedPatchSampler
    assert models.PatchDataset is PatchSampler
    assert models.CaseDataset is CaseDataset
    assert callable(models.filter_cases_by_domain)


def test_prefetch_loader_quantized_batches(case_tree):
    sampler = PatchSampler(case_tree / "data", case_tree / "splits" / "train_list.txt",
                           patch_size=(16, 16, 16), seed=1)
    loader = PrefetchLoader(sampler, batch_size=4, prefetch_depth=2, quantize=True)
    images, labels = next(iter(loader))
    assert images.dtype == np.uint16 and labels.dtype == np.uint8
    assert set(np.unique(labels)) <= {0, 1}
    # dequantized images must match the f32 batch within one quantization
    # step (training data is preprocessed to [0,1]; the fixture here is raw,
    # so compare against the clipped reference — the quantizer's [0,1] clip
    # is a no-op on real preprocessed batches)
    sampler2 = PatchSampler(case_tree / "data", case_tree / "splits" / "train_list.txt",
                            patch_size=(16, 16, 16), seed=1)
    ref_images, ref_labels = next(iter(PrefetchLoader(sampler2, batch_size=4, prefetch_depth=2)))
    np.testing.assert_allclose(
        images.astype(np.float32) / 65535.0, np.clip(ref_images, 0.0, 1.0),
        atol=1.01 / (2 * 65535),
    )
    np.testing.assert_array_equal(labels, ref_labels)


def test_loader_factory_quantize_guard(case_tree):
    """uint16 batch quantization maps [0,1]; any other normalization range
    must keep the exact f32 path (values would be clipped otherwise)."""
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.enabled = False
    cfg.training.batch_size = 2
    assert cfg.tpu.transfer_dtype == "uint16"

    out = get_data_loader(case_tree / "data", case_tree / "splits" / "train_list.txt", cfg, True)
    assert out["train_loader"].quantize is True

    cfg.data.intensity.normalization_range = [-1.0, 1.0]
    out = get_data_loader(case_tree / "data", case_tree / "splits" / "train_list.txt", cfg, True)
    assert out["train_loader"].quantize is False
