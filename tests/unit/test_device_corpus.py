"""Device-resident training corpus (``datasets/device_corpus.py``).

The invariant that matters: a corpus-gathered batch is BIT-IDENTICAL to the
host loader's quantized batch for the same sampler draws — the corpus mode
changes WHERE patches are assembled, never WHAT the model trains on.
"""

import numpy as np
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.datasets.device_corpus import (
    CornerLoader,
    DeviceCorpus,
    corner_for,
    corpus_bucket_shape,
    gather_patches,
)
from light_unet_tpu.datasets.loader import PrefetchLoader
from light_unet_tpu.datasets.patch_sampler import MixedPatchSampler, PatchSampler
from light_unet_tpu.datasets.volume_cache import VolumeCache
from light_unet_tpu.utils import nifti
from tests.synthetic import write_split_files

PATCH = (16, 16, 16)


def _write_norm_case(data_dir, cid, shape, rng):
    """Normalized-[0,1] case (the corpus precondition, like preprocessed
    data) with a couple of lesions."""
    (data_dir / "images").mkdir(parents=True, exist_ok=True)
    (data_dir / "labels").mkdir(parents=True, exist_ok=True)
    img = (0.2 + 0.1 * rng.random(shape)).astype(np.float32)
    lab = np.zeros(shape, np.float32)
    for _ in range(2):
        c = [int(rng.integers(2, s - 2)) for s in shape]
        img[c[0] - 1 : c[0] + 1, c[1] - 1 : c[1] + 1, c[2] - 1 : c[2] + 1] = 0.95
        lab[c[0] - 1 : c[0] + 1, c[1] - 1 : c[1] + 1, c[2] - 1 : c[2] + 1] = 1.0
    aff = np.diag([4.0, 4.0, 4.0, 1.0])
    nifti.save(nifti.Nifti1Image(img, aff), data_dir / "images" / f"{cid}_0000.nii.gz")
    nifti.save(nifti.Nifti1Image(lab.astype(np.uint8), aff), data_dir / "labels" / f"{cid}.nii.gz")


@pytest.fixture()
def tree(tmp_path):
    """Mixed-shape cohort incl. a volume SMALLER than the patch (border
    clamp + zero-pad edge case)."""
    data_dir = tmp_path / "processed"
    rng = np.random.default_rng(3)
    shapes = {"0001": (24, 24, 30), "0002": (20, 28, 24), "0003": (12, 14, 10)}
    for cid, shape in shapes.items():
        _write_norm_case(data_dir, cid, shape, rng)
    write_split_files(tmp_path / "splits", list(shapes), [])
    return tmp_path


def _sampler(tree, seed=42, domain=None):
    return PatchSampler(
        tree / "processed", tree / "splits" / "train_list.txt",
        PATCH, 0.5, seed, domain, None, VolumeCache(),
    )


def test_bucket_shape_never_clamps():
    """corner + patch <= bucket for the worst legal clamped corner."""
    shapes = [(100, 30, 7), (48, 48, 48), (5, 5, 5)]
    bucket = corpus_bucket_shape(shapes, (48, 48, 48))
    for s in shapes:
        for axis in range(3):
            worst = max(0, s[axis] - 1 - 48 // 2)
            assert worst + 48 <= bucket[axis], (s, axis, bucket)


def test_corpus_gather_bit_identical_to_host_quantized_batch(tree):
    """Same seed, same draws: device-gathered uint16/uint8 patches equal the
    host loader's quantized batch EXACTLY (including border zero-padding)."""
    s_host = _sampler(tree, seed=7)
    s_corpus = _sampler(tree, seed=7)
    corpus = DeviceCorpus.build(s_corpus.cases, s_corpus.cache, PATCH)
    assert corpus is not None

    loader = CornerLoader(s_corpus, corpus, batch_size=16)
    corners = loader.sample_corners()
    dev_img, dev_lbl = gather_patches(corpus.images, corpus.labels, corners, PATCH)

    host_img, host_lbl = PrefetchLoader._quantize_batch(s_host.sample_batch(16))
    np.testing.assert_array_equal(np.asarray(dev_img), host_img)
    np.testing.assert_array_equal(np.asarray(dev_lbl), host_lbl)


def test_corner_loader_preserves_rng_stream(tree):
    """After one corpus epoch, the sampler rng is in the same state as after
    one host epoch (draw_index consumes the stream exactly like draw)."""
    a = _sampler(tree, seed=11)
    b = _sampler(tree, seed=11)
    corpus = DeviceCorpus.build(a.cases, a.cache, PATCH)
    CornerLoader(a, corpus, 8).sample_corners()
    b.sample_batch(8)
    # next draw from both must pick identical (case, center)
    assert a.draw_index()[1:][0] == b.draw_index()[1:][0]


def test_mixed_sampler_draw_matches_draw_index(tree):
    """MixedPatchSampler.draw() routes through draw_index: patches and
    domain counts match a twin consuming the same stream."""
    dom = {"fl_prefix_max": 122, "dlbcl_prefix_min": 1000, "dlbcl_prefix_max": 1422}
    a = MixedPatchSampler(tree / "processed", tree / "splits" / "train_list.txt",
                          PATCH, 0.5, 5, dom, 0.5, None, VolumeCache())
    b = MixedPatchSampler(tree / "processed", tree / "splits" / "train_list.txt",
                          PATCH, 0.5, 5, dom, 0.5, None, VolumeCache())
    for _ in range(6):
        img_a, lbl_a = a.draw()
        which, idx, center = b.draw_index()
        sub = b.fl_sampler if which == 0 else b.dlbcl_sampler
        case = sub.cases[idx]
        img_b, lbl_b = sub._extract_patch(
            sub.cache.get(case.image_path), sub.cache.get(case.label_path), center
        )
        np.testing.assert_array_equal(img_a, img_b.astype(np.float32))
        np.testing.assert_array_equal(lbl_a, lbl_b.astype(np.float32))
    assert a.get_sample_counts() == b.get_sample_counts()


def test_budget_fallback(tree):
    s = _sampler(tree)
    assert DeviceCorpus.build(s.cases, s.cache, PATCH, budget_gb=1e-9) is None


def test_corner_for_matches_extract_patch_geometry():
    """corner_for reproduces the host clamp for interior, border, and
    smaller-than-patch volumes."""
    rng = np.random.default_rng(0)
    for shape in [(30, 30, 30), (20, 48, 9), (5, 5, 5)]:
        vol = rng.random(shape).astype(np.float32)
        sampler = PatchSampler.__new__(PatchSampler)  # geometry-only instance
        sampler.patch_size = PATCH
        for _ in range(20):
            center = np.array([rng.integers(0, s) for s in shape])
            img, _ = sampler._extract_patch(vol, vol, center)
            z0, y0, x0 = corner_for(center, PATCH)
            padded = np.zeros([s + p for s, p in zip(shape, PATCH)], np.float32)
            padded[: shape[0], : shape[1], : shape[2]] = vol
            ref = padded[z0 : z0 + PATCH[0], y0 : y0 + PATCH[1], x0 : x0 + PATCH[2]]
            np.testing.assert_array_equal(img, ref)


def test_trainer_corpus_mode_loss_bit_identical_to_host_mode(tmp_path):
    """End-to-end pin: two Trainers, same seed, corpus on vs off — identical
    per-step losses (same draws, same quantization, same augmentation keys)."""
    from light_unet_tpu.core.trainer import Trainer

    data_dir = tmp_path / "processed"
    rng = np.random.default_rng(9)
    for cid in ("0001", "0002"):
        _write_norm_case(data_dir, cid, (20, 20, 24), rng)
    write_split_files(tmp_path / "splits", ["0001", "0002"], ["0001"])

    def make_cfg(use_corpus):
        cfg = Config()
        cfg.data.patch_size = list(PATCH)
        cfg.data.body_mask.enabled = False
        cfg.training.batch_size = 4
        cfg.training.epochs = 1
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.device_corpus = use_corpus
        cfg.tpu.compilation_cache_dir = ""
        cfg.data_dir = str(data_dir)
        cfg.splits_dir = str(tmp_path / "splits")
        return cfg

    t_host = Trainer(make_cfg(False), workdir=str(tmp_path / "w1"))
    t_corp = Trainer(make_cfg(True), workdir=str(tmp_path / "w2"))
    assert t_host.corpus is None and t_corp.corpus is not None

    losses_host = [float(t_host._step_on_batch(b)) for b in t_host.train_loader]
    losses_corp = [float(t_corp._step_on_batch(b)) for b in t_corp.train_loader]
    assert len(losses_host) == len(losses_corp) > 0
    np.testing.assert_array_equal(np.asarray(losses_host), np.asarray(losses_corp))

    # with the corpus resident, the f32 train volumes must be evicted from
    # the host cache (5.4 GB of dead weight at reference scale); the host
    # trainer keeps (and needs) its cached volumes
    train_paths = {str(p) for c in t_corp.train_loader.sampler.cases
                   for p in (c.image_path, c.label_path) if p}
    assert not train_paths & set(t_corp.cache._store.keys())
    assert len(t_host.cache) > 0


def test_chained_dispatch_loss_bit_identical(tmp_path):
    """tpu.steps_per_dispatch > 1 must produce EXACTLY the losses of K
    single-step dispatches (same gather, same rng stream, same step math),
    including the shorter epoch-tail chain."""
    from light_unet_tpu.core.trainer import Trainer

    data_dir = tmp_path / "processed"
    rng = np.random.default_rng(11)
    for cid in ("0001", "0002"):
        _write_norm_case(data_dir, cid, (20, 20, 24), rng)
    write_split_files(tmp_path / "splits", ["0001", "0002"], ["0001"])

    def make_cfg(chain):
        cfg = Config()
        cfg.data.patch_size = list(PATCH)
        cfg.data.body_mask.enabled = False
        cfg.training.batch_size = 4
        cfg.training.epochs = 1
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.steps_per_dispatch = chain
        cfg.tpu.compilation_cache_dir = ""
        cfg.data_dir = str(data_dir)
        cfg.splits_dir = str(tmp_path / "splits")
        return cfg

    t1 = Trainer(make_cfg(1), workdir=str(tmp_path / "w1"))
    t3 = Trainer(make_cfg(3), workdir=str(tmp_path / "w2"))
    assert t3._train_chain is not None and t3.corpus is not None

    losses1 = [float(t1._step_on_batch(b)) for b in t1._dispatch_units(t1.train_loader)]
    units = list(t3._dispatch_units(t3.train_loader))
    n_batches = len(t3.train_loader)
    # the grouper must cover every batch: full chains + a tail
    assert sum(t3._unit_steps(u) for u in units) == n_batches
    assert any(t3._unit_steps(u) > 1 for u in units)
    losses3 = t3._flatten_losses([t3._step_on_batch(u) for u in units])
    np.testing.assert_array_equal(np.asarray(losses1), np.asarray(losses3))


def test_chained_dispatch_requires_separable_augment(tmp_path):
    """ADVICE r3: steps_per_dispatch>1 under the map_coordinates oracle
    augmentation path re-creates the measured gather-composition regression;
    the trainer must warn and fall back to single-step dispatch."""
    import warnings

    from light_unet_tpu.core.trainer import Trainer

    data_dir = tmp_path / "processed"
    rng = np.random.default_rng(13)
    for cid in ("0001", "0002"):
        _write_norm_case(data_dir, cid, (20, 20, 24), rng)
    write_split_files(tmp_path / "splits", ["0001", "0002"], ["0001"])

    cfg = Config()
    cfg.data.patch_size = list(PATCH)
    cfg.data.body_mask.enabled = False
    cfg.training.batch_size = 2
    cfg.tpu.steps_per_dispatch = 3
    cfg.tpu.separable_augment = False  # the supported oracle path
    cfg.tpu.compilation_cache_dir = ""
    cfg.data_dir = str(data_dir)
    cfg.splits_dir = str(tmp_path / "splits")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        t = Trainer(cfg, workdir=str(tmp_path / "w"))
    assert t._chain == 1 and t._train_chain is None
    assert any("separable_augment" in str(w.message) for w in caught)
    t.writer.close()


def test_sharded_gather_bit_identical_to_replicated():
    """Case-sharded corpus (tpu.shard_corpus, VERDICT r4 missing#2): the
    shard_map corner-routing gather must be BIT-identical to the replicated
    gather, per-device residency must be ~1/D, and the output must come back
    batch-sharded over all devices."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from light_unet_tpu.datasets.device_corpus import gather_patches_sharded
    from light_unet_tpu.parallel.mesh import create_mesh, replicate

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from functools import partial

    rng = np.random.default_rng(17)
    mesh = create_mesh("data", jax.devices())
    n_cases, n_rows, batch, patch = 11, 16, 16, (8, 8, 8)
    bucket = (20, 20, 24)
    img = np.zeros((n_rows, *bucket), np.uint16)  # rows 11..15 are padding
    lbl = np.zeros((n_rows, *bucket), np.uint8)
    img[:n_cases] = rng.integers(0, 65536, (n_cases, *bucket), dtype=np.uint16)
    lbl[:n_cases] = rng.integers(0, 2, (n_cases, *bucket), dtype=np.uint8)

    img_sh = jax.device_put(img, NamedSharding(mesh, P("data")))
    lbl_sh = jax.device_put(lbl, NamedSharding(mesh, P("data")))
    img_rep = replicate(jnp.asarray(img), mesh)
    lbl_rep = replicate(jnp.asarray(lbl), mesh)

    corners = np.stack([
        rng.integers(0, n_cases, batch),
        rng.integers(0, bucket[0] - patch[0] + 1, batch),
        rng.integers(0, bucket[1] - patch[1] + 1, batch),
        rng.integers(0, bucket[2] - patch[2] + 1, batch),
    ], axis=1).astype(np.int32)

    gi_r, gl_r = jax.jit(gather_patches, static_argnums=(3,))(
        img_rep, lbl_rep,
        jax.device_put(corners, NamedSharding(mesh, P("data"))), patch,
    )
    gi_s, gl_s = jax.jit(
        partial(gather_patches_sharded, mesh=mesh, data_axis="data"),
        static_argnums=(3,),
    )(img_sh, lbl_sh, jax.device_put(corners, NamedSharding(mesh, P())), patch)

    np.testing.assert_array_equal(np.asarray(gi_r), np.asarray(gi_s))
    np.testing.assert_array_equal(np.asarray(gl_r), np.asarray(gl_s))
    # residency: each device holds exactly rows/D of the stack
    for d in jax.devices():
        nb = sum(s.data.nbytes for s in img_sh.addressable_shards if s.device == d)
        assert nb == img_sh.nbytes // 8
    # output is batch-sharded over every device (feeds the train step as-is)
    assert len({s.device for s in gi_s.addressable_shards}) == 8


def test_trainer_sharded_corpus_loss_bit_identical(tmp_path):
    """End-to-end pin for tpu.shard_corpus: two Trainers, same seed, corpus
    sharded vs replicated — identical per-step losses (incl. through the
    chained-dispatch path), and the HBM ledger charges ~1/D per chip."""
    import jax

    from light_unet_tpu.core.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    data_dir = tmp_path / "processed"
    rng = np.random.default_rng(23)
    for cid in ("0001", "0002", "0003"):
        _write_norm_case(data_dir, cid, (20, 20, 24), rng)
    write_split_files(tmp_path / "splits", ["0001", "0002", "0003"], ["0001"])

    def make_cfg(shard):
        cfg = Config()
        cfg.data.patch_size = list(PATCH)
        cfg.data.body_mask.enabled = False
        cfg.training.batch_size = 8  # spans all 8 virtual devices
        cfg.training.epochs = 1
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.shard_corpus = shard
        cfg.tpu.compilation_cache_dir = ""
        cfg.data_dir = str(data_dir)
        cfg.splits_dir = str(tmp_path / "splits")
        return cfg

    t_rep = Trainer(make_cfg(False), workdir=str(tmp_path / "w1"))
    t_shd = Trainer(make_cfg(True), workdir=str(tmp_path / "w2"))
    assert t_rep.corpus is not None and not t_rep.corpus.sharded
    assert t_shd.corpus is not None and t_shd.corpus.sharded

    # ledger: replicated charges 3 rows/chip (a full copy); sharded pads
    # 3 cases to 8 rows and charges 8/8 = 1 row/chip — exactly 1/3
    rep_charge = t_rep.ledger.entries["train_corpus"]
    shd_charge = t_shd.ledger.entries["train_corpus"]
    assert shd_charge * 3 == rep_charge
    assert t_shd.corpus.images.shape[0] == 8

    losses_rep = t_rep._flatten_losses(
        [t_rep._step_on_batch(u) for u in t_rep._dispatch_units(t_rep.train_loader)]
    )
    losses_shd = t_shd._flatten_losses(
        [t_shd._step_on_batch(u) for u in t_shd._dispatch_units(t_shd.train_loader)]
    )
    assert len(losses_rep) == len(losses_shd) > 0
    np.testing.assert_array_equal(np.asarray(losses_rep), np.asarray(losses_shd))
