"""Block-sparse D2H fetch (ops/sparse_fetch.py) must be bit-identical to the
dense fetch — including uint16-quantized maps, non-block-multiple shapes, and
the exact-overflow fallback path."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.ops.fused import FusedVolumePipeline
from light_unet_tpu.ops.intensity import clip_and_normalize
from light_unet_tpu.ops.sliding_window import SlidingWindowInferencer
from light_unet_tpu.ops.sparse_fetch import (
    SparsePack,
    block_cap,
    block_grid,
    fetch_maybe_sparse,
    pack_blocks,
    unpack_blocks,
)


@pytest.mark.parametrize("shape", [(24, 24, 24), (17, 23, 30), (8, 8, 8), (5, 6, 7)])
@pytest.mark.parametrize("dtype", [np.float32, np.uint16])
def test_pack_unpack_roundtrip_bit_identical(rng, shape, dtype):
    vol = np.zeros(shape, dtype)
    # a sparse blob: one corner region + a few scattered voxels
    vol[: shape[0] // 2, : shape[1] // 3, : shape[2] // 3] = (
        rng.random((shape[0] // 2, shape[1] // 3, shape[2] // 3)) * 100
    ).astype(dtype)
    for _ in range(5):
        vol[tuple(rng.integers(0, s) for s in shape)] = dtype(7)

    cap = block_cap(shape, 8, 1.0)  # full capacity -> never overflows
    count, idx, tiles = jax.jit(pack_blocks, static_argnums=(1, 2))(vol, 8, cap)
    assert int(count) <= cap
    out = unpack_blocks(np.asarray(idx), np.asarray(tiles), shape, 8)
    np.testing.assert_array_equal(out, vol)
    assert out.dtype == vol.dtype


def test_all_zero_volume_fetches_as_zeros():
    vol = np.zeros((16, 16, 24), np.float32)
    cap = block_cap(vol.shape, 8, 1.0)
    count, idx, tiles = pack_blocks(jnp.asarray(vol), 8, cap)
    assert int(count) == 0
    pack = SparsePack(jnp.asarray(vol), count, idx, tiles, cap=cap, block=8)
    out = fetch_maybe_sparse(pack)
    np.testing.assert_array_equal(out, vol)


def test_slice_bucket_ladder():
    from light_unet_tpu.ops.sparse_fetch import slice_bucket

    seen = {slice_bucket(n, 11664) for n in range(12000)}
    assert len(seen) <= 16  # bounded slice-program variants
    assert all(slice_bucket(n, 11664) >= min(n, 11664) for n in range(12000))
    assert slice_bucket(0, 512) == 64 and slice_bucket(512, 512) == 512


def test_pack_counts_only_occupied_blocks(rng):
    vol = np.zeros((16, 16, 16), np.float32)
    vol[0, 0, 0] = 1.0  # block (0,0,0)
    vol[9, 9, 9] = 2.0  # block (1,1,1)
    cap = block_cap(vol.shape, 8, 1.0)
    count, idx, tiles = pack_blocks(jnp.asarray(vol), 8, cap)
    assert int(count) == 2
    nb = int(np.prod(block_grid(vol.shape, 8)))
    valid = np.asarray(idx) < nb
    assert valid.sum() == 2
    np.testing.assert_array_equal(
        unpack_blocks(np.asarray(idx), np.asarray(tiles), vol.shape, 8), vol
    )


def test_overflow_detected_exactly_and_falls_back_dense(rng):
    vol = rng.random((16, 16, 16)).astype(np.float32) + 0.1  # every block occupied
    nb = int(np.prod(block_grid(vol.shape, 8)))
    cap = nb - 1  # one short of what's needed
    count, idx, tiles = pack_blocks(jnp.asarray(vol), 8, cap)
    assert int(count) == nb > cap  # exact overflow signal
    pack = SparsePack(jnp.asarray(vol), count, idx, tiles, cap=cap, block=8)
    np.testing.assert_array_equal(fetch_maybe_sparse(pack), vol)


def test_block_cap_bounds():
    assert block_cap((64, 64, 64), 8, 1.0) == 512
    assert block_cap((64, 64, 64), 8, 0.5) % 64 == 0
    assert block_cap((8, 8, 8), 8, 0.01) == 1  # capped at the grid size
    assert block_cap((17, 9, 8), 8, 1.0) == int(np.prod(block_grid((17, 9, 8), 8)))


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(4, (3, 3, 3), padding="SAME")(x)
        h = nn.leaky_relu(h - jnp.mean(h, axis=(1, 2, 3), keepdims=True))
        return nn.sigmoid(nn.Conv(1, (1, 1, 1))(h))


@pytest.fixture
def phantom(rng):
    shape = (24, 24, 30)
    zz, yy, xx = np.ogrid[:24, :24, :30]
    body = ((zz - 12) ** 2 / 90 + (yy - 12) ** 2 / 90 + (xx - 15) ** 2 / 140) <= 1.0
    img = body * (2.0 + 0.4 * rng.random(shape)) + 0.01 * rng.random(shape)
    return img.astype(np.float32)


def _tiny(patch=16):
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, patch, 1)))
    return params, (lambda p, x: model.apply(p, x))


def test_sliding_window_sparse_fetch_bit_identical(phantom):
    params, apply_fn = _tiny()
    norm, _ = clip_and_normalize(phantom, 0.5, 99.5, (0, 1), z_bucket=16)
    mask = norm > 0.3  # body-ish mask -> genuinely sparse output

    for fetch_dtype in ("float32", "uint16"):
        dense_sw = SlidingWindowInferencer(
            apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16, fetch_dtype=fetch_dtype
        )
        sparse_sw = SlidingWindowInferencer(
            apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16, fetch_dtype=fetch_dtype,
            sparse_fetch=True, sparse_fetch_frac=0.9,
        )
        ref = dense_sw(params, norm, post_mask=mask)
        disp = sparse_sw.dispatch(params, norm, post_mask=mask)
        assert isinstance(disp[0], SparsePack)
        got = sparse_sw.fetch(disp)
        np.testing.assert_array_equal(got, ref)


def test_sliding_window_sparse_overflow_falls_back(rng):
    """frac so small the pack must overflow -> dense fallback, still exact.

    Needs a grid larger than the 64-tile cap rounding: 40^3 -> 125 blocks,
    cap(frac=0.05) = 64 < 125 occupied (sigmoid output is nonzero everywhere).
    """
    params, apply_fn = _tiny()
    vol = (rng.random((40, 40, 40)) * 3).astype(np.float32)
    norm, _ = clip_and_normalize(vol, 0.5, 99.5, (0, 1), z_bucket=16)
    ref = SlidingWindowInferencer(apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16)(
        params, norm
    )
    # unmasked map: sigmoid output is nonzero everywhere -> all blocks occupied
    sw = SlidingWindowInferencer(
        apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16,
        sparse_fetch=True, sparse_fetch_frac=0.05,
    )
    disp = sw.dispatch(params, norm)
    pack = disp[0]
    assert isinstance(pack, SparsePack) and int(pack.count) > pack.cap
    np.testing.assert_array_equal(sw.fetch(disp), ref)


def test_fused_pipeline_sparse_fetch_bit_identical(phantom):
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.closing_voxels = 2
    cfg.tpu.z_bucket = 16
    params, apply_fn = _tiny()

    ref = FusedVolumePipeline(apply_fn, cfg, patch_batch=8)(params, phantom)

    cfg.tpu.sparse_fetch = True
    cfg.tpu.sparse_fetch_frac = 0.9
    sparse_pipe = FusedVolumePipeline(apply_fn, cfg, patch_batch=8)
    disp = sparse_pipe.dispatch(params, phantom)
    assert isinstance(disp[0], SparsePack)
    np.testing.assert_array_equal(sparse_pipe.fetch(disp), ref)


def test_config_validates_sparse_fields():
    from light_unet_tpu.config import ConfigError

    cfg = Config()
    cfg.tpu.sparse_fetch_frac = 0.0
    with pytest.raises(ConfigError):
        cfg.validate()
    cfg.tpu.sparse_fetch_frac = 0.5
    cfg.tpu.steps_per_dispatch = 0
    with pytest.raises(ConfigError):
        cfg.validate()
