"""Fused per-volume programs must equal the unfused op chain exactly."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from light_unet_tpu.config import Config
from light_unet_tpu.ops.body_mask import generate_body_mask
from light_unet_tpu.ops.fused import FusedVolumePipeline, normalize_and_body_mask
from light_unet_tpu.ops.intensity import clip_and_normalize
from light_unet_tpu.ops.sliding_window import SlidingWindowInferencer


@pytest.fixture
def phantom(rng):
    shape = (24, 24, 30)
    zz, yy, xx = np.ogrid[:24, :24, :30]
    body = ((zz - 12) ** 2 / 90 + (yy - 12) ** 2 / 90 + (xx - 15) ** 2 / 140) <= 1.0
    img = body * (2.0 + 0.4 * rng.random(shape)) + 0.01 * rng.random(shape)
    return img.astype(np.float32)


def test_normalize_and_body_mask_matches_unfused(phantom):
    cfg = Config()
    cfg.data.body_mask.closing_voxels = 2
    norm_f, mask_f, imeta_f, mmeta_f = normalize_and_body_mask(
        phantom, cfg.data.intensity, cfg.data.body_mask, z_bucket=16
    )
    norm_u, imeta_u = clip_and_normalize(phantom, 0.5, 99.5, (0, 1), z_bucket=16)
    mask_u, mmeta_u = generate_body_mask(norm_u, cfg.data.body_mask, z_bucket=16)

    np.testing.assert_allclose(norm_f, norm_u, atol=1e-6)
    np.testing.assert_array_equal(mask_f, mask_u)
    assert imeta_f["clip_values"]["min"] == pytest.approx(imeta_u["clip_values"]["min"])
    assert mmeta_f["voxel_counts"] == mmeta_u["voxel_counts"]
    assert mmeta_f["bbox"] == mmeta_u["bbox"]


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(4, (3, 3, 3), padding="SAME")(x)
        h = nn.leaky_relu(h - jnp.mean(h, axis=(1, 2, 3), keepdims=True))
        return nn.sigmoid(nn.Conv(1, (1, 1, 1))(h))


def test_fused_pipeline_matches_stage_chain(phantom):
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.closing_voxels = 2
    cfg.tpu.z_bucket = 16

    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    apply_fn = lambda p, x: model.apply(p, x)

    pipe = FusedVolumePipeline(
        apply_fn, cfg, patch_batch=8, transfer_dtype="float32", fetch_dtype="float32"
    )
    fused = pipe(params, phantom)

    norm, _ = clip_and_normalize(phantom, 0.5, 99.5, (0, 1), z_bucket=16)
    mask, _ = generate_body_mask(norm, cfg.data.body_mask, z_bucket=16)
    sw = SlidingWindowInferencer(apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16)
    unfused = sw(params, norm) * mask

    np.testing.assert_allclose(fused, unfused, atol=1e-5)

    # the config default is quantized uint16 transfer (measured faster over
    # the link; numerics pinned by test_fused_pipeline_quantized_transfers)
    assert FusedVolumePipeline(apply_fn, cfg, patch_batch=8).transfer_dtype == jnp.uint16
    # opt-in bf16 upload (serving mode) trades <=2% prob-map deviation for
    # half the host->device traffic
    pipe_bf16 = FusedVolumePipeline(apply_fn, cfg, patch_batch=8, transfer_dtype="bfloat16")
    fused_bf16 = pipe_bf16(params, phantom)
    assert fused_bf16.dtype == np.float32
    np.testing.assert_allclose(fused_bf16, unfused, atol=2e-2)


def test_fused_pipeline_quantized_transfers_match_f32(phantom):
    """uint16 upload (quantized into the clip range) and uint16 prob-map
    fetch must reproduce the f32 paths within the quantization bound:
    intensity error <= (hi-lo)/65535/2 maps through the network's Lipschitz
    constant, so a loose 1e-3 tolerance; fetch error <= 1/(2*65535)."""
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.closing_voxels = 2
    cfg.tpu.z_bucket = 16
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    apply_fn = lambda p, x: model.apply(p, x)

    ref = FusedVolumePipeline(
        apply_fn, cfg, patch_batch=8, transfer_dtype="float32", fetch_dtype="float32"
    )(params, phantom)

    q_in = FusedVolumePipeline(
        apply_fn, cfg, patch_batch=8, transfer_dtype="uint16", fetch_dtype="float32"
    )(params, phantom)
    assert q_in.dtype == np.float32
    np.testing.assert_allclose(q_in, ref, atol=1e-3)

    q_out = FusedVolumePipeline(
        apply_fn, cfg, patch_batch=8, transfer_dtype="float32", fetch_dtype="uint16"
    )(params, phantom)
    assert q_out.dtype == np.float32
    np.testing.assert_allclose(q_out, ref, atol=1.01 / (2 * 65535))

    q_both = FusedVolumePipeline(
        apply_fn, cfg, patch_batch=8, transfer_dtype="uint16", fetch_dtype="uint16"
    )(params, phantom)
    np.testing.assert_allclose(q_both, ref, atol=1e-3)


def test_sliding_window_quantized_transfers_match_f32(phantom):
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    apply_fn = lambda p, x: model.apply(p, x)
    # normalized input, like the preprocessed volumes this engine consumes
    norm, _ = clip_and_normalize(phantom, 0.5, 99.5, (0, 1), z_bucket=16)
    mask = norm > 0.1

    ref_sw = SlidingWindowInferencer(apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16)
    ref = ref_sw(params, norm, post_mask=mask)

    q_sw = SlidingWindowInferencer(
        apply_fn, (16, 16, 16), patch_batch=8, z_bucket=16,
        transfer_dtype="uint16", fetch_dtype="uint16",
    )
    q = q_sw(params, norm, post_mask=mask)
    assert q.dtype == np.float32
    np.testing.assert_allclose(q, ref, atol=1e-3)


def test_fused_pipeline_async_dispatch(phantom):
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.closing_voxels = 2
    cfg.tpu.z_bucket = 16
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    pipe = FusedVolumePipeline(lambda p, x: model.apply(p, x), cfg, patch_batch=8)
    # NB: pure rescaling would be normalized away (percentile clip);
    # flip the volume to get a structurally different input
    d1 = pipe.dispatch(params, phantom)
    d2 = pipe.dispatch(params, phantom[::-1].copy())
    r1, r2 = pipe.fetch(d1), pipe.fetch(d2)
    assert r1.shape == phantom.shape and r2.shape == phantom.shape
    assert not np.array_equal(r1, r2)


def test_post_mask_in_sliding_window(phantom, rng):
    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    sw = SlidingWindowInferencer(lambda p, x: model.apply(p, x), (16, 16, 16), patch_batch=8, z_bucket=16)
    mask = (rng.random(phantom.shape) > 0.5).astype(np.float32)
    with_mask = sw(params, phantom, post_mask=mask)
    without = sw(params, phantom)
    np.testing.assert_allclose(with_mask, without * mask, atol=1e-6)


def test_sparse_host_prefetch_ships_only_the_count(phantom, monkeypatch):
    """ADVICE r3 (medium): in sparse-fetch mode, dispatch-time host prefetch
    must ride ONLY SparsePack.link_arrays() (the 4-byte count) — prefetching
    the capacity-sized idx/tiles arrays would push more bytes over the link
    than the dense map sparse fetch exists to avoid."""
    cfg = Config()
    cfg.data.patch_size = [16, 16, 16]
    cfg.data.body_mask.closing_voxels = 2
    cfg.tpu.z_bucket = 16
    cfg.tpu.sparse_fetch = True

    model = TinyNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    pipe = FusedVolumePipeline(
        lambda p, x: model.apply(p, x), cfg, patch_batch=8,
        transfer_dtype="float32", fetch_dtype="float32",
    )
    assert pipe.sparse_fetch and pipe.host_prefetch

    prefetched = []
    cls = type(jnp.zeros(1))
    orig = getattr(cls, "copy_to_host_async", None)
    assert orig is not None

    def spy(self):
        prefetched.append(self.nbytes)
        return orig(self)

    monkeypatch.setattr(cls, "copy_to_host_async", spy)
    out, shape = pipe.dispatch(params, pipe.prepare(np.asarray(phantom)))
    assert len(prefetched) == 1, prefetched  # count only
    assert prefetched[0] <= 8, prefetched    # scalar, not the tile payload
    # ...and the result still reconstructs exactly
    monkeypatch.setattr(cls, "copy_to_host_async", orig)
    dense_cfg = Config.from_dict(cfg.to_dict())
    dense_cfg.tpu.sparse_fetch = False
    dense_pipe = FusedVolumePipeline(
        lambda p, x: model.apply(p, x), dense_cfg, patch_batch=8,
        transfer_dtype="float32", fetch_dtype="float32",
    )
    np.testing.assert_array_equal(
        pipe.fetch((out, shape)),
        dense_pipe(params, np.asarray(phantom)),
    )
