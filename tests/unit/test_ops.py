"""Device-op tests: intensity, morphology, CCL, body mask, gaussian map."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from light_unet_tpu.ops import ccl, morphology
from light_unet_tpu.ops.body_mask import generate_body_mask
from light_unet_tpu.ops.gaussian import gaussian_importance_map
from light_unet_tpu.ops.intensity import clip_and_normalize


# --------------------------------------------------------------------------
# intensity


def test_clip_normalize_matches_numpy(rng):
    img = (rng.standard_normal((20, 22, 31)) * 50 + 10).astype(np.float32)
    ours, meta = clip_and_normalize(img, 0.5, 99.5, (0, 1))
    lo = np.percentile(img, 0.5)
    hi = np.percentile(img, 99.5)
    expected = (np.clip(img, lo, hi) - lo) / (hi - lo)
    np.testing.assert_allclose(ours, expected, atol=1e-5)
    assert meta["clip_values"]["min"] == pytest.approx(lo, rel=1e-4)
    assert meta["clip_values"]["max"] == pytest.approx(hi, rel=1e-4)


def test_clip_normalize_bucketed_excludes_padding(rng):
    """Padding to a Z bucket must not change the percentiles."""
    img = (rng.random((16, 16, 23)) * 9 + 1).astype(np.float32)
    plain, _ = clip_and_normalize(img, 0.5, 99.5, (0, 1), z_bucket=1)
    bucketed, _ = clip_and_normalize(img, 0.5, 99.5, (0, 1), z_bucket=16)
    np.testing.assert_allclose(plain, bucketed, atol=1e-6)


def test_clip_normalize_constant_volume():
    img = np.full((8, 8, 8), 3.0, np.float32)
    out, _ = clip_and_normalize(img)
    np.testing.assert_allclose(out, 0.0)


def test_clip_normalize_custom_range(rng):
    img = rng.random((10, 10, 10)).astype(np.float32)
    out, meta = clip_and_normalize(img, 0.0, 100.0, (-1, 1))
    assert out.min() == pytest.approx(-1, abs=1e-5)
    assert out.max() == pytest.approx(1, abs=1e-5)


# --------------------------------------------------------------------------
# morphology


@pytest.mark.parametrize("iterations", [1, 3])
def test_dilation_matches_scipy(rng, iterations):
    mask = (rng.random((12, 13, 14)) > 0.9).astype(np.float32)
    ours = np.asarray(morphology.binary_dilation(jnp.asarray(mask), iterations))
    struct = ndimage.generate_binary_structure(3, 1)
    theirs = ndimage.binary_dilation(mask > 0, structure=struct, iterations=iterations)
    np.testing.assert_array_equal(ours > 0.5, theirs)


@pytest.mark.parametrize("iterations", [1, 2])
def test_erosion_matches_scipy(rng, iterations):
    mask = (rng.random((12, 13, 14)) > 0.4).astype(np.float32)
    ours = np.asarray(morphology.binary_erosion(jnp.asarray(mask), iterations))
    struct = ndimage.generate_binary_structure(3, 1)
    theirs = ndimage.binary_erosion(
        mask > 0, structure=struct, iterations=iterations, border_value=0
    )
    np.testing.assert_array_equal(ours > 0.5, theirs)


def test_closing_matches_scipy_iterated_structure(rng):
    """Closing by the radius-k L1 ball == scipy binary_closing with
    iterate_structure(cross, k) (preprocess_data.py:124-126)."""
    mask = np.zeros((20, 20, 20), np.float32)
    mask[5:15, 5:15, 5:15] = 1
    mask[8:12, 8:12, 8:12] = 0  # hole to be closed
    for k in (2, 3):
        ours = np.asarray(morphology.binary_closing(jnp.asarray(mask), k))
        struct = ndimage.iterate_structure(ndimage.generate_binary_structure(3, 1), k)
        theirs = ndimage.binary_closing(mask > 0, structure=struct)
        np.testing.assert_array_equal(ours > 0.5, theirs, err_msg=f"radius {k}")


def test_dilation_valid_mask_acts_like_array_edge(rng):
    mask = (rng.random((8, 8, 6)) > 0.7).astype(np.float32)
    # pad to z=10 with a validity mask; result cropped back must equal unpadded
    padded = np.zeros((8, 8, 10), np.float32)
    padded[:, :, :6] = mask
    valid = np.zeros((8, 8, 10), np.float32)
    valid[:, :, :6] = 1
    ours = np.asarray(morphology.binary_dilation(jnp.asarray(padded), 2, jnp.asarray(valid)))
    plain = np.asarray(morphology.binary_dilation(jnp.asarray(mask), 2))
    np.testing.assert_array_equal(ours[:, :, :6], plain)
    assert ours[:, :, 6:].sum() == 0


# --------------------------------------------------------------------------
# connected components


def _random_blobs(rng, shape=(24, 24, 24), p=0.12):
    return (rng.random(shape) < p).astype(np.float32)


def test_ccl_jax_partition_matches_scipy(rng):
    for _ in range(3):
        mask = _random_blobs(rng)
        ours, n_ours = ccl.label_components(mask, backend="jax")
        theirs, n_theirs = ndimage.label(mask > 0)
        assert n_ours == n_theirs
        # identical partitions: labels must be a bijection
        joint = set(zip(ours.ravel().tolist(), theirs.ravel().tolist()))
        assert len(joint) == n_ours + 1  # each component + background maps 1:1
        np.testing.assert_array_equal(ours, theirs)  # scan-order renumbering


def test_ccl_host_backend(rng):
    mask = _random_blobs(rng)
    ours, n = ccl.label_components(mask, backend="host")
    theirs, n2 = ndimage.label(mask > 0)
    assert n == n2
    np.testing.assert_array_equal(ours, theirs)


def test_keep_largest_component():
    mask = np.zeros((20, 20, 20), np.float32)
    mask[2:10, 2:10, 2:10] = 1  # 512 voxels
    mask[15:17, 15:17, 15:17] = 1  # 8 voxels
    out = np.asarray(ccl.keep_largest_component(jnp.asarray(mask)))
    assert out[5, 5, 5] == 1 and out[16, 16, 16] == 0
    assert out.sum() == 512


def test_keep_largest_empty_mask():
    out = np.asarray(ccl.keep_largest_component(jnp.zeros((8, 8, 8))))
    assert out.sum() == 0


def test_ccl_snake(rng):
    """Tortuous component exercises multi-round convergence."""
    mask = np.zeros((4, 16, 16), np.float32)
    # serpentine path in one slice
    for row in range(16):
        mask[1, row, :] = 1 if row % 2 == 0 else 0
        if row % 2 == 0 and row + 1 < 16:
            mask[1, row + 1, 15 if (row // 2) % 2 == 0 else 0] = 1
    ours, n = ccl.label_components(mask, backend="jax")
    theirs, n2 = ndimage.label(mask > 0)
    assert n == n2
    np.testing.assert_array_equal(ours, theirs)


# --------------------------------------------------------------------------
# body mask end-to-end vs scipy reference chain


def _scipy_body_mask(norm, threshold=0.02, closing=5, keep_largest=True, dilate=3):
    mask = norm > threshold
    if closing > 0:
        struct = ndimage.iterate_structure(ndimage.generate_binary_structure(3, 1), closing)
        mask = ndimage.binary_closing(mask, structure=struct)
    if keep_largest:
        labeled, n = ndimage.label(mask)
        if n > 0:
            sizes = ndimage.sum(mask, labeled, range(1, n + 1))
            mask = labeled == (np.argmax(sizes) + 1)
    if dilate > 0:
        struct = ndimage.generate_binary_structure(3, 1)
        mask = ndimage.binary_dilation(mask, structure=struct, iterations=dilate)
    return mask


def test_body_mask_matches_scipy_chain(rng):
    # synthetic phantom: bright ellipsoid body + small noise speckles
    shape = (28, 28, 36)
    zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
    body = ((zz - 14) ** 2 / 100 + (yy - 14) ** 2 / 100 + (xx - 18) ** 2 / 220) <= 1.0
    norm = body * (0.3 + 0.2 * rng.random(shape)) + 0.001 * rng.random(shape)
    norm = norm.astype(np.float32)
    norm[2, 2, 2] = 0.5  # isolated speckle to be removed by keep-largest

    ours, meta = generate_body_mask(norm, {"threshold": 0.02, "closing_voxels": 2,
                                           "keep_largest_component": True, "dilate_voxels": 3})
    theirs = _scipy_body_mask(norm, 0.02, 2, True, 3)
    np.testing.assert_array_equal(ours, theirs)
    assert meta["voxel_counts"]["final"] == int(theirs.sum())
    assert meta["bbox"]["min"] == np.argwhere(theirs).min(axis=0).tolist()


def test_body_mask_bucketed_equivalence(rng):
    shape = (16, 16, 21)
    norm = (rng.random(shape) * 0.1).astype(np.float32)
    norm[4:12, 4:12, 4:17] = 0.5
    cfg = {"threshold": 0.02, "closing_voxels": 2, "keep_largest_component": True, "dilate_voxels": 2}
    plain, _ = generate_body_mask(norm, cfg, z_bucket=1)
    bucketed, _ = generate_body_mask(norm, cfg, z_bucket=16)
    np.testing.assert_array_equal(plain, bucketed)


# --------------------------------------------------------------------------
# gaussian importance map


def test_gaussian_map_properties():
    m = gaussian_importance_map((48, 48, 48))
    assert m.shape == (48, 48, 48)
    assert m.max() == pytest.approx(1.0)
    assert m[24, 24, 24] == pytest.approx(1.0)
    assert m[0, 0, 0] < 0.01
    # separable: m[z,y,x] = gz[z]*gy[y]*gx[x] normalized
    np.testing.assert_allclose(m[24, 24, :] * m[24, 0, 24], m[24, 0, :] * m[24, 24, 24], atol=1e-6)


def test_gaussian_map_matches_reference_formula():
    m = gaussian_importance_map((8, 8, 8))
    x = np.arange(8)
    g = np.exp(-((x - 4.0) ** 2) / (2 * (8 / 6.0) ** 2))
    expected = np.einsum("i,j,k->ijk", g, g, g)
    expected /= expected.max()
    np.testing.assert_allclose(m, expected, atol=1e-6)
