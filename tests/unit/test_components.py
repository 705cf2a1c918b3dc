"""Device-side candidate extraction vs the host scipy path."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from light_unet_tpu.core.inferencer import extract_bboxes
from light_unet_tpu.ops.components import (
    bboxes_from_table,
    center_of_mass_device,
    component_table_device,
)


def _random_prob_map(rng, shape=(40, 36, 30), n_blobs=5):
    prob = rng.random(shape).astype(np.float32) * 0.15  # sub-threshold noise
    for _ in range(n_blobs):
        c = [rng.integers(4, s - 4) for s in shape]
        r = int(rng.integers(1, 4))
        zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
        blob = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2 <= r**2
        prob[blob] = 0.5 + 0.5 * rng.random()
    return prob


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_bboxes_match_host_extract_bboxes(seed):
    rng = np.random.default_rng(seed)
    prob = _random_prob_map(rng)
    threshold, min_cc, spacing, exp = 0.3, 0.1, (4.0, 4.0, 4.0), 3

    expected = extract_bboxes(prob, threshold, min_cc, spacing, exp)

    table, n = component_table_device(jnp.asarray(prob), jnp.float32(threshold))
    got = bboxes_from_table(
        np.asarray(table), int(n), prob.shape,
        min_volume_cc=min_cc, spacing=spacing, expansion_voxels=exp,
    )
    assert got is not None
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g["mask_id"] == e["mask_id"]
        assert g["bbox_voxel"] == e["bbox_voxel"]
        np.testing.assert_allclose(g["bbox_mm"], e["bbox_mm"])
        assert g["volume_cc"] == pytest.approx(e["volume_cc"])
        assert g["confidence"] == pytest.approx(e["confidence"], abs=1e-6)


def test_exact_component_count_and_overflow():
    rng = np.random.default_rng(3)
    prob = np.zeros((24, 24, 24), np.float32)
    # 10 isolated single-voxel components
    pts = set()
    while len(pts) < 10:
        p = tuple(rng.integers(1, 11, 3) * 2)  # even coords -> never adjacent
        pts.add(p)
    for p in pts:
        prob[p] = 0.9
    table, n = component_table_device(jnp.asarray(prob), jnp.float32(0.3), max_components=16)
    assert int(n) == 10
    # cap smaller than count -> caller must get None (no silent truncation)
    table4, n4 = component_table_device(jnp.asarray(prob), jnp.float32(0.3), max_components=4)
    assert int(n4) == 10
    out = bboxes_from_table(np.asarray(table4), int(n4), prob.shape, 0.0, (4, 4, 4), 0,
                            max_components=4)
    assert out is None


def test_empty_and_full_masks():
    empty = np.zeros((10, 10, 10), np.float32)
    table, n = component_table_device(jnp.asarray(empty), jnp.float32(0.5))
    assert int(n) == 0
    assert bboxes_from_table(np.asarray(table), 0, empty.shape, 0.0, (4, 4, 4), 0) == []

    full = np.ones((8, 9, 10), np.float32)
    table, n = component_table_device(jnp.asarray(full), jnp.float32(0.5))
    assert int(n) == 1
    out = bboxes_from_table(np.asarray(table), 1, full.shape, 0.0, (4, 4, 4), 0)
    assert len(out) == 1
    assert out[0]["bbox_voxel"] == [0, 7, 0, 8, 0, 9]
    assert out[0]["volume_cc"] == pytest.approx(8 * 9 * 10 * 0.064)


def test_center_of_mass_matches_scipy(rng):
    mask = (rng.random((20, 22, 18)) > 0.85).astype(np.int32)
    labeled, n = ndimage.label(mask)
    if n == 0:
        pytest.skip("no components drawn")
    ours = np.asarray(center_of_mass_device(jnp.asarray(mask), jnp.asarray(labeled), int(n)))
    theirs = np.array(
        ndimage.center_of_mass(mask.astype(np.float32), labeled, index=np.arange(1, n + 1))
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
