"""On-device augmentation tests."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from light_unet_tpu.config import AugmentationConfig
from light_unet_tpu.ops.augment import make_augment_fn

PATCH = (16, 16, 16)


def _batch(rng, b=2):
    img = rng.random((b, *PATCH, 1)).astype(np.float32)
    lbl = (rng.random((b, *PATCH, 1)) > 0.8).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(lbl)


def _all_disabled():
    cfg = AugmentationConfig()
    for field in (cfg.random_flip, cfg.random_rotation, cfg.random_scale,
                  cfg.intensity_shift, cfg.gaussian_noise):
        field["enabled"] = False
    return cfg


def test_disabled_is_identity(rng):
    fn = make_augment_fn(_all_disabled(), PATCH)
    img, lbl = _batch(rng)
    out_img, out_lbl = fn(jax.random.PRNGKey(0), img, lbl)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl))


def test_flip_only_is_exact_flip(rng):
    cfg = _all_disabled()
    cfg.random_flip = {"enabled": True, "prob": 1.0, "axes": [0]}
    fn = make_augment_fn(cfg, PATCH)
    img, lbl = _batch(rng, b=1)
    out_img, out_lbl = fn(jax.random.PRNGKey(1), img, lbl)
    np.testing.assert_array_equal(np.asarray(out_img)[0, ..., 0],
                                  np.asarray(img)[0, ::-1, :, :, 0])
    np.testing.assert_array_equal(np.asarray(out_lbl)[0, ..., 0],
                                  np.asarray(lbl)[0, ::-1, :, :, 0])


def test_rotation_preserves_label_binarity_and_mass(rng):
    cfg = _all_disabled()
    cfg.random_rotation = {"enabled": True, "prob": 1.0, "angle_range": [15, 15],
                           "axes": [[0, 1], [0, 2], [1, 2]]}
    fn = make_augment_fn(cfg, PATCH)
    img = np.zeros((1, *PATCH, 1), np.float32)
    lbl = np.zeros((1, *PATCH, 1), np.float32)
    # off-center structure: a 15-degree rotation displaces it by >1 voxel
    lbl[0, 1:5, 1:5, 1:5, 0] = 1.0
    img[0, 1:5, 1:5, 1:5, 0] = 1.0
    out_img, out_lbl = fn(jax.random.PRNGKey(2), jnp.asarray(img), jnp.asarray(lbl))
    out_lbl = np.asarray(out_lbl)
    assert set(np.unique(out_lbl)).issubset({0.0, 1.0})  # order-0 keeps binarity
    assert 0.5 * lbl.sum() < out_lbl.sum() < 2.0 * lbl.sum()  # mass roughly kept
    assert not np.array_equal(out_lbl, lbl)  # something rotated
    assert not np.array_equal(np.asarray(out_img), img)  # trilinear image changed


def test_zero_prob_rotation_is_exact_identity(rng):
    """Inactive affine path must degrade to an exact identity resample."""
    cfg = _all_disabled()
    cfg.random_rotation = {"enabled": True, "prob": 0.0, "angle_range": [-15, 15],
                           "axes": [[0, 1]]}
    cfg.random_scale = {"enabled": True, "prob": 0.0, "scale_range": [0.9, 1.1]}
    fn = make_augment_fn(cfg, PATCH)
    img, lbl = _batch(rng)
    out_img, out_lbl = fn(jax.random.PRNGKey(3), img, lbl)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl))


def test_intensity_shift_clips(rng):
    cfg = _all_disabled()
    cfg.intensity_shift = {"enabled": True, "prob": 1.0, "shift_range": [0.5, 0.5]}
    fn = make_augment_fn(cfg, PATCH)
    img, lbl = _batch(rng)
    out_img, _ = fn(jax.random.PRNGKey(4), img, lbl)
    out = np.asarray(out_img)
    assert out.max() <= 1.0 and out.min() >= 0.5 - 1e-6


def test_noise_bounded_and_label_untouched(rng):
    cfg = _all_disabled()
    cfg.gaussian_noise = {"enabled": True, "prob": 1.0, "sigma": 0.01}
    fn = make_augment_fn(cfg, PATCH)
    img, lbl = _batch(rng)
    out_img, out_lbl = fn(jax.random.PRNGKey(5), img, lbl)
    assert not np.array_equal(np.asarray(out_img), np.asarray(img))
    assert np.abs(np.asarray(out_img) - np.asarray(img)).max() < 0.1
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl))


def test_separable_resample_matches_fused(rng):
    """``separable=True`` must reproduce the map_coordinates path: identical
    taps and weights, so images match to f32 reassociation and order-0
    labels match exactly."""
    cfg = _all_disabled()
    cfg.random_rotation = {"enabled": True, "prob": 1.0, "angle_range": [-15, 15],
                           "axes": [[0, 1], [0, 2], [1, 2]]}
    cfg.random_scale = {"enabled": True, "prob": 1.0, "scale_range": [0.9, 1.1]}
    fused = make_augment_fn(cfg, PATCH)
    sep = make_augment_fn(cfg, PATCH, separable=True)
    img, lbl = _batch(rng, b=4)
    for seed in (0, 1, 2):
        a_img, a_lbl = fused(jax.random.PRNGKey(seed), img, lbl)
        b_img, b_lbl = sep(jax.random.PRNGKey(seed), img, lbl)
        np.testing.assert_allclose(
            np.asarray(a_img), np.asarray(b_img), atol=2e-5, rtol=0
        )
        np.testing.assert_array_equal(np.asarray(a_lbl), np.asarray(b_lbl))


def test_separable_identity_and_binarity(rng):
    """Inactive transforms stay exact identities on the separable path, and
    order-0 keeps label binarity under a real rotation."""
    cfg = _all_disabled()
    cfg.random_rotation = {"enabled": True, "prob": 0.0, "angle_range": [-15, 15],
                           "axes": [[0, 1]]}
    cfg.random_scale = {"enabled": True, "prob": 0.0, "scale_range": [0.9, 1.1]}
    fn = make_augment_fn(cfg, PATCH, separable=True)
    img, lbl = _batch(rng)
    out_img, out_lbl = fn(jax.random.PRNGKey(3), img, lbl)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_lbl), np.asarray(lbl))

    cfg.random_rotation["prob"] = 1.0
    fn = make_augment_fn(cfg, PATCH, separable=True)
    lbl_box = np.zeros((1, *PATCH, 1), np.float32)
    lbl_box[0, 1:5, 1:5, 1:5, 0] = 1.0
    _, out = fn(jax.random.PRNGKey(4), jnp.zeros((1, *PATCH, 1), jnp.float32),
                jnp.asarray(lbl_box))
    assert set(np.unique(np.asarray(out))).issubset({0.0, 1.0})


def test_deterministic_given_key(rng):
    fn = make_augment_fn(AugmentationConfig(), PATCH)
    img, lbl = _batch(rng)
    a = fn(jax.random.PRNGKey(7), img, lbl)
    b = fn(jax.random.PRNGKey(7), img, lbl)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = fn(jax.random.PRNGKey(8), img, lbl)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_jittable(rng):
    fn = jax.jit(make_augment_fn(AugmentationConfig(), PATCH))
    img, lbl = _batch(rng)
    out_img, out_lbl = fn(jax.random.PRNGKey(9), img, lbl)
    assert out_img.shape == img.shape and out_lbl.shape == lbl.shape
