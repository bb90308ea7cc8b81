"""Device-side noise model semantics: dtype/clip behavior, statistical
agreement with the reference's numpy formulas, and determinism."""

import numpy as np
import pytest

from wst_tpu.ops.noise import (NOISE_LEVELS, NOISE_TYPES, add_noise,
                               add_noise_batch)
import jax


def _img(rng, h=32, w=32):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("noise_type", NOISE_TYPES)
def test_dtype_and_shape(noise_type, rng):
    img = _img(rng)
    out = np.asarray(add_noise(jax.random.PRNGKey(0), img, noise_type, 30))
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_unknown_type(rng):
    with pytest.raises(ValueError):
        add_noise(jax.random.PRNGKey(0), _img(rng), "perlin", 10)


def test_gaussian_statistics(rng):
    img = np.full((64, 64, 3), 128, np.uint8)
    out = np.asarray(add_noise(jax.random.PRNGKey(1), img, "gaussian", 30))
    diff = out.astype(np.float64) - 128.0
    # sigma = 30*255/100 = 76.5 but clipping compresses the tails;
    # clipped-normal std for these params is ~66.
    assert 55 < diff.std() < 80
    assert abs(diff.mean()) < 5


def test_uniform_bounds(rng):
    img = np.full((64, 64, 3), 128, np.uint8)
    out = np.asarray(add_noise(jax.random.PRNGKey(1), img, "uniform", 40))
    diff = out.astype(np.float64) - 128.0
    r = 40 * 255 / 100 / 2  # 51
    assert diff.min() >= -r - 1 and diff.max() <= r + 1
    assert 20 < diff.std() < 35  # uniform(-51,51) std ~ 29.4


def test_salt_pepper_counts(rng):
    img = np.full((64, 64, 3), 128, np.uint8)
    out = np.asarray(add_noise(jax.random.PRNGKey(2), img, "salt_and_pepper",
                               10))
    n_salt = (out == 255).all(axis=-1).sum()
    n_pepper = (out == 0).all(axis=-1).sum()
    # ceil(0.1 * 64*64*3 * 0.5) = 615 whole-pixel draws with replacement
    # over a 63x63 grid (the reference's off-by-one bound) -> ~570 unique,
    # pepper overwrites some salt.
    assert 400 < n_salt < 615
    assert 450 < n_pepper <= 615
    # last row/col never touched (reference randint(0, dim-1) quirk)
    assert (out[63, :, :] == 128).all() and (out[:, 63, :] == 128).all()


def test_speckle_scales_with_brightness(rng):
    img = np.zeros((32, 32, 3), np.uint8)
    out = np.asarray(add_noise(jax.random.PRNGKey(3), img, "speckle", 55))
    assert (out == 0).all()  # multiplicative noise leaves black pixels black


def test_poisson_preserves_brightness(rng):
    img = np.full((64, 64, 3), 100, np.uint8)
    out = np.asarray(add_noise(jax.random.PRNGKey(4), img, "poisson", 40))
    assert abs(out.astype(np.float64).mean() - 100) < 3
    assert out.astype(np.float64).std() > 5  # noise actually applied


def test_batch_determinism_and_shard_independence(rng):
    imgs = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    ids = np.arange(6, dtype=np.int32)
    a = np.asarray(add_noise_batch(42, ids, imgs, "gaussian", 30))
    b = np.asarray(add_noise_batch(42, ids, imgs, "gaussian", 30))
    np.testing.assert_array_equal(a, b)
    # Same image id -> same noise regardless of position in the batch.
    half = np.asarray(add_noise_batch(42, ids[3:], imgs[3:], "gaussian", 30))
    np.testing.assert_array_equal(a[3:], half)
    # Different seed -> different noise.
    c = np.asarray(add_noise_batch(43, ids, imgs, "gaussian", 30))
    assert (a != c).any()


def test_levels_registry():
    assert set(NOISE_LEVELS) == set(NOISE_TYPES)
    assert NOISE_LEVELS["gaussian"] == (30, 50)
