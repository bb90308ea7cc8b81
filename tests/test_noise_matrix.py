"""Full noise matrix as one sharded stream: 14 conditions, determinism,
and agreement with the per-variant path."""

import numpy as np

from wst_tpu.features.extractor import FeatureExtractor
from wst_tpu.ops.noise import NOISE_LEVELS
from wst_tpu.parallel.mesh import make_mesh
from wst_tpu.parallel.noise_matrix import (NoiseMatrixPipeline,
                                           augment_full_matrix,
                                           noise_matrix_conditions)


def test_conditions_list():
    conds = noise_matrix_conditions()
    assert conds[0] == ("clean", None, 0.0)
    assert len(conds) == 1 + sum(len(v) for v in NOISE_LEVELS.values()) == 14
    names = [c[0] for c in conds]
    assert "gaussian30" in names and "salt_and_pepper25" in names


def test_augment_matrix(rng):
    imgs = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    out = augment_full_matrix(imgs, seed=1)
    assert set(out) == {c[0] for c in noise_matrix_conditions()}
    np.testing.assert_array_equal(np.asarray(out["clean"]), imgs)
    # distinct variants differ from clean and from each other
    g30 = np.asarray(out["gaussian30"])
    g50 = np.asarray(out["gaussian50"])
    assert (g30 != imgs).any() and (g30 != g50).any()
    # deterministic
    out2 = augment_full_matrix(imgs, seed=1)
    np.testing.assert_array_equal(g30, np.asarray(out2["gaussian30"]))


def test_pipeline_matches_per_variant(rng):
    imgs = rng.integers(0, 256, (6, 16, 16, 3), dtype=np.uint8)
    pipe = NoiseMatrixPipeline("advanced_stats", 16, 16,
                               mesh=make_mesh(4), mode="fft")
    feats = pipe.run(imgs, seed=3, batch_size=32)
    assert set(feats) == {c[0] for c in noise_matrix_conditions()}
    assert feats["clean"].shape == (6, 54)

    # clean features equal the direct extractor output
    fx = FeatureExtractor("advanced_stats", 16, 16)
    want = fx.extract_numpy(
        imgs.astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
    np.testing.assert_allclose(feats["clean"], want, atol=1e-5)

    # noisy variant features equal features of that variant's images.
    # tolerance: the in-jit /255 conversion can differ by 1 ULP from the
    # numpy conversion, which may flip one pixel across the edge-density
    # P90 threshold -> 1/(16*16) = 3.9e-3 in that single feature.
    var = augment_full_matrix(imgs, seed=3)["speckle35"]
    want_noisy = fx.extract_numpy(
        np.asarray(var).astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
    np.testing.assert_allclose(feats["speckle35"], want_noisy, atol=1e-2)
    # all but the threshold-tie features agree tightly
    close = np.isclose(feats["speckle35"], want_noisy, atol=1e-5)
    assert close.mean() > 0.95


def test_pipeline_chunking_invariance(rng):
    imgs = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    pipe = NoiseMatrixPipeline("advanced_stats", 16, 16,
                               mesh=make_mesh(2), mode="fft")
    a = pipe.run(imgs, seed=0, batch_size=16)   # ragged: 70 -> pad to 80
    b = pipe.run(imgs, seed=0, batch_size=70)   # single chunk
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-5)
