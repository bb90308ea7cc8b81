"""Advanced-stats kernel vs scipy/numpy oracle (the reference's formulas)."""

import numpy as np
from scipy import stats as sstats
from scipy.ndimage import laplace, sobel

from wst_tpu.ops.stats import STAT_NAMES, advanced_stats


def reference_stats(rgb_image: np.ndarray) -> np.ndarray:
    """Direct transliteration of the reference formulas for the oracle."""
    feats = np.zeros(3 * 18)
    for i in range(3):
        ch = rgb_image[i]
        v = ch.ravel()
        b = i * 18
        feats[b + 0] = np.mean(v)
        feats[b + 1] = np.std(v)
        feats[b + 2] = np.var(v)
        feats[b + 3] = np.min(v)
        feats[b + 4] = np.max(v)
        feats[b + 5] = np.ptp(v)
        feats[b + 6] = sstats.skew(v)
        feats[b + 7] = sstats.kurtosis(v)
        feats[b + 8] = feats[b + 1] / max(feats[b + 0], 1e-8)
        for j, q in enumerate([10, 25, 50, 75, 90]):
            feats[b + 9 + j] = np.percentile(v, q)
        feats[b + 14] = feats[b + 12] - feats[b + 10]
        feats[b + 15] = np.mean(np.abs(v - feats[b + 0]))
        gx = sobel(ch, axis=0)
        gy = sobel(ch, axis=1)
        feats[b + 16] = np.mean(np.sqrt(gx ** 2 + gy ** 2))
        edges = np.abs(laplace(ch))
        thr = np.percentile(edges.ravel(), 90)
        feats[b + 17] = np.mean(edges.ravel() > thr)
    return feats


def test_names():
    assert len(STAT_NAMES) == 18
    assert STAT_NAMES[0] == "mean" and STAT_NAMES[-1] == "edge_density"


def test_matches_scipy(rng):
    imgs = rng.random((3, 3, 32, 32)).astype(np.float32)
    got = np.asarray(advanced_stats(imgs))
    assert got.shape == (3, 54)
    for b in range(3):
        want = reference_stats(imgs[b])
        np.testing.assert_allclose(got[b], want, rtol=2e-4, atol=2e-5)


def test_batch_shapes(rng):
    imgs = rng.random((5, 3, 16, 16)).astype(np.float32)
    out = np.asarray(advanced_stats(imgs))
    single = np.asarray(advanced_stats(imgs[2:3]))
    np.testing.assert_allclose(out[2], single[0], rtol=1e-6)
