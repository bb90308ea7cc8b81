"""Pallas fused-cascade kernel vs the jnp scattering path (interpret mode
on CPU; the same kernel compiles with Mosaic on real TPU — validated in
bench runs)."""

import jax
import numpy as np
import pytest


@pytest.fixture()
def interpreted_pallas(monkeypatch):
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", patched)
    # clear the compile cache so the patched pallas_call is used
    from wst_tpu.ops.pallas import fused_scattering
    fused_scattering._compiled.cache_clear()
    yield
    fused_scattering._compiled.cache_clear()


def test_fused_matches_reference(interpreted_pallas, rng):
    from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((3, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(2, 8, H, W, mode="fft").features(x))
    f = fused_scattering_j2(8, H, W)
    got = np.asarray(f.features(x))
    assert got.shape == (3, 162)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_fused_tall_layout(interpreted_pallas, rng):
    """Image-pair ("tall") layout matches the oracle, incl. the odd-batch
    padding path (5 images -> 3 grid programs of B=2)."""
    from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((5, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(2, 8, H, W, mode="fft").features(x))
    got = np.asarray(
        fused_scattering_j2(8, H, W, layout="tall2").features(x))
    assert got.shape == (5, 162)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_fused_bd_layout(interpreted_pallas, rng):
    """Block-diagonal MXU-tile-exact layout (round 5): grouped left/right
    DFT matmuls match the oracle on the periodic grid, incl. the
    odd-batch padding path (5 images -> 2 grid programs of B=4) and the
    orientation-grouped pooling lane slices."""
    from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((5, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(2, 8, H, W, mode="fft",
                                   boundary="periodic").features(x))
    for layout in ("bd2", "bd4"):
        got = np.asarray(fused_scattering_j2(
            8, H, W, boundary="periodic", layout=layout).features(x))
        assert got.shape == (5, 162)
        assert np.allclose(got, want, atol=1e-4), (
            layout, np.abs(got - want).max())


def test_fused_bd_rejects_reflect_grid(interpreted_pallas):
    """The reflect 17*2^k grids are not power-of-2; bd refuses instead of
    mis-slicing."""
    import pytest

    from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2

    with pytest.raises(ValueError, match="power-of-2"):
        fused_scattering_j2(8, 128, 128, boundary="reflect", layout="bd2")


def test_fused_general_bd_layout(interpreted_pallas, rng):
    """General-J block-diagonal layout (round 5): grouped left/right DFT
    matmuls + in-kernel pooled stats match the oracle at J=3."""
    from wst_tpu.ops.pallas.fused_general import FusedScattering
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((3, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(3, 8, H, W, mode="fft",
                                   boundary="periodic").features(x))
    k = FusedScattering(3, 8, H, W, boundary="periodic", layout="bd2")
    got = np.asarray(k.features(x))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
    maps = np.asarray(k(x))
    assert maps.shape == (3, k.n_coeffs, H >> 3, W >> 3)


def test_fused_l4(interpreted_pallas, rng):
    from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((2, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(2, 4, H, W, mode="fft").features(x))
    got = np.asarray(fused_scattering_j2(4, H, W).features(x))
    assert got.shape == (2, 2 * 25)
    assert np.allclose(got, want, atol=1e-4)


def test_fold_matrix_identity():
    from wst_tpu.ops.pallas.fused_scattering import _fold_mat
    rng = np.random.default_rng(0)
    z = rng.normal(size=(16, 16))
    p = _fold_mat(16, 4)
    want = z.reshape(4, 4, 4, 4).mean(axis=(0, 2))
    np.testing.assert_allclose(p @ z @ p.T, want, atol=1e-12)


def test_fused_periodic_matches_reference(interpreted_pallas, rng):
    from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((2, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(2, 8, H, W, mode="fft",
                                   boundary="periodic").features(x))
    got = np.asarray(fused_scattering_j2(8, H, W,
                                         boundary="periodic").features(x))
    assert got.shape == (2, 162)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


@pytest.fixture()
def interpreted_pallas_general(interpreted_pallas):
    """Also clear the general-J kernel's compile cache around the patch."""
    from wst_tpu.ops.pallas import fused_general
    fused_general._compiled.cache_clear()
    yield
    fused_general._compiled.cache_clear()


@pytest.mark.parametrize("boundary", ["reflect", "periodic"])
def test_fused_general_j3(interpreted_pallas_general, rng, boundary):
    """General-J fused cascade (deep scattering) vs the jnp oracle path."""
    from wst_tpu.ops.pallas.fused_general import FusedScattering
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((2, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(3, 8, H, W, mode="fft",
                                   boundary=boundary).features(x))
    got = np.asarray(FusedScattering(3, 8, H, W,
                                     boundary=boundary).features(x))
    assert got.shape == (2, 2 * 217)          # 1 + 3*8 + 64*3 = 217 paths
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_fused_general_j3_tall_odd_batch(interpreted_pallas_general, rng):
    """tall2 layout with an odd batch (padding path) at J=3."""
    from wst_tpu.ops.pallas.fused_general import FusedScattering
    from wst_tpu.ops.scattering import Scattering2D

    H = W = 32
    x = rng.random((3, H, W)).astype(np.float32)
    want = np.asarray(Scattering2D(3, 8, H, W, mode="fft",
                                   boundary="periodic").features(x))
    got = np.asarray(FusedScattering(3, 8, H, W, boundary="periodic",
                                     layout="tall2").features(x))
    assert got.shape == (3, 434)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_fused_general_routes_j2(interpreted_pallas_general, rng):
    """The factory returns the tuned J=2 kernel for J=2."""
    from wst_tpu.ops.pallas.fused_general import fused_scattering
    from wst_tpu.ops.pallas.fused_scattering import FusedScatteringJ2

    f = fused_scattering(2, 8, 32, 32)
    assert isinstance(f, FusedScatteringJ2)


def test_extractor_routes_general_j_pallas(interpreted_pallas_general, rng):
    """FeatureExtractor(mode='pallas') supports deep J via the general
    fused cascade and matches the fft path."""
    from wst_tpu.features.extractor import FeatureExtractor

    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    fx = FeatureExtractor("wst", 32, 32, J=3, L=8, mode="pallas",
                          boundary="periodic")
    got = fx.extract_numpy(x)
    want = FeatureExtractor("wst", 32, 32, J=3, L=8, mode="fft",
                            boundary="periodic").extract_numpy(x)
    assert got.shape == (2, 3 * 2 * 217) == (2, len(fx.feature_names))
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
