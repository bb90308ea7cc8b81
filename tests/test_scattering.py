"""Scattering transform correctness: filter bank structure, oracle parity,
backend agreement, and the invariants the reference pipeline relies on
(81 coefficients for J=2/L=8; 486 pooled features per RGB image)."""

import numpy as np
import pytest

from wst_tpu.ops.filter_bank import (FilterBank, build_path_meta,
                                     compute_padding, get_filter_bank,
                                     periodize_filter_fft)
from wst_tpu.ops.scattering import Scattering2D
from wst_tpu.ops.scattering_ref import scattering2d_ref


def test_path_meta_j2_l8():
    meta = build_path_meta(2, 8)
    assert meta.n_coeffs == 81  # 1 + 2*8 + 8*8
    assert meta.paths[0][0] == 0
    # order-1 block: j-major, theta ascending
    assert meta.paths[1] == (1, 0, 0, -1, -1)
    assert meta.paths[9] == (1, 1, 0, -1, -1)
    # order-2 block starts at 17 with (j1=0, t1=0, j2=1, t2=0)
    assert meta.paths[17] == (2, 0, 0, 1, 0)
    assert meta.paths[80] == (2, 0, 7, 1, 7)


def test_path_meta_j3():
    meta = build_path_meta(3, 8)
    # 1 + 3*8 + L^2 * J(J-1)/2 = 1 + 24 + 64*3 = 217
    assert meta.n_coeffs == 217


def test_padding():
    assert compute_padding(128, 128, 2) == (136, 136)
    assert compute_padding(64, 64, 2) == (72, 72)
    assert compute_padding(128, 128, 4) == (160, 160)


def test_periodize_preserves_dc():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 16))
    p = periodize_filter_fft(x, 1)
    assert p.shape == (8, 8)
    assert np.isclose(p[0, 0], x[0, 0])  # DC bin survives masking untouched


def test_filter_bank_shapes():
    bank = get_filter_bank(2, 8, 128, 128)
    assert bank.M_pad == 136 and bank.pad_h == 4
    assert bank.psi_f[(0, 0)].shape == (8, 136, 136)
    assert bank.psi_f[(1, 0)].shape == (8, 136, 136)
    assert bank.phi_f[0].shape == (136, 136)
    assert bank.phi_f[1].shape == (68, 68)
    assert bank.out_hw == (32, 32)
    assert bank.n_coeffs == 81


def test_morlet_zero_mean():
    # psi_f at DC (Fourier bin 0) must vanish: Morlet has zero integral.
    bank = get_filter_bank(2, 8, 64, 64)
    for j in range(2):
        assert np.all(np.abs(bank.psi_f[(j, 0)][:, 0, 0]) < 1e-6)


@pytest.mark.parametrize("mode", ["fft", "matmul"])
@pytest.mark.parametrize("hw", [(64, 64), (32, 32)])
def test_jax_matches_oracle(mode, hw, rng):
    H, W = hw
    bank = FilterBank(2, 8, H, W)
    x = rng.random((2, H, W)).astype(np.float32)
    want = np.stack([scattering2d_ref(xi, bank) for xi in x])
    sc = Scattering2D(2, 8, H, W, mode=mode)
    got = np.asarray(sc(x))
    assert got.shape == (2, 81, H // 4, W // 4)
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_jax_matches_oracle_j3(rng):
    H = W = 64
    bank = FilterBank(3, 4, H, W)
    x = rng.random((H, W)).astype(np.float32)
    want = scattering2d_ref(x, bank)
    sc = Scattering2D(3, 4, H, W, mode="fft")
    got = np.asarray(sc(x))
    assert got.shape == want.shape == (1 + 12 + 48, 8, 8)
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_backend_agreement(rng):
    H = W = 64
    x = rng.random((3, H, W)).astype(np.float32)
    a = np.asarray(Scattering2D(2, 8, H, W, mode="fft")(x))
    b = np.asarray(Scattering2D(2, 8, H, W, mode="matmul")(x))
    assert np.allclose(a, b, atol=2e-4)


def test_features_pooling(rng):
    H = W = 32
    sc = Scattering2D(2, 8, H, W, mode="fft")
    x = rng.random((2, 3, H, W)).astype(np.float32)
    feats = np.asarray(sc.features(x))
    assert feats.shape == (2, 3, 162)
    S = np.asarray(sc(x))
    assert np.allclose(feats[..., :81], S.mean(axis=(-2, -1)), atol=1e-5)
    assert np.allclose(feats[..., 81:], S.std(axis=(-2, -1)), atol=1e-5)


def test_batch_leading_dims(rng):
    sc = Scattering2D(2, 8, 32, 32, mode="fft")
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    out = np.asarray(sc(x))
    flat = np.asarray(sc(x.reshape(6, 32, 32)))
    assert np.allclose(out.reshape(6, 81, 8, 8), flat)


def test_deep_scattering_j4(rng):
    # BASELINE config 4: deep scattering J=4, L=8 (smaller grid here for
    # oracle speed; the structure/padding path is identical).
    H = W = 64
    from wst_tpu.ops.filter_bank import FilterBank
    bank = FilterBank(4, 8, H, W)
    assert bank.M_pad == 96
    # 1 + J*L + L^2 * J(J-1)/2 = 1 + 32 + 64*6 = 417 coefficients
    assert bank.n_coeffs == 417
    x = rng.random((H, W)).astype(np.float32)
    want = scattering2d_ref(x, bank)
    sc = Scattering2D(4, 8, H, W, mode="fft")
    got = np.asarray(sc(x))
    assert got.shape == (417, 4, 4)
    assert np.allclose(got, want, atol=3e-4), np.abs(got - want).max()
    feats = np.asarray(sc.features(x[None]))
    assert feats.shape == (1, 834)


def test_periodic_boundary_mode(rng):
    # TPU fast mode: circular convolution on the unpadded (lane-aligned)
    # grid.  Must match the oracle run with zero padding.
    H = W = 32
    from wst_tpu.ops.filter_bank import FilterBank
    bank = FilterBank(2, 8, H, W, boundary="periodic")
    assert bank.M_pad == H and bank.pad_h == 0
    assert bank.out_hw == (8, 8)
    x = rng.random((H, W)).astype(np.float32)
    want = scattering2d_ref(x, bank)
    sc = Scattering2D(2, 8, H, W, mode="fft", boundary="periodic")
    got = np.asarray(sc(x))
    assert got.shape == (81, 8, 8)
    assert np.allclose(got, want, atol=2e-4)
    # periodic differs from reflect (boundary handling) but correlates
    refl = np.asarray(Scattering2D(2, 8, H, W, mode="fft")(x))
    assert refl.shape == got.shape
    assert not np.allclose(got, refl, atol=1e-3)
