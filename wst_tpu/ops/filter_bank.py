"""Morlet wavelet filter bank for the 2-D wavelet scattering transform.

Built once per (J, L, H, W) configuration on the host (numpy) and then moved
to device memory as stacked arrays, so the per-image filter-bank rebuild that
dominates the reference's CPU cost (reference: src/training/
train_and_save_model.py:359, src/inference/inference.py:242) disappears.

Conventions follow the published Morlet scattering filter design used by the
reference's engine (kymatio 0.3.0 ``Scattering2D``), so that the coefficient
indices 0..(#paths-1) mean the same thing as the reference's feature names
``{ch}_wst_{mean,std}_{i}`` (reference: src/training/train_and_save_model.py:
400-427):

* psi_{j,theta}: Morlet wavelet, sigma = 0.8 * 2**j, xi = 3*pi/4 / 2**j,
  orientation angle (L/2 - 1 - theta) * pi / L, slant 4/L.
* phi_J: Gaussian low-pass, sigma = 0.8 * 2**(J-1), slant 1.
* Filters are constructed in the spatial domain on the padded grid,
  periodized over +-2 wrap-arounds, Fourier-transformed (real part), and
  periodized to each dyadic resolution used by the cascade.
* Input is reflect-padded to M_pad = (M // 2**J + 2) * 2**J (for M divisible
  by 2**J), i.e. 2**J pixels per side; after the final 2**J subsampling a
  1-pixel border is cropped ("unpad").

Everything here is plain numpy: it runs once at configuration time.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import numpy as np


def gabor_2d(M: int, N: int, sigma: float, theta: float, xi: float,
             slant: float = 1.0) -> np.ndarray:
    """Periodized 2-D Gabor filter in the spatial domain (complex128).

    gab(x, y) = sum_{ex,ey in [-2,2]} exp(-q(x+ex*M, y+ey*N) + i xi <u, e_theta>)
                 / (2 * 3.1415 * sigma^2 / slant)

    where q is the anisotropic quadratic form with principal axis rotated by
    ``theta`` and aspect ratio ``slant``.  The ``3.1415`` constant (rather
    than pi) matches the reference engine's normalization; the constant is
    irrelevant downstream because every scattering coefficient statistic is
    standardized per-feature before selection/classification.
    """
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], dtype=np.float64)
    D = np.array([[1.0, 0.0], [0.0, slant * slant]], dtype=np.float64)
    curv = R @ D @ R.T / (2.0 * sigma * sigma)

    gab = np.zeros((M, N), dtype=np.complex128)
    xs = np.arange(M, dtype=np.float64)[:, None]
    ys = np.arange(N, dtype=np.float64)[None, :]
    for ex in (-2, -1, 0, 1, 2):
        for ey in (-2, -1, 0, 1, 2):
            xx = xs + ex * M
            yy = ys + ey * N
            arg = (-(curv[0, 0] * xx * xx
                     + (curv[0, 1] + curv[1, 0]) * xx * yy
                     + curv[1, 1] * yy * yy)
                   + 1j * (xx * xi * np.cos(theta) + yy * xi * np.sin(theta)))
            gab += np.exp(arg)
    gab /= 2.0 * 3.1415 * sigma * sigma / slant
    return gab


def morlet_2d(M: int, N: int, sigma: float, theta: float, xi: float,
              slant: float = 0.5) -> np.ndarray:
    """Morlet = Gabor minus a Gaussian correction making the mean zero."""
    wv = gabor_2d(M, N, sigma, theta, xi, slant)
    wv_modulus = gabor_2d(M, N, sigma, theta, 0.0, slant)
    K = np.sum(wv) / np.sum(wv_modulus)
    return wv - K * wv_modulus


def periodize_filter_fft(x: np.ndarray, res: int) -> np.ndarray:
    """Periodize a full-resolution Fourier filter down to resolution ``res``.

    Equivalent to cropping the filter's support in the spatial domain:
    mask out the aliased mid-band frequencies, then fold the spectrum
    2**res times along each axis.
    """
    if res == 0:
        return x.copy()
    M, N = x.shape
    k = 2 ** res
    mask = np.ones_like(x, dtype=np.float64)
    start_x, len_x = M // (2 * k), M - M // k
    start_y, len_y = N // (2 * k), N - N // k
    mask[start_x:start_x + len_x, :] = 0
    mask[:, start_y:start_y + len_y] = 0
    xm = x * mask
    return xm.reshape(k, M // k, k, N // k).sum(axis=(0, 2))


def compute_padding(M: int, N: int, J: int) -> Tuple[int, int]:
    """Padded grid size: at least 2**J extra pixels per side, 2**J-aligned."""
    M_pad = ((M + 2 ** J) // 2 ** J + 1) * 2 ** J
    N_pad = ((N + 2 ** J) // 2 ** J + 1) * 2 ** J
    return M_pad, N_pad


@dataclasses.dataclass(frozen=True)
class ScatteringMeta:
    """Static path layout of an order-2 scattering transform.

    ``paths`` lists every output coefficient in the canonical order used by
    the reference engine (zeroth; then order 1 by (j1 asc, theta1 asc); then
    order 2 by (j1, theta1, j2 asc > j1, theta2 asc)).  Feature index i of
    the reference's ``{ch}_wst_{mean,std}_{i}`` names refers to paths[i].
    """
    J: int
    L: int
    max_order: int
    # Each entry: (order, j1, theta1, j2, theta2); -1 for unused slots.
    paths: Tuple[Tuple[int, int, int, int, int], ...]

    @property
    def n_coeffs(self) -> int:
        return len(self.paths)


def build_path_meta(J: int, L: int, max_order: int = 2) -> ScatteringMeta:
    paths: List[Tuple[int, int, int, int, int]] = [(0, -1, -1, -1, -1)]
    for j1 in range(J):
        for t1 in range(L):
            paths.append((1, j1, t1, -1, -1))
    if max_order >= 2:
        for j1 in range(J):
            for t1 in range(L):
                for j2 in range(j1 + 1, J):
                    for t2 in range(L):
                        paths.append((2, j1, t1, j2, t2))
    return ScatteringMeta(J=J, L=L, max_order=max_order, paths=tuple(paths))


class FilterBank:
    """Precomputed Fourier-domain Morlet filter bank for one (J, L, H, W).

    Attributes
    ----------
    psi_f : dict (j, res) -> float32 array (L, M_pad/2**res, N_pad/2**res)
        All L orientations of scale j, periodized to resolution ``res``.
        res ranges over 0..j (order-1 filters applied at res 0; order-2
        filters for scale j2 are applied at the resolution j1 < j2 of the
        first-order modulus signal).
    phi_f : dict res -> float32 array (M_pad/2**res, N_pad/2**res)
        Low-pass phi_J periodized to each resolution 0..J-1.
    """

    def __init__(self, J: int, L: int, H: int, W: int, max_order: int = 2,
                 boundary: str = "reflect"):
        if H % 2 ** J or W % 2 ** J:
            raise ValueError(
                f"H={H}, W={W} must be divisible by 2**J={2**J}")
        if boundary not in ("reflect", "periodic"):
            raise ValueError(f"unknown boundary mode: {boundary!r}")
        self.J, self.L, self.H, self.W = J, L, H, W
        self.max_order = max_order
        self.boundary = boundary
        if boundary == "reflect":
            # Reference-engine convention: reflect-pad by 2**J per side,
            # crop a 1-px border after the final subsampling.
            self.M_pad, self.N_pad = compute_padding(H, W, J)
        else:
            # TPU fast mode: circular convolution on the unpadded grid.
            # For power-of-two inputs every transform size is a multiple of
            # the 128-lane MXU tile, roughly doubling MXU utilization; the
            # features differ only through boundary handling.
            self.M_pad, self.N_pad = H, W
        self.pad_h = (self.M_pad - H) // 2
        self.pad_w = (self.N_pad - W) // 2
        self.meta = build_path_meta(J, L, max_order)

        psi_full: Dict[int, np.ndarray] = {}
        for j in range(J):
            filts = []
            for theta in range(L):
                angle = (int(L - L / 2 - 1) - theta) * np.pi / L
                m = morlet_2d(self.M_pad, self.N_pad, 0.8 * 2 ** j, angle,
                              3.0 / 4.0 * np.pi / 2 ** j, 4.0 / L)
                filts.append(np.real(np.fft.fft2(m)))
            psi_full[j] = np.stack(filts)

        self.psi_f: Dict[Tuple[int, int], np.ndarray] = {}
        for j in range(J):
            max_res = max(j, 1) if max_order >= 2 else 1
            for res in range(min(j + 1, max(J - 1, 1))):
                self.psi_f[(j, res)] = np.stack([
                    periodize_filter_fft(psi_full[j][t], res)
                    for t in range(L)
                ]).astype(np.float32)

        phi_full = np.real(np.fft.fft2(
            gabor_2d(self.M_pad, self.N_pad, 0.8 * 2 ** (J - 1), 0.0, 0.0)))
        self.phi_f: Dict[int, np.ndarray] = {
            res: periodize_filter_fft(phi_full, res).astype(np.float32)
            for res in range(J)
        }

    @property
    def out_hw(self) -> Tuple[int, int]:
        return self.H // 2 ** self.J, self.W // 2 ** self.J

    @property
    def n_coeffs(self) -> int:
        return self.meta.n_coeffs


@functools.lru_cache(maxsize=16)
def get_filter_bank(J: int, L: int, H: int, W: int, max_order: int = 2,
                    boundary: str = "reflect") -> FilterBank:
    """Cached filter-bank constructor (the bank is immutable after build)."""
    return FilterBank(J, L, H, W, max_order, boundary)
