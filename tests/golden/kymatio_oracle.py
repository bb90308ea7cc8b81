"""Independent numpy transcription of kymatio 0.3.0's Scattering2D.

Purpose: break the circular-oracle problem flagged in VERDICT.md (round 1).
The production path (``wst_tpu.ops.scattering``) and the in-package numpy
oracle (``wst_tpu.ops.scattering_ref``) share one ``FilterBank``; a
convention drift there would be invisible to every test.  This module is a
SECOND, fully independent implementation that imports nothing from
``wst_tpu`` and deliberately mirrors the *structure of the kymatio 0.3.0
source* instead (filter dicts with ``levels`` lists, ``cdgmm``/``modulus``/
``subsample_fourier`` backend primitives, the n1/n2 core loops), so the two
code bases share no lines.

Transcribed conventions (kymatio 0.3.0, the engine the reference pins in
/root/reference/requirements.txt and calls from
/root/reference/src/training/train_and_save_model.py:346-378):

* ``gabor_2d``: spatial-domain Gabor periodized over +-2 wrap-arounds of the
  padded grid, normalized by ``2 * 3.1415 * sigma**2 / slant`` (kymatio uses
  the literal 3.1415, not pi — kymatio/scattering2d/filter_bank.py).
* ``morlet_2d``: Gabor minus K * envelope with K = sum(gabor)/sum(envelope)
  so the filter has exactly zero mean.
* ``filter_bank``: psi_{j,theta} with sigma = 0.8 * 2**j,
  xi = 3/4 * pi / 2**j, angle = (int(L - L/2 - 1) - theta) * pi / L,
  slant = 4/L; phi_J Gaussian with sigma = 0.8 * 2**(J-1), slant 1.
  Fourier filters are the REAL part of fft2 of the spatial filter,
  periodized (mask + fold-sum) to each dyadic resolution.
* ``compute_padding``: M_padded = ((M + 2**J) // 2**J + 1) * 2**J; reflect
  padding split floor/ceil between the two sides
  (kymatio/scattering2d/utils.py + frontend/base_frontend.py).
* core cascade (kymatio/scattering2d/core/scattering2d.py): S0 first, then
  order-1 coefficients in psi-list order (j ascending, theta ascending),
  then ALL order-2 coefficients grouped after order 1, ordered by
  (n1 ascending, n2 ascending with j2 > j1).  Fourier subsampling takes the
  MEAN over the folded spectrum; unpadding crops a 1-pixel border.

No kymatio wheel is reachable from this sandbox (zero egress), so runtime
cross-validation against the real package is impossible here; this
transcription plus the analytic invariants in tests/test_golden_parity.py
(Littlewood-Paley frame bounds, zero-mean psi, rotation equivariance,
constant-image response) is the strongest available anchor.  If kymatio ever
becomes importable, tests/test_golden_parity.py::test_against_real_kymatio
will pick it up automatically and compare bit-for-bit.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# Filter construction — transcribed from kymatio/scattering2d/filter_bank.py
# ---------------------------------------------------------------------------

def gabor_2d(M, N, sigma, theta, xi, slant=1.0):
    gab = np.zeros((M, N), np.complex128)
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]], np.float64)
    R_inv = np.array([[np.cos(theta), np.sin(theta)],
                      [-np.sin(theta), np.cos(theta)]], np.float64)
    D = np.array([[1, 0], [0, slant * slant]])
    curv = np.dot(R, np.dot(D, R_inv)) / (2 * sigma * sigma)

    for ex in [-2, -1, 0, 1, 2]:
        for ey in [-2, -1, 0, 1, 2]:
            [xx, yy] = np.mgrid[ex * M:M + ex * M, ey * N:N + ey * N]
            arg = -(curv[0, 0] * xx * xx
                    + (curv[0, 1] + curv[1, 0]) * xx * yy
                    + curv[1, 1] * yy * yy) \
                + 1.j * (xx * xi * np.cos(theta) + yy * xi * np.sin(theta))
            gab += np.exp(arg)

    norm_factor = 2 * 3.1415 * sigma * sigma / slant
    gab /= norm_factor
    return gab


def morlet_2d(M, N, sigma, theta, xi, slant=0.5):
    wv = gabor_2d(M, N, sigma, theta, xi, slant)
    wv_modulus = gabor_2d(M, N, sigma, theta, 0, slant)
    K = np.sum(wv) / np.sum(wv_modulus)
    mor = wv - K * wv_modulus
    return mor


def periodize_filter_fft(x, res):
    M = x.shape[0]
    N = x.shape[1]

    mask = np.ones(x.shape, np.float64)
    len_x = int(M * (1 - 2 ** (-res)))
    start_x = int(M * 2 ** (-res - 1))
    len_y = int(N * (1 - 2 ** (-res)))
    start_y = int(N * 2 ** (-res - 1))
    mask[start_x:start_x + len_x, :] = 0
    mask[:, start_y:start_y + len_y] = 0
    x = np.multiply(x, mask)

    # fold-sum (kymatio vectorizes this the same way)
    k = int(2 ** res)
    crop = x.reshape(k, M // k, k, N // k).sum(axis=(0, 2))
    return crop


def filter_bank(M, N, J, L=8):
    filters = {}
    filters['psi'] = []

    for j in range(J):
        for theta in range(L):
            psi = {'levels': [], 'j': j, 'theta': theta}
            psi_signal = morlet_2d(
                M, N, 0.8 * 2 ** j,
                (int(L - L / 2 - 1) - theta) * np.pi / L,
                3.0 / 4.0 * np.pi / 2 ** j, 4.0 / L)
            psi_signal_fourier = np.real(np.fft.fft2(psi_signal))
            for res in range(min(j + 1, max(J - 1, 1))):
                psi_levels = periodize_filter_fft(psi_signal_fourier, res)
                psi['levels'].append(psi_levels)
            filters['psi'].append(psi)

    filters['phi'] = {'levels': [], 'j': J}
    phi_signal = gabor_2d(M, N, 0.8 * 2 ** (J - 1), 0, 0)
    phi_signal_fourier = np.real(np.fft.fft2(phi_signal))
    for res in range(J):
        filters['phi']['levels'].append(
            periodize_filter_fft(phi_signal_fourier, res))

    return filters


# ---------------------------------------------------------------------------
# Backend primitives — transcribed from kymatio numpy backend
# ---------------------------------------------------------------------------

def compute_padding(M, N, J):
    M_padded = ((M + 2 ** J) // 2 ** J + 1) * 2 ** J
    N_padded = ((N + 2 ** J) // 2 ** J + 1) * 2 ** J
    return M_padded, N_padded


def _pad(x, pad_size):
    # pad_size = [top, bottom, left, right], reflect mode
    return np.pad(x, ((pad_size[0], pad_size[1]), (pad_size[2], pad_size[3])),
                  mode='reflect')


def _unpad(x):
    return x[..., 1:-1, 1:-1]


def _subsample_fourier(x, k):
    if k == 1:
        return x
    M, N = x.shape[-2], x.shape[-1]
    y = x.reshape(k, M // k, k, N // k)
    return y.mean(axis=(0, 2))


def _cdgmm(A, B):
    return A * B


def _fft(x):
    return np.fft.fft2(x)


def _ifft(x):
    return np.fft.ifft2(x)


def _irfft(x):
    return np.real(np.fft.ifft2(x))


def _modulus(x):
    return np.abs(x)


# ---------------------------------------------------------------------------
# Core cascade — transcribed from kymatio/scattering2d/core/scattering2d.py
# ---------------------------------------------------------------------------

def scattering2d(x, J, L=8, max_order=2):
    """Order-<=2 scattering of one (M, N) float image.

    Returns (n_coeffs, M_out, N_out) float64, n_coeffs and ordering exactly
    as kymatio 0.3.0's array output for Scattering2D(J, shape=(M, N), L).
    """
    M, N = x.shape
    M_padded, N_padded = compute_padding(M, N, J)
    pad_size = [(M_padded - M) // 2, (M_padded - M + 1) // 2,
                (N_padded - N) // 2, (N_padded - N + 1) // 2]
    filters = filter_bank(M_padded, N_padded, J, L)
    phi, psi = filters['phi'], filters['psi']

    out_S_0, out_S_1, out_S_2 = [], [], []

    U_r = _pad(np.asarray(x, np.float64), pad_size)
    U_0_c = _fft(U_r)

    # Zeroth order
    U_1_c = _cdgmm(U_0_c, phi['levels'][0])
    U_1_c = _subsample_fourier(U_1_c, k=2 ** J)
    S_0 = _irfft(U_1_c)
    S_0 = _unpad(S_0)
    out_S_0.append(S_0)

    for n1 in range(len(psi)):
        j1 = psi[n1]['j']
        U_1_c = _cdgmm(U_0_c, psi[n1]['levels'][0])
        if j1 > 0:
            U_1_c = _subsample_fourier(U_1_c, k=2 ** j1)
        U_1_c = _ifft(U_1_c)
        U_1_c = _modulus(U_1_c)
        U_1_c = _fft(U_1_c)

        # Second low pass filter
        S_1_c = _cdgmm(U_1_c, phi['levels'][j1])
        S_1_c = _subsample_fourier(S_1_c, k=2 ** (J - j1))
        S_1_r = _irfft(S_1_c)
        S_1_r = _unpad(S_1_r)
        out_S_1.append(S_1_r)

        if max_order < 2:
            continue
        for n2 in range(len(psi)):
            j2 = psi[n2]['j']
            if j2 <= j1:
                continue
            U_2_c = _cdgmm(U_1_c, psi[n2]['levels'][j1])
            U_2_c = _subsample_fourier(U_2_c, k=2 ** (j2 - j1))
            U_2_c = _ifft(U_2_c)
            U_2_c = _modulus(U_2_c)
            U_2_c = _fft(U_2_c)

            S_2_c = _cdgmm(U_2_c, phi['levels'][j2])
            S_2_c = _subsample_fourier(S_2_c, k=2 ** (J - j2))
            S_2_r = _irfft(S_2_c)
            S_2_r = _unpad(S_2_r)
            out_S_2.append(S_2_r)

    out_S = out_S_0 + out_S_1 + out_S_2
    return np.stack(out_S)
