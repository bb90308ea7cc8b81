"""Slow, single-image numpy oracle for the 2-D scattering transform.

Implements the classic FFT cascade (pad -> FFT -> psi multiply -> subsample ->
modulus -> phi low-pass -> unpad) exactly as the reference engine (kymatio
0.3.0) evaluates it, using the FilterBank of this package.  Used only as the
correctness anchor in tests; the production path is the batched JAX
implementation in ``wst_tpu.ops.scattering``.
"""

from __future__ import annotations

import numpy as np

from wst_tpu.ops.filter_bank import FilterBank


def _pad_reflect(x: np.ndarray, ph: int, pw: int) -> np.ndarray:
    return np.pad(x, ((ph, ph), (pw, pw)), mode="reflect")


def _subsample_fourier(x: np.ndarray, k: int) -> np.ndarray:
    """Fourier-domain subsampling: fold the spectrum k times per axis (mean)."""
    if k == 1:
        return x
    M, N = x.shape[-2:]
    return x.reshape(*x.shape[:-2], k, M // k, k, N // k).mean(axis=(-4, -2))


def _unpad(x: np.ndarray) -> np.ndarray:
    return x[..., 1:-1, 1:-1]


def scattering2d_ref(x: np.ndarray, bank: FilterBank) -> np.ndarray:
    """Order-2 scattering of a single (H, W) image -> (n_coeffs, H/2^J, W/2^J).

    Coefficient order matches ``bank.meta.paths`` (zeroth; order-1 by
    (j1, theta1); order-2 by (j1, theta1, j2 > j1, theta2)).
    """
    J, L = bank.J, bank.L
    xp = np.asarray(x, dtype=np.float64)
    if bank.pad_h or bank.pad_w:
        xp = _pad_reflect(xp, bank.pad_h, bank.pad_w)
    unpad = _unpad if bank.boundary == "reflect" else (lambda z: z)
    X = np.fft.fft2(xp)

    out = []

    # Zeroth order: low-pass + subsample 2^J.
    S0 = np.real(np.fft.ifft2(
        _subsample_fourier(X * bank.phi_f[0], 2 ** J)))
    out.append(unpad(S0))

    U1_hat = {}  # (j1, theta1) -> FFT of |x * psi_{j1,theta1}| at res j1
    for j1 in range(J):
        for t1 in range(L):
            Y = X * bank.psi_f[(j1, 0)][t1]
            Y = _subsample_fourier(Y, 2 ** j1)
            U1 = np.abs(np.fft.ifft2(Y))
            U1_hat[(j1, t1)] = np.fft.fft2(U1)
            S1 = np.real(np.fft.ifft2(_subsample_fourier(
                U1_hat[(j1, t1)] * bank.phi_f[j1], 2 ** (J - j1))))
            out.append(unpad(S1))

    if bank.max_order >= 2:
        for j1 in range(J):
            for t1 in range(L):
                for j2 in range(j1 + 1, J):
                    for t2 in range(L):
                        Y = U1_hat[(j1, t1)] * bank.psi_f[(j2, j1)][t2]
                        Y = _subsample_fourier(Y, 2 ** (j2 - j1))
                        U2 = np.abs(np.fft.ifft2(Y))
                        S2 = np.real(np.fft.ifft2(_subsample_fourier(
                            np.fft.fft2(U2) * bank.phi_f[j2],
                            2 ** (J - j2))))
                        out.append(unpad(S2))

    return np.stack(out).astype(np.float32)
