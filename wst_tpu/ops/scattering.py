"""Batched 2-D wavelet scattering transform for TPU (JAX).

This is the TPU-native replacement for the reference's per-image kymatio
calls (reference: src/training/train_and_save_model.py:346-378).  Key design
differences from the reference:

* The Morlet filter bank is precomputed ONCE per (J, L, H, W) and lives in
  device memory; the reference rebuilt it for every image.
* The cascade is evaluated for a whole (batch, channel) block at once — all
  L orientations of a scale are processed as one tensor op, so the work is
  large, regular, and XLA-fusable.
* Two interchangeable spectral backends:
    - ``fft``    : jnp.fft (complex64) — default on CPU.
    - ``matmul`` : DFT-as-matmul on real/imag planes — default on TPU, where
      small (≈136-point) Fourier transforms run fastest on the MXU as
      batched f32 matrix products.
  Both produce identical coefficients (tested against the numpy oracle in
  ``wst_tpu.ops.scattering_ref``).

Output layout matches the reference's coefficient indexing: see
``FilterBank.meta.paths`` (zeroth; order-1 by (j1, theta1); order-2 by
(j1, theta1, j2 > j1, theta2)) so feature ``{ch}_wst_{stat}_{i}`` refers to
path i (reference: src/training/train_and_save_model.py:400-427).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wst_tpu.ops.filter_bank import FilterBank, get_filter_bank

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Spectral backends.  Complex arrays are represented either as jnp complex64
# ("fft" mode) or as a (real, imag) tuple of float32 ("matmul" mode).
# ---------------------------------------------------------------------------

class _FFTBackend:
    """jnp.fft-based backend (complex64 arrays)."""

    def fft2_real(self, x):
        return jnp.fft.fft2(x.astype(jnp.complex64))

    def fft2(self, x):
        return jnp.fft.fft2(x)

    def ifft2(self, x):
        return jnp.fft.ifft2(x)

    def ifft2_real(self, x):
        return jnp.real(jnp.fft.ifft2(x))

    def mul_filter(self, x, filt):
        return x * filt

    def modulus(self, x):
        return jnp.abs(x)

    def subsample(self, x, k):
        if k == 1:
            return x
        M, N = x.shape[-2], x.shape[-1]
        y = x.reshape(*x.shape[:-2], k, M // k, k, N // k)
        return y.mean(axis=(-4, -2))


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    k = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class _MatmulBackend:
    """DFT-as-matmul backend: complex = (re, im) float32 planes.

    A 2-D DFT of an (..., M, N) block is two dense matrix products with the
    M- and N-point DFT matrices — on TPU these land on the MXU and for the
    small transform sizes of the scattering cascade (~68..272 points) they
    outperform a generic FFT while keeping the whole cascade in one fused
    XLA computation.

    DFT matrices are injected per-trace via :meth:`set_mats` so they enter
    the jitted program as parameters, not giant inline constants.
    """

    def __init__(self, precision=_HIGHEST):
        self._cache: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._prec = precision

    def set_mats(self, mats: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]]):
        self._cache = dict(mats)

    def _mats(self, n: int):
        if n not in self._cache:
            c, s = _dft_mats(n)
            self._cache[n] = (jnp.asarray(c), jnp.asarray(s))
        return self._cache[n]

    def _mm_rows(self, M, x):
        return jnp.einsum("km,...mn->...kn", M, x, precision=self._prec)

    def _mm_cols(self, x, M):
        return jnp.einsum("...mn,nl->...ml", x, M, precision=self._prec)

    def _rows(self, re, im, inverse: bool):
        # Multiply along axis -2 by F = C - iS (forward) or (C + iS)/M (inv).
        m = re.shape[-2]
        C, S = self._mats(m)
        if not inverse:
            return (self._mm_rows(C, re) + self._mm_rows(S, im),
                    self._mm_rows(C, im) - self._mm_rows(S, re))
        return ((self._mm_rows(C, re) - self._mm_rows(S, im)) / m,
                (self._mm_rows(C, im) + self._mm_rows(S, re)) / m)

    def _cols(self, re, im, inverse: bool):
        n = re.shape[-1]
        C, S = self._mats(n)
        if not inverse:
            return (self._mm_cols(re, C) + self._mm_cols(im, S),
                    self._mm_cols(im, C) - self._mm_cols(re, S))
        return ((self._mm_cols(re, C) - self._mm_cols(im, S)) / n,
                (self._mm_cols(im, C) + self._mm_cols(re, S)) / n)

    def fft2_real(self, x):
        # Real input: row stage needs only 2 matmuls (imag part is -S @ x).
        m = x.shape[-2]
        C, S = self._mats(m)
        re, im = self._mm_rows(C, x), -self._mm_rows(S, x)
        return self._cols(re, im, inverse=False)

    def fft2(self, x):
        re, im = self._rows(x[0], x[1], inverse=False)
        return self._cols(re, im, inverse=False)

    def ifft2(self, x):
        re, im = self._rows(x[0], x[1], inverse=True)
        return self._cols(re, im, inverse=True)

    def ifft2_real(self, x):
        # Only the real part of the result is needed: 4 + 2 matmuls.
        re, im = self._rows(x[0], x[1], inverse=True)
        n = re.shape[-1]
        C, S = self._mats(n)
        return (self._mm_cols(re, C) - self._mm_cols(im, S)) / n

    def mul_filter(self, x, filt):
        return x[0] * filt, x[1] * filt

    def modulus(self, x):
        return jnp.sqrt(x[0] * x[0] + x[1] * x[1])

    def subsample(self, x, k):
        if k == 1:
            return x
        return (_subsample_real(x[0], k), _subsample_real(x[1], k))


def _subsample_real(x, k):
    M, N = x.shape[-2], x.shape[-1]
    y = x.reshape(*x.shape[:-2], k, M // k, k, N // k)
    return y.mean(axis=(-4, -2))


def _default_mode() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        platform = "cpu"
    return "fft" if platform == "cpu" else "matmul"


# ---------------------------------------------------------------------------
# The scattering transform.
# ---------------------------------------------------------------------------

class Scattering2D:
    """Batched order-2 wavelet scattering, jit-compiled once per shape.

    Parameters mirror the reference engine: ``J`` scales, ``L`` orientations,
    input spatial shape ``(H, W)``.  For J=2, L=8 the transform yields 81
    coefficient maps at (H/4, W/4), matching the reference's 486-feature
    per-image WST descriptor after mean/std pooling over 3 channels
    (reference: src/training/train_and_save_model.py:346-378).
    """

    def __init__(self, J: int, L: int, H: int, W: int, max_order: int = 2,
                 mode: Optional[str] = None, precision: str = "highest",
                 boundary: str = "reflect"):
        self.bank: FilterBank = get_filter_bank(J, L, H, W, max_order,
                                                boundary)
        self.mode = mode or _default_mode()
        if self.mode not in ("fft", "matmul"):
            raise ValueError(f"unknown scattering mode: {self.mode}")
        prec = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[precision]
        self._backend = (_FFTBackend() if self.mode == "fft"
                         else _MatmulBackend(prec))
        # Filters (and, in matmul mode, DFT matrices) are passed to the
        # jitted function as pytree ARGUMENTS, not closed-over constants:
        # this keeps the HLO small (fast compiles, especially over remote
        # PJRT tunnels) and lets XLA keep one device-resident copy.
        params = {
            "psi": {f"{j}_{res}": jnp.asarray(v)
                    for (j, res), v in self.bank.psi_f.items()},
            "phi": {str(res): jnp.asarray(v)
                    for res, v in self.bank.phi_f.items()},
            "dft": {},
        }
        if self.mode == "matmul":
            sizes = set()
            for r in range(self.bank.J + 1):
                sizes.add(self.bank.M_pad // 2 ** r)
                sizes.add(self.bank.N_pad // 2 ** r)
            for n in sorted(sizes):
                c, s = _dft_mats(n)
                params["dft"][str(n)] = (jnp.asarray(c), jnp.asarray(s))
        self._params = params
        self._apply = jax.jit(self._scatter_batch)
        self._apply_feats = jax.jit(self._features_batch)

    # -- public API ---------------------------------------------------------

    @property
    def n_coeffs(self) -> int:
        return self.bank.n_coeffs

    @property
    def out_hw(self) -> Tuple[int, int]:
        return self.bank.out_hw

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., H, W) -> (..., n_coeffs, H/2^J, W/2^J)."""
        lead = x.shape[:-2]
        xb = x.reshape((-1,) + x.shape[-2:])
        out = self._apply(xb, self._params)
        return out.reshape(lead + out.shape[1:])

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        """Pooled per-coefficient (mean, std) features.

        x: (..., H, W) -> (..., 2 * n_coeffs) laid out as
        [mean_0..mean_{K-1}, std_0..std_{K-1}], the reference's per-channel
        feature layout (reference: src/training/train_and_save_model.py:
        368-376 concatenates coeff means then coeff stds per channel).
        """
        lead = x.shape[:-2]
        xb = x.reshape((-1,) + x.shape[-2:])
        out = self._apply_feats(xb, self._params)
        return out.reshape(lead + out.shape[1:])

    # -- implementation -----------------------------------------------------

    def _pad(self, x):
        if self.bank.pad_h == 0 and self.bank.pad_w == 0:
            return x
        return jnp.pad(
            x,
            ((0, 0), (self.bank.pad_h, self.bank.pad_h),
             (self.bank.pad_w, self.bank.pad_w)),
            mode="reflect")

    def _unpad(self, x):
        if self.bank.boundary == "periodic":
            return x
        return x[..., 1:-1, 1:-1]

    def _scatter_batch(self, x: jnp.ndarray, params) -> jnp.ndarray:
        """x: (B, H, W) float32 -> (B, n_coeffs, h, w) float32."""
        be = self._backend
        if self.mode == "matmul":
            be.set_mats({int(k): v for k, v in params["dft"].items()})
        psi = {tuple(map(int, k.split("_"))): v
               for k, v in params["psi"].items()}
        phi = {int(k): v for k, v in params["phi"].items()}
        J, L = self.bank.J, self.bank.L
        B = x.shape[0]
        h, w = self.bank.out_hw

        X = be.fft2_real(self._pad(x.astype(jnp.float32)))

        # Zeroth order.
        S0 = self._unpad(be.ifft2_real(
            be.subsample(be.mul_filter(X, phi[0]), 2 ** J)))
        blocks = [S0[:, None]]

        # First order: all L orientations of scale j1 at once.
        u1_hat = {}
        s1_blocks = []
        for j1 in range(J):
            Xe = (X[:, None] if self.mode == "fft"
                  else (X[0][:, None], X[1][:, None]))
            Y = be.mul_filter(Xe, psi[(j1, 0)][None])
            Y = be.subsample(Y, 2 ** j1)
            U1 = be.modulus(be.ifft2(Y))            # (B, L, m, n) real
            U1h = be.fft2_real(U1)
            u1_hat[j1] = U1h
            S1 = self._unpad(be.ifft2_real(
                be.subsample(be.mul_filter(U1h, phi[j1]),
                             2 ** (J - j1))))
            s1_blocks.append(S1)
        blocks.extend(s1_blocks)

        # Second order, grouped as (j1, j2): (B, L1, L2, m, n).
        if self.bank.max_order >= 2:
            for j1 in range(J - 1):
                per_j2 = []
                for j2 in range(j1 + 1, J):
                    U1h = u1_hat[j1]
                    U1e = (U1h[:, :, None] if self.mode == "fft"
                           else (U1h[0][:, :, None], U1h[1][:, :, None]))
                    Y = be.mul_filter(U1e, psi[(j2, j1)][None, None])
                    Y = be.subsample(Y, 2 ** (j2 - j1))
                    U2 = be.modulus(be.ifft2(Y))
                    U2h = be.fft2_real(U2)
                    S2 = self._unpad(be.ifft2_real(
                        be.subsample(be.mul_filter(U2h, phi[j2]),
                                     2 ** (J - j2))))
                    per_j2.append(S2)                # (B, L, L, h, w)
                # Reference path order within fixed j1: [theta1][j2][theta2].
                S2j1 = jnp.stack(per_j2, axis=2)     # (B, L1, nj2, L2, h, w)
                blocks.append(S2j1.reshape(B, -1, h, w))

        return jnp.concatenate(blocks, axis=1)

    def _features_batch(self, x: jnp.ndarray, params) -> jnp.ndarray:
        S = self._scatter_batch(x, params)                   # (B, K, h, w)
        mean = jnp.mean(S, axis=(-2, -1))
        std = jnp.std(S, axis=(-2, -1))
        return jnp.concatenate([mean, std], axis=-1)  # (B, 2K)


@functools.lru_cache(maxsize=8)
def get_scattering(J: int, L: int, H: int, W: int, max_order: int = 2,
                   mode: Optional[str] = None,
                   boundary: str = "reflect") -> Scattering2D:
    return Scattering2D(J, L, H, W, max_order, mode, boundary=boundary)
