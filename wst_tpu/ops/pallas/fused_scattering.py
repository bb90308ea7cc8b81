"""Fused Pallas TPU kernel for the J=2 order-2 scattering cascade (D4).

One grid program processes one (channel-)image end-to-end with every
intermediate resident in VMEM — the padded spectrum, all |x * psi| modulus
fields, their spectra, and the low-passed outputs never round-trip through
HBM, unlike the XLA path where each cascade stage is a separate
HBM-materialized tensor.

Spectral transforms are DFT matmuls on (re, im) planes (MXU); modulus and
filter products run on the VPU.  Fourier-domain subsampling (spectrum
folding) is fused INTO the inverse-DFT matrices: for subsample factor k,
``ifft_{m/k}(fold_k(Y)) = (C_{m/k} P_k) Y (C_{m/k} P_k)^T``-style products
with ``P_k = tile(I_{m/k}, k)/k``, so the kernel is pure 2-D matmul +
elementwise — no >2-D reshapes (which Mosaic cannot lower).

The kernel emits, per image, the 81 coefficient maps' pooled mean and std
directly — the entire per-image WST feature vector of the reference
pipeline (reference: src/training/train_and_save_model.py:346-378) in one
kernel launch.

Restrictions: J=2 (the reference's configuration); any L; square padded
grid.  The general-J path remains ``wst_tpu.ops.scattering.Scattering2D``.

Precision: kernel matmuls default to the MXU's native bf16-input/f32-accum
mode (~1.6e-3 max feature error vs the f32 path — irrelevant downstream, as
every feature is standardized before selection/classification, but 1.8x
faster and far cheaper to compile than the 6-pass f32 emulation).  Pass
``precision="highest"`` for bitwise-grade parity with the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wst_tpu.ops.filter_bank import get_filter_bank
from wst_tpu.ops.scattering import _dft_mats


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _interpret_mode() -> bool:
    """Run the fused kernels in Pallas interpret mode off-TPU, so the
    mode="pallas" paths (FeatureExtractor, DistributedTrainer, the
    multi-chip dryrun) work on the simulated CPU mesh.  Override with
    WST_PALLAS_INTERPRET=0/1."""
    import os
    env = os.environ.get("WST_PALLAS_INTERPRET")
    if env is not None:
        return env == "1"
    return not pallas_available()


def _fold_mat(m: int, k: int) -> np.ndarray:
    """(m/k, m) matrix averaging k-strided spectrum blocks: P = tile(I)/k."""
    eye = np.eye(m // k, dtype=np.float32)
    return np.tile(eye, (1, k)) / np.float32(k)


def _build_constants(J: int, L: int, H: int, W: int,
                     boundary: str = "reflect"):
    bank = get_filter_bank(J, L, H, W, 2, boundary)
    n = bank.M_pad
    assert bank.N_pad == n, "kernel assumes square padded grid"
    nh, nq = n // 2, n // 4
    c_n, s_n = _dft_mats(n)
    c_h, s_h = _dft_mats(nh)
    c_q, s_q = _dft_mats(nq)
    p2 = _fold_mat(n, 2)          # (nh, n)
    p4 = _fold_mat(n, 4)          # (nq, n)
    p2h = _fold_mat(nh, 2)        # (nq, nh)
    consts = dict(
        psi0=bank.psi_f[(0, 0)],              # (L, n, n)
        psi1=bank.psi_f[(1, 0)],              # (L, n, n)
        phi0=bank.phi_f[0],                   # (n, n)
        phi1=bank.phi_f[1],                   # (nh, nh)
        c_n=c_n, s_n=s_n, c_h=c_h, s_h=s_h,
        gq_c=c_q @ p4, gq_s=s_q @ p4,         # (nq, n)  fold4 + iDFT
        gh_c=c_h @ p2, gh_s=s_h @ p2,         # (nh, n)  fold2 + iDFT
        gq2_c=c_q @ p2h, gq2_s=s_q @ p2h,     # (nq, nh) fold2 + iDFT
    )
    return bank, {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}


def _make_kernel(L: int, n: int, n_coeffs: int,
                 precision: str = "default"):
    from jax.experimental import pallas as pl  # noqa: F401

    nh, nq = n // 2, n // 4
    f32 = jnp.float32
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def kernel(x_ref, psi0_ref, psi1_ref, phi0_ref, phi1_ref,
               cn_ref, sn_ref, ch_ref, sh_ref,
               gqc_ref, gqs_ref, ghc_ref, ghs_ref, gq2c_ref, gq2s_ref,
               out_ref):
        C, S = cn_ref[0], sn_ref[0]
        Ch, Sh = ch_ref[0], sh_ref[0]
        Gqc, Gqs = gqc_ref[0], gqs_ref[0]
        Ghc, Ghs = ghc_ref[0], ghs_ref[0]
        Gq2c, Gq2s = gq2c_ref[0], gq2s_ref[0]
        x = x_ref[0]                                   # (n, n) padded image

        # fft2(x): real-input rows, complex cols.
        rr, ri = mm(C, x), -mm(S, x)
        Xr = mm(rr, C) + mm(ri, S)
        Xi = mm(ri, C) - mm(rr, S)

        def idft_real(zr, zi, Gc, Gs, m_out):
            # real part of folded inverse DFT: (m_out, n_in) mats
            ar = mm(Gc, zr) - mm(Gs, zi)
            ai = mm(Gc, zi) + mm(Gs, zr)
            return (mm(ar, Gc.T) - mm(ai, Gs.T)) / f32(m_out * m_out)

        def idft_c(zr, zi, Gc, Gs, m_out):
            ar = mm(Gc, zr) - mm(Gs, zi)
            ai = mm(Gc, zi) + mm(Gs, zr)
            return ((mm(ar, Gc.T) - mm(ai, Gs.T)) / f32(m_out * m_out),
                    (mm(ai, Gc.T) + mm(ar, Gs.T)) / f32(m_out * m_out))

        def fft2_real(u, Cm, Sm):
            a, b = mm(Cm, u), -mm(Sm, u)
            return mm(a, Cm) + mm(b, Sm), mm(b, Cm) - mm(a, Sm)

        def pool(smap, slot):
            # Write the full (unpadded-later) coefficient map; pooling to
            # mean/std happens outside the kernel (scalar/1-D stores are
            # unsupported by the Mosaic lowering, 2-D vector stores are).
            out_ref[0, slot] = smap

        # S0: phi low-pass, fused fold-by-4 inverse DFT.
        pool(idft_real(Xr * phi0_ref[0], Xi * phi0_ref[0], Gqc, Gqs, nq), 0)

        slot2 = 1 + 2 * L                              # first order-2 slot
        for t1 in range(L):
            # j1 = 0 at full resolution.
            p = psi0_ref[0, t1]
            U1r, U1i = idft_c(Xr * p, Xi * p, C, S, n)  # plain inverse DFT
            U1 = jnp.sqrt(U1r * U1r + U1i * U1i)
            Vr, Vi = fft2_real(U1, C, S)
            pool(idft_real(Vr * phi0_ref[0], Vi * phi0_ref[0],
                           Gqc, Gqs, nq), 1 + t1)
            for t2 in range(L):
                q = psi1_ref[0, t2]
                U2r, U2i = idft_c(Vr * q, Vi * q, Ghc, Ghs, nh)
                U2 = jnp.sqrt(U2r * U2r + U2i * U2i)   # (nh, nh)
                Wr, Wi = fft2_real(U2, Ch, Sh)
                pool(idft_real(Wr * phi1_ref[0], Wi * phi1_ref[0],
                               Gq2c, Gq2s, nq), slot2 + t1 * L + t2)

        for t1 in range(L):
            # j1 = 1: fold-by-2 fused into the inverse DFT.
            p = psi1_ref[0, t1]
            U1r, U1i = idft_c(Xr * p, Xi * p, Ghc, Ghs, nh)
            U1 = jnp.sqrt(U1r * U1r + U1i * U1i)
            Vr, Vi = fft2_real(U1, Ch, Sh)
            pool(idft_real(Vr * phi1_ref[0], Vi * phi1_ref[0],
                           Gq2c, Gq2s, nq), 1 + L + t1)

    return kernel


def _make_kernel_batched(L: int, n: int, n_coeffs: int,
                         precision: str = "default", B: int = 1):
    """Orientation- and image-batched kernel variant.

    Two batching axes fight the MXU's pipeline fill/drain overhead on these
    small (~128-point) transforms:

    * lanes — the L orientations are lane-concatenated into one (m, L*m)
      operand, so every row-side (left-multiply) DFT is a single wide MXU
      product instead of L narrow ones ("wide" layout, B=1);
    * sublanes — B images are additionally row-stacked into (B*m, L*m)
      operands, so every column-side (right-multiply) DFT runs once per
      orientation on a B*m-row operand instead of once per (image,
      orientation) on an m-row one ("tall" layout, B>=2).  Left-multiplies
      keep one matmul per image (their row dim is the transform dim), but
      the right-multiply count halves at B=2 with 2x taller operands.

    VMEM bounds B: live stacked buffers are (B*n, L*n) f32; at n=128, L=8
    that is B x 512 KB per buffer with ~8 concurrently live, so B=2 fits
    the ~16 MB VMEM budget and B>=4 generally does not.
    """
    from jax.experimental.pallas import tpu as pltpu

    nh, nq = n // 2, n // 4
    f32 = jnp.float32
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def kernel(x_ref, psi0_ref, psi1_ref, phi0_ref, phi1_ref,
               cn_ref, sn_ref, ch_ref, sh_ref,
               gqc_ref, gqs_ref, ghc_ref, ghs_ref, gq2c_ref, gq2s_ref,
               out_ref):
        C, S = cn_ref[0], sn_ref[0]
        Ch, Sh = ch_ref[0], sh_ref[0]
        Gqc, Gqs = gqc_ref[0], gqs_ref[0]
        Ghc, Ghs = ghc_ref[0], ghs_ref[0]
        Gq2c, Gq2s = gq2c_ref[0], gq2s_ref[0]

        def vstack(blocks):
            return blocks[0] if len(blocks) == 1 else jnp.concatenate(
                blocks, axis=0)

        def rtile(mat):
            """Row-tile a per-image constant across the B image blocks."""
            return mat if B == 1 else pltpu.repeat(mat, B, axis=0)

        # Lane-concatenated filter banks (built once per kernel instance),
        # row-tiled across the image blocks.
        psi0cat = rtile(jnp.concatenate([psi0_ref[0, t] for t in range(L)],
                                        axis=1))
        psi1cat = rtile(jnp.concatenate([psi1_ref[0, t] for t in range(L)],
                                        axis=1))
        phi0 = rtile(phi0_ref[0])                      # (B*n, n)
        ph0cat = rtile(pltpu.repeat(phi0_ref[0], L, axis=1))
        ph1cat = rtile(pltpu.repeat(phi1_ref[0], L, axis=1))

        def left_rows(Gc, Gs, Zr, Zi, m_in):
            """Per-image left-multiply of a row-stacked complex operand:
            (B*m_in, W) -> (B*m_out, W).  One matmul per image block."""
            ars, ais = [], []
            for b in range(B):
                zr = Zr[b * m_in:(b + 1) * m_in]
                zi = Zi[b * m_in:(b + 1) * m_in]
                ars.append(mm(Gc, zr) - mm(Gs, zi))
                ais.append(mm(Gc, zi) + mm(Gs, zr))
            return vstack(ars), vstack(ais)

        def right_cols_c(ar, ai, Gc, Gs, m_in, m_out, t):
            """Right-multiply of lane-block t — row-batched over all B
            images in one tall matmul."""
            sl_r = ar[:, t * m_in:(t + 1) * m_in]
            sl_i = ai[:, t * m_in:(t + 1) * m_in]
            return ((mm(sl_r, Gc.T) - mm(sl_i, Gs.T)) / f32(m_out * m_out),
                    (mm(sl_i, Gc.T) + mm(sl_r, Gs.T)) / f32(m_out * m_out))

        def pool(smap, slot, m_out):
            for b in range(B):
                out_ref[b, slot] = smap[b * m_out:(b + 1) * m_out]

        # fft2 of the B input images, row-stacked: (B*n, n) spectra.
        rr = vstack([mm(C, x_ref[b]) for b in range(B)])
        ri = vstack([-(mm(S, x_ref[b])) for b in range(B)])
        Xr = mm(rr, C) + mm(ri, S)
        Xi = mm(ri, C) - mm(rr, S)

        # S0: phi low-pass, fused fold-by-4 inverse DFT.
        ar0, ai0 = left_rows(Gqc, Gqs, Xr * phi0, Xi * phi0, n)
        pool((mm(ar0, Gqc.T) - mm(ai0, Gqs.T)) / f32(nq * nq), 0, nq)

        slot2 = 1 + 2 * L

        def order1_block(Gc, Gs, m1, Cm, Sm, psicat, phicat, Gq_c, Gq_s,
                         base_slot):
            """One j1 level for all t1: returns per-t1 row-stacked spectra
            (V) of the modulus fields at resolution m1."""
            Qr = pltpu.repeat(Xr, L, axis=1) * psicat
            Qi = pltpu.repeat(Xi, L, axis=1) * psicat
            ar, ai = left_rows(Gc, Gs, Qr, Qi, n)      # (B*m1, L*n)
            U1s = []
            for t in range(L):
                ur, ui = right_cols_c(ar, ai, Gc, Gs, n, m1, t)
                U1s.append(jnp.sqrt(ur * ur + ui * ui))
            U1cat = jnp.concatenate(U1s, axis=1)       # (B*m1, L*m1)
            a = vstack([mm(Cm, U1cat[b * m1:(b + 1) * m1])
                        for b in range(B)])
            bq = vstack([-(mm(Sm, U1cat[b * m1:(b + 1) * m1]))
                         for b in range(B)])
            Vr_blocks, Vi_blocks = [], []
            for t in range(L):
                sl = slice(t * m1, (t + 1) * m1)
                Vr_blocks.append(mm(a[:, sl], Cm) + mm(bq[:, sl], Sm))
                Vi_blocks.append(mm(bq[:, sl], Cm) - mm(a[:, sl], Sm))
            Vrcat = jnp.concatenate(Vr_blocks, axis=1)
            Vicat = jnp.concatenate(Vi_blocks, axis=1)
            # S1 pooling path.
            pr, pi = left_rows(Gq_c, Gq_s, Vrcat * phicat, Vicat * phicat,
                               m1)
            for t in range(L):
                sr, _si = right_cols_c(pr, pi, Gq_c, Gq_s, m1, nq, t)
                pool(sr, base_slot + t, nq)
            return Vr_blocks, Vi_blocks

        # j1 = 0 (full res) + order-2 children.
        Vr_blocks, Vi_blocks = order1_block(
            C, S, n, C, S, psi0cat, ph0cat, Gqc, Gqs, 1)
        for t1 in range(L):
            Vr, Vi = Vr_blocks[t1], Vi_blocks[t1]      # (B*n, n)
            Qr = pltpu.repeat(Vr, L, axis=1) * psi1cat
            Qi = pltpu.repeat(Vi, L, axis=1) * psi1cat
            ar, ai = left_rows(Ghc, Ghs, Qr, Qi, n)    # (B*nh, L*n)
            U2s = []
            for t2 in range(L):
                ur, ui = right_cols_c(ar, ai, Ghc, Ghs, n, nh, t2)
                U2s.append(jnp.sqrt(ur * ur + ui * ui))
            U2cat = jnp.concatenate(U2s, axis=1)       # (B*nh, L*nh)
            a = vstack([mm(Ch, U2cat[b * nh:(b + 1) * nh])
                        for b in range(B)])
            bq = vstack([-(mm(Sh, U2cat[b * nh:(b + 1) * nh]))
                         for b in range(B)])
            Wr_list, Wi_list = [], []
            for t2 in range(L):
                sl = slice(t2 * nh, (t2 + 1) * nh)
                Wr_list.append(mm(a[:, sl], Ch) + mm(bq[:, sl], Sh))
                Wi_list.append(mm(bq[:, sl], Ch) - mm(a[:, sl], Sh))
            Wrcat = jnp.concatenate(Wr_list, axis=1)
            Wicat = jnp.concatenate(Wi_list, axis=1)
            pr, pi = left_rows(Gq2c, Gq2s, Wrcat * ph1cat, Wicat * ph1cat,
                               nh)
            for t2 in range(L):
                sr, _si = right_cols_c(pr, pi, Gq2c, Gq2s, nh, nq, t2)
                pool(sr, slot2 + t1 * L + t2, nq)

        # j1 = 1.
        order1_block(Ghc, Ghs, nh, Ch, Sh, psi1cat, ph1cat,
                     Gq2c, Gq2s, 1 + L)

    return kernel


def _blockdiag(m: np.ndarray, g: int) -> np.ndarray:
    """g-fold block-diagonal replication of a 2-D matrix."""
    if g == 1:
        return np.asarray(m, np.float32)
    r, c = m.shape
    out = np.zeros((g * r, g * c), np.float32)
    for i in range(g):
        out[i * r:(i + 1) * r, i * c:(i + 1) * c] = m
    return out


def _bd_groups(n: int, L: int, B: int):
    """MXU-tile group factors for the block-diagonal layout.

    gL(m_in): images grouped per LEFT multiply so the contraction depth
    g*m_in fills the 128-deep MXU tile; gT(m_in, m_out): orientations
    grouped per RIGHT multiply so BOTH the contraction (g*m_in) and the
    output lanes (g*m_out) fill their 128 tiles.  Zero blocks issue the
    same FLOPs the tile padding would have wasted anyway — the win is
    g-fold fewer ops, each fully tile-utilized (e.g. the 32->16 pooling
    right-multiply at 64 px goes from 8 ops at 4x contraction + 8x lane
    waste to 1 op at none)."""
    nh, nq = n // 2, n // 4
    if n & (n - 1) or n < 16:
        raise ValueError(
            f"bd layout needs a power-of-2 padded grid (got n={n}); the "
            f"reflect boundary's 17*2^k grids stay on the wide/tall "
            f"layouts")

    def _floor_pow2(v):
        return 1 << (max(1, v).bit_length() - 1)

    def gL(m_in):
        # image-group factors must divide B (largest power of 2 in B)
        return min(B & -B, _floor_pow2(max(1, 128 // m_in)))

    def gT(m_in, m_out):
        # orientation-group factors must divide L (largest power of 2 in L)
        return min(L & -L,
                   _floor_pow2(max(1, 128 // m_in, 128 // m_out)))

    return {"gL_n": gL(n), "gL_h": gL(nh),
            "gT_nn": gT(n, n), "gT_hh": gT(nh, nh),
            "gT_nh": gT(n, nh), "gT_nq": gT(n, nq), "gT_hq": gT(nh, nq)}


def _build_bd_constants(consts, n: int, L: int, B: int):
    """Block-diagonal parameter set for :func:`_make_kernel_bd`."""
    c = {k: np.asarray(v, np.float32) for k, v in consts.items()}
    g = _bd_groups(n, L, B)
    nq = n // 4
    # In-kernel pooling reduction operators (pooled=True kernels): per
    # pooled block sr (B*nq, g*nq), (Opool @ sr) @ Qpool_g gives the
    # (B, g) per-(image, orientation) map sums on the MXU — the features
    # path then never materializes coefficient maps through HBM.
    opool = np.zeros((B, B * nq), np.float32)
    for b in range(B):
        opool[b, b * nq:(b + 1) * nq] = 1.0

    def qpool(gt):
        q = np.zeros((gt * nq, gt), np.float32)
        for t in range(gt):
            q[t * nq:(t + 1) * nq, t] = 1.0
        return q

    bd = {
        "Opool": opool,
        "Qpool_L": qpool(L),
        "Qpool_1": qpool(1),
        # elementwise banks + ungrouped fft-column / S0-right bases
        "psi0": c["psi0"], "psi1": c["psi1"],
        "phi0": c["phi0"], "phi1": c["phi1"],
        "c_n": c["c_n"], "s_n": c["s_n"],
        "gqT_c": c["gq_c"].T.copy(), "gqT_s": c["gq_s"].T.copy(),
        # LEFT (image-grouped) matrices: contraction = m_in
        "Lcn": _blockdiag(c["c_n"], g["gL_n"]),
        "Lsn": _blockdiag(c["s_n"], g["gL_n"]),
        "Lch": _blockdiag(c["c_h"], g["gL_h"]),
        "Lsh": _blockdiag(c["s_h"], g["gL_h"]),
        "Lgq_c": _blockdiag(c["gq_c"], g["gL_n"]),
        "Lgq_s": _blockdiag(c["gq_s"], g["gL_n"]),
        "Lgh_c": _blockdiag(c["gh_c"], g["gL_n"]),
        "Lgh_s": _blockdiag(c["gh_s"], g["gL_n"]),
        "Lgq2_c": _blockdiag(c["gq2_c"], g["gL_h"]),
        "Lgq2_s": _blockdiag(c["gq2_s"], g["gL_h"]),
        # RIGHT (orientation-grouped) transposed matrices
        "Rcn_c": _blockdiag(c["c_n"].T, g["gT_nn"]),
        "Rcn_s": _blockdiag(c["s_n"].T, g["gT_nn"]),
        "Rch_c": _blockdiag(c["c_h"].T, g["gT_hh"]),
        "Rch_s": _blockdiag(c["s_h"].T, g["gT_hh"]),
        "Rgh_c": _blockdiag(c["gh_c"].T, g["gT_nh"]),
        "Rgh_s": _blockdiag(c["gh_s"].T, g["gT_nh"]),
        "Rgq_c": _blockdiag(c["gq_c"].T, g["gT_nq"]),
        "Rgq_s": _blockdiag(c["gq_s"].T, g["gT_nq"]),
        "Rgq2_c": _blockdiag(c["gq2_c"].T, g["gT_hq"]),
        "Rgq2_s": _blockdiag(c["gq2_s"].T, g["gT_hq"]),
    }
    return {k: jnp.asarray(v, jnp.float32) for k, v in bd.items()}, g


BD_CONST_ORDER = [
    "psi0", "psi1", "phi0", "phi1", "c_n", "s_n", "gqT_c", "gqT_s",
    "Lcn", "Lsn", "Lch", "Lsh", "Lgq_c", "Lgq_s", "Lgh_c", "Lgh_s",
    "Lgq2_c", "Lgq2_s", "Rcn_c", "Rcn_s", "Rch_c", "Rch_s", "Rgh_c",
    "Rgh_s", "Rgq_c", "Rgq_s", "Rgq2_c", "Rgq2_s",
    "Opool", "Qpool_L", "Qpool_1"]


def _make_kernel_bd(L: int, n: int, n_coeffs: int, groups,
                    precision: str = "default", B: int = 4,
                    pooled: bool = False):
    """Block-diagonal MXU-tile-exact kernel variant ("bd" layout).

    Same tall image-stacking as :func:`_make_kernel_batched`, but every
    DFT matmul whose contraction or output-lane dimension underfills the
    128-point MXU tile is replaced by a grouped block-diagonal product
    that fills both exactly (see :func:`_bd_groups`).  On the 64-px
    periodic grid (n=64/32/16) this collapses the 2x/4x/8x tile padding
    of the plain tall layout; on the 128-px grid it recovers the
    second-order (nh=64) and pooling (nq=32) stages.
    """
    from jax.experimental.pallas import tpu as pltpu

    nh, nq = n // 2, n // 4
    f32 = jnp.float32
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    g = groups

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def mm_hi(a, b):
        # pooling reductions: f32-exact regardless of the cascade's bf16
        # default (these are tiny matmuls; the sums feed a mean/variance
        # difference where bf16 input quantization would dominate)
        return jnp.dot(a, b, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    idx = {k: i for i, k in enumerate(BD_CONST_ORDER)}

    def kernel(x_ref, *refs):
        if pooled:
            out_sum_ref, out_sq_ref = refs[-2], refs[-1]
            crefs = refs[:-2]
            pooled_blocks = {}          # base_slot -> ((B, g), (B, g))
        else:
            out_ref = refs[-1]
            crefs = refs[:-1]

        def R(name):
            return crefs[idx[name]][0]

        def vstack(blocks):
            return blocks[0] if len(blocks) == 1 else jnp.concatenate(
                blocks, axis=0)

        def rtile(mat):
            return mat if B == 1 else pltpu.repeat(mat, B, axis=0)

        psi0cat = rtile(jnp.concatenate(
            [crefs[idx["psi0"]][0, t] for t in range(L)], axis=1))
        psi1cat = rtile(jnp.concatenate(
            [crefs[idx["psi1"]][0, t] for t in range(L)], axis=1))
        phi0 = rtile(R("phi0"))
        ph0cat = rtile(pltpu.repeat(R("phi0"), L, axis=1))
        ph1cat = rtile(pltpu.repeat(R("phi1"), L, axis=1))

        def left_bd(Gc_bd, Gs_bd, Zr, Zi, m_in, m_out, gl):
            """(B*m_in, X) complex -> (B*m_out, X), image groups of gl."""
            ars, ais = [], []
            for q in range(B // gl):
                zr = Zr[q * gl * m_in:(q + 1) * gl * m_in]
                zi = Zi[q * gl * m_in:(q + 1) * gl * m_in]
                ars.append(mm(Gc_bd, zr) - mm(Gs_bd, zi))
                ais.append(mm(Gc_bd, zi) + mm(Gs_bd, zr))
            return vstack(ars), vstack(ais)

        def left_bd_real(Gc_bd, Gs_bd, U, m_in, gl):
            """Real operand: returns (Gc U, -Gs U) grouped."""
            ars, ais = [], []
            for q in range(B // gl):
                u = U[q * gl * m_in:(q + 1) * gl * m_in]
                ars.append(mm(Gc_bd, u))
                ais.append(-(mm(Gs_bd, u)))
            return vstack(ars), vstack(ais)

        def right_bd(ar, ai, GcT_bd, GsT_bd, m_in, m_out, gt, scale):
            """Lane-grouped right multiply over all L orientation blocks:
            (rows, L*m_in) -> (rows, L*m_out)."""
            outs_r, outs_i = [], []
            for q in range(L // gt):
                sl = slice(q * gt * m_in, (q + 1) * gt * m_in)
                a, b = ar[:, sl], ai[:, sl]
                outs_r.append((mm(a, GcT_bd) - mm(b, GsT_bd)) * scale)
                outs_i.append((mm(b, GcT_bd) + mm(a, GsT_bd)) * scale)
            cat_r = jnp.concatenate(outs_r, axis=1) if len(outs_r) > 1 \
                else outs_r[0]
            cat_i = jnp.concatenate(outs_i, axis=1) if len(outs_i) > 1 \
                else outs_i[0]
            return cat_r, cat_i

        def right_bd_fwd(ar, ai, GcT_bd, GsT_bd, m_in, m_out, gt):
            """Forward-DFT column side: (a+ib)(C - iS) = (aC+bS) +
            i(bC-aS) — the S signs flip vs the inverse helper."""
            outs_r, outs_i = [], []
            for q in range(L // gt):
                sl = slice(q * gt * m_in, (q + 1) * gt * m_in)
                a, b = ar[:, sl], ai[:, sl]
                outs_r.append(mm(a, GcT_bd) + mm(b, GsT_bd))
                outs_i.append(mm(b, GcT_bd) - mm(a, GsT_bd))
            cat_r = jnp.concatenate(outs_r, axis=1) if len(outs_r) > 1 \
                else outs_r[0]
            cat_i = jnp.concatenate(outs_i, axis=1) if len(outs_i) > 1 \
                else outs_i[0]
            return cat_r, cat_i

        def pool(srcat, base_slot, m_out):
            """srcat: (B*m_out, L*m_out) pooled maps, lane block per t.

            pooled=True reduces each (image, orientation) map to its sum
            and sum-of-squares ON THE MXU instead of storing maps:
            (Opool @ sr) @ Qpool collapses rows then lane blocks."""
            if pooled:
                O, Q = R("Opool"), R("Qpool_L")
                pooled_blocks[base_slot] = (
                    mm_hi(mm_hi(O, srcat), Q),
                    mm_hi(mm_hi(O, srcat * srcat), Q))
                return
            for b in range(B):
                rows = srcat[b * m_out:(b + 1) * m_out]
                for t in range(L):
                    out_ref[b, base_slot + t] = rows[:, t * m_out:
                                                     (t + 1) * m_out]

        # ---- fft2 of the B input images (rows grouped; cols ungrouped:
        # a single n-lane spectrum per image has no lateral partner) ----
        C, S = R("c_n"), R("s_n")
        xstack = vstack([x_ref[b] for b in range(B)])   # (B*n, n)
        rr, ri = left_bd_real(R("Lcn"), R("Lsn"), xstack, n, g["gL_n"])
        Xr = mm(rr, C) + mm(ri, S)
        Xi = mm(ri, C) - mm(rr, S)

        # ---- S0: phi low-pass, fold-4 iDFT (left grouped, right plain —
        # one tiny (B*nq, nq) output) ----
        ar0, ai0 = left_bd(R("Lgq_c"), R("Lgq_s"), Xr * phi0, Xi * phi0,
                           n, nq, g["gL_n"])
        s0 = (mm(ar0, R("gqT_c")) - mm(ai0, R("gqT_s"))) / f32(nq * nq)
        if pooled:
            O, Q1 = R("Opool"), R("Qpool_1")
            pooled_blocks[0] = (mm_hi(mm_hi(O, s0), Q1),
                                mm_hi(mm_hi(O, s0 * s0), Q1))
        else:
            for b in range(B):
                out_ref[b, 0] = s0[b * nq:(b + 1) * nq]

        slot2 = 1 + 2 * L

        def order1_block(Lc, Ls, RcT, RsT, gt_inv, m1, LCm, LSm, gl_m,
                         RCmT, RSmT, gt_sp, psicat, phicat,
                         Lq_c, Lq_s, RqT_c, RqT_s, gt_q, base_slot):
            """One j1 level for all t1 -> per-t1 V spectra lane-cat."""
            Qr = pltpu.repeat(Xr, L, axis=1) * psicat
            Qi = pltpu.repeat(Xi, L, axis=1) * psicat
            ar, ai = left_bd(Lc, Ls, Qr, Qi, n, m1, g["gL_n"])
            ur, ui = right_bd(ar, ai, RcT, RsT, n, m1, gt_inv,
                              f32(1.0 / (m1 * m1)))
            U1cat = jnp.sqrt(ur * ur + ui * ui)        # (B*m1, L*m1)
            a, bq = left_bd_real(LCm, LSm, U1cat, m1, gl_m)
            Vr, Vi = right_bd_fwd(a, bq, RCmT, RSmT, m1, m1, gt_sp)
            # S1 pooling
            pr, pi = left_bd(Lq_c, Lq_s, Vr * phicat, Vi * phicat,
                             m1, nq, gl_m)
            sr, _si = right_bd(pr, pi, RqT_c, RqT_s, m1, nq, gt_q,
                               f32(1.0 / (nq * nq)))
            pool(sr, base_slot, nq)
            return Vr, Vi

        # j1 = 0 (full res) + its order-2 children.
        Vr, Vi = order1_block(
            R("Lcn"), R("Lsn"), R("Rcn_c"), R("Rcn_s"), g["gT_nn"],
            n, R("Lcn"), R("Lsn"), g["gL_n"], R("Rcn_c"), R("Rcn_s"),
            g["gT_nn"], psi0cat, ph0cat,
            R("Lgq_c"), R("Lgq_s"), R("Rgq_c"), R("Rgq_s"), g["gT_nq"], 1)
        for t1 in range(L):
            Vr1 = Vr[:, t1 * n:(t1 + 1) * n]           # (B*n, n)
            Vi1 = Vi[:, t1 * n:(t1 + 1) * n]
            Qr = pltpu.repeat(Vr1, L, axis=1) * psi1cat
            Qi = pltpu.repeat(Vi1, L, axis=1) * psi1cat
            ar, ai = left_bd(R("Lgh_c"), R("Lgh_s"), Qr, Qi, n, nh,
                             g["gL_n"])
            ur, ui = right_bd(ar, ai, R("Rgh_c"), R("Rgh_s"), n, nh,
                              g["gT_nh"], f32(1.0 / (nh * nh)))
            U2cat = jnp.sqrt(ur * ur + ui * ui)        # (B*nh, L*nh)
            a, bq = left_bd_real(R("Lch"), R("Lsh"), U2cat, nh, g["gL_h"])
            Wr, Wi = right_bd_fwd(a, bq, R("Rch_c"), R("Rch_s"), nh, nh,
                                  g["gT_hh"])
            pr, pi = left_bd(R("Lgq2_c"), R("Lgq2_s"), Wr * ph1cat,
                             Wi * ph1cat, nh, nq, g["gL_h"])
            sr, _si = right_bd(pr, pi, R("Rgq2_c"), R("Rgq2_s"), nh, nq,
                               g["gT_hq"], f32(1.0 / (nq * nq)))
            pool(sr, slot2 + t1 * L, nq)

        # j1 = 1.
        order1_block(
            R("Lgh_c"), R("Lgh_s"), R("Rgh_c"), R("Rgh_s"), g["gT_nh"],
            nh, R("Lch"), R("Lsh"), g["gL_h"], R("Rch_c"), R("Rch_s"),
            g["gT_hh"], psi1cat, ph1cat,
            R("Lgq2_c"), R("Lgq2_s"), R("Rgq2_c"), R("Rgq2_s"),
            g["gT_hq"], 1 + L)

        if pooled:
            # Lane-concatenate the per-stage (B, width) sum blocks in slot
            # order -> (B, n_coeffs), pad lanes to 128, one 2-D store each.
            order = sorted(pooled_blocks)
            Tcat = jnp.concatenate([pooled_blocks[s][0] for s in order],
                                   axis=1)
            SQcat = jnp.concatenate([pooled_blocks[s][1] for s in order],
                                    axis=1)
            padlanes = 128 - Tcat.shape[1]
            if padlanes:
                z = jnp.zeros((B, padlanes), f32)
                Tcat = jnp.concatenate([Tcat, z], axis=1)
                SQcat = jnp.concatenate([SQcat, z], axis=1)
            if B < 8:
                # Mosaic requires store blocks with >= 8 sublanes: row-pad
                # the (B, 128) stats to (8, 128); the host slices rows :B.
                zr = jnp.zeros((8 - B, 128), f32)
                Tcat = jnp.concatenate([Tcat, zr], axis=0)
                SQcat = jnp.concatenate([SQcat, zr], axis=0)
            out_sum_ref[...] = Tcat
            out_sq_ref[...] = SQcat

    return kernel


@functools.lru_cache(maxsize=8)
def _compiled(L: int, H: int, W: int, precision: str = "default",
              boundary: str = "reflect", layout: str = "wide"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bank, consts = _build_constants(2, L, H, W, boundary)
    n = bank.M_pad
    nh, nq = n // 2, n // 4
    K = bank.n_coeffs
    bd_params = None
    if layout == "narrow":
        kernel, B = _make_kernel(L, n, K, precision), 1
    elif layout == "wide":
        kernel, B = _make_kernel_batched(L, n, K, precision, B=1), 1
    elif layout.startswith("tall"):
        B = int(layout[4:] or 2)
        kernel = _make_kernel_batched(L, n, K, precision, B=B)
    elif layout.startswith("bd"):
        B = int(layout[2:] or 4)
        bd_params, groups = _build_bd_constants(
            {k: np.asarray(v) for k, v in consts.items()}, n, L, B)
        kernel = _make_kernel_bd(L, n, K, groups, precision, B=B)
    else:
        raise ValueError(f"unknown layout: {layout!r}")
    del nh  # only nq appears in the output spec

    def bcast_spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (0,) * (nd + 1),
                            memory_space=pltpu.VMEM)

    const_order = BD_CONST_ORDER if bd_params is not None else [
        "psi0", "psi1", "phi0", "phi1", "c_n", "s_n", "c_h",
        "s_h", "gq_c", "gq_s", "gh_c", "gh_s", "gq2_c", "gq2_s"]
    params_src = bd_params if bd_params is not None else consts

    def _compiler_params():
        try:
            # The 16 MB scoped-VMEM compiler default is what capped the
            # tall layout at B=2; the physical budget is larger (same cap
            # policy as fused_general — overridable via WST_PALLAS_VMEM_MB).
            import os
            cap_mb = int(os.environ.get("WST_PALLAS_VMEM_MB", "96"))
            return {"compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=cap_mb * 1024 * 1024)}
        except (TypeError, ValueError):  # pragma: no cover - older jax
            return {}

    def run(xpad, params):
        nb = xpad.shape[0]
        pad_b = (-nb) % B
        if pad_b:
            xpad = jnp.pad(xpad, ((0, pad_b), (0, 0), (0, 0)))
        grid_spec = pl.GridSpec(
            grid=((nb + pad_b) // B,),
            in_specs=[pl.BlockSpec((B, n, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [bcast_spec(tuple(params[k].shape)) for k in const_order],
            out_specs=pl.BlockSpec((B, K, nq, nq),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb + pad_b, K, nq, nq),
                                           jnp.float32),
            interpret=_interpret_mode(),
            **_compiler_params(),
        )(xpad, *[params[k][None] for k in const_order])
        return out[:nb] if pad_b else out

    kernel_pooled = None
    if bd_params is not None:
        kernel_pooled = _make_kernel_bd(L, n, K, groups, precision, B=B,
                                        pooled=True)

    def run_pooled(xpad, params):
        """bd-only fully-fused path: per-coefficient map SUM and SUMSQ
        computed on the MXU inside the kernel — the features path never
        materializes the (K, nq, nq) coefficient maps through HBM (they
        were ~45% of the e2e HBM traffic and the XLA mean/std fusions
        ~19% of module time in the round-5 trace)."""
        nb = xpad.shape[0]
        pad_b = (-nb) % B
        if pad_b:
            xpad = jnp.pad(xpad, ((0, pad_b), (0, 0), (0, 0)))
        ngrid = (nb + pad_b) // B
        rows = max(B, 8)               # stats blocks row-padded to 8
        out_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(ngrid,),
            in_specs=[pl.BlockSpec((B, n, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [bcast_spec(tuple(params[k].shape)) for k in const_order],
            out_specs=[out_spec, out_spec],
        )
        struct = jax.ShapeDtypeStruct((ngrid * rows, 128), jnp.float32)
        s, sq = pl.pallas_call(
            kernel_pooled,
            grid_spec=grid_spec,
            out_shape=[struct, struct],
            interpret=_interpret_mode(),
            **_compiler_params(),
        )(xpad, *[params[k][None] for k in const_order])
        if rows != B:                  # drop the per-block row padding
            s = s.reshape(ngrid, rows, 128)[:, :B].reshape(-1, 128)
            sq = sq.reshape(ngrid, rows, 128)[:, :B].reshape(-1, 128)
        return (s[:nb], sq[:nb]) if pad_b else (s, sq)

    pad_h, pad_w = bank.pad_h, bank.pad_w

    def _prep(x):
        if pad_h == 0 and pad_w == 0:
            return x
        return jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w)),
                       mode="reflect")

    def _crop(maps):
        return maps[..., 1:-1, 1:-1] if bank.boundary == "reflect" else maps

    if kernel_pooled is not None:
        # bd layouts are periodic-only (no crop), so in-kernel pooled
        # sums are exact over the full maps.
        npix = jnp.float32(nq * nq)

        @jax.jit
        def features(x, params):
            """x: (B, H, W) float32 -> (B, 2K) [means then stds]."""
            s, sq = run_pooled(_prep(x), params)
            mean = s[:, :K] / npix
            var = jnp.maximum(sq[:, :K] / npix - mean * mean, 0.0)
            return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
    else:
        @jax.jit
        def features(x, params):
            """x: (B, H, W) float32 -> (B, 2K) [means then stds]."""
            maps = _crop(run(_prep(x), params))
            mean = jnp.mean(maps, axis=(-2, -1))
            std = jnp.std(maps, axis=(-2, -1))
            return jnp.concatenate([mean, std], axis=-1)

    @jax.jit
    def coeff_maps(x, params):
        """x: (B, H, W) -> (B, K, h, w) unpadded coefficient maps."""
        return _crop(run(_prep(x), params))

    features.coeff_maps = coeff_maps
    return features, params_src, bank


class FusedScatteringJ2:
    """Pallas-fused J=2 scattering feature extractor (pooled mean/std)."""

    def __init__(self, L: int, H: int, W: int, precision: str = "default",
                 boundary: str = "reflect", layout: str = "wide"):
        self._features, self._params, self.bank = _compiled(
            L, H, W, precision, boundary, layout)

    @property
    def n_coeffs(self) -> int:
        return self.bank.n_coeffs

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., H, W) -> (..., 2 * n_coeffs)."""
        lead = x.shape[:-2]
        xb = x.reshape((-1,) + x.shape[-2:]).astype(jnp.float32)
        out = self._features(xb, self._params)
        return out.reshape(lead + (out.shape[-1],))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., H, W) -> (..., n_coeffs, h, w) coefficient maps."""
        lead = x.shape[:-2]
        xb = x.reshape((-1,) + x.shape[-2:]).astype(jnp.float32)
        out = self._features.coeff_maps(xb, self._params)
        return out.reshape(lead + out.shape[1:])


def fused_scattering_j2(L: int, H: int, W: int,
                        precision: str = "default",
                        boundary: str = "reflect",
                        layout: str = "wide") -> FusedScatteringJ2:
    return FusedScatteringJ2(L, H, W, precision, boundary, layout)
