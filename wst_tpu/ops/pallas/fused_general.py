"""General-J fused Pallas TPU kernel for the order-2 scattering cascade.

Extends the J=2 kernel of ``fused_scattering.py`` (D4) to arbitrary depth —
the BASELINE "deep scattering" configuration (J=4, L=8, 128x128) runs the
whole 417-coefficient cascade per image inside one grid program with every
intermediate resident in VMEM, instead of the XLA path's per-stage HBM
round-trips (the measured bottleneck at J=4).

Layout follows the tuned J=2 "wide"/"tall" kernels: the L orientations are
lane-concatenated so row-side DFTs are single wide MXU products, and
(optionally) B images are sublane-stacked so column-side DFTs run on taller
operands.  Fourier-domain subsampling (fold by 2**d) is fused into the
inverse-DFT matrices per (resolution, fold) pair, so the kernel is pure 2-D
matmul + elementwise (Mosaic cannot lower >2-D reshapes).

Coefficient ordering matches ``build_path_meta`` — zeroth; order-1 by
(j1, theta1); order-2 by (j1, theta1, j2 > j1, theta2) — i.e. the reference
engine's feature indices (reference: src/training/train_and_save_model.py:
400-427).  The J=2 specialization of this kernel is numerically identical to
``fused_scattering_j2``; that tuned variant remains the J=2 default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wst_tpu.ops.filter_bank import get_filter_bank
from wst_tpu.ops.scattering import _dft_mats
from wst_tpu.ops.pallas.fused_scattering import _fold_mat, _interpret_mode


def _build_constants(J: int, L: int, H: int, W: int, boundary: str):
    """Filter banks + per-resolution DFT / fused fold-iDFT matrices.

    Returns (bank, {name: f32 array}, ordered name list).  Matrices:

    * ``psi_{j}_{res}`` : (L, m, m) Morlet bank of scale j periodized to
      resolution ``res`` (order-1 uses res 0; order-2 scale j2 applies at
      the res j1 of its parent).
    * ``phi_{res}``     : (m, m) low-pass at each resolution.
    * ``c_{r}, s_{r}``  : m-point DFT cos/sin matrices, m = n >> r.
    * ``g_{r}_{d}_{c,s}``: (m>>d, m) fold-by-2**d fused inverse-DFT factors
      ``C_{m>>d} @ P`` with ``P = tile(I)/2**d``.
    """
    bank = get_filter_bank(J, L, H, W, 2, boundary)
    n = bank.M_pad
    assert bank.N_pad == n, "kernel assumes square padded grid"
    consts = {}
    for (j, res), v in bank.psi_f.items():
        consts[f"psi_{j}_{res}"] = v
    for res, v in bank.phi_f.items():
        consts[f"phi_{res}"] = v
    for r in range(J):
        m = n >> r
        c, s = _dft_mats(m)
        consts[f"c_{r}"], consts[f"s_{r}"] = c, s
        for d in range(1, J - r + 1):
            p = _fold_mat(m, 1 << d)
            cc, ss = _dft_mats(m >> d)
            consts[f"g_{r}_{d}_c"] = cc @ p
            consts[f"g_{r}_{d}_s"] = ss @ p
    names = sorted(consts)
    return bank, {k: jnp.asarray(v, jnp.float32) for k, v in consts.items()}, names


def _make_kernel(J: int, L: int, n: int, meta, const_names,
                 precision: str = "default", B: int = 1):
    from jax.experimental.pallas import tpu as pltpu

    no = n >> J                                    # output map resolution
    f32 = jnp.float32
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    slot = {p: i for i, p in enumerate(meta.paths)}

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        cref = dict(zip(const_names, refs[:-1]))

        def R(name):
            return cref[name][0]

        def vstack(blocks):
            return blocks[0] if len(blocks) == 1 else jnp.concatenate(
                blocks, axis=0)

        def rtile(mat):
            return mat if B == 1 else pltpu.repeat(mat, B, axis=0)

        def g(r, d):
            if d == 0:
                return R(f"c_{r}"), R(f"s_{r}")
            return R(f"g_{r}_{d}_c"), R(f"g_{r}_{d}_s")

        def psicat(j, res):
            filts = R(f"psi_{j}_{res}")
            return rtile(jnp.concatenate([filts[t] for t in range(L)],
                                         axis=1))

        def phicat(res):
            return rtile(pltpu.repeat(R(f"phi_{res}"), L, axis=1))

        def left_rows(Gc, Gs, Zr, Zi, m_in):
            """Per-image left-multiply of a row-stacked complex operand."""
            ars, ais = [], []
            for b in range(B):
                zr = Zr[b * m_in:(b + 1) * m_in]
                zi = Zi[b * m_in:(b + 1) * m_in]
                ars.append(mm(Gc, zr) - mm(Gs, zi))
                ais.append(mm(Gc, zi) + mm(Gs, zr))
            return vstack(ars), vstack(ais)

        def right_cols_c(ar, ai, Gc, Gs, m_in, m_out, t):
            """Right-multiply of lane-block t, row-batched over B images."""
            sl_r = ar[:, t * m_in:(t + 1) * m_in]
            sl_i = ai[:, t * m_in:(t + 1) * m_in]
            return ((mm(sl_r, Gc.T) - mm(sl_i, Gs.T)) / f32(m_out * m_out),
                    (mm(sl_i, Gc.T) + mm(sl_r, Gs.T)) / f32(m_out * m_out))

        def pool(smap, k):
            for b in range(B):
                out_ref[b, k] = smap[b * no:(b + 1) * no]

        def wavelet_layer(Zr, Zi, psic, Gc, Gs, Cm, Sm, m_in, m_out):
            """|ifft(fold_{m_in/m_out}(Z * psi))| for all L orientations,
            returning the per-orientation spectra of the modulus fields."""
            Qr = pltpu.repeat(Zr, L, axis=1) * psic
            Qi = pltpu.repeat(Zi, L, axis=1) * psic
            ar, ai = left_rows(Gc, Gs, Qr, Qi, m_in)   # (B*m_out, L*m_in)
            Us = []
            for t in range(L):
                ur, ui = right_cols_c(ar, ai, Gc, Gs, m_in, m_out, t)
                Us.append(jnp.sqrt(ur * ur + ui * ui))
            Ucat = jnp.concatenate(Us, axis=1)         # (B*m_out, L*m_out)
            a = vstack([mm(Cm, Ucat[b * m_out:(b + 1) * m_out])
                        for b in range(B)])
            bq = vstack([-(mm(Sm, Ucat[b * m_out:(b + 1) * m_out]))
                         for b in range(B)])
            Vr_blocks, Vi_blocks = [], []
            for t in range(L):
                sl = slice(t * m_out, (t + 1) * m_out)
                Vr_blocks.append(mm(a[:, sl], Cm) + mm(bq[:, sl], Sm))
                Vi_blocks.append(mm(bq[:, sl], Cm) - mm(a[:, sl], Sm))
            return Vr_blocks, Vi_blocks

        def pool_layer(Vr_blocks, Vi_blocks, phic, res, m_in, slots):
            """phi low-pass + fold to the output resolution, one lane-wide
            matmul pass for all L orientations; pooled maps -> out slots."""
            Gc, Gs = g(res, J - res)
            Vrcat = jnp.concatenate(Vr_blocks, axis=1)
            Vicat = jnp.concatenate(Vi_blocks, axis=1)
            pr, pi = left_rows(Gc, Gs, Vrcat * phic, Vicat * phic, m_in)
            for t in range(L):
                sr, _si = right_cols_c(pr, pi, Gc, Gs, m_in, no, t)
                pool(sr, slots[t])

        # fft2 of the B input images, row-stacked: (B*n, n) spectra.
        C0, S0 = R("c_0"), R("s_0")
        rr = vstack([mm(C0, x_ref[b]) for b in range(B)])
        ri = vstack([-(mm(S0, x_ref[b])) for b in range(B)])
        Xr = mm(rr, C0) + mm(ri, S0)
        Xi = mm(ri, C0) - mm(rr, S0)

        # S0: phi low-pass, fold-by-2**J fused inverse DFT.
        phi0 = rtile(R("phi_0"))
        Gc, Gs = g(0, J)
        ar0, ai0 = left_rows(Gc, Gs, Xr * phi0, Xi * phi0, n)
        pool((mm(ar0, Gc.T) - mm(ai0, Gs.T)) / f32(no * no), 0)

        for j1 in range(J):
            m1 = n >> j1
            Gc1, Gs1 = g(0, j1)
            V1r, V1i = wavelet_layer(Xr, Xi, psicat(j1, 0), Gc1, Gs1,
                                     R(f"c_{j1}"), R(f"s_{j1}"), n, m1)
            pool_layer(V1r, V1i, phicat(j1), j1, m1,
                       [slot[(1, j1, t1, -1, -1)] for t1 in range(L)])
            for j2 in range(j1 + 1, J):
                m2 = n >> j2
                psic2 = psicat(j2, j1)
                phic2 = phicat(j2)
                Gc2, Gs2 = g(j1, j2 - j1)
                Cm2, Sm2 = R(f"c_{j2}"), R(f"s_{j2}")
                for t1 in range(L):
                    V2r, V2i = wavelet_layer(V1r[t1], V1i[t1], psic2,
                                             Gc2, Gs2, Cm2, Sm2, m1, m2)
                    pool_layer(V2r, V2i, phic2, j2, m2,
                               [slot[(2, j1, t1, j2, t2)]
                                for t2 in range(L)])

    return kernel


def _bd_groups_general(n: int, J: int, L: int, B: int):
    """MXU-tile group factors per (resolution r, fold d) — same tile
    logic as ``fused_scattering._bd_groups`` generalized to J levels."""
    if n & (n - 1) or n < 16:
        raise ValueError(
            f"bd layout needs a power-of-2 padded grid (got n={n}); the "
            f"reflect boundary's 17*2^k grids stay on the wide/tall "
            f"layouts")

    def fp2(v):
        return 1 << (max(1, v).bit_length() - 1)

    gl, gt = {}, {}
    for r in range(J):
        m = n >> r
        for d in range(0, J - r + 1):
            gl[(r, d)] = min(B & -B, fp2(max(1, 128 // m)))
            gt[(r, d)] = min(L & -L,
                             fp2(max(1, 128 // m, 128 // (m >> d))))
    return gl, gt


def _build_bd_constants_general(consts, n: int, J: int, L: int, B: int):
    """Block-diagonal parameter set for the general-J bd kernel."""
    from wst_tpu.ops.pallas.fused_scattering import _blockdiag

    c = {k: np.asarray(v, np.float32) for k, v in consts.items()}
    gl, gt = _bd_groups_general(n, J, L, B)
    no = n >> J
    bd = {k: v for k, v in c.items()
          if k.startswith("psi_") or k.startswith("phi_")}
    bd["c_0"], bd["s_0"] = c["c_0"], c["s_0"]     # ungrouped fft col side
    # ungrouped S0 right side (single lane block)
    bd["s0T_c"] = c[f"g_0_{J}_c"].T.copy()
    bd["s0T_s"] = c[f"g_0_{J}_s"].T.copy()
    for r in range(J):
        for d in range(0, J - r + 1):
            if d == 0:
                mc, ms = c[f"c_{r}"], c[f"s_{r}"]
            else:
                mc, ms = c[f"g_{r}_{d}_c"], c[f"g_{r}_{d}_s"]
            bd[f"bL_{r}_{d}_c"] = _blockdiag(mc, gl[(r, d)])
            bd[f"bL_{r}_{d}_s"] = _blockdiag(ms, gl[(r, d)])
            bd[f"bR_{r}_{d}_c"] = _blockdiag(mc.T, gt[(r, d)])
            bd[f"bR_{r}_{d}_s"] = _blockdiag(ms.T, gt[(r, d)])
    # pooled-stats reduction operators
    opool = np.zeros((B, B * no), np.float32)
    for b in range(B):
        opool[b, b * no:(b + 1) * no] = 1.0
    qL = np.zeros((L * no, L), np.float32)
    for t in range(L):
        qL[t * no:(t + 1) * no, t] = 1.0
    bd["Opool"] = opool
    bd["Qpool_L"] = qL
    bd["Qpool_1"] = np.ones((no, 1), np.float32)
    names = sorted(bd)
    return ({k: jnp.asarray(v, jnp.float32) for k, v in bd.items()},
            names, (gl, gt))


def _make_kernel_bd(J: int, L: int, n: int, meta, const_names, groups,
                    precision: str = "default", B: int = 8,
                    pooled: bool = False):
    """Block-diagonal MXU-tile-exact general-J kernel (see the J=2
    variant in ``fused_scattering._make_kernel_bd`` for the tile logic;
    this one generalizes the group factors per (resolution, fold) pair).
    ``pooled=True`` reduces every coefficient map to sum/sumsq on the MXU
    and emits two (B, lanes) stat rows instead of maps."""
    from jax.experimental.pallas import tpu as pltpu

    no = n >> J
    f32 = jnp.float32
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    slot = {p: i for i, p in enumerate(meta.paths)}
    gl_map, gt_map = groups
    K = len(meta.paths)
    lanes = ((K + 127) // 128) * 128
    rows_out = max(B, 8)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32, precision=prec)

    def mm_hi(a, b):
        return jnp.dot(a, b, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    def kernel(x_ref, *refs):
        if pooled:
            out_sum_ref, out_sq_ref = refs[-2], refs[-1]
            crefs = dict(zip(const_names, refs[:-2]))
            blocks = {}
        else:
            out_ref = refs[-1]
            crefs = dict(zip(const_names, refs[:-1]))

        def R(name):
            return crefs[name][0]

        def vstack(bs):
            return bs[0] if len(bs) == 1 else jnp.concatenate(bs, axis=0)

        def lcat(bs):
            return bs[0] if len(bs) == 1 else jnp.concatenate(bs, axis=1)

        def rtile(mat):
            return mat if B == 1 else pltpu.repeat(mat, B, axis=0)

        def psicat(j, res):
            filts = R(f"psi_{j}_{res}")
            return rtile(jnp.concatenate([filts[t] for t in range(L)],
                                         axis=1))

        def phicat(res):
            return rtile(pltpu.repeat(R(f"phi_{res}"), L, axis=1))

        def left_bd(r, d, Zr, Zi):
            m_in = n >> r
            gl = gl_map[(r, d)]
            Gc, Gs = R(f"bL_{r}_{d}_c"), R(f"bL_{r}_{d}_s")
            ars, ais = [], []
            for q in range(B // gl):
                zr = Zr[q * gl * m_in:(q + 1) * gl * m_in]
                zi = Zi[q * gl * m_in:(q + 1) * gl * m_in]
                ars.append(mm(Gc, zr) - mm(Gs, zi))
                ais.append(mm(Gc, zi) + mm(Gs, zr))
            return vstack(ars), vstack(ais)

        def left_bd_real(r, U):
            m_in = n >> r
            gl = gl_map[(r, 0)]
            Gc, Gs = R(f"bL_{r}_0_c"), R(f"bL_{r}_0_s")
            ars, ais = [], []
            for q in range(B // gl):
                u = U[q * gl * m_in:(q + 1) * gl * m_in]
                ars.append(mm(Gc, u))
                ais.append(-(mm(Gs, u)))
            return vstack(ars), vstack(ais)

        def right_bd(r, d, ar, ai, scale):
            m_in = n >> r
            gt = gt_map[(r, d)]
            GcT, GsT = R(f"bR_{r}_{d}_c"), R(f"bR_{r}_{d}_s")
            outs_r, outs_i = [], []
            for q in range(L // gt):
                sl = slice(q * gt * m_in, (q + 1) * gt * m_in)
                a, b = ar[:, sl], ai[:, sl]
                outs_r.append((mm(a, GcT) - mm(b, GsT)) * scale)
                outs_i.append((mm(b, GcT) + mm(a, GsT)) * scale)
            return lcat(outs_r), lcat(outs_i)

        def right_bd_fwd(r, ar, ai):
            # forward-DFT column side: (a+ib)(C-iS) = (aC+bS)+i(bC-aS)
            m_in = n >> r
            gt = gt_map[(r, 0)]
            GcT, GsT = R(f"bR_{r}_0_c"), R(f"bR_{r}_0_s")
            outs_r, outs_i = [], []
            for q in range(L // gt):
                sl = slice(q * gt * m_in, (q + 1) * gt * m_in)
                a, b = ar[:, sl], ai[:, sl]
                outs_r.append(mm(a, GcT) + mm(b, GsT))
                outs_i.append(mm(b, GcT) - mm(a, GsT))
            return lcat(outs_r), lcat(outs_i)

        def wavelet_layer(Zr, Zi, psic, r_in, d):
            """|ifft(fold(Z * psi))| for all L orientations -> forward
            spectra of the modulus fields, lane-concatenated."""
            m_out = n >> (r_in + d)
            Qr = pltpu.repeat(Zr, L, axis=1) * psic
            Qi = pltpu.repeat(Zi, L, axis=1) * psic
            ar, ai = left_bd(r_in, d, Qr, Qi)
            ur, ui = right_bd(r_in, d, ar, ai, f32(1.0 / (m_out * m_out)))
            Ucat = jnp.sqrt(ur * ur + ui * ui)     # (B*m_out, L*m_out)
            a, bq = left_bd_real(r_in + d, Ucat)
            return right_bd_fwd(r_in + d, a, bq)

        def pool_layer(Vrcat, Vicat, phic, res, base_slot):
            """phi low-pass + fold to output resolution for all L
            orientations; maps stored (or MXU-reduced when pooled)."""
            d = J - res
            pr, pi = left_bd(res, d, Vrcat * phic, Vicat * phic)
            sr, _si = right_bd(res, d, pr, pi, f32(1.0 / (no * no)))
            if pooled:
                O, Q = R("Opool"), R("Qpool_L")
                blocks[base_slot] = (mm_hi(mm_hi(O, sr), Q),
                                     mm_hi(mm_hi(O, sr * sr), Q))
                return
            for b in range(B):
                rows = sr[b * no:(b + 1) * no]
                for t in range(L):
                    out_ref[b, base_slot + t] = rows[:, t * no:
                                                     (t + 1) * no]

        # fft2 of the B input images (rows grouped; cols ungrouped).
        C0, S0 = R("c_0"), R("s_0")
        xstack = vstack([x_ref[b] for b in range(B)])
        rr, ri = left_bd_real(0, xstack)
        Xr = mm(rr, C0) + mm(ri, S0)
        Xi = mm(ri, C0) - mm(rr, S0)

        # S0: phi low-pass, fold-by-2**J iDFT (right side ungrouped).
        phi0 = rtile(R("phi_0"))
        ar0, ai0 = left_bd(0, J, Xr * phi0, Xi * phi0)
        s0 = (mm(ar0, R("s0T_c")) - mm(ai0, R("s0T_s"))) / f32(no * no)
        if pooled:
            O, Q1 = R("Opool"), R("Qpool_1")
            blocks[0] = (mm_hi(mm_hi(O, s0), Q1),
                         mm_hi(mm_hi(O, s0 * s0), Q1))
        else:
            for b in range(B):
                out_ref[b, 0] = s0[b * no:(b + 1) * no]

        for j1 in range(J):
            m1 = n >> j1
            V1r, V1i = wavelet_layer(Xr, Xi, psicat(j1, 0), 0, j1)
            pool_layer(V1r, V1i, phicat(j1), j1,
                       slot[(1, j1, 0, -1, -1)])
            for j2 in range(j1 + 1, J):
                psic2 = psicat(j2, j1)
                phic2 = phicat(j2)
                for t1 in range(L):
                    Z1r = V1r[:, t1 * m1:(t1 + 1) * m1]
                    Z1i = V1i[:, t1 * m1:(t1 + 1) * m1]
                    V2r, V2i = wavelet_layer(Z1r, Z1i, psic2, j1, j2 - j1)
                    pool_layer(V2r, V2i, phic2, j2,
                               slot[(2, j1, t1, j2, 0)])

        if pooled:
            order = sorted(blocks)
            Tcat = lcat([blocks[s][0] for s in order])
            SQcat = lcat([blocks[s][1] for s in order])
            padlanes = lanes - Tcat.shape[1]
            if padlanes:
                z = jnp.zeros((B, padlanes), f32)
                Tcat = jnp.concatenate([Tcat, z], axis=1)
                SQcat = jnp.concatenate([SQcat, z], axis=1)
            if B < rows_out:
                zr = jnp.zeros((rows_out - B, lanes), f32)
                Tcat = jnp.concatenate([Tcat, zr], axis=0)
                SQcat = jnp.concatenate([SQcat, zr], axis=0)
            out_sum_ref[...] = Tcat
            out_sq_ref[...] = SQcat

    return kernel


@functools.lru_cache(maxsize=8)
def _compiled(J: int, L: int, H: int, W: int, precision: str = "default",
              boundary: str = "reflect", layout: str = "wide"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bank, consts, const_names = _build_constants(J, L, H, W, boundary)
    n = bank.M_pad
    no = n >> J
    K = bank.n_coeffs
    bd = False
    if layout == "wide":
        B = 1
    elif layout.startswith("tall"):
        B = int(layout[4:] or 2)
    elif layout.startswith("bd"):
        B = int(layout[2:] or 8)
        bd = True
    else:
        raise ValueError(f"unknown layout: {layout!r}")
    if bd:
        params_src, const_names, groups = _build_bd_constants_general(
            {k: np.asarray(v) for k, v in consts.items()}, n, J, L, B)
        kernel = _make_kernel_bd(J, L, n, bank.meta, const_names, groups,
                                 precision, B, pooled=False)
        kernel_pooled = _make_kernel_bd(J, L, n, bank.meta, const_names,
                                        groups, precision, B, pooled=True)
    else:
        params_src = consts
        kernel = _make_kernel(J, L, n, bank.meta, const_names, precision,
                              B)
        kernel_pooled = None

    def bcast_spec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape, lambda i: (0,) * (nd + 1),
                            memory_space=pltpu.VMEM)

    def _compiler_params():
        try:
            # Deep grids and tall image-stacks exceed the 16 MB scoped-VMEM
            # compiler default (J=4 reflect-wide needs ~17 MB, tall4 ~57 MB);
            # the physical budget is larger, so raise the cap.
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
            + [bcast_spec(tuple(params[k].shape)) for k in const_names],
            out_specs=pl.BlockSpec((B, K, no, no),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb + pad_b, K, no, no),
                                           jnp.float32),
            interpret=_interpret_mode(),
            **_compiler_params(),
        )(xpad, *[params[k][None] for k in const_names])
        return out[:nb] if pad_b else out

    def run_pooled(xpad, params):
        """bd-only: in-kernel per-map sum/sumsq (no HBM map round-trip)."""
        nb = xpad.shape[0]
        pad_b = (-nb) % B
        if pad_b:
            xpad = jnp.pad(xpad, ((0, pad_b), (0, 0), (0, 0)))
        ngrid = (nb + pad_b) // B
        rows = max(B, 8)
        lanes = ((K + 127) // 128) * 128
        out_spec = pl.BlockSpec((rows, lanes), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pl.GridSpec(
            grid=(ngrid,),
            in_specs=[pl.BlockSpec((B, n, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [bcast_spec(tuple(params[k].shape)) for k in const_names],
            out_specs=[out_spec, out_spec],
        )
        struct = jax.ShapeDtypeStruct((ngrid * rows, lanes), jnp.float32)
        s, sq = pl.pallas_call(
            kernel_pooled,
            grid_spec=grid_spec,
            out_shape=[struct, struct],
            interpret=_interpret_mode(),
            **_compiler_params(),
        )(xpad, *[params[k][None] for k in const_names])
        if rows != B:
            s = s.reshape(ngrid, rows, lanes)[:, :B].reshape(-1, lanes)
            sq = sq.reshape(ngrid, rows, lanes)[:, :B].reshape(-1, lanes)
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
        npix = jnp.float32(no * no)

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
        return _crop(run(_prep(x), params))

    features.coeff_maps = coeff_maps
    return features, params_src, bank


class FusedScattering:
    """Pallas-fused order-2 scattering extractor for arbitrary J.

    Same surface as ``FusedScatteringJ2`` (the tuned J=2 kernel, which
    remains the J=2 default); this class covers the deep configurations,
    e.g. BASELINE's J=4, L=8 @ 128x128 (417 coefficient maps/channel).
    """

    def __init__(self, J: int, L: int, H: int, W: int,
                 precision: str = "default", boundary: str = "reflect",
                 layout: str = "wide"):
        self._features, self._params, self.bank = _compiled(
            J, L, H, W, precision, boundary, layout)

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


def auto_layout(J: int, boundary: str, H: int = 128) -> str:
    """Fastest measured layout per configuration (v5e, L=8).

    J=2 periodic: the round-5 block-diagonal layout with in-kernel pooled
    stats dominates — every DFT matmul fills both the 128-deep MXU
    contraction and the 128-lane output tile (fused_scattering.
    _bd_groups), and the features path reduces each coefficient map to
    sum/sumsq ON the MXU instead of round-tripping (K, nq, nq) maps
    through HBM.  Measured (v5e, idle host): 128 px bd8 20,804 patches/s
    (bd2 17,953, tall2 15,952); 64 px bd8 78,641 (bd16 73,391, tall4
    ~35k, tall2 26.4k — the 64/32/16-point stages padded 2-8x without
    bd).  The reflect 17*2^k grids are not power-of-2 so bd does not
    apply; wide remains reflect-optimal (tall2-reflect measured 1,292 —
    VMEM spill).  Deeper J shifts work to coarse resolutions where taller
    operands amortize more column-side DFTs: J=4 periodic tall8 5,948 >
    tall4 5,412 > tall2 4,614 > wide 3,431; reflect tall4 3,094 > tall2
    2,814 > wide 2,362.
    """
    pow2 = H >= 16 and (H & (H - 1)) == 0
    if J == 2:
        return "bd8" if boundary == "periodic" and pow2 else "wide"
    if boundary == "periodic":
        # J=4 @128px measured same-conditions: bd4 8,817 > bd8 7,339 >
        # tall8 6,743 (the deep 32/16/8-point stages carry the padding).
        return "bd4" if pow2 else "tall8"
    return "tall4"


def fused_scattering(J: int, L: int, H: int, W: int,
                     precision: str = "default", boundary: str = "reflect",
                     layout: str = "auto"):
    """Fused-kernel factory: tuned J=2 kernel, general kernel otherwise."""
    if layout == "auto":
        layout = auto_layout(J, boundary, min(H, W))
    if J == 2:
        from wst_tpu.ops.pallas.fused_scattering import fused_scattering_j2
        return fused_scattering_j2(L, H, W, precision, boundary, layout)
    return FusedScattering(J, L, H, W, precision, boundary, layout)
