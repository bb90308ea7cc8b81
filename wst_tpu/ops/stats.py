"""Batched "advanced statistics" feature kernel (54 features per RGB image).

TPU-native re-design of the reference's per-image, per-channel scipy loop
(reference: src/training/train_and_save_model.py:58-112): one jitted function
over a whole (batch, channel) block — percentiles via a single on-device sort,
sobel/laplace as 3x3 stencils on a symmetric-padded array (equivalent to
scipy.ndimage's default 'reflect' boundary mode).

Per channel, 18 features in this order (reference order, names in
``STAT_NAMES``): mean, std, var, min, max, range, skew, kurt, cv, p10, p25,
p50, p75, p90, iqr, mad, grad_mean, edge_density.

The reference filters non-finite pixels before computing statistics; device
images are produced by our own loaders/augmenters and are always finite, so
that filter is a no-op here (behaviour is identical on finite inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

STAT_NAMES = (
    "mean", "std", "var", "min", "max", "range", "skew", "kurt", "cv",
    "p10", "p25", "p50", "p75", "p90", "iqr", "mad", "grad_mean",
    "edge_density",
)
N_STATS = len(STAT_NAMES)  # 18 -> 54 for RGB


def _stencils(x: jnp.ndarray):
    """Sobel gradient magnitude and |laplace| with scipy 'reflect' boundary.

    x: (..., H, W) -> (grad_mag, abs_laplace), both (..., H, W).
    """
    H, W = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)],
                 mode="symmetric")

    def sh(di, dj):
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, 1 + di, 1 + di + H, axis=-2),
            1 + dj, 1 + dj + W, axis=-1)

    # correlate1d weights: derivative d=[-1,0,1], smoothing s=[1,2,1]
    gx = ((sh(1, -1) - sh(-1, -1))
          + 2.0 * (sh(1, 0) - sh(-1, 0))
          + (sh(1, 1) - sh(-1, 1)))          # derivative along axis 0
    gy = ((sh(-1, 1) - sh(-1, -1))
          + 2.0 * (sh(0, 1) - sh(0, -1))
          + (sh(1, 1) - sh(1, -1)))          # derivative along axis 1
    grad_mag = jnp.sqrt(gx * gx + gy * gy)
    lap = sh(-1, 0) + sh(1, 0) + sh(0, -1) + sh(0, 1) - 4.0 * sh(0, 0)
    return grad_mag, jnp.abs(lap)


@functools.partial(jax.jit, static_argnames=())
def advanced_stats(images: jnp.ndarray) -> jnp.ndarray:
    """images: (..., C, H, W) float32 -> (..., C * 18) features.

    Channel-major layout: [c0_stat0..c0_stat17, c1_stat0, ...] — identical to
    the reference's feature vector (R block, G block, B block).
    """
    x = images.astype(jnp.float32)
    flat = x.reshape(x.shape[:-2] + (-1,))           # (..., C, H*W)
    n = flat.shape[-1]

    mean = jnp.mean(flat, axis=-1)
    var = jnp.var(flat, axis=-1)
    std = jnp.sqrt(var)
    mn = jnp.min(flat, axis=-1)
    mx = jnp.max(flat, axis=-1)
    rng_ = mx - mn

    centered = flat - mean[..., None]
    m2 = jnp.mean(centered ** 2, axis=-1)
    m3 = jnp.mean(centered ** 3, axis=-1)
    m4 = jnp.mean(centered ** 4, axis=-1)
    skew = m3 / jnp.maximum(m2, 1e-30) ** 1.5
    kurt = m4 / jnp.maximum(m2, 1e-30) ** 2 - 3.0
    cv = std / jnp.maximum(mean, 1e-8)

    srt = jnp.sort(flat, axis=-1)
    qs = jnp.array([0.10, 0.25, 0.50, 0.75, 0.90], jnp.float32)
    pos = qs * (n - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    frac = pos - lo.astype(jnp.float32)
    p = (jnp.take(srt, lo, axis=-1) * (1.0 - frac)
         + jnp.take(srt, hi, axis=-1) * frac)       # (..., C, 5)
    p10, p25, p50, p75, p90 = [p[..., i] for i in range(5)]
    iqr = p75 - p25
    mad = jnp.mean(jnp.abs(centered), axis=-1)

    grad_mag, abs_lap = _stencils(x)
    grad_mean = jnp.mean(grad_mag, axis=(-2, -1))
    lap_flat = jnp.sort(abs_lap.reshape(abs_lap.shape[:-2] + (-1,)), axis=-1)
    lpos = 0.90 * (n - 1)
    llo = int(lpos)
    lfrac = lpos - llo
    edge_thr = lap_flat[..., llo] * (1.0 - lfrac) + lap_flat[..., min(llo + 1, n - 1)] * lfrac
    edge_density = jnp.mean(
        (abs_lap > edge_thr[..., None, None]).astype(jnp.float32),
        axis=(-2, -1))

    stats = jnp.stack([
        mean, std, var, mn, mx, rng_, skew, kurt, cv,
        p10, p25, p50, p75, p90, iqr, mad, grad_mean, edge_density,
    ], axis=-1)                                      # (..., C, 18)
    return stats.reshape(stats.shape[:-2] + (-1,))   # (..., C*18)
