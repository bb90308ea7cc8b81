"""Device-side noise models — the five noise families of the reference,
re-expressed as pure, batched JAX functions with counter-based PRNG.

Reference semantics (reference: src/preprocessing/add_noise.py:14-72), all
operating on uint8 HWC images and returning uint8:

* gaussian : additive N(0, sigma), sigma = intensity * 255 / 100, clip.
* salt_and_pepper : ceil(amount * size / 2) pixels -> 255 and as many -> 0,
  amount = intensity / 100; coordinates drawn independently per axis with
  replacement over [0, dim-2] (the reference's randint(0, dim-1) bound) and
  applied to whole pixels across channels.
* speckle : x + x * N(0,1) * intensity/100, clip.
* poisson : scale = 10 + intensity/100*90; poisson(x*scale/255)*255/scale.
* uniform : additive U(-r/2, r/2), r = intensity * 255 / 100, clip.

Unlike the reference (global numpy RNG, serial over files), every image gets
an independent key derived from (seed, image_id), so results are bitwise
reproducible regardless of batch order or shard count (SURVEY.md §5,
"race detection" equivalent: determinism by construction).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp

NOISE_TYPES = ("gaussian", "salt_and_pepper", "speckle", "poisson", "uniform")

# The reference grid's noise levels per family (SURVEY.md §2.1 C18).
NOISE_LEVELS: Dict[str, tuple] = {
    "gaussian": (30, 50),
    "poisson": (40, 60),
    "salt_and_pepper": (5, 15, 25),
    "speckle": (15, 35, 55),
    "uniform": (10, 25, 40),
}


def _clip_u8(x):
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def add_gaussian_noise(key, image, intensity):
    """image: (..., H, W, C) uint8; intensity in [0, 100]."""
    sigma = intensity * 255.0 / 100.0
    g = jax.random.normal(key, image.shape, jnp.float32) * sigma
    return _clip_u8(image.astype(jnp.float32) + g)


def add_speckle_noise(key, image, intensity):
    g = jax.random.normal(key, image.shape, jnp.float32)
    x = image.astype(jnp.float32)
    return _clip_u8(x + x * g * (intensity / 100.0))


def add_uniform_noise(key, image, intensity):
    r = intensity * 255.0 / 100.0
    u = jax.random.uniform(key, image.shape, jnp.float32, -r / 2.0, r / 2.0)
    return _clip_u8(image.astype(jnp.float32) + u)


def add_poisson_noise(key, image, intensity):
    scale = 10.0 + (intensity / 100.0) * 90.0
    lam = image.astype(jnp.float32) * scale / 255.0
    noisy = jax.random.poisson(key, lam).astype(jnp.float32) * 255.0 / scale
    return _clip_u8(noisy)


def add_salt_and_pepper_noise(key, image, intensity):
    """Whole-pixel salt/pepper with the reference's count and sampling scheme.

    Counts are a static function of (shape, intensity); coordinates are drawn
    with replacement, each axis independently, over [0, dim-2] — faithfully
    reproducing the reference's randint(0, dim-1) (high-exclusive) quirk that
    never salts the last row/column.
    """
    H, W = image.shape[-3], image.shape[-2]
    size = math.prod(image.shape[-3:])
    num_salt = int(math.ceil(intensity / 100.0 * size * 0.5))
    num_pepper = int(math.ceil(intensity / 100.0 * size * 0.5))
    ks, kp = jax.random.split(key)
    ksr, ksc = jax.random.split(ks)
    kpr, kpc = jax.random.split(kp)
    out = jnp.asarray(image)
    sr = jax.random.randint(ksr, (num_salt,), 0, H - 1)
    sc = jax.random.randint(ksc, (num_salt,), 0, W - 1)
    out = out.at[..., sr, sc, :].set(jnp.uint8(255))
    pr = jax.random.randint(kpr, (num_pepper,), 0, H - 1)
    pc = jax.random.randint(kpc, (num_pepper,), 0, W - 1)
    out = out.at[..., pr, pc, :].set(jnp.uint8(0))
    return out


_NOISE_FNS = {
    "gaussian": add_gaussian_noise,
    "salt_and_pepper": add_salt_and_pepper_noise,
    "speckle": add_speckle_noise,
    "poisson": add_poisson_noise,
    "uniform": add_uniform_noise,
}


def add_noise(key, image, noise_type: str, intensity: float):
    """Apply one noise family to a single (H, W, C) uint8 image."""
    if noise_type not in _NOISE_FNS:
        raise ValueError(f"Unknown noise type: {noise_type!r}; "
                         f"expected one of {NOISE_TYPES}")
    return _NOISE_FNS[noise_type](key, image, intensity)


@functools.partial(jax.jit, static_argnames=("noise_type", "intensity"))
def add_noise_batch(seed: jnp.ndarray, image_ids: jnp.ndarray,
                    images: jnp.ndarray, noise_type: str,
                    intensity: float) -> jnp.ndarray:
    """Batched noise: images (B, H, W, C) uint8, image_ids (B,) int32.

    Key for image i = fold_in(PRNGKey(seed), image_ids[i]) — a pure function
    of (seed, image id), independent of batching/sharding.
    """
    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(image_ids)
    fn = _NOISE_FNS[noise_type]
    return jax.vmap(lambda k, im: fn(k, im, intensity))(keys, images)
