"""Feature extraction front-end: advanced_stats / wst / hybrid.

Batched, device-resident replacement for the reference's per-image
``extract_features`` dispatcher (reference: src/training/
train_and_save_model.py:389-398) and its feature-name registry (:400-427).
Feature vectors and names are index-compatible with the reference:

* advanced_stats : 54 = 3 channels x 18 stats, names ``{R,G,B}_{stat}``.
* wst            : 486 = 3 channels x (81 means + 81 stds) for J=2, L=8,
                   names ``{ch}_wst_{mean,std}_{i}``.
* hybrid         : 540 = advanced_stats ++ wst.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from wst_tpu.ops.filter_bank import build_path_meta
from wst_tpu.ops.scattering import Scattering2D, get_scattering
from wst_tpu.ops.stats import STAT_NAMES, advanced_stats

METHODS = ("advanced_stats", "wst", "hybrid")
CHANNELS = ("R", "G", "B")


def get_feature_names(method: str, J: int = 2, L: int = 8) -> List[str]:
    """Deterministic feature names, index-aligned with extracted vectors."""
    if method == "advanced_stats":
        return [f"{c}_{s}" for c in CHANNELS for s in STAT_NAMES]
    if method == "wst":
        n = build_path_meta(J, L).n_coeffs
        return [f"{c}_wst_{stat}_{i}"
                for c in CHANNELS for stat in ("mean", "std")
                for i in range(n)]
    if method == "hybrid":
        return (get_feature_names("advanced_stats")
                + get_feature_names("wst", J, L))
    raise ValueError(f"Unknown feature method: {method!r}")


class FeatureExtractor:
    """Batched extractor for one (method, J, L, H, W) configuration.

    Input images: (B, C, H, W) float32 in [0, 1] (the reference's CHW layout
    after PNG load, reference: src/training/train_and_save_model.py:51-56).
    Output: (B, D) float32 feature matrix.
    """

    def __init__(self, method: str, H: int, W: int, J: int = 2, L: int = 8,
                 mode: Optional[str] = None, boundary: str = "reflect"):
        if method not in METHODS:
            raise ValueError(f"Unknown feature method: {method!r}")
        self.method = method
        self.J, self.L, self.H, self.W = J, L, H, W
        self._scattering: Optional[Scattering2D] = None
        self._fused = None
        if method in ("wst", "hybrid"):
            if mode == "pallas":
                # Fused TPU kernel: the fastest path.  J=2 routes to the
                # tuned kernel, deeper J to the general fused cascade.
                from wst_tpu.ops.pallas.fused_general import fused_scattering
                # layout="auto" picks the fastest measured image-stacking
                # per (J, boundary) — see fused_general.auto_layout.
                self._fused = fused_scattering(J, L, H, W,
                                               boundary=boundary)
            else:
                self._scattering = get_scattering(J, L, H, W, 2, mode,
                                                  boundary)
        self.feature_names = get_feature_names(method, J, L)

    @property
    def n_features(self) -> int:
        return len(self.feature_names)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        if images.ndim != 4:
            raise ValueError(f"expected (B, C, H, W), got {images.shape}")
        parts = []
        if self.method in ("advanced_stats", "hybrid"):
            parts.append(advanced_stats(images))
        if self.method in ("wst", "hybrid"):
            sc = self._fused if self._fused is not None else self._scattering
            f = sc.features(images)                   # (B, C, 2K)
            parts.append(f.reshape(f.shape[0], -1))   # channel-major concat
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return out

    def extract_numpy(self, images) -> np.ndarray:
        return np.asarray(self(jnp.asarray(images)))
