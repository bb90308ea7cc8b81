"""Full noise matrix as one sharded patch stream (BASELINE config 3).

The reference materializes 13 noisy dataset copies on disk and runs each
suite separately (reference: src/preprocessing/add_noise.py + shell loops).
Here the entire noise matrix — clean + every (family, intensity) variant of
SURVEY.md §2.1 (gaussian 30/50, poisson 40/60, salt&pepper 5/15/25,
speckle 15/35/55, uniform 10/25/40) — is generated device-side from ONE
patch batch and processed as ONE sharded stream:

    images (B, H, W, C) u8 --augment--> (14, B, H, W, C) u8
                          --features--> (14, B, D) float32

Augmentation and feature extraction are jitted; the flattened (14*B) stream
shards over the mesh's combined (data, model) axes, so every variant's
features come out of a single device pass.  Per-image noise is keyed by
(seed, variant, image-id): fully deterministic and shard-count independent.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wst_tpu.features.extractor import FeatureExtractor
from wst_tpu.ops.noise import NOISE_LEVELS, add_noise_batch
from wst_tpu.parallel.mesh import make_mesh


def noise_matrix_conditions() -> List[Tuple[str, Optional[str], float]]:
    """[(condition_name, family_or_None, intensity)] — clean first, then
    the 13 noisy variants in family order."""
    out: List[Tuple[str, Optional[str], float]] = [("clean", None, 0.0)]
    for fam, levels in NOISE_LEVELS.items():
        for lvl in levels:
            out.append((f"{fam}{lvl}", fam, float(lvl)))
    return out


def augment_full_matrix(images_u8: np.ndarray, seed: int = 42,
                        image_ids: Optional[np.ndarray] = None
                        ) -> Dict[str, jnp.ndarray]:
    """images (B, H, W, C) uint8 -> {condition: (B, H, W, C) uint8}.

    Each variant uses an independent counter-based key derived from
    (seed, condition index, image id).
    """
    B = images_u8.shape[0]
    ids = (np.arange(B, dtype=np.int32) if image_ids is None
           else np.asarray(image_ids, np.int32))
    out: Dict[str, jnp.ndarray] = {}
    for ci, (name, fam, lvl) in enumerate(noise_matrix_conditions()):
        if fam is None:
            out[name] = jnp.asarray(images_u8)
        else:
            out[name] = add_noise_batch(seed * 1000 + ci, ids, images_u8,
                                        fam, lvl)
    return out


class NoiseMatrixPipeline:
    """One sharded pass: augment all variants + extract features."""

    def __init__(self, method: str = "hybrid", H: int = 128, W: int = 128,
                 J: int = 2, L: int = 8, mesh=None,
                 mode: Optional[str] = None, boundary: str = "reflect"):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.fx = FeatureExtractor(method, H, W, J, L, mode,
                                   boundary=boundary)
        self.conditions = noise_matrix_conditions()

        dsh = NamedSharding(self.mesh, P(("data", "model")))

        def features_stream(stream_u8):
            # (V*B, H, W, C) u8 -> (V*B, D) float32, sharded over the mesh.
            x = jax.lax.with_sharding_constraint(stream_u8, dsh)
            imgs = x.astype(jnp.float32).transpose(0, 3, 1, 2) / 255.0
            feats = self.fx(imgs)
            return jax.lax.with_sharding_constraint(feats, dsh)

        self._features_stream = jax.jit(features_stream)

    def run(self, images_u8: np.ndarray, seed: int = 42,
            batch_size: int = 256) -> Dict[str, np.ndarray]:
        """images (B, H, W, C) uint8 -> {condition: (B, D) features}."""
        B = images_u8.shape[0]
        variants = augment_full_matrix(images_u8, seed)
        stream = jnp.concatenate([variants[name]
                                  for name, _, _ in self.conditions])
        n = len(stream)
        bs = min(batch_size, n)
        pad = (-n) % bs      # pad to a chunk multiple: one compiled shape
        if pad:
            stream = jnp.concatenate([stream, stream[:pad]])
        chunks = []
        with self.mesh:
            for i in range(0, len(stream), bs):
                chunks.append(np.asarray(
                    self._features_stream(stream[i:i + bs])))
        feats = np.concatenate(chunks)[:n]
        return {name: feats[vi * B:(vi + 1) * B]
                for vi, (name, _, _) in enumerate(self.conditions)}
