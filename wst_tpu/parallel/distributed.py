"""Fully-jitted distributed training step over a device mesh (D2/D3).

One XLA computation that takes a sharded patch batch end-to-end:

    patches --(data-parallel scattering/stats)--> features
            --(psum-reduced standardization)--> scaled features
            --(on-device kNN mutual information)--> top-k selection
            --(tree-parallel histogram forest fit over the model axis)-->
            --(batched predict + psum-reduced confusion matrix)--> metrics

Sharding layout: patch batches are sharded over the mesh's ``data`` axis;
ensemble trees (independent by construction) over the ``model`` axis; the
selected feature matrix (tiny) is replicated.  All cross-device reductions
(feature moments, MI statistics, confusion matrices) compile to psum /
all-gather over ICI — no hand-written communication.

This is the multi-chip analogue of the reference's whole training script
(reference: src/training/train_and_save_model.py:429-553) as a single
compiled step, and is what ``__graft_entry__.dryrun_multichip`` exercises.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from wst_tpu.features.selection import _mi_classif_device
from wst_tpu.models.forest import _fit_forest, _predict_forest
from wst_tpu.ops.scattering import Scattering2D
from wst_tpu.ops.stats import advanced_stats
from wst_tpu.parallel.mesh import make_mesh


def _device_bin(X: jnp.ndarray, max_bins: int = 256
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                           jnp.ndarray, jnp.ndarray]:
    """On-device quantile binning of (n, F): returns (binned int32 (n, F),
    thresholds (F, B-1) float32, n_thresholds (F,) int32, and per-bin value
    extrema vmin/vmax (F, B) float32 — +/-inf on empty bins, matching the
    host-side ``models.forest._bin_features`` contract the split kernel
    uses to place node-adjacent max-margin thresholds)."""
    n, F = X.shape
    u = jnp.sort(X, axis=0)                      # (n, F)
    if n > max_bins:
        idx = jnp.linspace(0, n - 1, max_bins).round().astype(jnp.int32)
        u = u[idx]
    mids = (u[:-1] + u[1:]) / 2.0                # (B-1, F)
    binned = jnp.sum(X[:, None, :] > mids[None], axis=1).astype(jnp.int32)
    nthr = jnp.full((F,), mids.shape[0], jnp.int32)
    B = mids.shape[0] + 1
    occ = binned[:, :, None] == jnp.arange(B)[None, None]   # (n, F, B)
    Xb = X.astype(jnp.float32)[:, :, None]
    vmin = jnp.min(jnp.where(occ, Xb, jnp.inf), axis=0)     # (F, B)
    vmax = jnp.max(jnp.where(occ, Xb, -jnp.inf), axis=0)
    return binned, mids.T.astype(jnp.float32), nthr, vmin, vmax


class DistributedTrainer:
    """Mesh-sharded end-to-end trainer for one (method, shape, k) config."""

    def __init__(self, mesh=None, method: str = "wst", H: int = 128,
                 W: int = 128, J: int = 2, L: int = 8, k_features: int = 10,
                 n_estimators: int = 50, n_classes: int = 3,
                 min_samples_split: int = 5, min_samples_leaf: int = 2,
                 max_depth: int = 16, mode: Optional[str] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.method = method
        self.k = k_features
        self.n_estimators = n_estimators
        self.n_classes = n_classes
        self.min_samples_split = min_samples_split
        self.min_samples_leaf = min_samples_leaf
        self.max_depth = max_depth
        self._scattering = None
        self._fused = None
        if method in ("wst", "hybrid"):
            if mode == "pallas":
                # Fused-kernel extraction inside the sharded step (runs in
                # interpret mode off-TPU so the simulated mesh still works).
                from wst_tpu.ops.pallas.fused_general import fused_scattering
                self._fused = fused_scattering(J, L, H, W)
            else:
                self._scattering = Scattering2D(J, L, H, W, mode=mode)

        m = self.mesh
        dsh = NamedSharding(m, P(("data", "model")))  # batch over all chips

        def dshard(x):
            return jax.lax.with_sharding_constraint(x, dsh)

        def msharded(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(m, P("model")))

        def extract(images):
            images = dshard(images)
            parts = []
            if method in ("advanced_stats", "hybrid"):
                parts.append(advanced_stats(images))
            if method in ("wst", "hybrid"):
                flat = images.reshape((-1,) + images.shape[-2:])
                if self._fused is not None:
                    f = self._fused.features(flat)
                else:
                    f = self._scattering._features_batch(
                        flat, self._scattering._params)
                parts.append(f.reshape(images.shape[0], -1))
            X = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
            return dshard(X)

        def step(train_images, y_train, test_images, y_test, seed):
            # 1) data-parallel feature extraction.
            Xtr = extract(train_images)
            Xte = extract(test_images)

            # 2) global standardization (mean/var reduce over the batch
            #    axis -> psum across the data axis).
            mean = jnp.mean(Xtr, axis=0)
            std = jnp.std(Xtr, axis=0)
            scale = jnp.where(std == 0.0, 1.0, std)
            Xtr_s = (Xtr - mean) / scale
            Xte_s = (Xte - mean) / scale

            # 3) mutual-information scores + top-k (replicated, tiny).
            scores = _mi_classif_device(Xtr_s, y_train, self.n_classes)
            _, sel = jax.lax.top_k(scores, self.k)
            sel = jnp.sort(sel)
            Xsel = Xtr_s[:, sel]
            Xsel_te = Xte_s[:, sel]

            # 4) tree-parallel forest fit on device-binned features.
            binned, thr, nthr, vmin, vmax = _device_bin(Xsel)
            n = Xsel.shape[0]
            forest = _fit_forest(
                binned, thr, nthr, vmin, vmax, y_train,
                n_trees=self.n_estimators, n_classes=self.n_classes,
                max_features=max(1, int(self.k ** 0.5)),
                min_samples_split=self.min_samples_split,
                min_samples_leaf=self.min_samples_leaf,
                max_depth=min(self.max_depth,
                              max(1, n // self.min_samples_leaf)),
                max_active=128,
                max_nodes=2 * min(2 ** self.max_depth, max(n, 2)) + 1,
                bootstrap=True, seed=seed)
            forest = tuple(msharded(a) for a in forest)

            # 5) batched predict + psum-reduced confusion matrix.
            proba = _predict_forest(Xsel_te, *forest,
                                    max_depth=min(self.max_depth,
                                                  max(1, n)))
            pred = jnp.argmax(proba, axis=1)
            acc = jnp.mean((pred == y_test).astype(jnp.float32))
            oh_t = jax.nn.one_hot(y_test, self.n_classes, dtype=jnp.float32)
            oh_p = jax.nn.one_hot(pred, self.n_classes, dtype=jnp.float32)
            cm = oh_t.T @ oh_p
            return {"accuracy": acc, "confusion_matrix": cm,
                    "selected": sel, "scores": scores, "forest": forest,
                    "proba": proba}

        self._step = jax.jit(step)
        self._extract = jax.jit(extract)

    # -- public API ---------------------------------------------------------

    def extract_features(self, images) -> jnp.ndarray:
        """Sharded feature extraction for a (B, 3, H, W) batch."""
        with self.mesh:
            return self._extract(jnp.asarray(images))

    def train_step(self, train_images, y_train, test_images, y_test,
                   seed: int = 42) -> dict:
        """Run the full compiled step.  Labels must be int32 class ids."""
        with self.mesh:
            return self._step(jnp.asarray(train_images),
                              jnp.asarray(y_train, jnp.int32),
                              jnp.asarray(test_images),
                              jnp.asarray(y_test, jnp.int32),
                              jnp.int32(seed))
