"""Full-scene tiled sliding-window inference (BASELINE.json config 5).

The reference only ever classifies pre-cut 128x128 patches; scaling to a
complete remote-sensing raster is this framework's counterpart to sequence
parallelism (SURVEY.md §5, long-context): the scene is tiled into a patch
grid (optionally strided/overlapping), patches are sharded over the device
mesh's combined (data, model) axes, scattering features and classification
run on device, and the per-patch labels are reassembled into a class map.

WST patches are independent (no halo exchange needed), so scene-space
sharding is embarrassingly parallel: the only collectives are the implicit
all-gathers XLA inserts when the label map is assembled.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wst_tpu.features.extractor import FeatureExtractor
from wst_tpu.features.selection import SelectionModel
from wst_tpu.models.forest import TreeEnsembleClassifier, _predict_forest
from wst_tpu.parallel.mesh import make_mesh


def tile_scene(scene: np.ndarray, patch: int, stride: Optional[int] = None
               ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """scene: (3, H, W) -> (n_tiles, 3, patch, patch), grid (rows, cols).

    Edge tiles are clamped inward so every tile is full-size (the standard
    remote-sensing sliding-window convention).
    """
    stride = stride or patch
    C, H, W = scene.shape
    if H < patch or W < patch:
        raise ValueError(f"scene {H}x{W} smaller than patch {patch}")
    ys, xs = tile_coords((H, W), patch, stride)
    tiles = np.stack([scene[:, y:y + patch, x:x + patch]
                      for y in ys for x in xs])
    return tiles, (len(ys), len(xs))


def tile_coords(hw: Tuple[int, int], patch: int,
                stride: Optional[int] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-left (ys, xs) of every sliding-window tile, edges clamped."""
    stride = stride or patch
    H, W = hw
    ys = list(range(0, H - patch + 1, stride))
    xs = list(range(0, W - patch + 1, stride))
    if ys[-1] != H - patch:
        ys.append(H - patch)
    if xs[-1] != W - patch:
        xs.append(W - patch)
    return np.asarray(ys, np.int32), np.asarray(xs, np.int32)


class SceneClassifier:
    """Classify a full raster with a trained experiment cell, on a mesh."""

    def __init__(self, model: TreeEnsembleClassifier,
                 selection: SelectionModel, method: str, patch: int = 128,
                 J: Optional[int] = None, L: Optional[int] = None, mesh=None,
                 batch_size: int = 256, mode: Optional[str] = None,
                 boundary: Optional[str] = None):
        """``boundary``: 'reflect' is the kymatio-faithful parity mode;
        'periodic' is the lane-aligned TPU fast mode (boundary-only
        feature difference, ~2.3x faster scattering —
        docs/ARCHITECTURE.md).  It must match the boundary the model's
        training features were extracted with, so the default (None, like
        J/L) resolves from the model's extraction stamp when the model was
        loaded from artifacts (``load_artifacts`` attaches
        ``extraction_config_``), falling back to J=2, L=8, reflect for
        unstamped in-memory models.  An explicit value that contradicts
        the stamp raises — the silent train/serve boundary mismatch is the
        defect class the reference shipped (reference: src/inference/
        inference.py:277-280)."""
        self.model, self.selection = model, selection
        stamp = getattr(model, "extraction_config_", {})
        for name, val in (("J", J), ("L", L), ("boundary", boundary)):
            if (val is not None and name in stamp and val != stamp[name]):
                raise ValueError(
                    f"{name} mismatch: model was trained with "
                    f"{name}={stamp[name]!r} but {name}={val!r} was "
                    f"requested; retrain or drop the override.")
        self.J = J if J is not None else stamp.get("J", 2)
        self.L = L if L is not None else stamp.get("L", 8)
        self.boundary = (boundary if boundary is not None
                         else stamp.get("boundary", "reflect"))
        self.patch = patch
        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_size = batch_size
        self.fx = FeatureExtractor(method, patch, patch, self.J, self.L,
                                   mode, boundary=self.boundary)

        f = model.forest_
        scaler_mean = jnp.asarray(selection.scaler.mean, jnp.float32)
        scaler_scale = jnp.asarray(selection.scaler.scale, jnp.float32)
        sel_idx = jnp.asarray(selection.selected_indices, jnp.int32)
        forest = tuple(jnp.asarray(a) for a in
                       (f.feature, f.threshold, f.left, f.right, f.is_leaf,
                        f.probs))

        from jax.sharding import NamedSharding, PartitionSpec as P
        dsh = NamedSharding(self.mesh, P(("data", "model")))
        rep = NamedSharding(self.mesh, P())
        self._replicated = rep

        def step(tiles):  # (B, 3, p, p) float32 -> (B,) class ids, (B,) conf
            tiles = jax.lax.with_sharding_constraint(tiles, dsh)
            X = self.fx(tiles)
            Xs = (X - scaler_mean) / scaler_scale
            Xsel = Xs[:, sel_idx]
            depth = (model.max_depth_used_
                     if getattr(model, "max_depth_used_", None)
                     else f.feature.shape[1])
            proba = _predict_forest(Xsel, *forest, max_depth=depth)
            # Replicate the tiny per-tile outputs (the one collective of
            # the scene pipeline — XLA lowers this to an all-gather over
            # ICI/DCN): fully-replicated outputs are addressable from
            # every process, which is what makes ``classify`` work
            # unchanged on a multi-HOST mesh.
            return jax.lax.with_sharding_constraint(
                (jnp.argmax(proba, axis=1), jnp.max(proba, axis=1)), rep)

        self._step = jax.jit(step)

        p = self.patch

        def step_scene(scene, ys, xs):
            """Tile ON DEVICE: the scene crosses the host->device link once
            (uint8 if the caller keeps rasters in native u8 — 12x less
            transfer than per-tile float32 duplication), and each batch's
            tiles are gathered with dynamic slices."""
            def get(y, x):
                return jax.lax.dynamic_slice(scene, (0, y, x), (3, p, p))
            tiles = jax.vmap(get)(ys, xs)
            if tiles.dtype == jnp.uint8:
                tiles = tiles.astype(jnp.float32) / 255.0
            return step(tiles)

        self._step_scene = jax.jit(step_scene)

    @classmethod
    def from_artifacts(cls, model_dir: str, patch: int = 128,
                       method: Optional[str] = None, **kwargs
                       ) -> "SceneClassifier":
        """Build a scene classifier from a saved experiment cell, with the
        extractor constructed from the SAVED config (method, J, L,
        boundary) — the self-describing-artifact contract.  Explicit
        kwargs that contradict the saved stamp raise in ``__init__``."""
        from wst_tpu.utils.artifacts import load_artifacts, load_report
        model, selection = load_artifacts(model_dir)
        if method is None:
            try:
                method = load_report(model_dir)["config"]["feature_method"]
            except (FileNotFoundError, KeyError):
                raise ValueError(
                    f"{model_dir!r} has no report with config.feature_method;"
                    f" pass method= explicitly.")
        return cls(model, selection, method, patch=patch, **kwargs)

    def classify(self, scene: np.ndarray, stride: Optional[int] = None
                 ) -> Dict[str, np.ndarray]:
        """scene: (3, H, W) float32 in [0,1] (or uint8 in [0,255]) ->
        dict with 'class_map' (rows, cols) of class indices, 'confidence'
        and 'labels'."""
        ys, xs = tile_coords(scene.shape[1:], self.patch, stride)
        grid = (len(ys), len(xs))
        coords = np.stack(np.meshgrid(ys, xs, indexing="ij"),
                          axis=-1).reshape(-1, 2)
        n = len(coords)
        bs = self.batch_size
        pad = (-n) % bs if n > bs else bs - n
        if pad:
            coords = np.concatenate(
                [coords, np.repeat(coords[-1:], pad, axis=0)])
        ids, confs = [], []
        with self.mesh:
            # Replicate the raster over the mesh (each device dynamic-
            # slices its own tiles from the full scene, so every shard
            # needs the whole raster; on one process this is the same
            # single transfer as before).  Coordinates stay host numpy —
            # jit treats them as replicated inputs, which also holds on a
            # multi-process mesh where every process passes identical
            # values.
            scene_dev = jax.device_put(np.ascontiguousarray(scene),
                                       self._replicated)
            outs = []
            for i in range(0, len(coords), bs):
                outs.append(self._step_scene(
                    scene_dev, np.ascontiguousarray(coords[i:i + bs, 0]),
                    np.ascontiguousarray(coords[i:i + bs, 1])))
            # fetch after all batches are submitted (no per-batch sync)
            for a, c in outs:
                ids.append(np.asarray(a))
                confs.append(np.asarray(c))
        ids = np.concatenate(ids)[:n].reshape(grid)
        confs = np.concatenate(confs)[:n].reshape(grid)
        return {"class_map": ids, "confidence": confs,
                "labels": np.asarray(self.model.classes_),
                "grid": grid}

    def throughput(self, n_tiles: int = 512, iters: int = 5
                   ) -> float:
        """Patches/sec on device-resident synthetic tiles.

        Timing forces completion via a host fetch of a dependent scalar
        (block_until_ready alone is unreliable over remote PJRT tunnels).
        """
        import time
        rng = np.random.default_rng(0)
        tiles = jnp.asarray(rng.random(
            (self.batch_size, 3, self.patch, self.patch), dtype=np.float32))
        with self.mesh:
            ids, conf = self._step(tiles)
            float(conf.sum())                      # warmup + full sync
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(iters):
                _ids, conf = self._step(tiles)
                acc = acc + conf.sum()
            float(acc)
            dt = (time.perf_counter() - t0) / iters
        return self.batch_size / dt
