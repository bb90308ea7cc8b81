"""wst_tpu — TPU-native Wavelet Scattering Transform feature framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline ``WST-Feature-Extraction-for-Remote-Sensing-Vegetation-Classification
-via-Machine-Learning`` (see SURVEY.md): device-side noise augmentation,
batched order-2 wavelet scattering on TPU, advanced RGB statistics, mutual
information feature selection, an on-device histogram-split tree ensemble, a
grid experiment runner emitting the reference's JSON report schema, inference,
and analysis — scalable over a ``jax.sharding.Mesh``.

The compute path is JAX (jnp + Pallas kernels); the filter banks are
precomputed once per (J, L, H, W) configuration.
"""

__version__ = "0.1.0"

from wst_tpu.ops.filter_bank import FilterBank, ScatteringMeta
from wst_tpu.ops.scattering import Scattering2D

# Lazy re-exports of the main user-facing surfaces (kept lazy so that
# ``import wst_tpu`` stays light — analysis pulls in pandas/matplotlib).
_LAZY = {
    "FeatureExtractor": "wst_tpu.features.extractor",
    "get_feature_names": "wst_tpu.features.extractor",
    "fit_select_kbest": "wst_tpu.features.selection",
    "SelectionModel": "wst_tpu.features.selection",
    "TreeEnsembleClassifier": "wst_tpu.models.forest",
    "ModelInference": "wst_tpu.infer.inference",
    "SceneClassifier": "wst_tpu.infer.scene",
    "NoiseExperimentAnalyzer": "wst_tpu.analysis.analyzer",
    "make_synthetic_dataset": "wst_tpu.data.dataset",
    "load_area_images_and_labels": "wst_tpu.data.dataset",
    "make_mesh": "wst_tpu.parallel.mesh",
    "DistributedTrainer": "wst_tpu.parallel.distributed",
    "save_artifacts": "wst_tpu.utils.artifacts",
    "load_artifacts": "wst_tpu.utils.artifacts",
    "run_matrix_suite": "wst_tpu.train.matrix_runner",
    "ExperimentConfig": "wst_tpu.utils.config",
}

__all__ = [
    "FilterBank",
    "ScatteringMeta",
    "Scattering2D",
    "__version__",
    *sorted(_LAZY),
]


def __getattr__(name):
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module 'wst_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
