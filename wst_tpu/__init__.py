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

__all__ = [
    "FilterBank",
    "ScatteringMeta",
    "Scattering2D",
    "__version__",
]
