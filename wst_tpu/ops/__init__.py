from wst_tpu.ops.filter_bank import FilterBank, ScatteringMeta
from wst_tpu.ops.scattering import Scattering2D

__all__ = ["FilterBank", "ScatteringMeta", "Scattering2D"]
