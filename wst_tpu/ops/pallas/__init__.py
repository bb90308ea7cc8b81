try:
    from wst_tpu.ops.pallas.fused_scattering import (fused_scattering_j2,
                                                     pallas_available)
except Exception:  # pragma: no cover - pallas unavailable on this backend
    pallas_available = lambda: False  # noqa: E731
    fused_scattering_j2 = None

__all__ = ["fused_scattering_j2", "pallas_available"]
