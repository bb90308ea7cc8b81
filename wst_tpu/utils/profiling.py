"""Profiling & observability: traces, throughput meters, structured logs.

The reference's only observability is print()/tqdm and one hardcoded timing
chart (SURVEY.md §5).  TPU-native equivalents:

* ``trace(path)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution.
* ``Throughput`` — steady-state items/sec meter with compile-excluded
  warmup, the measurement discipline every benchmark here uses.
* ``log_event`` — one-line JSON structured logs (stdout or file), so grid
  runs and benchmarks are machine-parsable.
* ``flop_estimate_scattering`` — analytic FLOP count of the DFT-matmul
  cascade, used for speed-of-light accounting in bench.py.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Measure steady-state throughput of fn(batch) -> device array."""

    def __init__(self, fn: Callable, warmup: int = 1, iters: int = 10):
        self.fn, self.warmup, self.iters = fn, warmup, iters

    def measure(self, batch, items_per_call: Optional[int] = None) -> dict:
        for _ in range(self.warmup):
            out = self.fn(batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = self.fn(batch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / self.iters
        n = items_per_call if items_per_call is not None else len(batch)
        return {"sec_per_call": dt, "items_per_sec": n / dt, "items": n}


def log_event(event: str, stream=None, **fields) -> None:
    rec = {"event": event, "time": time.time(), **fields}
    print(json.dumps(rec), file=stream or sys.stderr, flush=True)


# Per-chip dense peak (TFLOP/s) by PJRT device_kind, bf16 MXU rate — the
# denominator every published TPU MFU number uses.  Sources: Google Cloud
# TPU system-architecture pages (v4 275, v5e 197, v5p 459, v6e 918).
_CHIP_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def chip_peak_tflops(device=None) -> Optional[float]:
    """Dense bf16 peak of the attached chip, or None when unknown (CPU,
    new TPU generations).  Override with WST_CHIP_PEAK_TFLOPS."""
    import os
    env = os.environ.get("WST_CHIP_PEAK_TFLOPS")
    if env:
        try:
            return float(env)
        except ValueError:
            pass
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "")
    for k, v in _CHIP_PEAK_TFLOPS.items():
        if kind.startswith(k):
            return v
    return None


def flop_estimate_scattering(J: int, L: int, H: int, W: int,
                             boundary: str = "reflect") -> float:
    """Analytic FLOPs per channel-image of the DFT-matmul cascade.

    Counts the matmul FLOPs of the real-optimized path (2 row + 4 col
    einsums per real-input fft2; 4 + 2 for real-output ifft2; 8 for complex
    transforms), matching wst_tpu.ops.scattering's matmul backend.

    ``boundary='reflect'`` runs on the kymatio-faithful padded grid
    (compute_padding -> 136 for 128x128 at J=2); ``'periodic'`` is the
    lane-aligned fast mode on the unpadded HxW grid — the FLOP counts
    (and hence MFU denominators) differ between the two.
    """
    if boundary == "periodic":
        n = H
    else:
        from wst_tpu.ops.filter_bank import compute_padding
        n, _ = compute_padding(H, W, J)

    def mm(m):             # one m x m DFT matmul over an m x m operand
        return 2.0 * m ** 3

    total = 6 * mm(n)      # fft2_real of the padded input
    # S0: ifft2_real at n / 2^J
    total += 6 * mm(n // 2 ** J)
    for j1 in range(J):
        m1 = n // 2 ** j1
        # per orientation: complex ifft2 at m1, fft2_real at m1,
        # ifft2_real at n/2^J after phi fold
        total += L * (8 * mm(m1) + 6 * mm(m1) + 6 * mm(n // 2 ** J))
        for j2 in range(j1 + 1, J):
            m2 = n // 2 ** j2
            total += L * L * (8 * mm(m2) + 6 * mm(m2)
                              + 6 * mm(n // 2 ** J))
    return total
