#!/usr/bin/env python3
"""Measure the deep-scattering (J=4, L=8, 128x128) fused Pallas kernel vs
the XLA matmul path on the real TPU chip (BASELINE config 4)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _steady  # noqa: E402

H = W = 128
L = 8
J = 4


def main():
    import jax
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 8
    x3 = np.random.default_rng(0).random((batch * 3, H, W), dtype=np.float32)

    from wst_tpu.ops.pallas.fused_general import FusedScattering

    for boundary, layout in [("periodic", "wide"), ("periodic", "tall2"),
                             ("reflect", "wide")]:
        try:
            t0 = time.perf_counter()
            f = FusedScattering(J, L, H, W, boundary=boundary, layout=layout)
            xd = jax.device_put(x3)
            dt = _steady(f.features, xd, iters)
            compile_s = time.perf_counter() - t0 - dt * iters
            pps = batch / dt
            print(f"fused J4 {boundary}/{layout}: {pps:.1f} patches/s "
                  f"(batch {batch}, compile ~{compile_s:.0f}s)", flush=True)
            # ramp-up re-measure
            dt = _steady(f.features, xd, iters)
            print(f"fused J4 {boundary}/{layout} (re): {batch/dt:.1f} "
                  f"patches/s", flush=True)
        except Exception as e:
            print(f"fused J4 {boundary}/{layout} FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)

    from wst_tpu.ops.scattering import Scattering2D
    sc = Scattering2D(J=J, L=L, H=H, W=W)
    x = jax.device_put(np.random.default_rng(0).random(
        (batch, 3, H, W), dtype=np.float32))
    dt = _steady(sc.features, x, iters)
    print(f"xla J4 reflect: {batch/dt:.1f} patches/s", flush=True)


if __name__ == "__main__":
    main()
