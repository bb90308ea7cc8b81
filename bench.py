#!/usr/bin/env python3
"""Benchmark: WST patches/sec/chip (order-2, J=2, L=8, 128x128 RGB).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "patches/s/chip", "vs_baseline": N}

Baseline: the reference's CPU pipeline at ~0.5 s per 128x128 RGB patch for
the order-2 WST descriptor (reference: src/visualization/
visualize_features.py:653 and the per-image kymatio rebuild in
src/training/train_and_save_model.py:359), i.e. ~2 patches/s.
"""

import json
import sys
import time

import numpy as np

BASELINE_PATCHES_PER_S = 2.0  # reference CPU: ~0.5 s/patch (WST, 128x128 RGB)


def bench_scattering(batch: int, iters: int, mode=None):
    import jax
    from wst_tpu.ops.scattering import Scattering2D

    sc = Scattering2D(J=2, L=8, H=128, W=128, mode=mode)
    rng = np.random.default_rng(0)
    x = rng.random((batch, 3, 128, 128), dtype=np.float32)
    xd = jax.device_put(x)

    out = sc.features(xd)       # compile + warmup
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sc.features(xd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def main():
    import jax

    platform = jax.devices()[0].platform
    best = 0.0
    best_cfg = None
    batches = [32, 64, 128] if platform != "cpu" else [16]
    iters = 10 if platform != "cpu" else 2
    for batch in batches:
        try:
            pps, dt = bench_scattering(batch, iters)
            print(f"# batch={batch}: {pps:.1f} patches/s "
                  f"({dt*1e3:.1f} ms/batch) on {platform}", file=sys.stderr)
            if pps > best:
                best, best_cfg = pps, batch
        except Exception as e:
            print(f"# batch={batch} failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "wst_patches_per_sec_per_chip_J2_L8_128px",
        "value": round(best, 2),
        "unit": "patches/s/chip",
        "vs_baseline": round(best / BASELINE_PATCHES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
