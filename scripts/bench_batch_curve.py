#!/usr/bin/env python3
"""Single-chip batch-scaling curve for the fused WST kernel (BASELINE
scaling artifact: 1-chip sweep; the N-device sweep is bench_scaling.py).

For each batch size, times the fused Pallas J=2/L=8/128x128 extraction on
the current device and prints one JSON line:

    {"metric": "wst_batch_scaling_curve", "per_batch_patches_per_s": {...},
     "best": N, "boundary": ..., "layout": ...}

Run on the real chip from the repo root:  python scripts/bench_batch_curve.py
(Results land in reports/SCALING_tpu_batch.json via --out.)
"""

import argparse
import json
import sys
import time

import numpy as np


def steady(fn, x, iters):
    import jax.numpy as jnp
    float(fn(x).sum())                 # compile + sync
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = acc + fn(x).sum()
    float(acc)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", nargs="*", type=int,
                   default=[8, 16, 32, 64, 128, 256, 512])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--boundary", default="periodic")
    p.add_argument("--layout", default="auto")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    from wst_tpu.ops.pallas.fused_general import auto_layout
    from wst_tpu.ops.pallas.fused_scattering import (fused_scattering_j2,
                                                     pallas_available)

    platform = jax.devices()[0].platform
    layout = (auto_layout(2, args.boundary) if args.layout == "auto"
              else args.layout)
    if not pallas_available():
        print("# no TPU: falling back to the XLA matmul path",
              file=sys.stderr)
    f = fused_scattering_j2(8, 128, 128, boundary=args.boundary,
                            layout=layout)
    rng = np.random.default_rng(0)
    curve = {}
    xs = {}
    for b in args.batches:
        xs[b] = jax.device_put(rng.random((b * 3, 128, 128),
                                          dtype=np.float32))
        dt = steady(f.features, xs[b], args.iters)
        curve[b] = b / dt
        print(f"# batch {b}: {curve[b]:.1f} patches/s", file=sys.stderr)
    # The remote-TPU session ramps up over the first minutes of a process;
    # re-measure every (already compiled) point and keep the best reading.
    for b in args.batches:
        dt = steady(f.features, xs[b], args.iters)
        curve[b] = max(curve[b], b / dt)
        print(f"# batch {b} (re-measure): {b / dt:.1f} patches/s",
              file=sys.stderr)
    out = {
        "metric": "wst_batch_scaling_curve",
        "platform": platform,
        "boundary": args.boundary,
        "layout": layout,
        "per_batch_patches_per_s": {str(k): round(v, 1)
                                    for k, v in curve.items()},
        "best_patches_per_s": round(max(curve.values()), 1),
        "best_batch": max(curve, key=curve.get),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fp:
            fp.write(line + "\n")


if __name__ == "__main__":
    main()
