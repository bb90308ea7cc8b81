#!/usr/bin/env python3
"""Benchmark: WST patches/sec/chip (order-2, J=2, L=8, 128x128 RGB).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "patches/s/chip", "vs_baseline": N}

Baseline: the reference's CPU pipeline at ~0.5 s per 128x128 RGB patch for
the order-2 WST descriptor (reference: src/visualization/
visualize_features.py:653 and the per-image kymatio filter-bank rebuild in
src/training/train_and_save_model.py:359), i.e. ~2 patches/s.

Measures both the XLA DFT-matmul path and the fused Pallas kernel (on TPU)
and reports the best; secondary lines (speed-of-light accounting, per-path
numbers) go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_PATCHES_PER_S = 2.0  # reference CPU: ~0.5 s/patch (WST, 128x128 RGB)
H = W = 128
L = 8


def _steady(fn, arg, iters):
    """Steady-state sec/call; a host fetch of a dependent scalar forces
    full completion (block_until_ready alone is unreliable over the
    remote-PJRT tunnel this sandbox uses)."""
    import jax.numpy as jnp
    float(fn(arg).sum())          # warmup (compile) + full sync
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for _ in range(iters):
        acc = acc + fn(arg).sum()
    float(acc)                    # forces every iteration
    return (time.perf_counter() - t0) / iters


def bench_xla(batch: int, iters: int):
    import jax
    from wst_tpu.ops.scattering import Scattering2D
    sc = Scattering2D(J=2, L=L, H=H, W=W)
    x = jax.device_put(np.random.default_rng(0).random(
        (batch, 3, H, W), dtype=np.float32))
    dt = _steady(sc.features, x, iters)
    return batch / dt


def bench_pallas(batch: int, iters: int, boundary: str = "reflect",
                 layout: str = "wide", h: int = H, w: int = W):
    import jax
    from wst_tpu.ops.pallas.fused_scattering import (fused_scattering_j2,
                                                     pallas_available)
    if not pallas_available():
        return None
    f = fused_scattering_j2(L, h, w, boundary=boundary, layout=layout)
    x = jax.device_put(np.random.default_rng(0).random(
        (batch * 3, h, w), dtype=np.float32))
    dt = _steady(f.features, x, iters)
    return batch / dt


def main():
    import os
    import jax

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    iters = 10 if on_tpu else 2
    batch = 128 if on_tpu else 16
    # Remote-tunnel compiles are minutes each; run candidates best-first and
    # stop starting new ones once the budget is spent so a JSON line always
    # lands before any outer timeout.
    # The axon tunnel's latency varies by hours-of-day from ~30 s to ~5 min
    # per compile (measured 2026-08-20); the SIGTERM handler below emits the
    # best-so-far JSON line if the harness kills us first, so a generous
    # budget only ever helps.
    budget = float(os.environ.get("WST_BENCH_BUDGET_SEC", "1200"))
    t_start = time.perf_counter()

    # Cheapest-compiling candidate first so at least one number lands even
    # under a tight outer timeout; the re-measure pass below keeps the best
    # reading per candidate regardless of order.
    plan = [(f"xla_matmul_b{batch}", lambda: bench_xla(batch, iters))]
    if on_tpu:
        # tall2 first: the fastest measured layout (12,080 patches/s).
        # reflect+tall2 is omitted as a MEASURED negative result (round 2):
        # with the scoped-VMEM cap raised to 96 MB it does compile, but the
        # Mosaic compile takes 22 min and the kernel lands at 1,292
        # patches/s vs wide's 6,357 — the B=2-stacked working set on the
        # 136-point reflect grid (2x everything: 136x136 spectra through
        # the whole 81-path cascade) blows past the ~16 MB VMEM that can
        # stay resident, so the scheduler spills; wide remains optimal for
        # the reflect boundary.
        # (periodic-wide dropped from the plan: tall2 dominated it in every
        # round-1 measurement, and each remote compile costs minutes.)
        # batch 512 amortizes dispatch best on the measured batch-scaling
        # curve (reports/SCALING_tpu_batch.json: 14.8k patches/s vs 11.8k
        # at 128).
        # The batch curve keeps amortizing dispatch toward a ~16k
        # asymptote (reports/SCALING_tpu_batch.json, 2026-08-21:
        # 14.9k@512, 15.5k@1024, 16.0k@3072) — b3072 is the measured
        # knee (578 MB input, well inside HBM).
        # bd8 first: the round-5 block-diagonal MXU-tile-exact layout with
        # in-kernel pooled stats (20,804 patches/s measured vs tall2's
        # 15,952 — every DFT matmul fills both the 128-deep contraction
        # and the 128-lane tile, and the features path never round-trips
        # coefficient maps through HBM).
        plan += [("pallas_periodic_bd8_b3072",
                  lambda: bench_pallas(3072, iters, "periodic", "bd8")),
                 ("pallas_periodic_tall2_b3072",
                  lambda: bench_pallas(3072, iters, "periodic", "tall2")),
                 ("pallas_periodic_bd8_b512",
                  lambda: bench_pallas(512, iters, "periodic", "bd8")),
                 (f"pallas_reflect_b{batch}",
                  lambda: bench_pallas(batch, iters, "reflect")),
                 # BASELINE config 1's shape (64x64 patches): measured as a
                 # secondary datum; excluded from the 128px headline.  bd8
                 # collapses the 64/32/16-point stages' 2-8x tile padding
                 # (78,641 measured vs round-4 tall2's 26.4k).
                 ("pallas_periodic_64px_bd8_b4096",
                  lambda: bench_pallas(4096, iters, "periodic", "bd8",
                                       h=64, w=64))]

    candidates = {}
    fns = {}

    # If the harness kills us mid-compile, still emit the best-so-far line.
    import signal
    emitted = []

    def _emit_once():
        if not emitted:
            emitted.append(True)
            _emit(candidates, platform)

    def _emit_and_exit(signum, frame):
        _emit_once()
        sys.exit(0)

    signal.signal(signal.SIGTERM, _emit_and_exit)
    for name, fn in plan:
        if candidates and time.perf_counter() - t_start > budget:
            print(f"# budget spent; skipping {name}", file=sys.stderr)
            continue
        try:
            pps = fn()
            if pps:
                candidates[name] = pps
                fns[name] = fn
        except Exception as e:
            print(f"# {name} failed: {e}", file=sys.stderr)

    # The remote-TPU session ramps up over the first minutes of a process
    # (early timing rounds read several-fold slow).  Everything is compiled
    # now — re-measure each candidate and keep the best reading.
    for name, fn in fns.items():
        try:
            candidates[name] = max(candidates[name], fn())
        except Exception:
            pass

    _emit_once()


def _emit(candidates, platform="tpu"):
    for name, pps in sorted(candidates.items()):
        print(f"# {name}: {pps:.1f} patches/s on {platform}",
              file=sys.stderr)

    # 64px candidates are a separate datum (BASELINE config 1), never the
    # 128px headline.
    c128 = {n: v for n, v in candidates.items() if "64px" not in n}
    c64 = {n: v for n, v in candidates.items() if "64px" in n}
    best = max(c128.values()) if c128 else 0.0
    best_name = max(c128, key=c128.get) if c128 else ""
    reflect = [v for n, v in c128.items() if "reflect" in n]

    # Roofline/MFU accounting (VERDICT round-3 directive #5): sustained
    # TFLOP/s per boundary against the chip's dense bf16 peak.  The two
    # boundaries have different FLOP totals: reflect runs the
    # kymatio-faithful padded 136-grid, periodic the lane-aligned 128-grid.
    mfu = {}
    try:
        from wst_tpu.utils.profiling import (chip_peak_tflops,
                                             flop_estimate_scattering)
        peak = chip_peak_tflops() if platform != "cpu" else None
        for boundary, pps in (
                ("periodic", max([v for n, v in c128.items()
                                  if "periodic" in n], default=0.0)),
                ("reflect", max(reflect, default=0.0))):
            if pps <= 0:
                continue
            flops = flop_estimate_scattering(2, L, H, W, boundary) * 3
            tf = pps * flops / 1e12
            mfu[boundary] = {
                "gflop_per_patch": flops / 1e9,
                "tflops_sustained": round(tf, 2),
                "mfu": (round(tf / peak, 4) if peak else None),
            }
            print(f"# {boundary}: ~{flops/1e9:.2f} GFLOP/patch -> "
                  f"{tf:.2f} TFLOP/s sustained"
                  + (f" = {tf/peak:.1%} of {peak:.0f} TFLOP/s peak"
                     if peak else ""),
                  file=sys.stderr)
    except Exception as e:
        peak = None
        print(f"# roofline accounting failed: {e}", file=sys.stderr)

    # The headline is the periodic fast mode (lane-aligned grids;
    # boundary-only feature difference vs kymatio, corr 0.9998 —
    # docs/ARCHITECTURE.md).  The kymatio-faithful reflect-boundary number
    # travels WITH it as a first-class field so both are driver-recorded.
    line = {
        "metric": "wst_patches_per_sec_per_chip_J2_L8_128px",
        "value": round(best, 2),
        "unit": "patches/s/chip",
        "vs_baseline": round(best / BASELINE_PATCHES_PER_S, 2),
        # xla_matmul runs Scattering2D's default reflect boundary
        "boundary": ("periodic" if "periodic" in best_name else "reflect"),
    }
    if peak:
        line["chip_peak_tflops"] = peak
    if "periodic" in mfu:
        line["tflops_sustained"] = mfu["periodic"]["tflops_sustained"]
        line["mfu"] = mfu["periodic"]["mfu"]
    if reflect:
        line["reflect_parity_value"] = round(max(reflect), 2)
        line["reflect_vs_baseline"] = round(
            max(reflect) / BASELINE_PATCHES_PER_S, 2)
        if "reflect" in mfu:
            line["reflect_tflops_sustained"] = \
                mfu["reflect"]["tflops_sustained"]
            line["reflect_mfu"] = mfu["reflect"]["mfu"]
    if c64:
        line["value_64px"] = round(max(c64.values()), 2)
        try:
            from wst_tpu.utils.profiling import flop_estimate_scattering
            f64 = flop_estimate_scattering(2, L, 64, 64, "periodic") * 3
            tf64 = max(c64.values()) * f64 / 1e12
            line["value_64px_tflops_sustained"] = round(tf64, 2)
            if peak:
                line["value_64px_mfu"] = round(tf64 / peak, 4)
        except Exception as e:
            print(f"# 64px roofline accounting failed: {e}",
                  file=sys.stderr)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
