#!/usr/bin/env python3
"""Regenerate the full 1,512-cell experiment corpus + all five analyses.

Mirrors the reference's complete factorial study (reference corpus:
experiments/{rgb_clean,gaussian,poisson,saltpepper,speckle,uniform} —
3 areas x 3 sizes x 3 methods x 4 k x 14 noise conditions = 1,512 cells,
SURVEY.md §2.1 C22) on the synthetic dataset, using the sharded
noise-matrix pipeline: one device pass per (area, size) produces all 14
conditions' features, then every cell's selection + forest + CV runs from
that single batch.

Usage:
    python scripts/run_full_grid.py [--data demo_grid/data/rgb_clean]
        [--out full_grid] [--sizes mini small original]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wst_tpu.analysis.analyzer import NOISE_FAMILIES, NoiseExperimentAnalyzer
from wst_tpu.data.dataset import AREAS, load_area_images_and_labels
from wst_tpu.train.matrix_runner import run_matrix_suite


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="demo_grid/data/rgb_clean")
    p.add_argument("--out", default="full_grid")
    p.add_argument("--sizes", nargs="*",
                   default=["mini", "small", "original"])
    p.add_argument("--k", nargs="*", type=int, default=[2, 5, 10, 20])
    p.add_argument("--families", nargs="*", default=None,
                   help="noise families to run (default: all five)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--boundary", default="reflect",
                   choices=["reflect", "periodic"],
                   help="Scattering boundary for the whole corpus "
                        "(periodic = the TPU fast mode; used for the "
                        "periodic-mode science-equivalence corpus)")
    p.add_argument("--skip-analysis", action="store_true",
                   help="Generate the experiment corpus only (no "
                        "analyzer reports/plots)")
    args = p.parse_args(argv)

    exp_root = os.path.join(args.out, "experiments")
    t_start = time.time()
    n_cells = 0
    for size in args.sizes:
        ds_path = os.path.join(args.data, size)
        for area in AREAS:
            t0 = time.time()
            # Block-level resume (the remote TPU worker can crash mid-run):
            # one (area, size) block = one device pass = |conditions| x
            # 3 methods x |k| cells; skip blocks whose reports all exist.
            # The expected set must honor --families exactly as
            # run_matrix_suite does, or a families-restricted rerun would
            # never see a complete block and resume would silently no-op.
            from wst_tpu.parallel.noise_matrix import noise_matrix_conditions
            from wst_tpu.utils.artifacts import REPORT_NAME
            conds = [cond for cond, _, _ in noise_matrix_conditions()
                     if args.families is None or cond == "clean"
                     or any(cond.startswith(f) for f in args.families)]
            expected = [os.path.join(exp_root,
                                     "rgb_clean" if cond == "clean"
                                     else cond,
                                     area, size, f"k{k}", method,
                                     REPORT_NAME)
                        for cond in conds
                        for method in ("advanced_stats", "wst", "hybrid")
                        for k in args.k]
            if all(os.path.exists(p) for p in expected):
                n_cells += len(expected)
                print(f"[grid] {area}/{size}: {len(expected)} cells already "
                      f"present, skipping ({n_cells} total)", flush=True)
                continue
            images, labels, _ = load_area_images_and_labels(ds_path, area)
            reports = run_matrix_suite(
                images, labels, exp_root, area, size,
                dataset_path=ds_path, ks=args.k, families=args.families,
                seed=args.seed, boundary=args.boundary, verbose=False)
            n_cells += len(reports)
            print(f"[grid] {area}/{size}: {len(reports)} cells in "
                  f"{time.time() - t0:.1f}s ({n_cells} total)", flush=True)

    print(f"[grid] corpus complete: {n_cells} cells in "
          f"{(time.time() - t_start) / 60:.1f} min", flush=True)

    for family in ([] if args.skip_analysis
                   else sorted(args.families or NOISE_FAMILIES)):
        t0 = time.time()
        analyzer = NoiseExperimentAnalyzer(family, exp_root)
        res = analyzer.create_complete_analysis(
            os.path.join(args.out, "analysis", f"{family}_analysis"))
        print(f"[analysis] {family}: {res['n_experiments']} experiments, "
              f"{len(res['comparison_plots'])} comparison + "
              f"{len(res['detailed_plots'])} detailed plots in "
              f"{time.time() - t0:.1f}s", flush=True)
    print(f"[done] total {(time.time() - t_start) / 60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
