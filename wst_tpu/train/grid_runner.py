"""Factorial experiment-grid runner.

Drives the reference's 1,512-cell grid (3 areas x 3 sizes x 3 methods x
4 k values x 14 noise variants, SURVEY.md §0) as config products, writing
each cell's artifacts into the corpus directory convention
``{out_root}/{condition}/{area}/{size}/k{n}/{method}/``.

Efficiency re-design vs the reference: the reference re-extracted features
for every cell (including a per-image filter-bank rebuild); here hybrid
features are extracted ONCE per (dataset variant, area) on device and the
per-method matrices are column slices (advanced_stats = first 54 columns,
wst = remaining 486), so a full 36-cell (method x k) block costs one
feature pass.  Cells are idempotent: a cell whose report already exists is
skipped (the reference's implicit resume-by-directory behaviour, SURVEY.md
§5 checkpoint/resume).

CLI:
    python -m wst_tpu.train.grid_runner --data-root DIR --out-root DIR \
        [--conditions rgb_clean gaussian30 ...] [--areas ...] [--sizes ...]
        [--methods ...] [--k 2 5 10 20]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from wst_tpu.data.dataset import load_area_images_and_labels
from wst_tpu.features.extractor import FeatureExtractor, get_feature_names
from wst_tpu.utils.artifacts import REPORT_NAME
from wst_tpu.utils.config import ExperimentConfig
from wst_tpu.utils.profiling import log_event

ERROR_NAME = "cell_error.json"

METHOD_SLICES = {
    "advanced_stats": (0, 54),
    "wst": (54, 540),
    "hybrid": (0, 540),
}


def _extract_hybrid_once(images: np.ndarray, J: int, L: int,
                         batch_size: int = 64) -> np.ndarray:
    H, W = images.shape[-2:]
    fx = FeatureExtractor("hybrid", H, W, J, L)
    out = []
    for i in range(0, len(images), batch_size):
        out.append(fx.extract_numpy(images[i:i + batch_size]))
    return np.concatenate(out, axis=0)


class _CellFeatures:
    """Precomputed hybrid features for one (dataset, area): method matrices
    are column slices, with the matching name slices."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 J: int, L: int):
        self.labels = labels
        self.hybrid = _extract_hybrid_once(images, J, L)
        self.shape = images.shape
        self._names = get_feature_names("hybrid", J, L)

    def matrix(self, method: str) -> np.ndarray:
        lo, hi = METHOD_SLICES[method]
        return self.hybrid[:, lo:hi]

    def names(self, method: str) -> List[str]:
        lo, hi = METHOD_SLICES[method]
        return self._names[lo:hi]


def run_grid(data_roots: Dict[str, str], out_root: str,
             areas: Sequence[str] = ("assatigue", "popolar", "sunset"),
             sizes: Sequence[str] = ("mini", "small", "original"),
             methods: Sequence[str] = ("advanced_stats", "wst", "hybrid"),
             ks: Sequence[int] = (2, 5, 10, 20),
             J: int = 2, L: int = 8, overwrite: bool = False,
             verbose: bool = True) -> List[dict]:
    """data_roots: {condition_name: dataset_root_containing_size_dirs}.

    For each condition/area/size, features are computed once and all
    (method, k) cells reuse them.  Returns the list of report dicts.

    Robustness (SURVEY.md §5 failure-detection equivalent): a failing cell
    is recorded (``cell_error.json`` in its output dir + a structured
    ``cell_error`` log event) and the grid continues; progress is emitted
    as JSON ``log_event`` lines (cell_start/cell_done with wall time and
    extraction throughput) rather than bare prints.
    """
    import time
    import traceback

    reports = []
    failures = []
    for condition, root in data_roots.items():
        for size in sizes:
            ds_path = os.path.join(root, size)
            if not os.path.isdir(ds_path):
                log_event("grid_skip_missing_dataset", path=ds_path)
                continue
            for area in areas:
                cache: Optional[_CellFeatures] = None
                for method in methods:
                    for k in ks:
                        out_dir = os.path.join(out_root, condition, area,
                                               size, f"k{k}", method)
                        if (not overwrite
                                and os.path.exists(os.path.join(out_dir,
                                                                REPORT_NAME))):
                            continue
                        t0 = time.time()
                        log_event("cell_start", cell=out_dir)
                        try:
                            if cache is None:
                                images, labels, _ = \
                                    load_area_images_and_labels(ds_path, area)
                                te = time.time()
                                cache = _CellFeatures(images, labels, J, L)
                                log_event(
                                    "features_extracted", condition=condition,
                                    area=area, size=size,
                                    n_images=int(len(labels)),
                                    images_per_sec=round(
                                        len(labels)
                                        / max(time.time() - te, 1e-9), 2))
                            cfg = ExperimentConfig(
                                dataset_path=ds_path, area_name=area,
                                feature_method=method, k_features=k,
                                output_dir=out_dir, J=J, L=L)
                            report = _run_cell_from_features(cfg, cache,
                                                             verbose=verbose)
                            reports.append(report)
                            log_event(
                                "cell_done", cell=out_dir,
                                test_accuracy=report["performance"]
                                ["test_accuracy"],
                                cv_mean=report["performance"]
                                ["cv_mean_accuracy"],
                                wall_time_sec=round(time.time() - t0, 3))
                        except Exception as err:  # noqa: BLE001 — record+go
                            rec = {"cell": out_dir,
                                   "error": f"{type(err).__name__}: {err}",
                                   "traceback": traceback.format_exc(),
                                   "time": time.time()}
                            failures.append(rec)
                            os.makedirs(out_dir, exist_ok=True)
                            import json as _json
                            with open(os.path.join(out_dir, ERROR_NAME),
                                      "w") as fp:
                                _json.dump(rec, fp, indent=2)
                            log_event("cell_error", cell=out_dir,
                                      error=rec["error"])
    log_event("grid_done", cells_completed=len(reports),
              cells_failed=len(failures))
    return reports


def _run_cell_from_features(config: ExperimentConfig, cache: _CellFeatures,
                            verbose: bool = True) -> dict:
    """run_experiment variant that reuses a precomputed feature matrix."""
    import datetime
    import time
    from collections import Counter

    from wst_tpu.features.selection import fit_select_kbest
    from wst_tpu.train.trainer import train_final_model
    from wst_tpu.utils.artifacts import save_artifacts

    t0 = time.time()
    X = cache.matrix(config.feature_method)
    names = cache.names(config.feature_method)
    labels = cache.labels
    X_selected, selection = fit_select_kbest(X, labels, names,
                                             k=config.k_features)
    model, performance = train_final_model(X_selected, labels, config)
    class_counts = Counter(labels.tolist())
    _, _, H, W = cache.shape
    report = {
        "experiment_name": (f"{config.feature_method}_{config.area_name}"
                            f"_k{config.k_features}_WithModel"),
        "config": config.to_report_dict(),
        "dataset_info": {
            "data_directory": config.dataset_path,
            "area_name": config.area_name,
            "total_images": int(len(labels)),
            "classes": {k: int(v) for k, v in sorted(class_counts.items())},
            "image_shape": [3, int(H), int(W)],
            "total_features_available": X.shape[1],
            "feature_method": config.feature_method,
            "dataset_type": config.dataset_type,
            "k_features": config.k_features,
        },
        "feature_selection": {
            "method": f"SelectKBest_k{config.k_features}",
            "num_features": len(selection.selected_features),
            "selected_features": selection.selected_features,
            "feature_scores": selection.selected_scores.tolist(),
        },
        "performance": performance,
        "model_files": {
            "trained_model": "trained_model.npz",
            "scaler": "selection_model.json",
            "feature_selector": "selection_model.json",
            "feature_names": "feature_names.json",
        },
        "timestamp": datetime.datetime.now().isoformat(),
        "wall_time_sec": round(time.time() - t0, 3),
    }
    save_artifacts(config.output_dir, model, selection, report)
    if verbose:
        print(f"[{config.output_dir}] acc={performance['test_accuracy']:.3f}"
              f" cv={performance['cv_mean_accuracy']:.3f}")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="Run the factorial grid")
    p.add_argument("--data-root", required=True,
                   help="Root containing one subdir per condition, each "
                        "with size dirs (mini/small/original)")
    p.add_argument("--out-root", required=True)
    p.add_argument("--conditions", nargs="*", default=None,
                   help="Condition subdir names (default: all present)")
    p.add_argument("--areas", nargs="*",
                   default=["assatigue", "popolar", "sunset"])
    p.add_argument("--sizes", nargs="*",
                   default=["mini", "small", "original"])
    p.add_argument("--methods", nargs="*",
                   default=["advanced_stats", "wst", "hybrid"])
    p.add_argument("--k", nargs="*", type=int, default=[2, 5, 10, 20])
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)

    conditions = args.conditions or sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isdir(os.path.join(args.data_root, d)))
    data_roots = {c: os.path.join(args.data_root, c) for c in conditions}
    reports = run_grid(data_roots, args.out_root, args.areas, args.sizes,
                       args.methods, args.k)
    print(f"Completed {len(reports)} cells")


if __name__ == "__main__":
    main()
