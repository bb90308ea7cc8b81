"""Noise-matrix experiment suite: the full robustness study in one pass.

Combines the sharded noise-matrix pipeline (all 14 conditions generated and
featurized on device from ONE clean patch batch) with the experiment-cell
machinery: for every (condition, method, k) cell it runs selection + the
tree ensemble + stratified CV and writes reference-schema artifacts into
``{out_root}/{condition}/{area}/{size}/k{n}/{method}/`` — ready for
:mod:`wst_tpu.analysis.analyzer`.

This replaces the reference's workflow of materializing 13 noisy dataset
copies on disk and re-running the trainer per copy (reference:
src/preprocessing/add_noise.py + per-suite shell loops): the equivalent of
14 dataset variants x 12 cells costs one feature pass over a 14x batch
stream plus the (cheap) per-cell classifier fits.

CLI:
    python -m wst_tpu.train.matrix_runner <dataset_path> <area> <out_root>
        [--methods ...] [--k ...] [--families gaussian speckle ...]
"""

from __future__ import annotations

import argparse
import datetime
import os
import time
from collections import Counter
from typing import Dict, List, Optional, Sequence

import numpy as np

from wst_tpu.data.dataset import load_area_images_and_labels
from wst_tpu.features.extractor import get_feature_names
from wst_tpu.features.selection import fit_select_kbest
from wst_tpu.parallel.noise_matrix import NoiseMatrixPipeline
from wst_tpu.train.grid_runner import METHOD_SLICES
from wst_tpu.train.trainer import train_final_model
from wst_tpu.utils.artifacts import save_artifacts
from wst_tpu.utils.config import ExperimentConfig


def run_matrix_suite(images: np.ndarray, labels: np.ndarray,
                     out_root: str, area_name: str, dataset_type: str,
                     dataset_path: str = "",
                     methods: Sequence[str] = ("advanced_stats", "wst",
                                               "hybrid"),
                     ks: Sequence[int] = (2, 5, 10, 20),
                     families: Optional[Sequence[str]] = None,
                     J: int = 2, L: int = 8, seed: int = 42,
                     mode: Optional[str] = None,
                     verbose: bool = True) -> List[dict]:
    """images: (B, 3, H, W) float32 in [0,1]; one area/size slice.

    Returns the report dicts of every (condition, method, k) cell.
    """
    H, W = images.shape[-2:]
    u8 = np.clip(images * 255.0, 0, 255).astype(np.uint8).transpose(
        0, 2, 3, 1)
    pipe = NoiseMatrixPipeline("hybrid", H, W, J, L, mode=mode)
    per_condition = pipe.run(u8, seed=seed)
    if families is not None:
        keep = {"clean"} | {c for c in per_condition
                            if any(c.startswith(f) for f in families)}
        per_condition = {c: v for c, v in per_condition.items()
                         if c in keep}

    all_names = get_feature_names("hybrid", J, L)
    reports = []
    for condition, hybrid_X in per_condition.items():
        cond_dir = "rgb_clean" if condition == "clean" else condition
        for method in methods:
            lo, hi = METHOD_SLICES[method]
            X = hybrid_X[:, lo:hi]
            names = all_names[lo:hi]
            for k in ks:
                t0 = time.time()
                out_dir = os.path.join(out_root, cond_dir, area_name,
                                       dataset_type, f"k{k}", method)
                # The n_estimators size heuristic keys off the dataset-path
                # basename; for device-generated variants synthesize one
                # ending in the dataset_type.
                cfg = ExperimentConfig(
                    dataset_path=(dataset_path
                                  or os.path.join(f"<device:{condition}>",
                                                  dataset_type)),
                    area_name=area_name, feature_method=method,
                    k_features=k, output_dir=out_dir, J=J, L=L)
                X_sel, selection = fit_select_kbest(X, labels, names, k=k)
                model, perf = train_final_model(X_sel, labels, cfg)
                counts = Counter(labels.tolist())
                report = {
                    "experiment_name": (f"{method}_{area_name}_k{k}"
                                        f"_WithModel"),
                    "config": cfg.to_report_dict(),
                    "dataset_info": {
                        "data_directory": cfg.dataset_path,
                        "area_name": area_name,
                        "total_images": int(len(labels)),
                        "classes": {c: int(n)
                                    for c, n in sorted(counts.items())},
                        "image_shape": [3, int(H), int(W)],
                        "total_features_available": X.shape[1],
                        "feature_method": method,
                        "dataset_type": dataset_type,
                        "k_features": k,
                        "noise_condition": condition,
                    },
                    "feature_selection": {
                        "method": f"SelectKBest_k{k}",
                        "num_features": len(selection.selected_features),
                        "selected_features": selection.selected_features,
                        "feature_scores":
                            selection.selected_scores.tolist(),
                    },
                    "performance": perf,
                    "model_files": {
                        "trained_model": "trained_model.npz",
                        "scaler": "selection_model.json",
                        "feature_selector": "selection_model.json",
                        "feature_names": "feature_names.json",
                    },
                    "timestamp": datetime.datetime.now().isoformat(),
                    "wall_time_sec": round(time.time() - t0, 3),
                }
                save_artifacts(out_dir, model, selection, report)
                reports.append(report)
                if verbose:
                    print(f"[{condition}/{method}/k{k}] "
                          f"cv={perf['cv_mean_accuracy']:.3f}")
    return reports


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Run the full noise-matrix robustness suite")
    p.add_argument("dataset_path", help="Clean dataset root (size dir)")
    p.add_argument("area_name")
    p.add_argument("out_root")
    p.add_argument("--methods", nargs="*",
                   default=["advanced_stats", "wst", "hybrid"])
    p.add_argument("--k", nargs="*", type=int, default=[2, 5, 10, 20])
    p.add_argument("--families", nargs="*", default=None)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    images, labels, _ = load_area_images_and_labels(args.dataset_path,
                                                    args.area_name)
    dataset_type = os.path.basename(os.path.normpath(args.dataset_path))
    reports = run_matrix_suite(
        images, labels, args.out_root, args.area_name, dataset_type,
        dataset_path=args.dataset_path, methods=args.methods, ks=args.k,
        families=args.families, seed=args.seed)
    print(f"Completed {len(reports)} cells -> {args.out_root}")


if __name__ == "__main__":
    main()
