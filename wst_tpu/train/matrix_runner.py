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
from wst_tpu.utils.profiling import log_event
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
                     boundary: str = "reflect",
                     cell_batching: bool = True,
                     verbose: bool = True) -> List[dict]:
    """images: (B, 3, H, W) float32 in [0,1]; one area/size slice.

    Returns the report dicts of every (condition, method, k) cell.

    ``cell_batching=True`` (default) runs the classifier stage batched: MI
    scoring is computed once per (condition, method) — it is k-independent —
    vmapped over all conditions in one dispatch per method, and every
    (condition, method, fold) forest fit of one k-width runs in a single
    vmapped dispatch.  Cell results are identical to the per-cell path
    (``cell_batching=False``); only the dispatch count changes (hundreds of
    tiny tunnel round-trips become a handful).
    """
    H, W = images.shape[-2:]
    u8 = np.clip(images * 255.0, 0, 255).astype(np.uint8).transpose(
        0, 2, 3, 1)
    pipe = NoiseMatrixPipeline("hybrid", H, W, J, L, mode=mode,
                               boundary=boundary)
    per_condition = pipe.run(u8, seed=seed)
    if families is not None:
        keep = {"clean"} | {c for c in per_condition
                            if any(c.startswith(f) for f in families)}
        per_condition = {c: v for c, v in per_condition.items()
                         if c in keep}

    all_names = get_feature_names("hybrid", J, L)
    if cell_batching:
        return _run_cells_batched(per_condition, labels, out_root,
                                  area_name, dataset_type, dataset_path,
                                  methods, ks, J, L, H, W, all_names,
                                  boundary, verbose)
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
                    k_features=k, output_dir=out_dir, J=J, L=L,
                    boundary=boundary)
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
                    log_event("cell_done", cell=out_dir,
                              cv_mean=perf["cv_mean_accuracy"],
                              wall_time_sec=round(time.time() - t0, 3))
    return reports


def _run_cells_batched(per_condition, labels, out_root, area_name,
                       dataset_type, dataset_path, methods, ks, J, L, H, W,
                       all_names, boundary, verbose) -> List[dict]:
    """Dispatch-batched classifier stage (see ``run_matrix_suite``)."""
    from wst_tpu.features.selection import (SelectionModel,
                                            fit_standard_scaler,
                                            mutual_info_classif_batch,
                                            top_k_indices)
    from wst_tpu.train.trainer import train_final_models_batch

    t_start = time.time()
    conditions = list(per_condition)
    counts = Counter(labels.tolist())

    # MI scores are k-independent: one vmapped dispatch per method scores
    # every condition at once (the per-cell path recomputed them 4x).
    sel_cache = {}                        # (condition, method) -> state
    for method in methods:
        lo, hi = METHOD_SLICES[method]
        scalers, scaled = [], []
        for c in conditions:
            scaler, Xs_std = fit_standard_scaler(per_condition[c][:, lo:hi])
            scalers.append(scaler)
            scaled.append(Xs_std)
        scores_b = mutual_info_classif_batch(np.stack(scaled), labels)
        for c, scaler, Xs_std, s in zip(conditions, scalers, scaled,
                                        scores_b):
            sel_cache[(c, method)] = (scaler, Xs_std, s)

    cells = [(c, m, k) for c in conditions for m in methods for k in ks]
    selections, X_sels, cfgs = {}, {}, {}
    for c, method, k in cells:
        lo, hi = METHOD_SLICES[method]
        scaler, Xs_std, s = sel_cache[(c, method)]
        idx = top_k_indices(s, k)
        selections[(c, method, k)] = SelectionModel(
            scaler=scaler, scores=s, selected_indices=idx,
            feature_names=list(all_names[lo:hi]))
        X_sels[(c, method, k)] = Xs_std[:, idx]
        cond_dir = "rgb_clean" if c == "clean" else c
        cfgs[(c, method, k)] = ExperimentConfig(
            dataset_path=(dataset_path
                          or os.path.join(f"<device:{c}>", dataset_type)),
            area_name=area_name, feature_method=method, k_features=k,
            output_dir=os.path.join(out_root, cond_dir, area_name,
                                    dataset_type, f"k{k}", method),
            J=J, L=L, boundary=boundary)

    # All (condition, method) cells of one k share the fit shapes: every
    # (final + fold) forest of the k-group runs in one vmapped dispatch.
    results = {}
    for k in ks:
        group = [(c, m, k) for c in conditions for m in methods]
        batch = train_final_models_batch(
            [X_sels[cell] for cell in group], labels, cfgs[group[0]])
        results.update(dict(zip(group, batch)))

    wall = round((time.time() - t_start) / max(1, len(cells)), 3)
    reports = []
    for cell in cells:
        c, method, k = cell
        cfg = cfgs[cell]
        selection = selections[cell]
        model, perf = results[cell]
        report = {
            "experiment_name": f"{method}_{area_name}_k{k}_WithModel",
            "config": cfg.to_report_dict(),
            "dataset_info": {
                "data_directory": cfg.dataset_path,
                "area_name": area_name,
                "total_images": int(len(labels)),
                "classes": {cl: int(n) for cl, n in sorted(counts.items())},
                "image_shape": [3, int(H), int(W)],
                "total_features_available": len(selection.feature_names),
                "feature_method": method,
                "dataset_type": dataset_type,
                "k_features": k,
                "noise_condition": c,
            },
            "feature_selection": {
                "method": f"SelectKBest_k{k}",
                "num_features": len(selection.selected_features),
                "selected_features": selection.selected_features,
                "feature_scores": selection.selected_scores.tolist(),
            },
            "performance": perf,
            "model_files": {
                "trained_model": "trained_model.npz",
                "scaler": "selection_model.json",
                "feature_selector": "selection_model.json",
                "feature_names": "feature_names.json",
            },
            "timestamp": datetime.datetime.now().isoformat(),
            "wall_time_sec": wall,
        }
        save_artifacts(cfg.output_dir, model, selection, report)
        reports.append(report)
        if verbose:
            log_event("cell_done", cell=cfg.output_dir,
                      cv_mean=perf["cv_mean_accuracy"],
                      wall_time_sec=wall, batched=True)
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
    p.add_argument("--boundary", default="reflect",
                   choices=["reflect", "periodic"])
    args = p.parse_args(argv)

    images, labels, _ = load_area_images_and_labels(args.dataset_path,
                                                    args.area_name)
    dataset_type = os.path.basename(os.path.normpath(args.dataset_path))
    reports = run_matrix_suite(
        images, labels, args.out_root, args.area_name, dataset_type,
        dataset_path=args.dataset_path, methods=args.methods, ks=args.k,
        families=args.families, seed=args.seed, boundary=args.boundary)
    print(f"Completed {len(reports)} cells -> {args.out_root}")


if __name__ == "__main__":
    main()
