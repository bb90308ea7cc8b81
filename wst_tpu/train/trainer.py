"""End-to-end experiment cell: load -> features -> select -> train -> CV ->
artifacts, emitting the reference's report schema.

TPU-native re-design of the reference training script (reference:
src/training/train_and_save_model.py:429-553).  The per-image serial hot
loop becomes one batched device computation; everything else (splits, CV,
report) reproduces the reference's behaviour exactly.

CLI mirrors the reference:
    python -m wst_tpu.train.trainer <dataset_path> <area> <method> <k> \
        <output_dir> [--n_estimators N] [--test_size F] [--random_state N] \
        [--cv_folds N]
"""

from __future__ import annotations

import argparse
import datetime
import time
from collections import Counter
from typing import Optional, Tuple

import numpy as np

from wst_tpu.data.dataset import load_area_images_and_labels
from wst_tpu.features.extractor import FeatureExtractor
from wst_tpu.features.selection import fit_select_kbest
from wst_tpu.models.forest import TreeEnsembleClassifier
from wst_tpu.train.metrics import (accuracy_score, classification_report,
                                   confusion_matrix)
from wst_tpu.train.splits import (stratified_kfold_indices,
                                  stratified_train_test_split)
from wst_tpu.utils.artifacts import save_artifacts
from wst_tpu.utils.config import ExperimentConfig


def extract_features_batched(config: ExperimentConfig, images: np.ndarray,
                             extractor: Optional[FeatureExtractor] = None
                             ) -> np.ndarray:
    """Feature matrix for (N, 3, H, W) images, batched on device."""
    H, W = images.shape[-2:]
    fx = extractor or FeatureExtractor(config.feature_method, H, W,
                                       config.J, config.L,
                                       config.scattering_mode,
                                       boundary=config.boundary)
    chunks = []
    bs = config.batch_size
    for i in range(0, len(images), bs):
        chunks.append(fx.extract_numpy(images[i:i + bs]))
    return np.concatenate(chunks, axis=0)


def train_final_model(X: np.ndarray, y: np.ndarray,
                      config: ExperimentConfig
                      ) -> Tuple[TreeEnsembleClassifier, dict]:
    """Stratified split + fit + test eval + stratified k-fold CV.

    Mirrors the reference's ``train_final_model`` (reference: src/training/
    train_and_save_model.py:167-198): CV re-fits a fresh model per fold on
    the full selected matrix.
    """
    n_estimators = config.resolve_n_estimators()
    tr, te = stratified_train_test_split(y, config.test_size,
                                         config.random_state)
    model = TreeEnsembleClassifier(n_estimators=n_estimators,
                                   random_state=config.random_state)
    model.fit(X[tr], y[tr])
    y_pred = model.predict(X[te])
    test_accuracy = accuracy_score(y[te], y_pred)

    cv_scores = []
    for ftr, fte in stratified_kfold_indices(y, config.cv_folds,
                                             config.random_state):
        fold_model = TreeEnsembleClassifier(n_estimators=n_estimators,
                                            random_state=config.random_state)
        fold_model.fit(X[ftr], y[ftr])
        cv_scores.append(fold_model.score(X[fte], y[fte]))
    cv_scores = np.asarray(cv_scores)

    labels = sorted(np.unique(y).tolist())
    performance = {
        "test_accuracy": test_accuracy,
        "cv_mean_accuracy": float(np.mean(cv_scores)),
        "cv_std_accuracy": float(np.std(cv_scores)),
        "cv_scores": cv_scores.tolist(),
        "classification_report": classification_report(y[te], y_pred,
                                                       labels=labels),
        "confusion_matrix": confusion_matrix(y[te], y_pred,
                                             labels=labels).tolist(),
    }
    return model, performance


def train_final_models_batch(Xs, y: np.ndarray, config: ExperimentConfig):
    """``train_final_model`` for M cells sharing one label vector — all
    (1 + cv_folds) * M forest fits in a handful of vmapped device dispatches
    (grouped by shape), then all evaluations likewise.

    Per-cell results are identical to calling ``train_final_model`` on each
    X: the split/fold indices depend only on (y, seed) and the batched fit
    is a vmap of the same deterministic per-cell program.  Returns a list of
    (model, performance) pairs.
    """
    from wst_tpu.models.forest import (fit_tree_ensembles,
                                       predict_tree_ensembles)

    n_estimators = config.resolve_n_estimators()
    tr, te = stratified_train_test_split(y, config.test_size,
                                         config.random_state)
    folds = list(stratified_kfold_indices(y, config.cv_folds,
                                          config.random_state))
    M = len(Xs)
    Xs = [np.asarray(X, np.float32) for X in Xs]

    # One flat job list: job (i, -1) = cell i's final fit on the train
    # split; job (i, j>=0) = cell i's CV fold j.
    jobs = [(i, j) for i in range(M) for j in range(-1, len(folds))]
    fit_X, fit_y, eval_X, eval_y = [], [], [], []
    for i, j in jobs:
        fit_idx, eval_idx = (tr, te) if j < 0 else folds[j]
        fit_X.append(Xs[i][fit_idx])
        fit_y.append(y[fit_idx])
        eval_X.append(Xs[i][eval_idx])
        eval_y.append(y[eval_idx])

    # Batched fits, grouped by training-set shape (for the reference's
    # grid sizes every job shares one shape: 0.8n == (folds-1)/folds * n).
    models = [None] * len(jobs)
    fit_groups = {}
    for idx, X in enumerate(fit_X):
        fit_groups.setdefault(X.shape, []).append(idx)
    for idxs in fit_groups.values():
        fitted = fit_tree_ensembles([fit_X[i] for i in idxs],
                                    [fit_y[i] for i in idxs],
                                    n_estimators=n_estimators,
                                    random_state=config.random_state)
        for i, m in zip(idxs, fitted):
            models[i] = m

    # Batched evaluation predictions, grouped by eval-set shape.
    preds = [None] * len(jobs)
    pred_groups = {}
    for idx, X in enumerate(eval_X):
        pred_groups.setdefault(X.shape, []).append(idx)
    for idxs in pred_groups.values():
        outs = predict_tree_ensembles([models[i] for i in idxs],
                                      [eval_X[i] for i in idxs])
        for i, p in zip(idxs, outs):
            preds[i] = p

    labels = sorted(np.unique(y).tolist())
    results = []
    per_cell = len(folds) + 1
    for i in range(M):
        base = i * per_cell
        y_pred = preds[base]                       # final fit, test split
        cv_scores = np.asarray([
            float(np.mean(preds[base + 1 + j] == eval_y[base + 1 + j]))
            for j in range(len(folds))])
        performance = {
            "test_accuracy": accuracy_score(y[te], y_pred),
            "cv_mean_accuracy": float(np.mean(cv_scores)),
            "cv_std_accuracy": float(np.std(cv_scores)),
            "cv_scores": cv_scores.tolist(),
            "classification_report": classification_report(y[te], y_pred,
                                                           labels=labels),
            "confusion_matrix": confusion_matrix(y[te], y_pred,
                                                 labels=labels).tolist(),
        }
        results.append((models[base], performance))
    return results


def run_experiment(config: ExperimentConfig,
                   images: Optional[np.ndarray] = None,
                   labels: Optional[np.ndarray] = None,
                   save: bool = True, verbose: bool = True) -> dict:
    """One grid cell.  Returns the report dict (and persists artifacts)."""
    t0 = time.time()
    if images is None or labels is None:
        images, labels, _paths = load_area_images_and_labels(
            config.dataset_path, config.area_name)
    if verbose:
        print(f"[{config.area_name}/{config.dataset_type}/"
              f"k{config.k_features}/{config.feature_method}] "
              f"{len(images)} images")

    H, W = images.shape[-2:]
    fx = FeatureExtractor(config.feature_method, H, W, config.J, config.L,
                          config.scattering_mode, boundary=config.boundary)
    X = extract_features_batched(config, images, fx)
    X_selected, selection = fit_select_kbest(
        X, labels, fx.feature_names, k=config.k_features)
    model, performance = train_final_model(X_selected, labels, config)

    class_counts = Counter(labels.tolist())
    experiment_name = (f"{config.feature_method}_{config.area_name}"
                       f"_k{config.k_features}_WithModel")
    report = {
        "experiment_name": experiment_name,
        "config": config.to_report_dict(),
        "dataset_info": {
            "data_directory": config.dataset_path,
            "area_name": config.area_name,
            "total_images": int(len(images)),
            "classes": {k: int(v) for k, v in sorted(class_counts.items())},
            "image_shape": [3, int(H), int(W)],
            "total_features_available": fx.n_features,
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
    if save:
        save_artifacts(config.output_dir, model, selection, report)
    if verbose:
        print(f"  test_acc={performance['test_accuracy']:.4f} "
              f"cv={performance['cv_mean_accuracy']:.4f}"
              f"±{performance['cv_std_accuracy']:.4f} "
              f"({report['wall_time_sec']}s)")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train a TPU tree-ensemble classifier on WST/stats "
                    "features")
    p.add_argument("dataset_path")
    p.add_argument("area_name")
    p.add_argument("feature_method",
                   choices=["advanced_stats", "wst", "hybrid"])
    p.add_argument("k_features", type=int)
    p.add_argument("output_dir")
    p.add_argument("--n_estimators", type=int, default=50)
    p.add_argument("--test_size", type=float, default=0.2)
    p.add_argument("--random_state", type=int, default=42)
    p.add_argument("--cv_folds", type=int, default=5)
    p.add_argument("--J", type=int, default=2)
    p.add_argument("--L", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--scattering_mode", default=None,
                   choices=["fft", "matmul", "pallas"],
                   help="Spectral backend (default: auto by platform; "
                        "'pallas' = fused TPU kernel, J=2 only)")
    p.add_argument("--boundary", default="reflect",
                   choices=["reflect", "periodic"],
                   help="Scattering boundary: 'reflect' = kymatio-faithful "
                        "parity mode, 'periodic' = TPU fast mode.  Saved "
                        "into the artifact bundle; inference extracts with "
                        "the saved boundary.")
    args = p.parse_args(argv)
    config = ExperimentConfig(
        dataset_path=args.dataset_path, area_name=args.area_name,
        feature_method=args.feature_method, k_features=args.k_features,
        output_dir=args.output_dir, n_estimators=args.n_estimators,
        test_size=args.test_size, random_state=args.random_state,
        cv_folds=args.cv_folds, J=args.J, L=args.L,
        batch_size=args.batch_size, scattering_mode=args.scattering_mode,
        boundary=args.boundary)
    report = run_experiment(config)
    print(f"Saved artifacts to {config.output_dir}")
    return report


if __name__ == "__main__":
    main()
