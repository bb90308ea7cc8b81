"""Inference engine: load a trained experiment cell and classify datasets.

TPU-native replacement for the reference's ``ModelInference`` (reference:
src/inference/inference.py:54-570), with three deliberate upgrades:

* Configuration auto-detection reads the experiment report JSON saved next
  to the model (robust), falling back to the reference's path-token parsing
  (`.../{noise}/{area}/{size}/k{n}/{method}` corpus convention and the older
  `method_size_kN_area` underscore convention, reference: inference.py:
  61-124) when no report exists.
* The per-image serial predict loop becomes one batched device computation.
* Training and inference share one FeatureExtractor, eliminating the
  reference's wst train/inference feature-count mismatch (486 vs 492 —
  a known reference defect, SURVEY.md §2.1).

The dataset registry is configurable (constructor arg, ``WST_TPU_DATASETS``
env var pointing at a JSON file, or explicit --dataset-dir) instead of the
reference's hardcoded author paths (reference: inference.py:44-52).

CLI:
    python -m wst_tpu.infer.inference --model-dir DIR [--dataset-dir PATH]
        [-t TYPE] [-s N] [-o OUT] [--seed 42]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from wst_tpu.data.dataset import load_area_images_and_labels
from wst_tpu.features.extractor import FeatureExtractor
from wst_tpu.train.metrics import (accuracy_score, classification_report,
                                   confusion_matrix, per_class_accuracy)
from wst_tpu.utils.artifacts import REPORT_NAME, load_any_artifacts

AREAS = ("assatigue", "popolar", "sunset")
METHODS = ("advanced_stats", "wst", "hybrid")
SIZES = ("mini", "small", "original")


def _load_dataset_registry(registry: Optional[Dict[str, str]]
                           ) -> Dict[str, str]:
    if registry is not None:
        return dict(registry)
    env = os.environ.get("WST_TPU_DATASETS")
    if env and os.path.exists(env):
        with open(env) as f:
            return json.load(f)
    return {}


def parse_model_directory(model_dir: str) -> Dict[str, Optional[str]]:
    """Detect (area, method, dataset_type) from a model directory path.

    Handles the experiment-corpus convention
    ``.../{noise}/{area}/{size}/k{n}/{method}`` and the reference's legacy
    ``{method}_{size}_k{n}_{area}`` directory-name convention.
    """
    parts = [p for p in os.path.normpath(model_dir).split(os.sep) if p]
    info: Dict[str, Optional[str]] = {
        "area_name": None, "feature_method": None, "dataset_type": None}
    last = parts[-1] if parts else ""
    # Corpus convention: method is last, size two up, area three up.
    if last in METHODS:
        info["feature_method"] = last
        for p in reversed(parts):
            if info["dataset_type"] is None and p in SIZES:
                info["dataset_type"] = p
            if info["area_name"] is None and p in AREAS:
                info["area_name"] = p
    else:
        # Legacy underscore convention.
        tokens = last.split("_")
        if tokens and tokens[-1] in AREAS:
            info["area_name"] = tokens[-1]
        for m in ("advanced_stats", "hybrid", "wst"):
            if m in last:
                info["feature_method"] = m
                break
        for s in SIZES:
            if s in last:
                info["dataset_type"] = s
                break
    return info


class ModelInference:
    """Load a trained cell and run batched dataset classification."""

    def __init__(self, model_dir: str,
                 dataset_registry: Optional[Dict[str, str]] = None,
                 batch_size: int = 64, artifact_format: str = "auto",
                 reference_inference_quirk: bool = False,
                 boundary: Optional[str] = None):
        """``artifact_format``: "auto" serves both this framework's NPZ/JSON
        bundles and the reference corpus's joblib trio (so any of the 1,516
        checked-in model dirs is directly servable); "wst_tpu"/"joblib"
        force one.

        ``reference_inference_quirk``: byte-faithful reproduction of the
        reference *inference* script's feature construction (reference:
        src/inference/inference.py:237-287), which deviates from its own
        training script: the per-channel WST block is interleaved
        (mean_0, std_0, mean_1, ...) instead of training's
        (means..., stds...), and the ``wst`` method prepends 6 basic
        features (492 total) — which makes scaler.transform raise on any
        486-feature wst model, exactly as the reference does.  Default
        False = training-faithful features (the fixed behavior).

        ``boundary``: scattering boundary for feature extraction.  Default
        None = use the boundary the model was TRAINED with (read from the
        report config / NPZ extraction stamp; 'reflect' for pre-stamp and
        reference-corpus bundles).  An explicit value that contradicts the
        saved stamp raises — serving a periodic-trained cell on reflect
        features (or vice versa) is exactly the silent train/infer
        mismatch the reference shipped (reference: src/inference/
        inference.py:277-280) and this framework refuses to reproduce."""
        self.model_dir = model_dir
        self.batch_size = batch_size
        self.reference_inference_quirk = reference_inference_quirk
        self.dataset_registry = _load_dataset_registry(dataset_registry)

        report_path = os.path.join(model_dir, REPORT_NAME)
        self.report = None
        if os.path.exists(report_path):
            with open(report_path) as f:
                self.report = json.load(f)
        detected = parse_model_directory(model_dir)
        cfg = (self.report or {}).get("config", {})
        di = (self.report or {}).get("dataset_info", {})
        self.area_name = (cfg.get("area_name") or detected["area_name"])
        self.feature_method = (cfg.get("feature_method")
                               or detected["feature_method"]
                               or "advanced_stats")
        self.dataset_type = (di.get("dataset_type")
                             or detected["dataset_type"] or "original")
        if self.area_name is None:
            raise ValueError(
                f"Could not detect area from {model_dir!r}; expected one of "
                f"{AREAS} in the path or a {REPORT_NAME} with config.")
        self.model, self.selection = load_any_artifacts(model_dir,
                                                        artifact_format)
        # Extraction axes: report config first, NPZ extraction stamp as
        # fallback (joblib corpus bundles have neither -> the reference's
        # fixed J=2, L=8, reflect).
        stamp = getattr(self.model, "extraction_config_", {})
        self.J = int(cfg.get("J", stamp.get("J", 2)))
        self.L = int(cfg.get("L", stamp.get("L", 8)))
        saved_boundary = cfg.get("boundary") or stamp.get("boundary")
        if (boundary is not None and saved_boundary is not None
                and boundary != saved_boundary):
            raise ValueError(
                f"boundary mismatch: {model_dir!r} was trained with "
                f"boundary={saved_boundary!r} but boundary={boundary!r} was "
                f"requested.  Serving a model on features from a different "
                f"scattering boundary silently mismatches the training "
                f"distribution; retrain or drop the override.")
        self.boundary = boundary or saved_boundary or "reflect"
        self._extractors: Dict[Tuple[int, int], FeatureExtractor] = {}

    # ------------------------------------------------------------------ api

    @property
    def classes_(self):
        return self.model.classes_

    def _extractor(self, H: int, W: int) -> FeatureExtractor:
        if (H, W) not in self._extractors:
            self._extractors[(H, W)] = FeatureExtractor(
                self.feature_method, H, W, self.J, self.L,
                boundary=self.boundary)
        return self._extractors[(H, W)]

    def _apply_reference_quirk(self, X: np.ndarray,
                               images: np.ndarray) -> np.ndarray:
        """Rebuild feature vectors the way the reference's *inference* script
        does (reference: src/inference/inference.py:237-287): WST block
        interleaved per coefficient, and for ``wst`` 6 basic features
        prepended (dooming 486-feature models, faithfully)."""
        if self.feature_method == "advanced_stats":
            return X
        n_adv = 54 if self.feature_method == "hybrid" else 0
        wst = X[:, n_adv:]
        nc = wst.shape[1] // 6            # coefficients per channel
        perm = np.empty(2 * nc, np.int64)
        perm[0::2] = np.arange(nc)        # mean_i
        perm[1::2] = nc + np.arange(nc)   # std_i
        wst_il = wst.reshape(len(X), 3, 2 * nc)[:, :, perm].reshape(len(X), -1)
        if self.feature_method == "hybrid":
            return np.concatenate([X[:, :n_adv], wst_il], axis=1)
        basic = np.stack([images.mean(axis=(-2, -1)),
                          images.std(axis=(-2, -1))],
                         axis=-1).reshape(len(X), -1)  # R_mean,R_std,G_...
        return np.concatenate([basic, wst_il], axis=1)

    def predict_images(self, images: np.ndarray) -> pd.DataFrame:
        """images: (N, 3, H, W) float32 -> DataFrame with predictions."""
        H, W = images.shape[-2:]
        fx = self._extractor(H, W)
        feats = []
        for i in range(0, len(images), self.batch_size):
            feats.append(fx.extract_numpy(images[i:i + self.batch_size]))
        X_raw = np.concatenate(feats, axis=0)
        if self.reference_inference_quirk:
            X_raw = self._apply_reference_quirk(X_raw, np.asarray(images))
        X = self.selection.transform(X_raw)
        proba = self.model.predict_proba(X)
        pred = self.classes_[np.argmax(proba, axis=1)]
        df = pd.DataFrame({
            "predicted_label": pred,
            "confidence": proba.max(axis=1),
        })
        for j, c in enumerate(self.classes_):
            df[f"prob_{c}"] = proba[:, j]
        return df

    def predict_single_image(self, image_path) -> dict:
        """Single-file predict with the reference's result contract."""
        try:
            from wst_tpu.data.dataset import load_rgb_image
            img = load_rgb_image(image_path)[None]
            df = self.predict_images(img)
            probs = {c: float(df[f"prob_{c}"][0]) for c in self.classes_}
            return {"predicted_class": df["predicted_label"][0],
                    "probabilities": probs,
                    "confidence": float(df["confidence"][0]),
                    "success": True}
        except Exception as e:
            return {"predicted_class": None, "probabilities": None,
                    "confidence": 0.0, "success": False, "error": str(e)}

    def get_dataset_path(self, dataset_type_override: Optional[str] = None,
                         dataset_dir: Optional[str] = None) -> str:
        if dataset_dir:
            return dataset_dir
        dt = dataset_type_override or self.dataset_type
        if dt in self.dataset_registry:
            return self.dataset_registry[dt]
        cfg = (self.report or {}).get("config", {})
        if cfg.get("dataset_path") and os.path.isdir(cfg["dataset_path"]):
            return cfg["dataset_path"]
        raise ValueError(
            f"No dataset path for type {dt!r}: pass --dataset-dir, register "
            f"it in the registry (WST_TPU_DATASETS), or keep the training "
            f"dataset_path valid.")

    def predict_dataset(self, dataset_type_override: Optional[str] = None,
                        sample_per_class: Optional[int] = None,
                        dataset_dir: Optional[str] = None,
                        seed: Optional[int] = 42
                        ) -> Tuple[pd.DataFrame, int]:
        dataset_path = self.get_dataset_path(dataset_type_override,
                                             dataset_dir)
        images, labels, paths = load_area_images_and_labels(
            dataset_path, self.area_name, sample_per_class, seed)
        df = self.predict_images(images)
        df.insert(0, "image_path", paths)
        df.insert(1, "true_label", labels)
        return df, len(df)

    # ----------------------------------------------------------- evaluation

    def evaluate_predictions(self, results_df: pd.DataFrame
                             ) -> Optional[dict]:
        valid = results_df[results_df["predicted_label"] != "ERROR"]
        if len(valid) == 0:
            return None
        y_true = valid["true_label"].to_numpy()
        y_pred = valid["predicted_label"].to_numpy()
        conf = valid["confidence"].to_numpy()
        labels = list(self.classes_)
        return {
            "overall_accuracy": accuracy_score(y_true, y_pred),
            "mean_confidence": float(np.mean(conf)),
            "std_confidence": float(np.std(conf)),
            "classification_report": classification_report(
                y_true, y_pred, labels=labels),
            "confusion_matrix": confusion_matrix(y_true, y_pred,
                                                 labels=labels),
            "per_class_accuracy": per_class_accuracy(y_true, y_pred),
            "total_predictions": int(len(valid)),
            "successful_predictions": int(len(valid)),
        }

    def save_results(self, results_df: pd.DataFrame,
                     evaluation_results: Optional[dict], output_dir,
                     dataset_type_override: Optional[str] = None) -> None:
        os.makedirs(output_dir, exist_ok=True)
        dt = dataset_type_override or self.dataset_type
        suffix = f"{self.area_name}_{dt}_{self.feature_method}"
        results_df.to_csv(
            os.path.join(output_dir, f"inference_results_{suffix}.csv"),
            index=False)
        if evaluation_results:
            ev = dict(evaluation_results)
            ev["confusion_matrix"] = np.asarray(
                ev["confusion_matrix"]).tolist()
            ev["configuration"] = {
                "area_name": self.area_name,
                "feature_method": self.feature_method,
                "dataset_type": dt,
                "model_directory": self.model_dir,
            }
            with open(os.path.join(
                    output_dir, f"evaluation_summary_{suffix}.json"),
                    "w") as f:
                json.dump(ev, f, indent=2)
            self.plot_confusion_matrix(
                np.asarray(evaluation_results["confusion_matrix"]),
                list(self.classes_),
                os.path.join(output_dir, f"confusion_matrix_{suffix}.png"))

    @staticmethod
    def plot_confusion_matrix(cm, class_names, save_path) -> None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns
        plt.figure(figsize=(10, 8))
        sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                    xticklabels=class_names, yticklabels=class_names)
        plt.title("Confusion Matrix")
        plt.ylabel("True Label")
        plt.xlabel("Predicted Label")
        plt.tight_layout()
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close()


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Inference for trained wst_tpu experiment cells")
    p.add_argument("--model-dir", "-m", required=True)
    p.add_argument("--dataset-type", "-t", default=None)
    p.add_argument("--dataset-dir", "-d", default=None,
                   help="Explicit dataset root (overrides registry)")
    p.add_argument("--sample", "-s", type=int, default=None)
    p.add_argument("--output", "-o", default="inference_results")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--boundary", default=None,
                   choices=["reflect", "periodic"],
                   help="Scattering boundary override (default: the "
                        "boundary the model was trained with; a "
                        "contradictory override raises)")
    args = p.parse_args(argv)

    inf = ModelInference(args.model_dir, boundary=args.boundary)
    results_df, n = inf.predict_dataset(args.dataset_type, args.sample,
                                        args.dataset_dir, args.seed)
    ev = inf.evaluate_predictions(results_df)
    if ev:
        print(f"Overall Accuracy: {ev['overall_accuracy']:.4f}")
        print(f"Mean Confidence: {ev['mean_confidence']:.4f} "
              f"± {ev['std_confidence']:.4f}")
        for cls, acc in ev["per_class_accuracy"].items():
            print(f"  {cls}: {acc:.4f}")
    inf.save_results(results_df, ev, args.output, args.dataset_type)
    print(f"Processed {n} images; results saved to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
