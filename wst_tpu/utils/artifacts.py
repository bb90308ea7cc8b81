"""Artifact store: the per-experiment bundle the reference persists.

The reference writes six files per experiment cell (reference: src/training/
train_and_save_model.py:200-317): trained_model.joblib, scaler.joblib,
feature_selector.joblib, feature_names.json, experiment_report_with_model
.json, model_usage_instructions.md.  This framework has no pickled sklearn
objects; the equivalents are transparent, portable JSON/NPZ artifacts:

* ``trained_model.npz``   — the forest node tables + class names.
* ``selection_model.json``— scaler mean/scale, MI scores, selected indices.
* ``feature_names.json``  — same schema as the reference's file.
* ``experiment_report_with_model.json`` — byte-compatible report schema.
* ``model_usage_instructions.md``

``load_artifacts`` restores a ready-to-predict (forest, selection) pair.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from wst_tpu.features.selection import SelectionModel
from wst_tpu.models.forest import ForestArrays, TreeEnsembleClassifier

REPORT_NAME = "experiment_report_with_model.json"
MODEL_NAME = "trained_model.npz"
SELECTION_NAME = "selection_model.json"
FEATURES_NAME = "feature_names.json"
USAGE_NAME = "model_usage_instructions.md"

_METHOD_DESC = {
    "advanced_stats": "Advanced Statistics",
    "wst": "Wavelet Scattering Transform",
    "hybrid": "Hybrid (RGB Stats + WST)",
}


def save_artifacts(output_dir, model: TreeEnsembleClassifier,
                   selection: SelectionModel, report: dict) -> None:
    os.makedirs(output_dir, exist_ok=True)
    f = model.forest_
    np.savez(os.path.join(output_dir, MODEL_NAME),
             feature=f.feature, threshold=f.threshold, left=f.left,
             right=f.right, is_leaf=f.is_leaf, probs=f.probs,
             classes=np.asarray(model.classes_, dtype=np.str_),
             n_estimators=np.int64(model.n_estimators),
             random_state=np.int64(model.random_state),
             max_depth_used=np.int64(model.max_depth_used_ or 0))
    with open(os.path.join(output_dir, SELECTION_NAME), "w") as fp:
        json.dump(selection.to_dict(), fp)
    with open(os.path.join(output_dir, FEATURES_NAME), "w") as fp:
        json.dump({
            "selected_features": selection.selected_features,
            "feature_scores": selection.selected_scores.tolist(),
            "all_feature_names": selection.feature_names,
        }, fp, indent=2)
    with open(os.path.join(output_dir, REPORT_NAME), "w") as fp:
        json.dump(report, fp, indent=2)
    cfg = report.get("config", {})
    perf = report.get("performance", {})
    usage = f"""# Model Usage Instructions

## Loading the Model
```python
from wst_tpu.utils.artifacts import load_artifacts
model, selection = load_artifacts({output_dir!r})
```

## Making Predictions
```python
from wst_tpu.features import FeatureExtractor
fx = FeatureExtractor({cfg.get('feature_method', 'hybrid')!r}, H, W)
X = fx.extract_numpy(images)          # (N, C, H, W) float32 in [0, 1]
predictions = model.predict(selection.transform(X))
probabilities = model.predict_proba(selection.transform(X))
```

## Model Details
- **Feature Method**: {_METHOD_DESC.get(cfg.get('feature_method'), cfg.get('feature_method'))}
- **Selected Features**: {selection.selected_features}
- **Model**: TPU tree ensemble with {cfg.get('n_estimators')} estimators
- **Test Accuracy**: {perf.get('test_accuracy', float('nan')):.4f}
- **CV Accuracy**: {perf.get('cv_mean_accuracy', float('nan')):.4f} ± {perf.get('cv_std_accuracy', float('nan')):.4f}
"""
    with open(os.path.join(output_dir, USAGE_NAME), "w") as fp:
        fp.write(usage)


def load_artifacts(model_dir) -> Tuple[TreeEnsembleClassifier,
                                       SelectionModel]:
    with np.load(os.path.join(model_dir, MODEL_NAME), allow_pickle=False) as z:
        forest = ForestArrays(
            feature=z["feature"], threshold=z["threshold"], left=z["left"],
            right=z["right"], is_leaf=z["is_leaf"], probs=z["probs"])
        classes = z["classes"]
        n_estimators = int(z["n_estimators"])
        random_state = int(z["random_state"])
        max_depth_used = int(z["max_depth_used"]) if "max_depth_used" in z \
            else 0
    model = TreeEnsembleClassifier(n_estimators=n_estimators,
                                   random_state=random_state)
    model.forest_ = forest
    model.classes_ = classes
    model.max_depth_used_ = max_depth_used or None
    with open(os.path.join(model_dir, SELECTION_NAME)) as fp:
        selection = SelectionModel.from_dict(json.load(fp))
    return model, selection


def load_report(model_dir) -> dict:
    with open(os.path.join(model_dir, REPORT_NAME)) as fp:
        return json.load(fp)
