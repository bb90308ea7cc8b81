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
    # Stamp the feature-extraction axes into the model bundle itself (in
    # addition to the report config) so the artifact stays self-describing
    # even when served without its report JSON: a cell trained with
    # boundary="periodic" must never be silently served reflect features
    # (the reference's own train/infer mismatch defect class, reference:
    # src/inference/inference.py:277-280).
    cfg = report.get("config", {})
    np.savez(os.path.join(output_dir, MODEL_NAME),
             feature=f.feature, threshold=f.threshold, left=f.left,
             right=f.right, is_leaf=f.is_leaf, probs=f.probs,
             classes=np.asarray(model.classes_, dtype=np.str_),
             n_estimators=np.int64(model.n_estimators),
             random_state=np.int64(model.random_state),
             max_depth_used=np.int64(model.max_depth_used_ or 0),
             extraction_J=np.int64(cfg.get("J", 2)),
             extraction_L=np.int64(cfg.get("L", 8)),
             extraction_boundary=np.str_(cfg.get("boundary", "reflect")))
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
fx = FeatureExtractor({cfg.get('feature_method', 'hybrid')!r}, H, W,
                      J={cfg.get('J', 2)}, L={cfg.get('L', 8)},
                      boundary={cfg.get('boundary', 'reflect')!r})
X = fx.extract_numpy(images)          # (N, C, H, W) float32 in [0, 1]
predictions = model.predict(selection.transform(X))
probabilities = model.predict_proba(selection.transform(X))
```

## Model Details
- **Feature Method**: {_METHOD_DESC.get(cfg.get('feature_method'), cfg.get('feature_method'))}
- **Scattering**: J={cfg.get('J', 2)}, L={cfg.get('L', 8)}, boundary={cfg.get('boundary', 'reflect')!r} — inference features MUST be extracted with this boundary
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
        # Pre-round-5 bundles lack the extraction stamp; they were all
        # trained with the defaults.
        extraction = {
            "J": int(z["extraction_J"]) if "extraction_J" in z else 2,
            "L": int(z["extraction_L"]) if "extraction_L" in z else 8,
            "boundary": (str(z["extraction_boundary"])
                         if "extraction_boundary" in z else "reflect"),
        }
    model = TreeEnsembleClassifier(n_estimators=n_estimators,
                                   random_state=random_state)
    model.forest_ = forest
    model.classes_ = classes
    model.max_depth_used_ = max_depth_used or None
    model.extraction_config_ = extraction
    with open(os.path.join(model_dir, SELECTION_NAME)) as fp:
        selection = SelectionModel.from_dict(json.load(fp))
    return model, selection


def load_report(model_dir) -> dict:
    with open(os.path.join(model_dir, REPORT_NAME)) as fp:
        return json.load(fp)


# ---------------------------------------------------------------------------
# Reference joblib bundle loader: serve any of the corpus's 1,516 saved
# sklearn models directly (reference: src/inference/inference.py:126-161
# loads trained_model.joblib + scaler.joblib + feature_selector.joblib).
# ---------------------------------------------------------------------------

JOBLIB_MODEL_NAME = "trained_model.joblib"
JOBLIB_SCALER_NAME = "scaler.joblib"
JOBLIB_SELECTOR_NAME = "feature_selector.joblib"


class SklearnModelAdapter:
    """Duck-types TreeEnsembleClassifier's predict surface over a loaded
    sklearn RandomForestClassifier."""

    def __init__(self, rf):
        self._rf = rf
        self.classes_ = np.asarray(rf.classes_)
        self.n_estimators = int(rf.n_estimators)

    def predict(self, X):
        return self._rf.predict(np.asarray(X))

    def predict_proba(self, X):
        return self._rf.predict_proba(np.asarray(X))

    def score(self, X, y):
        return float((self.predict(X) == np.asarray(y)).mean())


class SklearnSelectionAdapter:
    """Duck-types SelectionModel's transform surface over a loaded sklearn
    StandardScaler + SelectKBest pair."""

    def __init__(self, scaler, selector, feature_names):
        self._scaler = scaler
        self._selector = selector
        self.feature_names = list(feature_names)
        self.selected_indices = np.asarray(
            selector.get_support(indices=True), np.int64)
        self.scores = np.asarray(selector.scores_, np.float64)

    @property
    def selected_features(self):
        if self.feature_names:
            return [self.feature_names[i] for i in self.selected_indices]
        return [f"f{i}" for i in self.selected_indices]

    @property
    def selected_scores(self):
        return self.scores[self.selected_indices]

    @property
    def n_features_in(self) -> int:
        return int(np.asarray(self._scaler.mean_).shape[0])

    def transform(self, X):
        return self._selector.transform(self._scaler.transform(
            np.asarray(X)))


def has_joblib_artifacts(model_dir) -> bool:
    return all(os.path.exists(os.path.join(model_dir, n)) for n in
               (JOBLIB_MODEL_NAME, JOBLIB_SCALER_NAME, JOBLIB_SELECTOR_NAME))


def load_joblib_artifacts(model_dir) -> Tuple[SklearnModelAdapter,
                                              SklearnSelectionAdapter]:
    """Load a reference-corpus cell's pickled sklearn artifact trio.

    The corpus was written by sklearn 1.7; loading under a newer sklearn
    emits InconsistentVersionWarning but round-trips these simple estimators
    faithfully (covered by tests/test_inference.py corpus tests).
    """
    import warnings

    import joblib
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore",
                                message=".*InconsistentVersion.*")
        try:  # sklearn >= 1.0 exposes the class; filter by category too
            from sklearn.exceptions import InconsistentVersionWarning
            warnings.simplefilter("ignore", InconsistentVersionWarning)
        except ImportError:
            pass
        rf = joblib.load(os.path.join(model_dir, JOBLIB_MODEL_NAME))
        scaler = joblib.load(os.path.join(model_dir, JOBLIB_SCALER_NAME))
        selector = joblib.load(os.path.join(model_dir, JOBLIB_SELECTOR_NAME))
    names_path = os.path.join(model_dir, FEATURES_NAME)
    names = []
    if os.path.exists(names_path):
        with open(names_path) as fp:
            payload = json.load(fp)
        # the reference writes either a bare list or {"feature_names": [...]}
        names = payload if isinstance(payload, list) else \
            payload.get("all_feature_names", payload.get("feature_names", []))
    return SklearnModelAdapter(rf), SklearnSelectionAdapter(scaler, selector,
                                                            names)


def load_any_artifacts(model_dir, artifact_format: str = "auto"):
    """Load a model dir in either this framework's NPZ/JSON format or the
    reference's joblib format.

    artifact_format: "auto" (prefer native, fall back to joblib),
    "wst_tpu", or "joblib".
    """
    if artifact_format not in ("auto", "wst_tpu", "joblib"):
        raise ValueError(f"unknown artifact_format: {artifact_format!r}")
    native = os.path.exists(os.path.join(model_dir, MODEL_NAME))
    if artifact_format == "wst_tpu" or (artifact_format == "auto" and native):
        return load_artifacts(model_dir)
    if artifact_format == "joblib" or has_joblib_artifacts(model_dir):
        return load_joblib_artifacts(model_dir)
    raise FileNotFoundError(
        f"{model_dir!r} contains neither {MODEL_NAME} nor the joblib trio "
        f"({JOBLIB_MODEL_NAME}, {JOBLIB_SCALER_NAME}, {JOBLIB_SELECTOR_NAME})")


# ---------------------------------------------------------------------------
# Reference joblib bundle EXPORT: convert a wst_tpu NPZ cell into the
# reference's sklearn artifact trio so the reference's own inference.py
# (reference: src/inference/inference.py:126-161) can consume models trained
# here — true stock-sklearn objects, no wst_tpu import needed to unpickle.
# ---------------------------------------------------------------------------

def _sklearn_node_dtype():
    """The Cython Tree node record dtype of the installed sklearn."""
    from sklearn.tree import DecisionTreeClassifier
    t = DecisionTreeClassifier(max_depth=1).fit([[0.0], [1.0]], [0, 1])
    return t.tree_.__getstate__()["nodes"].dtype


def _sklearn_tree(feature, threshold, left, right, is_leaf, probs,
                  n_features: int, classes, node_dtype):
    """One wst_tpu node table -> a fitted sklearn DecisionTreeClassifier.

    Reachable nodes are compacted BFS-first; traversal semantics match
    (x[feature] <= threshold -> left).  Leaf ``values`` carry the stored
    class probabilities (already normalized), which is exactly what
    sklearn's predict_proba consumes.
    """
    from sklearn.tree import DecisionTreeClassifier
    from sklearn.tree._tree import Tree

    C = probs.shape[1]
    order, depth_of = [0], {0: 0}
    head = 0
    while head < len(order):
        nid = order[head]
        head += 1
        if not is_leaf[nid]:
            for ch in (int(left[nid]), int(right[nid])):
                depth_of[ch] = depth_of[nid] + 1
                order.append(ch)
    remap = {old: new for new, old in enumerate(order)}

    nodes = np.zeros(len(order), dtype=node_dtype)
    values = np.zeros((len(order), 1, C), np.float64)
    for new, old in enumerate(order):
        p = probs[old].astype(np.float64)
        values[new, 0] = p
        gini = float(1.0 - np.sum(p * p))
        if is_leaf[old]:
            nodes[new] = (-1, -1, -2, -2.0, gini, 1, 1.0, 0)
        else:
            nodes[new] = (remap[int(left[old])], remap[int(right[old])],
                          int(feature[old]), float(threshold[old]),
                          gini, 1, 1.0, 0)

    tree = Tree(n_features, np.asarray([C], dtype=np.intp), 1)
    tree.__setstate__({"max_depth": max(depth_of.values()),
                       "node_count": len(order),
                       "nodes": nodes, "values": values})
    clf = DecisionTreeClassifier()
    clf.tree_ = tree
    clf.classes_ = np.asarray(classes)
    clf.n_classes_ = C
    clf.n_outputs_ = 1
    clf.n_features_in_ = n_features
    return clf


def forest_to_sklearn(model: TreeEnsembleClassifier, n_features: int):
    """wst_tpu TreeEnsembleClassifier -> stock sklearn RandomForestClassifier
    with identical predict/predict_proba (same trees, same `<=` rule, same
    probability averaging)."""
    from sklearn.ensemble import RandomForestClassifier

    f = model.forest_
    dtype = _sklearn_node_dtype()
    ests = [_sklearn_tree(f.feature[t], f.threshold[t], f.left[t],
                          f.right[t], f.is_leaf[t], f.probs[t],
                          n_features, model.classes_, dtype)
            for t in range(f.feature.shape[0])]
    rf = RandomForestClassifier(
        n_estimators=len(ests), max_features="sqrt",
        min_samples_split=model.min_samples_split,
        min_samples_leaf=model.min_samples_leaf,
        random_state=model.random_state)
    rf.estimators_ = ests
    rf.classes_ = np.asarray(model.classes_)
    rf.n_classes_ = len(rf.classes_)
    rf.n_outputs_ = 1
    rf.n_features_in_ = n_features
    return rf


def export_joblib(model_dir, out_dir=None) -> dict:
    """Export a wst_tpu NPZ/JSON cell as the reference's joblib trio.

    Writes trained_model.joblib / scaler.joblib / feature_selector.joblib
    (stock sklearn RandomForestClassifier / StandardScaler / SelectKBest)
    next to the native artifacts (or into ``out_dir``), making the cell
    consumable by the reference's inference.py:126-161 without wst_tpu
    installed.  feature_names.json (already written by save_artifacts)
    completes the reference's expected file set.  Returns the written paths.
    """
    import joblib
    from sklearn.feature_selection import SelectKBest
    from sklearn.preprocessing import StandardScaler

    model, selection = load_artifacts(model_dir)
    out_dir = out_dir or model_dir
    os.makedirs(out_dir, exist_ok=True)
    F = len(selection.scores)
    k = len(selection.selected_indices)

    scaler = StandardScaler()
    scaler.mean_ = np.asarray(selection.scaler.mean, np.float64)
    scaler.scale_ = np.asarray(selection.scaler.scale, np.float64)
    scaler.var_ = scaler.scale_ ** 2
    scaler.n_features_in_ = F
    scaler.n_samples_seen_ = np.int64(1)

    selector = SelectKBest(k=k)
    selector.scores_ = np.asarray(selection.scores, np.float64)
    selector.pvalues_ = None
    selector.n_features_in_ = F
    got = np.sort(np.argsort(selector.scores_, kind="mergesort")[-k:])
    assert np.array_equal(got, np.sort(selection.selected_indices)), (
        "SelectKBest support from stored scores disagrees with the "
        "selected indices — scores and indices are inconsistent")

    rf = forest_to_sklearn(model, n_features=k)

    paths = {}
    for name, obj in ((JOBLIB_MODEL_NAME, rf), (JOBLIB_SCALER_NAME, scaler),
                      (JOBLIB_SELECTOR_NAME, selector)):
        p = os.path.join(out_dir, name)
        joblib.dump(obj, p)
        paths[name] = p
    if out_dir != model_dir:
        names_src = os.path.join(model_dir, FEATURES_NAME)
        if os.path.exists(names_src):
            import shutil
            shutil.copy(names_src, os.path.join(out_dir, FEATURES_NAME))
    # Stamp the extraction axes into the exported bundle's usage notes: a
    # consumer of the joblib trio (e.g. the reference's inference.py) has
    # no NPZ header to read, so the boundary contract must travel in the
    # human-readable instructions.
    ex = getattr(model, "extraction_config_",
                 {"J": 2, "L": 8, "boundary": "reflect"})
    usage_path = os.path.join(out_dir, USAGE_NAME)
    stamp = (f"\n## Exported joblib bundle\n"
             f"- **Scattering**: J={ex['J']}, L={ex['L']}, "
             f"boundary={ex['boundary']!r}\n"
             f"- Inference features MUST be extracted with "
             f"boundary={ex['boundary']!r} (J/L as above); serving this "
             f"model on features from any other boundary silently "
             f"mismatches the training distribution.\n")
    existing = ""
    if os.path.exists(usage_path):
        with open(usage_path) as fp:
            existing = fp.read()
    if "## Exported joblib bundle" not in existing:
        with open(usage_path, "w") as fp:
            fp.write(existing + stamp)
    paths[USAGE_NAME] = usage_path
    return paths
