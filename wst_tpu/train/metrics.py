"""Classification metrics matching sklearn's report/confusion-matrix output.

The reference persists sklearn's ``classification_report(output_dict=True)``
and ``confusion_matrix`` into every experiment JSON (reference: src/training/
train_and_save_model.py:191-198); the analyzers consume that schema.  This
module reproduces the same dict structure in pure numpy so reports remain
byte-compatible.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def accuracy_score(y_true, y_pred) -> float:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    return float(np.mean(y_true == y_pred))


def confusion_matrix(y_true, y_pred,
                     labels: Optional[List] = None) -> np.ndarray:
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    if labels is None:
        labels = np.unique(np.concatenate([y_true, y_pred]))
    labels = np.asarray(labels)
    index = {l: i for i, l in enumerate(labels.tolist())}
    cm = np.zeros((len(labels), len(labels)), np.int64)
    for t, p in zip(y_true.tolist(), y_pred.tolist()):
        if t in index and p in index:
            cm[index[t], index[p]] += 1
    return cm


def classification_report(y_true, y_pred,
                          labels: Optional[List] = None) -> Dict:
    """sklearn-compatible ``output_dict=True`` report."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    if labels is None:
        labels = np.unique(np.concatenate([y_true, y_pred]))
    labels = np.asarray(labels)
    cm = confusion_matrix(y_true, y_pred, labels=list(labels))
    tp = np.diag(cm).astype(np.float64)
    pred_tot = cm.sum(axis=0).astype(np.float64)
    true_tot = cm.sum(axis=1).astype(np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_tot > 0, tp / pred_tot, 0.0)
        recall = np.where(true_tot > 0, tp / true_tot, 0.0)
        denom = precision + recall
        f1 = np.where(denom > 0, 2 * precision * recall / denom, 0.0)

    report: Dict = {}
    for i, label in enumerate(labels.tolist()):
        report[str(label)] = {
            "precision": float(precision[i]),
            "recall": float(recall[i]),
            "f1-score": float(f1[i]),
            "support": float(true_tot[i]),
        }
    n = float(len(y_true))
    support_sum = float(true_tot.sum())
    report["accuracy"] = accuracy_score(y_true, y_pred)
    report["macro avg"] = {
        "precision": float(precision.mean()),
        "recall": float(recall.mean()),
        "f1-score": float(f1.mean()),
        "support": support_sum,
    }
    weights = true_tot / max(support_sum, 1.0)
    report["weighted avg"] = {
        "precision": float((precision * weights).sum()),
        "recall": float((recall * weights).sum()),
        "f1-score": float((f1 * weights).sum()),
        "support": support_sum,
    }
    return report


def per_class_accuracy(y_true, y_pred) -> Dict[str, float]:
    """Per-class recall dict (the reference's inference-time 'per-class
    accuracy', reference: src/inference/inference.py:449-460)."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    out = {}
    for label in np.unique(y_true).tolist():
        mask = y_true == label
        out[str(label)] = float(np.mean(y_pred[mask] == label))
    return out
