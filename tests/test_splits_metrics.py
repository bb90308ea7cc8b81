"""Split generators must be bit-identical to sklearn; metrics must match
sklearn's dict schema and values."""

import numpy as np
import pytest
from sklearn.metrics import classification_report as sk_report
from sklearn.metrics import confusion_matrix as sk_cm
from sklearn.model_selection import StratifiedKFold, train_test_split

from wst_tpu.train.metrics import (accuracy_score, classification_report,
                                   confusion_matrix, per_class_accuracy)
from wst_tpu.train.splits import (stratified_kfold_indices,
                                  stratified_train_test_split)


@pytest.mark.parametrize("n_per,seed", [(5, 42), (15, 42), (40, 42),
                                        (15, 7), (40, 123)])
def test_train_test_split_matches_sklearn(n_per, seed):
    y = np.array(["garden", "low_veg", "trees"]).repeat(n_per)
    X = np.arange(len(y))[:, None]
    tr_idx, te_idx = stratified_train_test_split(y, 0.2, seed)
    X_tr, X_te, y_tr, y_te = train_test_split(
        X, y, test_size=0.2, random_state=seed, stratify=y)
    np.testing.assert_array_equal(np.sort(tr_idx), np.sort(X_tr[:, 0]))
    np.testing.assert_array_equal(np.sort(te_idx), np.sort(X_te[:, 0]))
    # order matters too (the reference trains on sklearn's exact order)
    np.testing.assert_array_equal(tr_idx, X_tr[:, 0])
    np.testing.assert_array_equal(te_idx, X_te[:, 0])


@pytest.mark.parametrize("n_per,seed", [(5, 42), (15, 42), (40, 42),
                                        (16, 3)])
def test_kfold_matches_sklearn(n_per, seed):
    rng = np.random.default_rng(0)
    y = rng.permutation(np.array(["a", "b", "c"]).repeat(n_per))
    folds = stratified_kfold_indices(y, 5, seed)
    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=seed)
    for (tr, te), (str_, ste) in zip(folds, skf.split(np.zeros(len(y)), y)):
        np.testing.assert_array_equal(tr, str_)
        np.testing.assert_array_equal(te, ste)


def test_split_errors():
    with pytest.raises(ValueError):
        stratified_train_test_split(np.array(["a", "b", "b"]))
    with pytest.raises(ValueError):
        stratified_kfold_indices(np.array(["a"] * 3 + ["b"] * 5), 5)


def test_report_matches_sklearn(rng):
    y_true = rng.choice(["garden", "low_veg", "trees"], 50)
    y_pred = np.where(rng.random(50) < 0.7, y_true,
                      rng.choice(["garden", "low_veg", "trees"], 50))
    ours = classification_report(y_true, y_pred)
    theirs = sk_report(y_true, y_pred, output_dict=True, zero_division=0)
    assert set(ours) == set(theirs)
    for k in theirs:
        if k == "accuracy":
            assert abs(ours[k] - theirs[k]) < 1e-12
        else:
            for m in ("precision", "recall", "f1-score", "support"):
                assert abs(ours[k][m] - theirs[k][m]) < 1e-12, (k, m)
    np.testing.assert_array_equal(confusion_matrix(y_true, y_pred),
                                  sk_cm(y_true, y_pred))
    assert accuracy_score(y_true, y_pred) == theirs["accuracy"]


def test_per_class_accuracy():
    y_true = np.array(["a", "a", "b", "b"])
    y_pred = np.array(["a", "b", "b", "b"])
    pca = per_class_accuracy(y_true, y_pred)
    assert pca == {"a": 0.5, "b": 1.0}
