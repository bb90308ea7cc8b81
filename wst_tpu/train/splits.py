"""Stratified split / k-fold index generation, bit-identical to sklearn.

The reference's experiment cells depend on sklearn's exact fold composition
(``train_test_split(stratify=y, random_state)`` and
``StratifiedKFold(shuffle=True, random_state)``, reference: src/training/
train_and_save_model.py:169-189).  To make results reproducible against the
checked-in corpus without importing sklearn at runtime, this module
re-implements both index generators in pure numpy, following sklearn's
published algorithms with the same ``np.random.RandomState`` consumption
order.  ``tests/test_splits.py`` verifies bit-identical output vs sklearn.

Fold assignment is a pure function of (labels, seed) — independent of device
count or sharding (SURVEY.md §7 "Stratified-CV reproducibility across
shards").
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np


def _approximate_mode(class_counts: np.ndarray, n_draws: int,
                      rng: np.random.RandomState) -> np.ndarray:
    """sklearn.utils._approximate_mode: floor allocation + largest-remainder
    rounding with random tie-breaking."""
    continuous = class_counts / class_counts.sum() * n_draws
    floored = np.floor(continuous)
    need_to_add = int(n_draws - floored.sum())
    if need_to_add > 0:
        remainder = continuous - floored
        values = np.sort(np.unique(remainder))[::-1]
        for value in values:
            (inds,) = np.where(remainder == value)
            add_now = min(len(inds), need_to_add)
            inds = rng.choice(inds, size=add_now, replace=False)
            floored[inds] += 1
            need_to_add -= add_now
            if need_to_add == 0:
                break
    return floored.astype(int)


def stratified_train_test_split(
        y, test_size: float = 0.2,
        random_state: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """Index version of sklearn's stratified ``train_test_split``.

    Returns (train_idx, test_idx) — identical to
    ``StratifiedShuffleSplit(n_splits=1, test_size, random_state)``.
    """
    y = np.asarray(y)
    n = len(y)
    n_test = int(math.ceil(test_size * n))
    n_train = n - n_test
    classes, y_indices = np.unique(y, return_inverse=True)
    class_counts = np.bincount(y_indices)
    if np.min(class_counts) < 2:
        raise ValueError("The least populated class has fewer than 2 members")

    rng = np.random.RandomState(random_state)
    n_i = _approximate_mode(class_counts, n_train, rng)
    class_counts_remaining = class_counts - n_i
    t_i = _approximate_mode(class_counts_remaining, n_test, rng)

    train: List[int] = []
    test: List[int] = []
    for i in range(len(classes)):
        permutation = rng.permutation(class_counts[i])
        perm_indices_class_i = np.where(y_indices == i)[0][permutation]
        train.extend(perm_indices_class_i[: n_i[i]])
        test.extend(perm_indices_class_i[n_i[i]: n_i[i] + t_i[i]])
    train = rng.permutation(train)
    test = rng.permutation(test)
    return np.asarray(train), np.asarray(test)


def stratified_kfold_test_folds(y, n_splits: int = 5,
                                random_state: int = 42) -> np.ndarray:
    """Per-sample test-fold id, identical to sklearn's
    ``StratifiedKFold(shuffle=True, random_state)._make_test_folds``."""
    y = np.asarray(y)
    rng = np.random.RandomState(random_state)
    # Classes are encoded by order of first appearance in y (sklearn detail).
    _, y_first_idx, y_inv = np.unique(y, return_index=True,
                                      return_inverse=True)
    _, class_perm = np.unique(y_first_idx, return_inverse=True)
    y_encoded = class_perm[y_inv]
    n_classes = len(y_first_idx)
    y_counts = np.bincount(y_encoded)
    if np.min(y_counts) < n_splits:
        raise ValueError(
            f"n_splits={n_splits} greater than the number of members in the "
            f"least populated class ({np.min(y_counts)}).")

    y_order = np.sort(y_encoded)
    allocation = np.asarray([
        np.bincount(y_order[i::n_splits], minlength=n_classes)
        for i in range(n_splits)])
    test_folds = np.empty(len(y), dtype="i")
    for k in range(n_classes):
        folds_for_class = np.arange(n_splits).repeat(allocation[:, k])
        rng.shuffle(folds_for_class)
        test_folds[y_encoded == k] = folds_for_class
    return test_folds


def stratified_kfold_indices(y, n_splits: int = 5, random_state: int = 42
                             ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """List of (train_idx, test_idx) per fold, sklearn-identical."""
    test_folds = stratified_kfold_test_folds(y, n_splits, random_state)
    out = []
    idx = np.arange(len(test_folds))
    for k in range(n_splits):
        test = idx[test_folds == k]
        train = idx[test_folds != k]
        out.append((train, test))
    return out
