"""Dispatch-batched grid cells == the per-cell path, exactly.

The factorial grid's classifier stage (MI selection + forest fits + CV)
runs vmapped across cells; these tests pin that batching is a pure
performance transform — every per-cell result is unchanged.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cell_data():
    rng = np.random.default_rng(7)
    n, F = 30, 12
    y = np.array(sorted(["garden", "low_veg", "trees"] * (n // 3)))
    Xs = [rng.normal(size=(n, F)) + (y == "trees")[:, None] * (0.5 + i * 0.1)
          for i in range(3)]
    return Xs, y


def test_fit_tree_ensembles_matches_solo(cell_data):
    from wst_tpu.models.forest import TreeEnsembleClassifier, \
        fit_tree_ensembles

    Xs, y = cell_data
    batch = fit_tree_ensembles(Xs, [y] * len(Xs), n_estimators=5)
    for X, m in zip(Xs, batch):
        solo = TreeEnsembleClassifier(n_estimators=5).fit(X, y)
        for fld in ("feature", "threshold", "left", "right", "is_leaf",
                    "probs"):
            np.testing.assert_array_equal(getattr(m.forest_, fld),
                                          getattr(solo.forest_, fld),
                                          err_msg=fld)
        assert m.max_depth_used_ == solo.max_depth_used_
        np.testing.assert_array_equal(m.classes_, solo.classes_)


def test_predict_tree_ensembles_matches_solo(cell_data):
    from wst_tpu.models.forest import fit_tree_ensembles, \
        predict_tree_ensembles

    Xs, y = cell_data
    models = fit_tree_ensembles(Xs, [y] * len(Xs), n_estimators=5)
    preds = predict_tree_ensembles(models, Xs)
    for m, X, p in zip(models, Xs, preds):
        np.testing.assert_array_equal(p, m.predict(X))


def test_mi_batch_matches_solo(cell_data):
    from wst_tpu.features.selection import (mutual_info_classif,
                                            mutual_info_classif_batch)

    Xs, y = cell_data
    batch = mutual_info_classif_batch(np.stack(Xs), y)
    for X, s in zip(Xs, batch):
        np.testing.assert_allclose(s, mutual_info_classif(X, y),
                                   rtol=0, atol=1e-6)


def test_train_batch_matches_solo(cell_data):
    from wst_tpu.train.trainer import (train_final_model,
                                       train_final_models_batch)
    from wst_tpu.utils.config import ExperimentConfig

    Xs, y = cell_data
    cfg = ExperimentConfig(dataset_path="x/mini", area_name="a",
                           feature_method="hybrid", k_features=5,
                           output_dir="/tmp/unused")
    batch = train_final_models_batch(Xs, y, cfg)
    for X, (model, perf) in zip(Xs, batch):
        solo_model, solo_perf = train_final_model(X, y, cfg)
        assert perf == solo_perf
        np.testing.assert_array_equal(model.forest_.feature,
                                      solo_model.forest_.feature)


def test_matrix_suite_batched_equals_percell(tmp_path):
    from wst_tpu.train.matrix_runner import run_matrix_suite

    rng = np.random.default_rng(3)
    n = 15
    labels = np.array(sorted(["garden", "low_veg", "trees"] * (n // 3)))
    images = rng.random((n, 3, 16, 16)).astype(np.float32)
    images[labels == "trees"] *= 0.6

    kw = dict(area_name="a", dataset_type="mini", methods=["advanced_stats"],
              ks=[2, 5], families=["gaussian"], verbose=False)
    fast = run_matrix_suite(images, labels, str(tmp_path / "fast"),
                            cell_batching=True, **kw)
    slow = run_matrix_suite(images, labels, str(tmp_path / "slow"),
                            cell_batching=False, **kw)
    assert len(fast) == len(slow) > 0

    def key(r):
        d = r["dataset_info"]
        return (d["noise_condition"], d["feature_method"], d["k_features"])

    slow_by_key = {key(r): r for r in slow}
    for r in fast:
        s = slow_by_key[key(r)]
        for fld in ("performance", "feature_selection", "dataset_info"):
            assert r[fld] == s[fld], (key(r), fld)


def test_dispatch_cap_chunks_are_bitwise_identical(monkeypatch, rng):
    """WST_MAX_CELLS_PER_DISPATCH only changes dispatch shapes, never
    results (axon worker-crash workaround, models/forest.py)."""
    from wst_tpu.models.forest import (fit_tree_ensembles,
                                       predict_proba_tree_ensembles)
    y = np.repeat([0, 1, 2], 10)
    Xs = [rng.normal(size=(30, 6)).astype(np.float32) for _ in range(7)]
    monkeypatch.setenv("WST_MAX_CELLS_PER_DISPATCH", "3")  # 7 cells -> 3 chunks
    capped = fit_tree_ensembles(Xs, [y] * 7, n_estimators=5, random_state=1)
    p_capped = predict_proba_tree_ensembles(capped, Xs)
    monkeypatch.delenv("WST_MAX_CELLS_PER_DISPATCH")
    full = fit_tree_ensembles(Xs, [y] * 7, n_estimators=5, random_state=1)
    p_full = predict_proba_tree_ensembles(full, Xs)
    for a, b in zip(p_capped, p_full):
        np.testing.assert_array_equal(a, b)
