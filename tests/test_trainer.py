"""End-to-end experiment cell: synthetic dataset -> features -> selection ->
ensemble -> CV -> reference-schema report + reloadable artifacts."""

import json
import os

import numpy as np
import pytest

from wst_tpu.data.dataset import (load_area_images_and_labels,
                                  make_synthetic_dataset)
from wst_tpu.train.trainer import run_experiment
from wst_tpu.utils.artifacts import load_artifacts, load_report
from wst_tpu.utils.config import ExperimentConfig, expand_grid


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    path = make_synthetic_dataset(root, size="mini", hw=(32, 32), seed=1,
                                  areas=("sunset",))
    return path


def test_synthetic_dataset_layout(dataset):
    imgs, labels, paths = load_area_images_and_labels(dataset, "sunset")
    assert imgs.shape == (15, 3, 32, 32)
    assert imgs.dtype == np.float32 and imgs.max() <= 1.0
    assert sorted(set(labels)) == ["garden", "low_veg", "trees"]
    # determinism: regenerating produces identical pixels
    imgs2, _, _ = load_area_images_and_labels(dataset, "sunset")
    np.testing.assert_array_equal(imgs, imgs2)


def test_bad_area(dataset):
    with pytest.raises(ValueError):
        load_area_images_and_labels(dataset, "nowhere")


@pytest.mark.parametrize("method", ["advanced_stats", "hybrid"])
def test_run_experiment_schema(dataset, tmp_path, method):
    out = tmp_path / "exp" / method
    config = ExperimentConfig(
        dataset_path=dataset, area_name="sunset", feature_method=method,
        k_features=5, output_dir=str(out))
    report = run_experiment(config, verbose=False)

    # Reference schema keys (reference: train_and_save_model.py:232-251).
    assert report["experiment_name"] == f"{method}_sunset_k5_WithModel"
    assert report["config"]["n_estimators"] == 3  # mini heuristic
    di = report["dataset_info"]
    assert di["total_images"] == 15
    assert di["classes"] == {"garden": 5, "low_veg": 5, "trees": 5}
    assert di["image_shape"] == [3, 32, 32]
    expected_dims = {"advanced_stats": 54, "hybrid": 540}
    assert di["total_features_available"] == expected_dims[method]
    fs = report["feature_selection"]
    assert fs["method"] == "SelectKBest_k5"
    assert len(fs["selected_features"]) == 5
    perf = report["performance"]
    assert 0.0 <= perf["test_accuracy"] <= 1.0
    assert len(perf["cv_scores"]) == 5
    assert "macro avg" in perf["classification_report"]
    assert np.asarray(perf["confusion_matrix"]).shape == (3, 3)

    # All six artifacts exist.
    for f in ["trained_model.npz", "selection_model.json",
              "feature_names.json", "experiment_report_with_model.json",
              "model_usage_instructions.md"]:
        assert (out / f).exists(), f

    # JSON is valid and reloadable; artifacts predict.
    assert load_report(out)["experiment_name"] == report["experiment_name"]
    model, selection = load_artifacts(out)
    imgs, labels, _ = load_area_images_and_labels(dataset, "sunset")
    from wst_tpu.features.extractor import FeatureExtractor
    X = FeatureExtractor(method, 32, 32).extract_numpy(imgs)
    preds = model.predict(selection.transform(X))
    assert (preds == labels).mean() >= 0.6  # synthetic classes separable


def test_grid_expansion(dataset, tmp_path):
    cfgs = expand_grid([dataset], ["sunset"], ["advanced_stats"], [2, 5],
                       str(tmp_path / "grid"))
    assert len(cfgs) == 2
    assert cfgs[0].output_dir.endswith("sunset/mini/k2/advanced_stats")


def test_determinism(dataset, tmp_path):
    config = ExperimentConfig(
        dataset_path=dataset, area_name="sunset",
        feature_method="advanced_stats", k_features=5,
        output_dir=str(tmp_path / "d1"))
    r1 = run_experiment(config, save=False, verbose=False)
    r2 = run_experiment(config, save=False, verbose=False)
    assert r1["performance"]["cv_scores"] == r2["performance"]["cv_scores"]
    assert (r1["feature_selection"]["selected_features"]
            == r2["feature_selection"]["selected_features"])


def test_grid_runner_poisoned_cell_recorded(dataset, monkeypatch, tmp_path):
    """Failure-detection (SURVEY.md §5): one poisoned cell must not abort
    the grid — it is recorded as cell_error.json and the rest completes."""
    from wst_tpu.train import grid_runner
    from wst_tpu.train.grid_runner import ERROR_NAME, run_grid

    size_dir = os.path.dirname(dataset)  # root containing 'mini'
    real = grid_runner._run_cell_from_features
    calls = []

    def poisoned(config, cache, verbose=True):
        calls.append(config.output_dir)
        if config.k_features == 5:
            raise RuntimeError("poisoned cell")
        return real(config, cache, verbose=verbose)

    monkeypatch.setattr(grid_runner, "_run_cell_from_features", poisoned)
    out = tmp_path / "grid_out"
    reports = run_grid({"rgb_clean": size_dir}, str(out),
                       areas=["sunset"], sizes=["mini"],
                       methods=["advanced_stats"], ks=[2, 5, 10],
                       verbose=False)
    assert len(calls) == 3
    assert len(reports) == 2  # k=2 and k=10 completed
    err_file = out / "rgb_clean/sunset/mini/k5/advanced_stats" / ERROR_NAME
    assert err_file.exists()
    rec = json.loads(err_file.read_text())
    assert "poisoned cell" in rec["error"]
    # the failed cell is re-runnable: no report was written there
    assert not (err_file.parent / "experiment_report_with_model.json").exists()
