"""Inference engine: path auto-detection, batched predict, evaluation
schema, and outputs (CSV/JSON/PNG) against a trained synthetic cell."""

import json
import os

import numpy as np
import pytest

from wst_tpu.data.dataset import make_synthetic_dataset
from wst_tpu.infer.inference import ModelInference, parse_model_directory
from wst_tpu.train.trainer import run_experiment
from wst_tpu.utils.config import ExperimentConfig


def test_parse_corpus_convention():
    info = parse_model_directory(
        "/exp/rgb_clean/sunset/small/k20/hybrid")
    assert info == {"area_name": "sunset", "feature_method": "hybrid",
                    "dataset_type": "small"}


def test_parse_legacy_convention():
    info = parse_model_directory(
        "/exp/rgb_kbest/experiments/advanced_stats_original_k5_popolar")
    assert info["area_name"] == "popolar"
    assert info["feature_method"] == "advanced_stats"
    assert info["dataset_type"] == "original"


@pytest.fixture(scope="module")
def trained_cell(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    ds = make_synthetic_dataset(root, size="mini", hw=(32, 32), seed=3,
                                areas=("popolar",))
    out = str(tmp_path_factory.mktemp("exp") / "popolar" / "mini" / "k5"
              / "advanced_stats")
    cfg = ExperimentConfig(dataset_path=ds, area_name="popolar",
                           feature_method="advanced_stats", k_features=5,
                           output_dir=out)
    run_experiment(cfg, verbose=False)
    return ds, out


def test_inference_end_to_end(trained_cell, tmp_path):
    ds, model_dir = trained_cell
    inf = ModelInference(model_dir)
    assert inf.area_name == "popolar"
    assert inf.feature_method == "advanced_stats"
    assert inf.dataset_type == "mini"

    df, n = inf.predict_dataset(dataset_dir=ds)
    assert n == 15
    assert set(df["predicted_label"]) <= {"garden", "low_veg", "trees"}
    assert ((df["confidence"] > 0) & (df["confidence"] <= 1)).all()
    prob_cols = [c for c in df.columns if c.startswith("prob_")]
    np.testing.assert_allclose(df[prob_cols].sum(axis=1), 1.0, atol=1e-5)

    ev = inf.evaluate_predictions(df)
    assert ev["total_predictions"] == 15
    assert 0 <= ev["overall_accuracy"] <= 1
    assert set(ev["per_class_accuracy"]) == {"garden", "low_veg", "trees"}
    # synthetic classes are separable; the model must actually work
    assert ev["overall_accuracy"] >= 0.6

    outdir = tmp_path / "results"
    inf.save_results(df, ev, outdir)
    suffix = "popolar_mini_advanced_stats"
    assert (outdir / f"inference_results_{suffix}.csv").exists()
    assert (outdir / f"confusion_matrix_{suffix}.png").exists()
    with open(outdir / f"evaluation_summary_{suffix}.json") as f:
        summary = json.load(f)
    assert summary["configuration"]["area_name"] == "popolar"
    assert np.asarray(summary["confusion_matrix"]).shape == (3, 3)


def test_sampling(trained_cell):
    ds, model_dir = trained_cell
    inf = ModelInference(model_dir)
    df, n = inf.predict_dataset(dataset_dir=ds, sample_per_class=2)
    assert n == 6
    # deterministic under fixed seed
    df2, _ = inf.predict_dataset(dataset_dir=ds, sample_per_class=2)
    assert list(df["image_path"]) == list(df2["image_path"])


def test_single_image(trained_cell):
    ds, model_dir = trained_cell
    inf = ModelInference(model_dir)
    some_png = next(
        os.path.join(r, f) for r, _, fs in os.walk(ds) for f in fs
        if f.endswith(".png"))
    res = inf.predict_single_image(some_png)
    assert res["success"] and res["predicted_class"] in inf.classes_
    bad = inf.predict_single_image("/nonexistent.png")
    assert not bad["success"] and "error" in bad


def test_missing_dataset_registry(trained_cell, tmp_path):
    _, model_dir = trained_cell
    inf = ModelInference(model_dir)
    inf.report["config"]["dataset_path"] = "/nonexistent"
    with pytest.raises(ValueError):
        inf.get_dataset_path("weird_type")


# ---------------------------------------------------------------------------
# Serving the reference corpus's joblib artifacts directly
# (reference: src/inference/inference.py:126-161, 272-287)
# ---------------------------------------------------------------------------

REF_CLEAN = "/root/reference/experiments/rgb_clean"
needs_corpus = pytest.mark.skipif(not os.path.isdir(REF_CLEAN),
                                  reason="reference corpus not mounted")


def _synthetic_rgb(n, hw=128, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, 3, hw, hw), dtype=np.float32)


@needs_corpus
def test_serve_corpus_advanced_stats_model():
    d = os.path.join(REF_CLEAN, "popolar/small/k10/advanced_stats")
    inf = ModelInference(d)
    assert inf.feature_method == "advanced_stats"
    # (this particular corpus cell was trained with a 'water' class)
    assert list(inf.classes_) == ["low_veg", "trees", "water"]
    # selected features agree with the cell's own feature_names.json
    with open(os.path.join(d, "feature_names.json")) as f:
        names = json.load(f)
    assert inf.selection.selected_features == names["selected_features"]
    df = inf.predict_images(_synthetic_rgb(4))
    assert len(df) == 4
    prob_cols = [c for c in df.columns if c.startswith("prob_")]
    np.testing.assert_allclose(df[prob_cols].sum(axis=1), 1.0, atol=1e-6)


@needs_corpus
def test_serve_corpus_hybrid_model_with_wst():
    d = os.path.join(REF_CLEAN, "sunset/small/k20/hybrid")
    inf = ModelInference(d)
    assert inf.selection.n_features_in == 540
    df = inf.predict_images(_synthetic_rgb(2))
    assert len(df) == 2
    assert set(df["predicted_label"]) <= {"garden", "low_veg", "trees"}


@needs_corpus
def test_serve_corpus_wst_model_fixed_vs_quirk():
    """Default mode serves the 486-feature wst models the reference's own
    inference script cannot (it builds 492 features and crashes on
    scaler.transform); quirk mode reproduces that crash faithfully."""
    d = os.path.join(REF_CLEAN, "popolar/mini/k5/wst")
    inf = ModelInference(d)
    assert inf.selection.n_features_in == 486
    df = inf.predict_images(_synthetic_rgb(2))
    assert len(df) == 2  # fixed behavior: serves fine

    quirky = ModelInference(d, reference_inference_quirk=True)
    with pytest.raises(ValueError):
        quirky.predict_images(_synthetic_rgb(2))


@needs_corpus
def test_corpus_hybrid_quirk_permutes_wst_block():
    """With the quirk on, hybrid features are reordered exactly as the
    reference inference script builds them (interleaved mean/std) — same
    count, silently different vectors (the reference's latent defect)."""
    d = os.path.join(REF_CLEAN, "sunset/small/k20/hybrid")
    inf = ModelInference(d)
    imgs = _synthetic_rgb(3, seed=1)
    X = np.tile(np.arange(540, dtype=np.float64), (3, 1))
    Xq = inf._apply_reference_quirk(X.copy(), imgs)
    assert Xq.shape == X.shape
    # advanced block untouched, wst block permuted per channel
    np.testing.assert_array_equal(Xq[:, :54], X[:, :54])
    assert Xq[0, 54] == X[0, 54]          # mean_0 stays first
    assert Xq[0, 55] == X[0, 54 + 81]     # std_0 moves next to it
    assert sorted(Xq[0]) == sorted(X[0])  # a pure permutation


# ---------------------------------------------------------------------------
# Self-describing artifact contract for the extraction axes (boundary, J, L)
# — the defect class the reference shipped (src/inference/inference.py:
# 277-280, the 486/492 wst train/serve mismatch) must be impossible here.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def periodic_wst_cell(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds_p")
    ds = make_synthetic_dataset(root, size="mini", hw=(32, 32), seed=5,
                                areas=("popolar",))
    out = str(tmp_path_factory.mktemp("exp_p") / "popolar" / "mini" / "k5"
              / "wst")
    cfg = ExperimentConfig(dataset_path=ds, area_name="popolar",
                           feature_method="wst", k_features=5,
                           output_dir=out, J=2, L=4, boundary="periodic")
    run_experiment(cfg, verbose=False)
    return ds, out


def test_boundary_serialized_in_artifacts(periodic_wst_cell):
    """boundary/J/L are written to BOTH the report config and the NPZ
    bundle (round-5 contract: artifacts are self-describing)."""
    _, cell = periodic_wst_cell
    with open(os.path.join(cell, "experiment_report_with_model.json")) as f:
        report = json.load(f)
    assert report["config"]["boundary"] == "periodic"
    assert report["config"]["J"] == 2
    assert report["config"]["L"] == 4
    with np.load(os.path.join(cell, "trained_model.npz")) as z:
        assert str(z["extraction_boundary"]) == "periodic"
        assert int(z["extraction_J"]) == 2
        assert int(z["extraction_L"]) == 4
    # usage instructions carry the boundary contract
    with open(os.path.join(cell, "model_usage_instructions.md")) as f:
        usage = f.read()
    assert "boundary='periodic'" in usage


def test_periodic_roundtrip_bitwise(periodic_wst_cell):
    """periodic train -> save -> ModelInference -> predict is bitwise equal
    to the in-memory (extract -> transform -> predict) path with the
    training extractor config."""
    from wst_tpu.features.extractor import FeatureExtractor
    from wst_tpu.data.dataset import load_area_images_and_labels
    from wst_tpu.utils.artifacts import load_artifacts

    ds, cell = periodic_wst_cell
    inf = ModelInference(cell)
    assert inf.boundary == "periodic" and inf.J == 2 and inf.L == 4

    images, _labels, _paths = load_area_images_and_labels(ds, "popolar")
    df, _ = inf.predict_dataset(dataset_dir=ds)

    model, selection = load_artifacts(cell)
    fx = FeatureExtractor("wst", 32, 32, 2, 4, boundary="periodic")
    X = selection.transform(fx.extract_numpy(images))
    proba = model.predict_proba(X)
    pred = model.classes_[np.argmax(proba, axis=1)]
    np.testing.assert_array_equal(df["predicted_label"].to_numpy(), pred)
    np.testing.assert_array_equal(df["confidence"].to_numpy(),
                                  proba.max(axis=1))


def test_boundary_mismatch_raises(periodic_wst_cell):
    """Serving a periodic-trained cell with an explicit reflect override
    (or vice versa) refuses instead of silently extracting mismatched
    features."""
    _, cell = periodic_wst_cell
    with pytest.raises(ValueError, match="boundary mismatch"):
        ModelInference(cell, boundary="reflect")
    # matching explicit override is fine
    inf = ModelInference(cell, boundary="periodic")
    assert inf.boundary == "periodic"


def test_scene_classifier_respects_stamp(periodic_wst_cell):
    """SceneClassifier resolves (J, L, boundary) from the loaded model's
    extraction stamp and raises on explicit contradiction."""
    from wst_tpu.infer.scene import SceneClassifier
    from wst_tpu.utils.artifacts import load_artifacts

    _, cell = periodic_wst_cell
    model, selection = load_artifacts(cell)
    with pytest.raises(ValueError, match="boundary mismatch"):
        SceneClassifier(model, selection, "wst", patch=32,
                        boundary="reflect")
    with pytest.raises(ValueError, match="L mismatch"):
        SceneClassifier(model, selection, "wst", patch=32, L=8)
    sc = SceneClassifier.from_artifacts(cell, patch=32)
    assert sc.boundary == "periodic" and sc.J == 2 and sc.L == 4
    assert sc.fx.method == "wst"


def test_export_joblib_stamps_boundary(periodic_wst_cell, tmp_path):
    from wst_tpu.utils.artifacts import export_joblib

    _, cell = periodic_wst_cell
    out = str(tmp_path / "export")
    paths = export_joblib(cell, out)
    with open(paths["model_usage_instructions.md"]) as f:
        usage = f.read()
    assert "boundary='periodic'" in usage


def test_export_joblib_bidirectional_interop(trained_cell):
    """A wst_tpu-trained cell exports to the reference's joblib trio
    (stock sklearn RandomForestClassifier / StandardScaler / SelectKBest)
    and the reference's composed loading contract
    (scaler.transform -> selector.transform -> model.predict;
    reference: src/inference/inference.py:126-161, 289-320) reproduces the
    native predictions exactly.  The reference script itself cannot be
    imported here (it imports kymatio at module load), so its artifact and
    compose contracts are exercised directly."""
    import joblib

    from wst_tpu.utils.artifacts import export_joblib, load_artifacts

    _, cell = trained_cell
    model, selection = load_artifacts(cell)
    paths = export_joblib(cell)

    rf = joblib.load(paths["trained_model.joblib"])
    scaler = joblib.load(paths["scaler.joblib"])
    selector = joblib.load(paths["feature_selector.joblib"])
    with open(os.path.join(cell, "feature_names.json")) as fp:
        feature_info = json.load(fp)
    assert feature_info["selected_features"] == selection.selected_features
    assert list(rf.classes_) == list(model.classes_)
    assert np.array_equal(selector.get_support(indices=True),
                          selection.selected_indices)

    rng = np.random.default_rng(7)
    Xq = rng.normal(size=(100, len(selection.feature_names)))
    ours = model.predict(selection.transform(Xq))
    ref = rf.predict(selector.transform(scaler.transform(Xq)))
    np.testing.assert_array_equal(ours, ref)
    np.testing.assert_allclose(
        model.predict_proba(selection.transform(Xq)),
        rf.predict_proba(selector.transform(scaler.transform(Xq))),
        atol=1e-6)
