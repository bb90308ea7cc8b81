"""Parity against the reference's checked-in experiment corpus.

The reference repo ships its full grid results (feature names, MI scores,
report schema) under /root/reference/experiments.  These tests pin that our
feature-name registries, report schema, and analyzer loader are drop-in
compatible with that corpus — a user's existing artifacts and tooling keep
working.
"""

import json
import os
from pathlib import Path

import pytest

from wst_tpu.features.extractor import get_feature_names

REF = Path("/root/reference/experiments")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference corpus not mounted")


def test_wst_feature_names_match_reference_corpus():
    d = json.load(open(
        REF / "rgb_clean/popolar/mini/k5/wst/feature_names.json"))
    assert get_feature_names("wst") == d["all_feature_names"]


def test_hybrid_feature_names_match_reference_corpus():
    d = json.load(open(
        REF / "rgb_clean/sunset/original/k10/hybrid/feature_names.json"))
    ref = d["all_feature_names"]
    ours = get_feature_names("hybrid")
    assert len(ours) == len(ref) == 540
    assert ours == ref


def test_report_schema_keys_match():
    ref = json.load(open(
        REF / "rgb_clean/sunset/small/k20/hybrid/"
              "experiment_report_with_model.json"))
    # Our reports must contain every key the reference's analyzers read.
    from wst_tpu.utils.config import ExperimentConfig
    from wst_tpu.train.trainer import run_experiment
    import numpy as np
    rng = np.random.default_rng(0)
    imgs = rng.random((15, 3, 16, 16)).astype(np.float32)
    labels = np.array(["garden", "low_veg", "trees"]).repeat(5)
    cfg = ExperimentConfig(dataset_path="/tmp/x/small", area_name="sunset",
                          feature_method="advanced_stats", k_features=5,
                          output_dir="/tmp/unused")
    ours = run_experiment(cfg, images=imgs, labels=labels, save=False,
                          verbose=False)
    for key in ("experiment_name", "config", "dataset_info",
                "feature_selection", "performance", "model_files",
                "timestamp"):
        assert key in ours and key in ref
    for key in ref["performance"]:
        assert key in ours["performance"], key
    for key in ref["dataset_info"]:
        assert key in ours["dataset_info"], key
    for key in ref["feature_selection"]:
        assert key in ours["feature_selection"], key
    for key in ref["config"]:
        assert key in ours["config"], key


def test_analyzer_reads_reference_corpus():
    """Our analyzer must consume the reference's own checked-in results."""
    from wst_tpu.analysis.analyzer import NoiseExperimentAnalyzer

    an = NoiseExperimentAnalyzer("gaussian", str(REF),
                                 clean_dir=str(REF / "rgb_clean"))
    df = an.load_all_experiments()
    clean = df[df["noise_condition"] == "clean"]
    assert len(clean) == 108  # 3 areas x 3 sizes x 4 k x 3 methods
    assert set(clean["area"]) == {"assatigue", "popolar", "sunset"}
    # Mean clean accuracy of the checked-in corpus is 0.945 (the 0.959 in
    # the reference's gaussian report predates the committed rgb_clean
    # tree — the same inconsistency its own salt&pepper analysis shows,
    # SURVEY.md §2.1 "known reference defects").
    assert abs(clean["mean_accuracy"].mean() - 0.9451) < 0.002
    noisy = df[df["noise_condition"] != "clean"]
    assert len(noisy) == 216  # gaussian30 + gaussian50
    rep = an.generate_comprehensive_report()
    assert "AVERAGE ACCURACY" in rep
    assert "Clean → Gaussian σ=50" in rep
