"""Grid runner + analyzer: build a miniature corpus (clean + one noisy
variant) and validate the analysis deliverables."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from wst_tpu.analysis.analyzer import (NOISE_FAMILIES,
                                       NoiseExperimentAnalyzer, NoiseFamily)
from wst_tpu.data.dataset import make_synthetic_dataset
from wst_tpu.data.noise_gen import generate_noisy_dataset
from wst_tpu.train.grid_runner import run_grid


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    data = root / "data"
    clean = make_synthetic_dataset(data / "rgb_clean", size="mini",
                                   hw=(32, 32), areas=("sunset",), seed=5)
    # noise the whole dataset root so the {size}/{area}/{class} levels are
    # preserved in the mirrored tree
    noisy_out = generate_noisy_dataset(
        str(Path(clean).parent), "gaussian", 30, output_root=data / "g30")
    exp = root / "experiments"
    reports = run_grid(
        {"rgb_clean": str(Path(clean).parent),
         "gaussian30": noisy_out},
        str(exp), areas=("sunset",), sizes=("mini",),
        methods=("advanced_stats", "hybrid"), ks=(2, 5), verbose=False)
    return exp, reports


def test_grid_runner_outputs(corpus):
    exp, reports = corpus
    assert len(reports) == 8  # 2 conditions x 2 methods x 2 k
    cell = exp / "rgb_clean" / "sunset" / "mini" / "k5" / "hybrid"
    assert (cell / "experiment_report_with_model.json").exists()
    with open(cell / "experiment_report_with_model.json") as f:
        rep = json.load(f)
    assert rep["dataset_info"]["total_features_available"] == 540
    assert rep["config"]["n_estimators"] == 3  # mini heuristic


def test_grid_runner_idempotent(corpus):
    exp, _ = corpus
    reports2 = run_grid(
        {"rgb_clean": str(Path(exp).parent / "data" / "rgb_clean")},
        str(exp), areas=("sunset",), sizes=("mini",),
        methods=("advanced_stats",), ks=(2,), verbose=False)
    assert reports2 == []  # all cells already exist -> skipped


def test_analyzer_complete(corpus, tmp_path):
    exp, _ = corpus
    # custom family matching our miniature corpus levels
    fam = NoiseFamily("gaussian", (30,), "σ")
    an = NoiseExperimentAnalyzer(fam, str(exp), areas=("sunset",),
                                 sizes=("mini",), k_values=(2, 5),
                                 methods=("advanced_stats", "hybrid"))
    res = an.create_complete_analysis(tmp_path / "analysis")
    assert res["n_experiments"] == 8
    out = Path(res["output_dir"])
    assert (out / "comprehensive_report.md").exists()
    assert (out / "qualitative_analysis.md").exists()
    assert (out / "analysis_summary.md").exists()
    assert len(res["comparison_plots"]) == 4
    assert len(res["detailed_plots"]) > 0
    for p in res["comparison_plots"] + res["detailed_plots"]:
        assert os.path.getsize(p) > 1000

    text = (out / "comprehensive_report.md").read_text()
    assert "GAUSSIAN NOISE" in text
    assert "AVERAGE ACCURACY BY FEATURE EXTRACTION METHOD" in text
    assert "Clean → Gaussian σ=30" in text

    import pandas as pd
    df = pd.read_csv(out / "experiments_summary.csv")
    assert len(df) == 8
    assert set(df["noise_condition"]) == {"clean", "gaussian30"}


def test_analyzer_empty_corpus(tmp_path):
    an = NoiseExperimentAnalyzer("speckle", str(tmp_path / "nothing"))
    with pytest.raises(ValueError):
        an.generate_comprehensive_report()


def test_families_registry():
    assert set(NOISE_FAMILIES) == {"gaussian", "poisson", "salt_and_pepper",
                                   "speckle", "uniform"}
    assert NOISE_FAMILIES["speckle"].conditions == [
        "clean", "speckle15", "speckle35", "speckle55"]
