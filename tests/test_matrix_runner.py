"""Noise-matrix suite runner: 14-condition cells from one batch, analyzable
corpus layout."""

import numpy as np
import pytest

from wst_tpu.analysis.analyzer import NoiseExperimentAnalyzer, NoiseFamily
from wst_tpu.data.dataset import synthesize_patch
from wst_tpu.train.matrix_runner import run_matrix_suite


@pytest.fixture(scope="module")
def suite(tmp_path_factory):
    out = tmp_path_factory.mktemp("matrix")
    imgs, labels = [], []
    for cls in ("garden", "low_veg", "trees"):
        for i in range(5):
            r = np.random.default_rng(hash((cls, i)) % 2**32)
            p = synthesize_patch(r, cls, "sunset", (32, 32))
            imgs.append(p.transpose(2, 0, 1).astype(np.float32) / 255.0)
            labels.append(cls)
    reports = run_matrix_suite(
        np.stack(imgs), np.asarray(labels), str(out), "sunset", "mini",
        methods=("advanced_stats",), ks=(5,), families=("gaussian",),
        verbose=False)
    return out, reports


def test_suite_cells(suite):
    out, reports = suite
    # clean + gaussian30 + gaussian50, 1 method x 1 k each
    assert len(reports) == 3
    conds = {r["dataset_info"]["noise_condition"] for r in reports}
    assert conds == {"clean", "gaussian30", "gaussian50"}
    for r in reports:
        assert r["config"]["n_estimators"] == 3  # mini heuristic
        assert len(r["performance"]["cv_scores"]) == 5
    assert (out / "rgb_clean" / "sunset" / "mini" / "k5" / "advanced_stats"
            / "experiment_report_with_model.json").exists()
    assert (out / "gaussian50" / "sunset" / "mini" / "k5" / "advanced_stats"
            / "trained_model.npz").exists()


def test_suite_analyzable(suite, tmp_path):
    out, _ = suite
    an = NoiseExperimentAnalyzer(NoiseFamily("gaussian", (30, 50), "σ"),
                                 str(out), areas=("sunset",),
                                 sizes=("mini",), k_values=(5,),
                                 methods=("advanced_stats",))
    df = an.load_all_experiments()
    assert len(df) == 3
    rep = an.generate_comprehensive_report()
    assert "Clean → Gaussian σ=50" in rep
