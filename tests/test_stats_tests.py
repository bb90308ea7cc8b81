"""Significance tests vs scipy/statsmodels semantics."""

import numpy as np
import pandas as pd
import pytest

from wst_tpu.analysis.stats_tests import (benjamini_hochberg, cohens_d_paired,
                                          method_comparison_table,
                                          paired_accuracies,
                                          wilcoxon_signed_rank,
                                          write_significance_report)


def _df(rng, shift=0.05):
    rows = []
    for cond in ("clean", "gaussian30"):
        for area in ("a", "b", "c"):
            for size in ("mini", "small"):
                for k in (5, 10):
                    base = rng.uniform(0.7, 0.95)
                    rows.append(dict(noise_condition=cond, area=area,
                                     dataset_type=size, k_features=k,
                                     feature_method="advanced_stats",
                                     mean_accuracy=base))
                    rows.append(dict(noise_condition=cond, area=area,
                                     dataset_type=size, k_features=k,
                                     feature_method="wst",
                                     mean_accuracy=min(1.0, base + shift
                                                       + rng.normal(0, 0.01))))
    return pd.DataFrame(rows)


def test_pairing(rng):
    df = _df(rng)
    a, b = paired_accuracies(df, "advanced_stats", "wst")
    assert len(a) == len(b) == 24


def test_bh_matches_known_example():
    p = [0.01, 0.04, 0.03, 0.005]
    adj = benjamini_hochberg(p)
    # classic BH: sorted p * m/rank with monotone enforcement
    assert adj == pytest.approx([0.02, 0.04, 0.04, 0.02])


def test_wilcoxon_matches_scipy(rng):
    from scipy.stats import wilcoxon as sp
    a = rng.normal(0.8, 0.05, 30)
    b = a + rng.normal(0.02, 0.03, 30)
    ours = wilcoxon_signed_rank(a, b)
    ref = sp(a - b)
    assert ours["p_value"] == pytest.approx(ref.pvalue)


def test_cohens_d_sign():
    a = np.array([0.9, 0.85, 0.95, 0.9])
    b = np.array([0.8, 0.8, 0.85, 0.82])
    assert cohens_d_paired(a, b) > 1.0
    assert cohens_d_paired(b, a) < -1.0
    assert cohens_d_paired(a, a) == 0.0


def test_comparison_table_detects_shift(rng):
    df = _df(rng, shift=0.06)
    table = method_comparison_table(df)
    assert len(table) == 1
    row = table.iloc[0]
    assert row["n_pairs"] == 24
    assert row["significant"]
    # wst wins, so diff sign depends on pair order (alphabetical a=adv)
    assert row["mean_diff"] < 0 and row["cohens_d"] < 0


def test_no_signal_not_significant(rng):
    df = _df(rng, shift=0.0)
    table = method_comparison_table(df)
    assert not table.iloc[0]["significant"]


def test_report(tmp_path, rng):
    df = _df(rng)
    text = write_significance_report(df, tmp_path / "sig.md")
    assert "Wilcoxon" in text and "advanced_stats vs wst" in text
    assert (tmp_path / "sig.md").exists()
