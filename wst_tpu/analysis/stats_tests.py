"""Paired statistical significance tests across feature methods.

The reference paper reports Wilcoxon signed-rank tests with
Benjamini-Hochberg FDR correction and Cohen's d effect sizes over paired
experiment cells (SURVEY.md §4.3; reference: article/latex/images/
image_labels.txt:209-217,245-252, tables 09/13).  The reference repo itself
contains no code for these — this module supplies them, operating on the
analyzer's experiment DataFrame.

Pairing: two methods are compared on the accuracy of cells that share
(noise_condition, area, dataset_type, k_features).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

KEY_COLS = ["noise_condition", "area", "dataset_type", "k_features"]


def paired_accuracies(df: pd.DataFrame, method_a: str, method_b: str,
                      value_col: str = "mean_accuracy"):
    a = df[df["feature_method"] == method_a].set_index(KEY_COLS)[value_col]
    b = df[df["feature_method"] == method_b].set_index(KEY_COLS)[value_col]
    joined = pd.DataFrame({"a": a, "b": b}).dropna()
    return joined["a"].to_numpy(), joined["b"].to_numpy()


def cohens_d_paired(a: np.ndarray, b: np.ndarray) -> float:
    """Cohen's d for paired samples: mean(diff) / std(diff, ddof=1)."""
    d = a - b
    sd = d.std(ddof=1)
    return float(d.mean() / sd) if sd > 0 else 0.0


def wilcoxon_signed_rank(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """Two-sided Wilcoxon signed-rank p-value (scipy, zeros dropped)."""
    from scipy.stats import wilcoxon
    d = a - b
    nz = d[d != 0]
    if len(nz) < 1:
        return {"statistic": 0.0, "p_value": 1.0, "n": 0}
    res = wilcoxon(nz)
    return {"statistic": float(res.statistic),
            "p_value": float(res.pvalue), "n": int(len(nz))}


def benjamini_hochberg(p_values: List[float]) -> List[float]:
    """BH-adjusted p-values (monotone, capped at 1)."""
    p = np.asarray(p_values, float)
    m = len(p)
    order = np.argsort(p)
    adj = np.empty(m)
    prev = 1.0
    for rank_idx in range(m - 1, -1, -1):
        i = order[rank_idx]
        val = min(prev, p[i] * m / (rank_idx + 1))
        adj[i] = val
        prev = val
    return adj.tolist()


def method_comparison_table(df: pd.DataFrame,
                            methods: Optional[List[str]] = None,
                            value_col: str = "mean_accuracy",
                            alpha: float = 0.05) -> pd.DataFrame:
    """All pairwise method comparisons with FDR-corrected significance."""
    methods = methods or sorted(df["feature_method"].unique())
    rows = []
    for ma, mb in itertools.combinations(methods, 2):
        a, b = paired_accuracies(df, ma, mb, value_col)
        if len(a) == 0:
            continue
        w = wilcoxon_signed_rank(a, b)
        rows.append({
            "method_a": ma, "method_b": mb, "n_pairs": len(a),
            "mean_a": float(a.mean()), "mean_b": float(b.mean()),
            "mean_diff": float((a - b).mean()),
            "cohens_d": cohens_d_paired(a, b),
            "wilcoxon_stat": w["statistic"], "p_value": w["p_value"],
        })
    table = pd.DataFrame(rows)
    if len(table):
        table["p_fdr"] = benjamini_hochberg(table["p_value"].tolist())
        table["significant"] = table["p_fdr"] < alpha
    return table


def write_significance_report(df: pd.DataFrame, output_path,
                              alpha: float = 0.05) -> str:
    table = method_comparison_table(df, alpha=alpha)
    lines = ["# STATISTICAL SIGNIFICANCE (Wilcoxon signed-rank, BH-FDR)",
             "", f"Significance level: alpha={alpha} (FDR-corrected)", ""]
    if not len(table):
        lines.append("No method pairs with shared cells found.")
    for _, r in table.iterrows():
        verdict = "SIGNIFICANT" if r["significant"] else "n.s."
        lines.append(
            f"- {r['method_a']} vs {r['method_b']}: "
            f"Δacc={r['mean_diff']:+.4f}, d={r['cohens_d']:+.3f}, "
            f"W={r['wilcoxon_stat']:.1f}, p={r['p_value']:.4f}, "
            f"p_FDR={r['p_fdr']:.4f} ({verdict}, n={int(r['n_pairs'])})")
    text = "\n".join(lines)
    with open(output_path, "w") as f:
        f.write(text)
    return text
