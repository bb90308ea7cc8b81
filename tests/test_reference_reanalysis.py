"""Regression-pin the reference-corpus reanalysis against the reference's own
checked-in analysis reports (VERDICT round-1 missing #3).

Three layers of pinning, per noise family:

1. *Analyzer faithfulness*: the aggregates our ``NoiseExperimentAnalyzer``
   computes from ``/root/reference/experiments`` equal a direct independent
   json-walk recomputation to 1e-9 (the analyzer neither drops nor distorts
   cells).
2. *Report parity where the corpus supports it*: the reference's
   ``*_comprehensive_report.md`` per-method / per-noise-level / per-area
   aggregates are reproduced to +-0.0015 (3-decimal print quantization)
   for every row whose underlying cells are in the checked-in corpus.
3. *Known staleness, explicitly modeled*: the reference's gaussian report
   (and the Clean row of its poisson/speckle/uniform reports, all printed as
   0.959) predates the committed ``rgb_clean`` tree, whose true mean is
   0.945 — the same inconsistency the reference's own salt&pepper report
   exposes (its Clean row reads 0.945).  SURVEY.md §2.1 "known reference
   defects".  Those rows are pinned to the corpus-derived truth instead, and
   the divergence from the stale report is asserted so this test documents
   the discrepancy quantitatively.

Reference report sources:
  /root/reference/experiments/gaussian/gaussian_analysis/comprehensive_report.md:19-26
  + the four sibling reports.
"""

import json
import re
from pathlib import Path

import numpy as np
import pytest

from wst_tpu.analysis.analyzer import NoiseExperimentAnalyzer

REF = Path("/root/reference/experiments")

FAMILIES = {
    "gaussian": {
        "report": REF / "gaussian/gaussian_analysis/comprehensive_report.md",
        "labels": {"Clean": "clean", "Gaussian σ=30": "gaussian30",
                   "Gaussian σ=50": "gaussian50"},
        "stale": {"clean", "gaussian30", "gaussian50"},  # whole report stale
    },
    "poisson": {
        "report": REF / "poisson/poisson_analysis/poisson_comprehensive_report.md",
        "labels": {"Clean": "clean", "Poisson λ=40": "poisson40",
                   "Poisson λ=60": "poisson60"},
        "stale": {"clean"},
    },
    "salt_and_pepper": {
        "report": REF / "saltpepper/saltpepper_analysis/saltpepper_comprehensive_report.md",
        "labels": {"Clean": "clean", "S&P 5%": "salt_and_pepper5",
                   "S&P 15%": "salt_and_pepper15",
                   "S&P 25%": "salt_and_pepper25"},
        "stale": set(),  # the only fully current reference report
    },
    "speckle": {
        "report": REF / "speckle/speckle_analysis/speckle_comprehensive_report.md",
        "labels": {"Clean": "clean", "Speckle ν=0.15": "speckle15",
                   "Speckle ν=0.35": "speckle35",
                   "Speckle ν=0.55": "speckle55"},
        "stale": {"clean"},
    },
    "uniform": {
        "report": REF / "uniform/uniform_analysis/uniform_comprehensive_report.md",
        "labels": {"Clean": "clean", "Uniform ±10": "uniform10",
                   "Uniform ±25": "uniform25", "Uniform ±40": "uniform40"},
        "stale": {"clean"},
    },
}

METHOD_LABELS = {"Advanced Stats": "advanced_stats", "Hybrid": "hybrid",
                 "WST": "wst"}

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference corpus not mounted")


# ---------------------------------------------------------------------------
# Parsing the reference markdown reports
# ---------------------------------------------------------------------------

_ROW = re.compile(r"- \*\*(?P<label>[^*]+)\*\*: (?P<mean>[\d.]+) ± "
                  r"(?P<std>[\d.]+) \((?P<n>[\d.]+) experiments\)")
_AREA_HDR = re.compile(r"^### (?P<area>[A-Z]+)$")
_AREA_ROW = re.compile(r"^  - (?P<label>[A-Za-z ]+): (?P<mean>[\d.]+) ± "
                       r"(?P<std>[\d.]+)$")


def parse_reference_report(path: Path):
    """-> (method_rows, noise_rows, area_rows) with printed means/stds."""
    method_rows, noise_rows, area_rows = {}, {}, {}
    section, area = None, None
    for line in path.read_text().splitlines():
        if line.startswith("## "):
            section = line[3:].strip()
            area = None
            continue
        m = _AREA_HDR.match(line)
        if m:
            area = m.group("area").lower()
            continue
        m = _ROW.match(line.strip()) if line.strip().startswith("- **") else None
        if m:
            row = (float(m.group("mean")), float(m.group("std")),
                   int(float(m.group("n"))))
            if "FEATURE EXTRACTION METHOD" in section:
                method_rows[m.group("label").strip()] = row
            elif "NOISE CONDITION" in section:
                noise_rows[m.group("label").strip()] = row
            continue
        m = _AREA_ROW.match(line)
        if m and area and "GEOGRAPHIC AREA" in (section or ""):
            area_rows[(area, m.group("label").strip())] = (
                float(m.group("mean")), float(m.group("std")))
    return method_rows, noise_rows, area_rows


# ---------------------------------------------------------------------------
# Independent corpus recomputation (no analyzer code involved)
# ---------------------------------------------------------------------------

def corpus_accuracies(family: str):
    """condition -> np.array of cv_mean_accuracy, walked directly."""
    an = NoiseExperimentAnalyzer(family, str(REF),
                                 clean_dir=str(REF / "rgb_clean"))
    out = {}
    for cond in an.family.conditions:
        d = an._condition_dir(cond)
        assert d is not None and d.is_dir(), (family, cond)
        accs = []
        for area in ("assatigue", "popolar", "sunset"):
            for size in ("mini", "small", "original"):
                for k in ("k2", "k5", "k10", "k20"):
                    for method in ("advanced_stats", "wst", "hybrid"):
                        p = (d / area / size / k / method /
                             "experiment_report_with_model.json")
                        if not p.is_file():
                            continue
                        perf = json.loads(p.read_text())["performance"]
                        accs.append(perf.get("cv_mean_accuracy",
                                             perf.get("mean_accuracy")))
        out[cond] = np.asarray(accs, np.float64)
    return out


@pytest.fixture(scope="module")
def dfs():
    out = {}
    for family in FAMILIES:
        an = NoiseExperimentAnalyzer(family, str(REF),
                                     clean_dir=str(REF / "rgb_clean"))
        out[family] = an.load_all_experiments()
    return out


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_analyzer_faithful_to_corpus(dfs, family):
    """Layer 1: analyzer aggregates == independent json-walk to 1e-9."""
    df = dfs[family]
    truth = corpus_accuracies(family)
    for cond, accs in truth.items():
        got = df[df["noise_condition"] == cond]["mean_accuracy"]
        assert len(got) == len(accs), (family, cond, len(got), len(accs))
        assert abs(got.mean() - accs.mean()) < 1e-9
        assert abs(got.std(ddof=0) - accs.std()) < 1e-9


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_noise_level_rows_match_reference_report(dfs, family):
    """Layer 2/3: per-noise-level rows vs the reference's printed report."""
    spec = FAMILIES[family]
    _, noise_rows, _ = parse_reference_report(spec["report"])
    df = dfs[family]
    assert len(noise_rows) == len(spec["labels"]), noise_rows
    for label, cond in spec["labels"].items():
        ref_mean, ref_std, ref_n = noise_rows[label]
        sel = df[df["noise_condition"] == cond]["mean_accuracy"]
        if cond in spec["stale"]:
            continue  # asserted in test_stale_rows_documented
        assert len(sel) == ref_n, (family, cond, len(sel), ref_n)
        assert abs(sel.mean() - ref_mean) < 1.5e-3, (family, cond,
                                                     sel.mean(), ref_mean)
        assert abs(sel.std(ddof=1) - ref_std) < 1.5e-3, (family, cond)


def test_method_and_area_rows_match_for_saltpepper(dfs):
    """Layer 2: s&p is the one report whose every section is current —
    pin its per-method and per-area×method aggregates too."""
    spec = FAMILIES["salt_and_pepper"]
    method_rows, _, area_rows = parse_reference_report(spec["report"])
    df = dfs["salt_and_pepper"]
    for label, method in METHOD_LABELS.items():
        ref_mean, ref_std, ref_n = method_rows[label]
        sel = df[df["feature_method"] == method]["mean_accuracy"]
        assert len(sel) == ref_n
        assert abs(sel.mean() - ref_mean) < 1.5e-3, (method, sel.mean())
        assert abs(sel.std(ddof=1) - ref_std) < 1.5e-3, method
    assert len(area_rows) == 9
    for (area, label), (ref_mean, ref_std) in area_rows.items():
        sel = df[(df["area"] == area)
                 & (df["feature_method"] == METHOD_LABELS[label])
                 ]["mean_accuracy"]
        assert len(sel) == 48  # 4 conditions x 3 sizes x 4 k
        assert abs(sel.mean() - ref_mean) < 1.5e-3, (area, label, sel.mean())
        assert abs(sel.std(ddof=1) - ref_std) < 1.5e-3, (area, label)


def test_stale_rows_documented(dfs):
    """Layer 3: the known-stale reference rows, pinned quantitatively.

    * Every report except salt&pepper prints Clean = 0.959; the committed
      rgb_clean corpus averages 0.9451.  Our analyzer reports the corpus
      truth and must keep doing so.
    * The gaussian report's noisy rows also predate the committed
      gaussian_output tree (σ=30 printed 0.893, corpus 0.8884).
    """
    clean = corpus_accuracies("salt_and_pepper")["clean"]
    assert abs(clean.mean() - 0.9451) < 5e-4  # corpus truth
    for family in FAMILIES:
        _, noise_rows, _ = parse_reference_report(FAMILIES[family]["report"])
        ref_clean = noise_rows["Clean"][0]
        df_clean = dfs[family][dfs[family]["noise_condition"] == "clean"][
            "mean_accuracy"]
        assert abs(df_clean.mean() - clean.mean()) < 1e-9
        if family == "salt_and_pepper":
            assert abs(ref_clean - 0.945) < 5e-4  # current
        else:
            assert abs(ref_clean - 0.959) < 5e-4  # stale print
            assert abs(df_clean.mean() - ref_clean) > 0.01

    g = dfs["gaussian"]
    g30 = g[g["noise_condition"] == "gaussian30"]["mean_accuracy"]
    assert abs(g30.mean() - 0.8876) < 5e-4  # corpus truth
    _, noise_rows, _ = parse_reference_report(FAMILIES["gaussian"]["report"])
    assert abs(noise_rows["Gaussian σ=30"][0] - 0.893) < 5e-4  # stale print
    assert abs(g30.mean() - noise_rows["Gaussian σ=30"][0]) > 3e-3
