"""Parameterized experiment analyzer — one module instead of five clones.

The reference ships five ~800-line near-identical analyzers, one per noise
family (reference: src/analysis/per_noise_type/analyze_{gaussian,poisson,
salt_and_pepper,speckle,uniform}_experiments.py; SURVEY.md §2.1 C18).  Here
a single ``NoiseExperimentAnalyzer`` is parameterized by a ``NoiseFamily``
(name, intensity levels, display labels) and produces the same deliverables:

* comprehensive markdown report (setup, accuracy by method / noise level /
  area, top-10 table, degradation-vs-clean per method),
* qualitative analysis (rankings, k-sensitivity, size effect),
* 4 comparison plots (noise curve, size curve, method boxplot, heatmap),
* detailed plots per (size, k), (noise, k), (noise, size),
* CSV exports and an analysis summary index.

It consumes the experiment corpus convention
``{base}/{condition}/{area}/{size}/k{n}/{method}/experiment_report_with_
model.json`` emitted by :mod:`wst_tpu.train.grid_runner` — the same report
schema as the reference corpus, so it can equally analyze the reference's
own checked-in experiments.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

AREAS = ("assatigue", "popolar", "sunset")
SIZES = ("mini", "small", "original")
K_VALUES = (2, 5, 10, 20)
METHODS = ("advanced_stats", "wst", "hybrid")

METHOD_LABELS = {"advanced_stats": "Advanced Stats", "wst": "WST",
                 "hybrid": "Hybrid"}
SIZE_LABELS = {"mini": "Mini", "small": "Small", "original": "Original"}


@dataclasses.dataclass(frozen=True)
class NoiseFamily:
    name: str                      # e.g. "gaussian"
    levels: Sequence[int]          # e.g. (30, 50)
    symbol: str = ""               # display, e.g. "σ"

    @property
    def conditions(self) -> List[str]:
        return ["clean"] + [f"{self.name}{lvl}" for lvl in self.levels]

    def label(self, condition: str) -> str:
        if condition == "clean":
            return "Clean"
        lvl = condition[len(self.name):]
        sym = f" {self.symbol}=" if self.symbol else " "
        return f"{self.name.replace('_', ' ').title()}{sym}{lvl}"


NOISE_FAMILIES: Dict[str, NoiseFamily] = {
    "gaussian": NoiseFamily("gaussian", (30, 50), "σ"),
    "poisson": NoiseFamily("poisson", (40, 60), "λ"),
    "salt_and_pepper": NoiseFamily("salt_and_pepper", (5, 15, 25), "%"),
    "speckle": NoiseFamily("speckle", (15, 35, 55), "σ"),
    "uniform": NoiseFamily("uniform", (10, 25, 40), "±"),
}


class NoiseExperimentAnalyzer:
    """Aggregate one noise family's grid cells and emit reports/plots."""

    def __init__(self, family, base_dir: str,
                 clean_dir: Optional[str] = None,
                 areas: Sequence[str] = AREAS,
                 sizes: Sequence[str] = SIZES,
                 k_values: Sequence[int] = K_VALUES,
                 methods: Sequence[str] = METHODS):
        self.family = (family if isinstance(family, NoiseFamily)
                       else NOISE_FAMILIES[family])
        self.base_dir = Path(base_dir)
        self.clean_dir = Path(clean_dir) if clean_dir else None
        self.areas, self.sizes = list(areas), list(sizes)
        self.k_values, self.methods = list(k_values), list(methods)
        self.df: Optional[pd.DataFrame] = None

    # -------------------------------------------------------------- loading

    def _condition_dir(self, condition: str) -> Optional[Path]:
        """Find the corpus subdir for a condition under base_dir.

        Handles both this framework's flat layout ``{base}/{condition}`` and
        the reference corpus's nested one
        ``{base}/{familydir}/{familydir}_output/{rgb_|dataset_rgb_}{cond}``
        (e.g. experiments/gaussian/gaussian_output/rgb_gaussian50 or
        experiments/poisson/poisson_output/dataset_rgb_poisson_60).  The
        clean baseline may live in a separate tree (clean_dir).
        """
        fam = self.family.name
        roots = [self.base_dir]
        if condition == "clean" and self.clean_dir is not None:
            roots.insert(0, self.clean_dir.parent)
        candidates = ([self.clean_dir.name] if condition == "clean"
                      and self.clean_dir is not None else [])
        candidates += [condition, f"rgb_{condition}"]
        if condition == "clean":
            candidates += ["rgb_clean", "clean"]
        else:
            level = condition[len(fam):]
            candidates += [f"dataset_rgb_{fam}_{level}",
                           f"dataset_rgb_{condition}"]
        aliases = {fam, fam.replace("_", ""),
                   fam.replace("_and_", "")}       # salt_and_pepper->saltpepper
        subtrees = [""] + sorted(
            sub for a in aliases
            for sub in (a, os.path.join(a, f"{a}_output")))
        for root in roots:
            for sub in subtrees:
                for c in candidates:
                    d = root / sub / c if sub else root / c
                    if d.is_dir():
                        return d
        return None

    def load_all_experiments(self) -> pd.DataFrame:
        rows = []
        for condition in self.family.conditions:
            cdir = self._condition_dir(condition)
            if cdir is None:
                continue
            for area in self.areas:
                for size in self.sizes:
                    for k in self.k_values:
                        for method in self.methods:
                            d = cdir / area / size / f"k{k}" / method
                            if not d.is_dir():
                                continue
                            for jf in sorted(d.glob("*.json")):
                                row = self._parse_report(jf, condition, area,
                                                         size, k, method)
                                if row is not None:
                                    rows.append(row)
                                    break  # one report per cell
        self.df = pd.DataFrame(rows)
        return self.df

    @staticmethod
    def _parse_report(path: Path, condition, area, size, k, method
                      ) -> Optional[dict]:
        try:
            with open(path) as f:
                data = json.load(f)
            perf = data.get("performance", {})
            mean_acc = (perf.get("cv_mean_accuracy")
                        if perf.get("cv_mean_accuracy") is not None
                        else perf.get("mean_accuracy"))
            if mean_acc is None:
                return None
            return {
                "noise_condition": condition,
                "area": area,
                "dataset_type": size,
                "k_features": int(k),
                "feature_method": method,
                "experiment_name": data.get("experiment_name", ""),
                "mean_accuracy": float(mean_acc),
                "std_accuracy": float(
                    perf.get("cv_std_accuracy",
                             perf.get("std_accuracy", 0.0)) or 0.0),
                "test_accuracy": perf.get("test_accuracy"),
                "total_images": data.get("dataset_info", {}).get(
                    "total_images"),
                "selected_features": ";".join(
                    data.get("feature_selection", {}).get(
                        "selected_features", [])),
                "file_path": str(path),
            }
        except (json.JSONDecodeError, KeyError, ValueError):
            return None

    def _require_df(self) -> pd.DataFrame:
        if self.df is None or len(self.df) == 0:
            self.load_all_experiments()
        if self.df is None or len(self.df) == 0:
            raise ValueError(
                f"No experiments found under {self.base_dir} for family "
                f"{self.family.name!r}")
        return self.df

    # -------------------------------------------------------------- reports

    def generate_comprehensive_report(self) -> str:
        df = self._require_df()
        fam = self.family
        L: List[str] = []
        title = fam.name.replace("_", " ").upper()
        L.append(f"# COMPARATIVE REPORT: TREE-ENSEMBLE EXPERIMENTS - "
                 f"{title} NOISE")
        L.append("=" * 70)
        L.append("")
        L.append("## EXPERIMENTAL SETUP")
        L.append(f"- Total experiments: {len(df)}")
        L.append(f"- Noise conditions: "
                 f"{', '.join(sorted(df['noise_condition'].unique()))}")
        L.append(f"- Geographic areas: "
                 f"{', '.join(sorted(df['area'].unique()))}")
        L.append(f"- Dataset types: "
                 f"{', '.join(sorted(df['dataset_type'].unique()))}")
        L.append(f"- Feature methods: "
                 f"{', '.join(sorted(df['feature_method'].unique()))}")
        L.append(f"- k values: "
                 f"{', '.join(map(str, sorted(df['k_features'].unique())))}")
        L.append("")

        L.append("## AVERAGE ACCURACY BY FEATURE EXTRACTION METHOD")
        for method, g in df.groupby("feature_method")["mean_accuracy"]:
            L.append(f"- **{METHOD_LABELS.get(method, method)}**: "
                     f"{g.mean():.3f} ± {g.std():.3f} ({len(g)} experiments)")
        L.append("")

        L.append("## AVERAGE ACCURACY BY NOISE CONDITION")
        for cond in fam.conditions:
            g = df[df["noise_condition"] == cond]["mean_accuracy"]
            if len(g):
                L.append(f"- **{fam.label(cond)}**: {g.mean():.3f} ± "
                         f"{g.std():.3f} ({len(g)} experiments)")
        L.append("")

        L.append("## TOP 10 GLOBAL PERFORMANCES")
        for _, r in df.nlargest(10, "mean_accuracy").iterrows():
            L.append(f"- {r['mean_accuracy']:.3f} | "
                     f"{METHOD_LABELS.get(r['feature_method'])} | "
                     f"{r['area']} | {SIZE_LABELS.get(r['dataset_type'])} | "
                     f"k={r['k_features']} | "
                     f"{fam.label(r['noise_condition'])}")
        L.append("")

        L.append("## PERFORMANCE BY GEOGRAPHIC AREA")
        for area in sorted(df["area"].unique()):
            L.append(f"### {area.upper()}")
            sub = df[df["area"] == area]
            for method, g in sub.groupby("feature_method")["mean_accuracy"]:
                L.append(f"  - {METHOD_LABELS.get(method, method)}: "
                         f"{g.mean():.3f} ± {g.std():.3f}")
            L.append("")

        L.append(f"## {title} NOISE ROBUSTNESS ANALYSIS")
        key_cols = ["area", "dataset_type", "feature_method", "k_features"]
        clean = df[df["noise_condition"] == "clean"].set_index(key_cols)[
            "mean_accuracy"]
        for cond in fam.conditions[1:]:
            noisy = df[df["noise_condition"] == cond].set_index(key_cols)[
                "mean_accuracy"]
            joined = pd.DataFrame({"clean": clean, "noisy": noisy}).dropna()
            if not len(joined):
                continue
            joined["deg"] = joined["clean"] - joined["noisy"]
            L.append(f"### Average degradation per method "
                     f"(Clean → {fam.label(cond)})")
            for method in sorted(self.methods):
                d = joined.xs(method, level="feature_method")["deg"] \
                    if method in joined.index.get_level_values(
                        "feature_method") else pd.Series(dtype=float)
                if len(d):
                    L.append(f"- {METHOD_LABELS.get(method, method)}: "
                             f"{d.mean():.3f} ± "
                             f"{(d.std() if len(d) > 1 else 0.0):.3f}")
            L.append("")
        return "\n".join(L)

    def generate_qualitative_analysis(self) -> str:
        df = self._require_df()
        fam = self.family
        L: List[str] = []
        L.append(f"# QUALITATIVE ANALYSIS - "
                 f"{fam.name.replace('_', ' ').upper()} NOISE ROBUSTNESS")
        L.append("")
        ranking = df.groupby("feature_method")["mean_accuracy"].mean() \
            .sort_values(ascending=False)
        L.append("## METHOD RANKING (overall mean accuracy)")
        for i, (m, v) in enumerate(ranking.items(), 1):
            L.append(f"{i}. {METHOD_LABELS.get(m, m)}: {v:.3f}")
        L.append("")

        L.append("## EFFECT OF FEATURE COUNT (k)")
        for k, g in df.groupby("k_features")["mean_accuracy"]:
            L.append(f"- k={k}: {g.mean():.3f} ± {g.std():.3f}")
        L.append("")

        L.append("## EFFECT OF DATASET SIZE")
        for size in self.sizes:
            g = df[df["dataset_type"] == size]["mean_accuracy"]
            if len(g):
                L.append(f"- {SIZE_LABELS.get(size, size)}: "
                         f"{g.mean():.3f} ± {g.std():.3f}")
        L.append("")

        L.append("## AREA DIFFICULTY (lower accuracy = harder)")
        by_area = df.groupby("area")["mean_accuracy"].mean() \
            .sort_values()
        for a, v in by_area.items():
            L.append(f"- {a}: {v:.3f}")
        L.append("")

        # -- noise robustness table (the reference's "KEY FINDINGS" §2,
        #    analyze_gaussian_experiments.py:264-275) -----------------------
        noise_stats = df.groupby("noise_condition")["mean_accuracy"] \
            .agg(["mean", "std"])
        clean_acc = (noise_stats.loc["clean", "mean"]
                     if "clean" in noise_stats.index else 0.0)
        L.append("## NOISE ROBUSTNESS")
        L.append("")
        L.append("| Condition | Mean Accuracy | Performance Loss |")
        L.append("|-----------|---------------|------------------|")
        for cond in fam.conditions:
            if cond not in noise_stats.index:
                continue
            row = noise_stats.loc[cond]
            loss = ((clean_acc - row["mean"]) * 100
                    if cond != "clean" and clean_acc > 0 else 0.0)
            loss_str = f"-{loss:.1f}%" if loss > 0 else "baseline"
            L.append(f"| {fam.label(cond)} | {row['mean']:.3f} ± "
                     f"{row['std']:.3f} | {loss_str} |")
        L.append("")

        # -- per-area best/worst breakdown (the reference's §3,
        #    analyze_gaussian_experiments.py:277-292) -----------------------
        L.append("## GEOGRAPHIC AREA ANALYSIS")
        for area in sorted(df["area"].unique()):
            sub = df[df["area"] == area]
            stats = sub.groupby("feature_method")["mean_accuracy"] \
                .agg(["mean", "std"]).sort_values("mean", ascending=False)
            L.append(f"### {area.upper()}")
            for i, (m, row) in enumerate(stats.iterrows()):
                tag = (" (best in this area)" if i == 0 else
                       " (weakest in this area)" if i == len(stats) - 1
                       else "")
                L.append(f"- **{METHOD_LABELS.get(m, m)}**: "
                         f"{row['mean']:.3f} ± {row['std']:.3f}{tag}")
            L.append("")

        noisy = df[df["noise_condition"] != "clean"]
        clean = df[df["noise_condition"] == "clean"]
        if len(noisy):
            noisy_means = noisy.groupby("feature_method")[
                "mean_accuracy"].mean()
            best_noisy = noisy_means.idxmax()
            L.append("## ROBUSTNESS VERDICT")
            L.append(
                f"Most robust method under {fam.name.replace('_', ' ')} "
                f"noise: **{METHOD_LABELS.get(best_noisy, best_noisy)}** "
                f"({noisy_means.max():.3f} mean accuracy across noisy "
                f"conditions).")
            L.append("")

        # -- conclusions + recommendations, derived from the data (the
        #    reference hardcodes this prose; analyze_gaussian_experiments.py:
        #    294-337) ------------------------------------------------------
        if len(noisy) and len(clean):
            drop = (clean.groupby("feature_method")["mean_accuracy"].mean()
                    - noisy.groupby("feature_method")["mean_accuracy"]
                    .mean()).sort_values()
            most_stable, most_fragile = drop.index[0], drop.index[-1]
            consistency = df.groupby("feature_method")["mean_accuracy"] \
                .std().sort_values()
            L.append("## CONCLUSIONS")
            L.append("")
            for i, (m, d) in enumerate(drop.items(), 1):
                L.append(f"{i}. **{METHOD_LABELS.get(m, m)}** loses "
                         f"{d * 100:.1f} points clean -> noisy"
                         + (" (most robust)" if m == most_stable else
                            " (most degraded)" if m == most_fragile else
                            ""))
            L.append("")
            L.append(f"Lowest run-to-run variability: "
                     f"**{METHOD_LABELS.get(consistency.index[0], consistency.index[0])}** "
                     f"(std {consistency.iloc[0]:.3f}).")
            L.append("")
            L.append("## PRACTICAL RECOMMENDATIONS")
            L.append("")
            L.append(f"1. For {fam.name.replace('_', ' ')}-degraded "
                     f"imagery: use "
                     f"**{METHOD_LABELS.get(best_noisy, best_noisy)}** "
                     f"(highest mean accuracy under noise).")
            best_clean = clean.groupby("feature_method")[
                "mean_accuracy"].mean().idxmax()
            L.append(f"2. For clean imagery: "
                     f"**{METHOD_LABELS.get(best_clean, best_clean)}** "
                     f"leads the clean suite.")
            best_k = df.groupby("k_features")["mean_accuracy"].mean() \
                .idxmax()
            L.append(f"3. Feature budget: k={best_k} maximizes mean "
                     f"accuracy on this suite; smaller k trades accuracy "
                     f"for interpretability.")
        return "\n".join(L)

    # ---------------------------------------------------------------- plots

    def _plt(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt

    def create_comparison_plots(self, output_dir) -> List[str]:
        df = self._require_df()
        fam = self.family
        plt = self._plt()
        comp = Path(output_dir) / "comparisons"
        comp.mkdir(parents=True, exist_ok=True)
        written = []

        def _curve(xcats, xlabel, fname, title, sel):
            plt.figure(figsize=(10, 6))
            for method in sorted(df["feature_method"].unique()):
                ys, es = [], []
                for c in xcats:
                    g = df[(df["feature_method"] == method) & sel(df, c)][
                        "mean_accuracy"]
                    ys.append(g.mean() if len(g) else 0.0)
                    es.append(g.std() if len(g) > 1 else 0.0)
                plt.errorbar(range(len(xcats)), ys, yerr=es, marker="o",
                             capsize=5, linewidth=2,
                             label=METHOD_LABELS.get(method, method))
            plt.xticks(range(len(xcats)),
                       [fam.label(c) if sel is _sel_noise else
                        SIZE_LABELS.get(c, c) for c in xcats])
            plt.xlabel(xlabel)
            plt.ylabel("Mean Accuracy")
            plt.title(title)
            plt.legend(title="Feature Extraction Method")
            plt.grid(True, alpha=0.3)
            plt.tight_layout()
            path = comp / fname
            plt.savefig(path, dpi=150, bbox_inches="tight")
            plt.close()
            written.append(str(path))

        def _sel_noise(d, c):
            return d["noise_condition"] == c

        def _sel_size(d, c):
            return d["dataset_type"] == c

        _curve(fam.conditions, "Noise Condition",
               f"accuracy_vs_{fam.name}_noise_overall.png",
               f"Accuracy vs {fam.name.replace('_', ' ').title()} Noise "
               f"Level", _sel_noise)
        _curve(self.sizes, "Dataset Size",
               "accuracy_vs_dataset_size_overall.png",
               "Accuracy vs Dataset Size", _sel_size)

        # method boxplot
        plt.figure(figsize=(10, 6))
        methods = sorted(df["feature_method"].unique())
        data = [df[df["feature_method"] == m]["mean_accuracy"].values
                for m in methods]
        bp = plt.boxplot(data, tick_labels=[METHOD_LABELS.get(m, m)
                                            for m in methods],
                         patch_artist=True)
        for patch in bp["boxes"]:
            patch.set_alpha(0.7)
        plt.ylabel("Accuracy")
        plt.title(f"Accuracy Distribution by Method - "
                  f"{fam.name.replace('_', ' ').title()} Noise Experiments")
        plt.grid(True, alpha=0.3)
        plt.tight_layout()
        path = comp / f"accuracy_vs_method_boxplot_{fam.name}.png"
        plt.savefig(path, dpi=150, bbox_inches="tight")
        plt.close()
        written.append(str(path))

        # heatmap: method x (noise, size)
        import seaborn as sns
        cols, mat = [], []
        for m in methods:
            row = []
            for cond in fam.conditions:
                for size in self.sizes:
                    g = df[(df["feature_method"] == m)
                           & (df["noise_condition"] == cond)
                           & (df["dataset_type"] == size)]["mean_accuracy"]
                    row.append(g.mean() if len(g) else np.nan)
            mat.append(row)
        cols = [f"{fam.label(c)}\n{SIZE_LABELS[s]}"
                for c in fam.conditions for s in self.sizes]
        plt.figure(figsize=(max(12, len(cols) * 1.2), 8))
        sns.heatmap(pd.DataFrame(
            mat, index=[METHOD_LABELS.get(m, m) for m in methods],
            columns=cols), annot=True, fmt=".3f", cmap="RdYlGn",
            vmin=0.5, vmax=1.0, cbar_kws={"label": "Mean Accuracy"})
        plt.title(f"Accuracy Heatmap: Methods vs "
                  f"{fam.name.replace('_', ' ').title()} Noise / Size")
        plt.tight_layout()
        path = comp / f"accuracy_heatmap_{fam.name}_summary.png"
        plt.savefig(path, dpi=150, bbox_inches="tight")
        plt.close()
        written.append(str(path))
        return written

    def create_detailed_plots(self, output_dir) -> List[str]:
        """Per-(size, k), per-(noise, k) and per-(noise, size) method
        curves — the reference's ~33 detailed plots, generated generically.
        """
        df = self._require_df()
        fam = self.family
        plt = self._plt()
        det = Path(output_dir) / "detailed"
        det.mkdir(parents=True, exist_ok=True)
        written = []

        def plot_methods_over(x_vals, x_fmt, fname, title, sel):
            plt.figure(figsize=(8, 5))
            found = False
            for method in sorted(df["feature_method"].unique()):
                ys = []
                for x in x_vals:
                    g = df[(df["feature_method"] == method)
                           & sel(df, x)]["mean_accuracy"]
                    ys.append(g.mean() if len(g) else np.nan)
                if not all(np.isnan(y) for y in ys):
                    found = True
                plt.plot(range(len(x_vals)), ys, marker="o",
                         label=METHOD_LABELS.get(method, method))
            if not found:
                plt.close()
                return
            plt.xticks(range(len(x_vals)), [x_fmt(x) for x in x_vals])
            plt.ylabel("Mean Accuracy")
            plt.title(title, fontsize=11)
            plt.legend(fontsize=8)
            plt.grid(True, alpha=0.3)
            plt.tight_layout()
            path = det / fname
            plt.savefig(path, dpi=120, bbox_inches="tight")
            plt.close()
            written.append(str(path))

        for size in self.sizes:
            for k in self.k_values:
                plot_methods_over(
                    fam.conditions, fam.label,
                    f"noise_curve_{size}_k{k}.png",
                    f"Accuracy vs Noise ({SIZE_LABELS[size]}, k={k})",
                    lambda d, c, size=size, k=k: (
                        (d["noise_condition"] == c)
                        & (d["dataset_type"] == size)
                        & (d["k_features"] == k)))
        for cond in fam.conditions:
            for k in self.k_values:
                plot_methods_over(
                    self.sizes, lambda s: SIZE_LABELS.get(s, s),
                    f"size_curve_{cond}_k{k}.png",
                    f"Accuracy vs Size ({fam.label(cond)}, k={k})",
                    lambda d, s, cond=cond, k=k: (
                        (d["noise_condition"] == cond)
                        & (d["dataset_type"] == s)
                        & (d["k_features"] == k)))
            for size in self.sizes:
                plot_methods_over(
                    self.k_values, str,
                    f"k_curve_{cond}_{size}.png",
                    f"Accuracy vs k ({fam.label(cond)}, "
                    f"{SIZE_LABELS[size]})",
                    lambda d, k, cond=cond, size=size: (
                        (d["noise_condition"] == cond)
                        & (d["dataset_type"] == size)
                        & (d["k_features"] == k)))
        return written

    # --------------------------------------------------------------- export

    def export_to_csv(self, output_dir) -> List[str]:
        df = self._require_df()
        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)
        p1 = out / "experiments_summary.csv"
        df.to_csv(p1, index=False)
        agg = df.groupby(["noise_condition", "feature_method"]).agg(
            mean_accuracy=("mean_accuracy", "mean"),
            std_accuracy=("mean_accuracy", "std"),
            n=("mean_accuracy", "count")).reset_index()
        p2 = out / "aggregated_statistics.csv"
        agg.to_csv(p2, index=False)
        return [str(p1), str(p2)]

    def create_analysis_summary(self, output_dir) -> str:
        df = self._require_df()
        fam = self.family
        by_method = df.groupby("feature_method")["mean_accuracy"].mean()
        clean_mean = df[df["noise_condition"] == "clean"][
            "mean_accuracy"].mean()
        worst_cond = fam.conditions[-1]
        worst_mean = df[df["noise_condition"] == worst_cond][
            "mean_accuracy"].mean()
        mini = df[df["dataset_type"] == "mini"]["mean_accuracy"].mean()
        orig = df[df["dataset_type"] == "original"]["mean_accuracy"].mean()
        L = [
            f"# ANALYSIS SUMMARY - {fam.name.replace('_', ' ').upper()}",
            "",
            f"- Experiments analyzed: {len(df)}",
            f"- Best method: {by_method.idxmax()} "
            f"({by_method.max():.3f} avg)",
            f"- Noise impact (clean → {fam.label(worst_cond)}): "
            f"{(worst_mean - clean_mean) / max(clean_mean, 1e-9) * 100:+.1f}%",
            f"- Size effect (mini → original): "
            f"{(orig - mini) / max(mini, 1e-9) * 100:+.1f}%",
            "",
            "## Generated artifacts",
            "- comprehensive_report.md",
            "- qualitative_analysis.md",
            "- comparisons/ (4 plots)",
            "- detailed/ (per size/k/noise plots)",
            "- experiments_summary.csv, aggregated_statistics.csv",
        ]
        text = "\n".join(L)
        path = Path(output_dir) / "analysis_summary.md"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(text)
        return str(path)

    # ---------------------------------------------------------- orchestrate

    def create_complete_analysis(self, output_dir: Optional[str] = None
                                 ) -> Dict[str, object]:
        out = Path(output_dir
                   or (self.base_dir / f"{self.family.name}_analysis"))
        out.mkdir(parents=True, exist_ok=True)
        self.load_all_experiments()
        report = self.generate_comprehensive_report()
        (out / "comprehensive_report.md").write_text(report)
        qual = self.generate_qualitative_analysis()
        (out / "qualitative_analysis.md").write_text(qual)
        comp = self.create_comparison_plots(out)
        det = self.create_detailed_plots(out)
        csvs = self.export_to_csv(out)
        summary = self.create_analysis_summary(out)
        from wst_tpu.analysis.stats_tests import write_significance_report
        sig = write_significance_report(self.df,
                                        out / "significance_report.md")
        return {"output_dir": str(out), "n_experiments": len(self.df),
                "comparison_plots": comp, "detailed_plots": det,
                "csv_files": csvs, "summary": summary,
                "significance": sig}


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="Analyze a noise family's grid")
    p.add_argument("family", choices=sorted(NOISE_FAMILIES))
    p.add_argument("--base-dir", required=True)
    p.add_argument("--clean-dir", default=None)
    p.add_argument("--output-dir", default=None)
    args = p.parse_args(argv)
    analyzer = NoiseExperimentAnalyzer(args.family, args.base_dir,
                                       args.clean_dir)
    res = analyzer.create_complete_analysis(args.output_dir)
    print(f"Analyzed {res['n_experiments']} experiments -> "
          f"{res['output_dir']} ({len(res['comparison_plots'])} comparison "
          f"+ {len(res['detailed_plots'])} detailed plots)")


if __name__ == "__main__":
    main()
