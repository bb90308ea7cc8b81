"""End-to-end accuracy-parity harness: composed wst_tpu stack vs composed
sklearn stack on identical feature matrices (BASELINE.json 0.5% target).

Two regimes, both written into reports/PARITY.json:

1. ``families`` (round-2 back-compat): 3 synthetic areas x 3 dataset sizes
   on blended-class + gaussian-noise imagery tuned to the reference's
   accuracy regime (~0.6-0.9), plus a deep-seed ``bias_bound`` pass
   (>= 150 seeds) on the worst families so the per-family bias is bounded
   with a 95% CI instead of a noise-floor assertion (VERDICT round-2
   directive #2).

Seed counts are rebalanced by cost x variance (FAMILY_SEEDS/SUITE_SEEDS):
a mini cell (3-tree fits, n=30) costs ~2% of an original cell (50-tree,
n=120) but has ~6x its paired noise floor (sigma ~0.13 vs ~0.015), so the
deep seeds go where they are cheap AND where the variance lives.  At the
chosen counts every pooled gate in tests/test_e2e_parity.py sits >= 3
standard errors from its bound when the true bias is the bias_bound-
measured <= 0.004.

2. ``suites`` (VERDICT round-2 directive #1): all six experiment suites of
   the reference's factorial grid — clean + the 5 noise families at the
   reference intensities (gaussian 30/50, poisson 40/60, salt&pepper
   5/15/25, speckle 15/35/55, uniform 10/25/40; reference:
   src/preprocessing/add_noise.py:14-72) — applied to the synthetic
   imagery with wst_tpu.ops.noise (same uint8 semantics as add_noise.py),
   3 areas x 3 sizes per condition.  Per suite it records pooled CV/test
   accuracy deltas AND per-class test-recall deltas (reference composes
   per-class metrics from the test-split classification_report,
   src/training/train_and_save_model.py:183-198).

3. ``replication`` (VERDICT round-3 directive #1): every cell of the
   main ``suites`` grid shares one seed set and one image pool per area,
   so cell deltas are CORRELATED and naive pooled standard errors
   overstate precision.  This phase re-runs ALL SIX suites with DISJOINT
   seeds (1000+) at deep counts (mini 400 / small 160 / original 20 per
   cell; clean, which has a third of the cells, at 800/320/40) so each
   suite's pooled and per-class deltas can be asserted at the BASELINE
   0.5% budget itself.

4. ``factorial`` (VERDICT round-3 directive #2): the reference's
   method x k axes (3 methods x k in {2,5,10,20},
   reference: src/training/train_and_save_model.py:320-344) on the small
   size across 3 areas — k=2 is the tie-heaviest selection regime and
   advanced/wst have different feature-correlation structure than hybrid,
   so selection-set parity and |d_cv| are asserted per (method, k).

5. ``family_128`` (VERDICT round-3 directive #9): one full family at the
   production 128x128 patch shape (the main grids extract at 64x64 for
   CPU tractability; the parity LOGIC is identical-input so unaffected,
   but this measures forest parity on the production feature
   distribution too).

Run ``--device tpu`` to let the wst_tpu forest fits/predicts and feature
extraction run on the real chip (the sklearn oracle side always runs on
host CPU); results feed the same artifact — the parity measured is then
the production TPU-fit-vs-sklearn comparison.  Checkpoints embed their
seed-plan fingerprint and are discarded on mismatch, so a stale part can
never masquerade as the current plan.

Per cell, both stacks see identical feature matrices:

  (a) sklearn: StandardScaler -> SelectKBest(mutual_info_classif, k=10)
      -> RandomForestClassifier(n_estimators per the reference's size
      heuristic, max_features='sqrt', min_samples_split=5,
      min_samples_leaf=2) with stratified 80/20 split + 5-fold stratified
      CV (reference: src/training/train_and_save_model.py:147-198);
  (b) wst_tpu: fit_select_kbest -> TreeEnsembleClassifier with this
      framework's splits (bit-identical to sklearn's) — ALL seeds' (test +
      5 fold) fits run in one batched device dispatch via per-cell seeds.

Usable as a script (writes reports/PARITY.json) or imported by
tests/test_e2e_parity.py.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = {"mini": (5, 3), "small": (15, 10), "original": (40, 50)}
AREAS = ("assatigue", "popolar", "sunset")

# Per-size seed counts for the checked-in artifact (see module docstring).
FAMILY_SEEDS = {"mini": 400, "small": 160, "original": 20}
SUITE_SEEDS = {"mini": 100, "small": 40, "original": 10}
# Replication seed plans: DISJOINT from the 0..N-1 main-grid seeds.
REPL_SEEDS = {"mini": range(1000, 1400), "small": range(1000, 1160),
              "original": range(1000, 1020)}
REPL_SEEDS_CLEAN = {"mini": range(1000, 1800), "small": range(1000, 1320),
                    "original": range(1000, 1040)}
# Deep-seed bias-bound plan (VERDICT round-3 directive #3: CIs must sit
# under the gate so it cannot be satisfied by variance).  Round 5 sizes
# the counts so the TEST-split delta's ci95 also lands under 0.01: the
# measured stds are d_test ~0.31 at mini and ~0.105 at small, so mini
# needs (1.96*0.31/0.01)^2 ~ 3700 seeds and the small families ~430.
BIAS_SEEDS = {"popolar/mini": 4100, "assatigue/small": 470,
              "popolar/small": 470}
# family_128 at the bias_bound treatment (round-4 VERDICT directive #2).
# mini at 1200: the decoupled-oracle d_cv std measured up to 0.167
# (sunset), so the ci95 <= 0.01 gate needs n >= (1.96*0.167/0.01)^2.
FAMILY128_SEEDS = {"mini": 1200, "small": 400, "original": 40}
# Forest-kernel RNG/semantics version: embedded in every forest-dependent
# phase plan so artifacts measured against an older kernel are discarded
# instead of silently gating a changed forest.  r5: bootstrap key split
# from the subsample chain + sklearn-exact max_features budget accounting.
FOREST_VER = "r5-keysplit-budget"
FACTORIAL_KS = (2, 5, 10, 20)
FACTORIAL_SEEDS = range(96)
REPLICATION_SUITES = ("clean", "gaussian", "poisson", "salt_and_pepper",
                      "speckle", "uniform")


def _seeds_for(seeds, size):
    """seeds may be an iterable (same for every size) or a per-size dict
    mapping size -> count-or-iterable."""
    if isinstance(seeds, dict):
        seeds = seeds[size]
    if isinstance(seeds, int):
        return range(seeds)
    return seeds


def _plan_fingerprint(**parts) -> str:
    """Canonical string of a phase's seed plan, embedded in its checkpoint
    so stale parts are discarded when the plan (or grid) changes."""
    def enc(v):
        if isinstance(v, range):
            return [v.start, v.stop, v.step]
        if isinstance(v, dict):
            return {k: enc(x) for k, x in sorted(v.items())}
        if isinstance(v, (list, tuple)):
            return [enc(x) for x in v]
        return v
    return json.dumps(enc(parts), sort_keys=True)

# hw=64 keeps CPU extraction tractable; J=2, L=8 as the reference.
HW = 64


def _blended_images(area: str, hw: int, n_per: int, alpha: float,
                    seed: int):
    """Blended-class synthetic imagery -> (uint8 HWC images, labels).

    Blending class textures (alpha = weight of the labeled class)
    de-saturates the task so parity is measured at the reference's accuracy
    regime instead of at a vacuous 1.0.
    """
    import zlib

    from wst_tpu.data.dataset import CLASSES, synthesize_patch

    # zlib.crc32, not hash(): str hash is salted per process
    rng = np.random.default_rng(seed + zlib.crc32(area.encode()) % 1000)
    per = {c: [synthesize_patch(rng, c, area, hw=(hw, hw))
               for _ in range(n_per)] for c in CLASSES}
    imgs = []
    for c in CLASSES:
        for i in range(n_per):
            other = per[CLASSES[rng.integers(0, len(CLASSES))]][
                rng.integers(0, n_per)]
            imgs.append(np.clip(
                alpha * per[c][i].astype(np.float32)
                + (1 - alpha) * other.astype(np.float32), 0, 255
            ).astype(np.uint8))
    return np.stack(imgs), np.repeat(CLASSES, n_per)


def make_area_features(area: str, hw: int = HW, n_per: int = 40,
                       alpha: float = 0.4, sigma: float = 50.0,
                       seed: int = 7):
    """Round-2 regime: blended + float-gaussian-noised -> hybrid features."""
    from wst_tpu.features.extractor import FeatureExtractor

    u8, y = _blended_images(area, hw, n_per, alpha, seed)
    rng = np.random.default_rng(seed + 1)
    x = u8.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    x = np.clip(x + rng.normal(0, sigma / 255, x.shape).astype(np.float32),
                0, 1)
    fx = FeatureExtractor("hybrid", hw, hw, 2, 8)
    # float64 like the reference's feature matrices (np.array of python
    # lists): keeps BOTH stacks' scalers in float64, where the selection
    # chain is bitwise-identical.
    return fx.extract_numpy(x).astype(np.float64), y


def suite_conditions():
    """[(condition, family-or-None, intensity)] — the reference's 14-cell
    noise axis (clean + 13 noisy variants), reference intensities per
    src/preprocessing/add_noise.py and SURVEY.md §2.1 C18."""
    from wst_tpu.ops.noise import NOISE_LEVELS
    conds = [("clean", None, 0.0)]
    for fam in ("gaussian", "poisson", "salt_and_pepper", "speckle",
                "uniform"):
        for lvl in NOISE_LEVELS[fam]:
            conds.append((f"{fam}_{lvl}", fam, float(lvl)))
    return conds


def condition_features(clean_u8: np.ndarray, fam, intensity: float,
                       extractor=None, hw: int = HW, noise_seed: int = 42):
    """Apply one reference noise condition device-side, extract hybrid
    features.  Noise semantics match the reference's add_noise.py (uint8
    in/out, same distributions and clip); keys are per-image
    fold_in(seed, i)."""
    from wst_tpu.features.extractor import FeatureExtractor
    from wst_tpu.ops.noise import add_noise_batch

    u8 = clean_u8
    if fam is not None:
        u8 = np.asarray(add_noise_batch(
            noise_seed, np.arange(len(u8), dtype=np.int32), u8, fam,
            intensity))
    x = u8.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    fx = extractor or FeatureExtractor("hybrid", hw, hw, 2, 8)
    return fx.extract_numpy(x).astype(np.float64)  # reference float64 regime


def _decoupled_rf_proba(Xtr, ytr, Xte, n_est, seed, classes):
    """Stock sklearn RF with the splitter stream DECOUPLED from the
    bootstrap draw — the semantics-equal oracle.

    sklearn's RandomForestClassifier seeds each tree with
    RandomState(ensemble_seed).randint(int32_max) and then uses that SAME
    tree seed for BOTH the bootstrap draw (_generate_sample_indices) and
    the splitter's rand_r stream (tree._fit) — the first MT19937 output
    simultaneously determines bootstrap idx[0] and rand_r_state, so the
    in-bag set and the feature-visit order are deterministically coupled.
    At tie-heavy regimes (128x128 features, n=12, 3 trees) this coupling
    measurably DEPRESSES stock sklearn's CV accuracy by ~1.5-2%
    (reports/FAMILY128_BIAS.md); a cleanly-keyed reimplementation (this
    framework's forest) therefore scores "better than sklearn" there
    through no semantic difference of its own.

    This oracle reproduces sklearn's tree seeds and bootstrap draws
    EXACTLY and changes only the splitter seed (a fixed Knuth-mix of the
    tree seed) — the paired delta against it measures splitter-semantics
    parity with the coupling artifact removed."""
    from sklearn.tree import DecisionTreeClassifier

    MAXI = np.iinfo(np.int32).max
    rs = np.random.RandomState(seed)
    n = len(Xtr)
    probs = np.zeros((len(Xte), len(classes)))
    col = {c: j for j, c in enumerate(classes)}
    for t in range(n_est):
        st = rs.randint(MAXI)
        w = np.bincount(np.random.RandomState(st).randint(0, n, n),
                        minlength=n).astype(np.float64)
        dec = DecisionTreeClassifier(
            max_features="sqrt", min_samples_split=5, min_samples_leaf=2,
            random_state=int((st * 2654435761 + 97 + t) % MAXI))
        dec.fit(Xtr, ytr, sample_weight=w)
        p = dec.predict_proba(Xte)
        for j, c in enumerate(dec.classes_):
            probs[:, col[c]] += p[:, j]
    return probs


def run_family(X, y, n_per: int, n_est: int, k: int = 10,
               seeds=range(20), decoupled_oracle: bool = False):
    """-> dict with per-seed paired test/cv accuracy diffs and per-class
    test-recall diffs for one (feature matrix, size) cell.

    ``decoupled_oracle=True`` additionally scores every seed against the
    decoupled-sklearn oracle (see :func:`_decoupled_rf_proba`), adding
    d_cv_dec_* / d_test_dec_* keys."""
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.feature_selection import mutual_info_classif as sk_mi
    from sklearn.model_selection import (StratifiedKFold, cross_val_score,
                                         train_test_split)
    from sklearn.preprocessing import StandardScaler

    from wst_tpu.features.selection import fit_select_kbest
    from wst_tpu.models.forest import (fit_tree_ensembles,
                                       predict_tree_ensembles)
    from wst_tpu.train.splits import (stratified_kfold_indices,
                                      stratified_train_test_split)

    classes = np.unique(y)
    idx = np.concatenate([np.where(y == c)[0][:n_per] for c in classes])
    Xf, yf = X[idx], y[idx]
    seeds = list(seeds)

    # selection happens once per cell in both stacks (it has no seed in
    # the reference; we fix the MI tie-noise stream to random_state=0)
    Xs_sk = StandardScaler().fit_transform(Xf)
    mi = sk_mi(Xs_sk, yf, n_neighbors=3, random_state=0)
    sel = np.sort(np.argsort(mi, kind="mergesort")[-k:])
    Xsel_sk = Xs_sk[:, sel]
    Xsel_us, model = fit_select_kbest(Xf, yf,
                                      [f"f{i}" for i in range(X.shape[1])],
                                      k)
    overlap = len(set(sel) & set(model.selected_indices))

    def recalls(pred, truth):
        return np.array([(pred[truth == c] == c).mean() for c in classes])

    # ---- sklearn stack, per seed (cannot batch a Cython RF) -------------
    d_test, d_cv, acc_sk_all = [], [], []
    rec_sk = np.zeros((len(seeds), len(classes)))
    splits, dec_splits = [], []
    for si, s in enumerate(seeds):
        tr, te = train_test_split(np.arange(len(yf)), test_size=0.2,
                                  stratify=yf, random_state=s)
        rf = RandomForestClassifier(
            n_estimators=n_est, max_features="sqrt", min_samples_split=5,
            min_samples_leaf=2, random_state=s)
        rf.fit(Xsel_sk[tr], yf[tr])
        pred_sk = rf.predict(Xsel_sk[te])
        acc_sk = float((pred_sk == yf[te]).mean())
        rec_sk[si] = recalls(pred_sk, yf[te])
        cv_sk = cross_val_score(
            RandomForestClassifier(
                n_estimators=n_est, max_features="sqrt",
                min_samples_split=5, min_samples_leaf=2, random_state=s),
            Xsel_sk, yf,
            cv=StratifiedKFold(5, shuffle=True, random_state=s)).mean()
        acc_sk_all.append(acc_sk)
        splits.append((acc_sk, cv_sk))
        if decoupled_oracle:
            pd_ = _decoupled_rf_proba(Xsel_sk[tr], yf[tr], Xsel_sk[te],
                                      n_est, s, classes)
            acc_dec = float((classes[np.argmax(pd_, 1)] == yf[te]).mean())
            cvs = []
            for ftr_, fte_ in StratifiedKFold(
                    5, shuffle=True, random_state=s).split(Xsel_sk, yf):
                pf = _decoupled_rf_proba(Xsel_sk[ftr_], yf[ftr_],
                                         Xsel_sk[fte_], n_est, s, classes)
                cvs.append(float(
                    (classes[np.argmax(pf, 1)] == yf[fte_]).mean()))
            dec_splits.append((acc_dec, float(np.mean(cvs))))

    # ---- wst_tpu stack: ALL seeds' (test + 5 folds) in one batched fit --
    jobs, seed_vec = [], []
    for s in seeds:
        tr2, te2 = stratified_train_test_split(yf, 0.2, s)
        folds = list(stratified_kfold_indices(yf, 5, s))
        for a, b in [(tr2, te2)] + folds:
            jobs.append((a, b))
            seed_vec.append(s)
    models = fit_tree_ensembles([Xsel_us[a] for a, _ in jobs],
                                [yf[a] for a, _ in jobs],
                                n_estimators=n_est, random_state=seed_vec)
    preds = predict_tree_ensembles(models, [Xsel_us[b] for _, b in jobs])

    rec_us = np.zeros((len(seeds), len(classes)))
    d_test_dec, d_cv_dec = [], []
    for si, s in enumerate(seeds):
        p6 = preds[6 * si:6 * si + 6]
        j6 = jobs[6 * si:6 * si + 6]
        accs = [float((p == yf[b]).mean()) for p, (_, b) in zip(p6, j6)]
        rec_us[si] = recalls(p6[0], yf[j6[0][1]])
        acc_sk, cv_sk = splits[si]
        d_test.append(accs[0] - acc_sk)
        d_cv.append(np.mean(accs[1:]) - cv_sk)
        if decoupled_oracle:
            acc_dec, cv_dec = dec_splits[si]
            d_test_dec.append(accs[0] - acc_dec)
            d_cv_dec.append(np.mean(accs[1:]) - cv_dec)

    d_rec = rec_us - rec_sk                      # (seeds, classes)
    extra = {}
    if decoupled_oracle:
        extra = {
            "d_test_dec_mean": float(np.mean(d_test_dec)),
            "d_test_dec_std": float(np.std(d_test_dec)),
            "d_cv_dec_mean": float(np.mean(d_cv_dec)),
            "d_cv_dec_std": float(np.std(d_cv_dec)),
        }
    return {
        **extra,
        "n_per_class": n_per, "n_estimators": n_est, "k": k,
        "selection_overlap": overlap,
        "sk_test_acc_mean": float(np.mean(acc_sk_all)),
        "d_test_mean": float(np.mean(d_test)),
        "d_test_std": float(np.std(d_test)),
        "d_cv_mean": float(np.mean(d_cv)),
        "d_cv_std": float(np.std(d_cv)),
        "per_class_d_test": {str(c): float(d_rec[:, j].mean())
                             for j, c in enumerate(classes)},
        "sk_per_class_recall": {str(c): float(rec_sk[:, j].mean())
                                for j, c in enumerate(classes)},
        "n_seeds": len(seeds),
    }


def run_all(seeds=FAMILY_SEEDS, verbose=True):
    """Round-2 ``families`` grid (blended-gaussian regime)."""
    results = {}
    for area in AREAS:
        X, y = make_area_features(area)
        for size, (n_per, n_est) in SIZES.items():
            r = run_family(X, y, n_per, n_est, seeds=_seeds_for(seeds, size))
            results[f"{area}/{size}"] = r
            if verbose:
                print(f"{area}/{size}: sk_acc {r['sk_test_acc_mean']:.3f} "
                      f"overlap {r['selection_overlap']}/10 "
                      f"dtest {r['d_test_mean']:+.4f}±{r['d_test_std']:.4f} "
                      f"dcv {r['d_cv_mean']:+.4f}±{r['d_cv_std']:.4f}",
                      flush=True)
    return results


def run_suites(seeds=SUITE_SEEDS, areas=AREAS, sizes=None, conds=None,
               verbose=True, checkpoint=None, plan=None):
    """Six-suite grid -> {suite: {"cells": {...}, pooled deltas}}.

    Every (area, condition) extracts features once at the ``original``
    pool (40/class); sizes subset rows, mirroring how the reference's
    mini/small/original datasets nest.  ``plan`` (a fingerprint string) is
    stored in the checkpoint; a checkpoint whose plan differs is discarded
    instead of silently reused.
    """
    from wst_tpu.features.extractor import FeatureExtractor

    sizes = sizes or SIZES
    conds = conds or suite_conditions()
    fx = FeatureExtractor("hybrid", HW, HW, 2, 8)
    cells_by_suite = {}
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint) as f:
            cells_by_suite = json.load(f)
        ck_plan = cells_by_suite.pop("__plan__", None)
        if plan is not None and ck_plan != plan:
            print(f"# discarding stale checkpoint {checkpoint} "
                  f"(seed plan changed)", flush=True)
            cells_by_suite = {}
    for area in areas:
        u8, y = _blended_images(area, HW, 40, alpha=0.4, seed=7)
        for cond, fam, lvl in conds:
            # group finished in a prior run only if EVERY size is present
            # (checkpoint writes are group-atomic today, but a subset or
            # reordered `sizes` dict must not mis-detect completion).
            done = cells_by_suite.get(fam or "clean", {})
            if all(f"{cond}/{area}/{size}" in done for size in sizes):
                continue
            X = condition_features(u8, fam, lvl, extractor=fx)
            for size, (n_per, n_est) in sizes.items():
                r = run_family(X, y, n_per, n_est,
                               seeds=_seeds_for(seeds, size))
                suite = fam or "clean"
                cells_by_suite.setdefault(suite, {})[
                    f"{cond}/{area}/{size}"] = r
                if verbose:
                    pc = " ".join(f"{v:+.3f}"
                                  for v in r["per_class_d_test"].values())
                    print(f"{cond}/{area}/{size}: "
                          f"sk {r['sk_test_acc_mean']:.3f} "
                          f"ovl {r['selection_overlap']}/10 "
                          f"dcv {r['d_cv_mean']:+.4f} "
                          f"dtest {r['d_test_mean']:+.4f} pc [{pc}]",
                          flush=True)
            if checkpoint:
                with open(checkpoint, "w") as f:
                    json.dump({"__plan__": plan, **cells_by_suite}, f)
    return {suite: aggregate_suite(cells)
            for suite, cells in cells_by_suite.items()}


def aggregate_suite(cells: dict) -> dict:
    """Pool one suite's cells: mean deltas + per-class pooled deltas."""
    d_cv = [r["d_cv_mean"] for r in cells.values()]
    d_test = [r["d_test_mean"] for r in cells.values()]
    class_names = sorted(next(iter(cells.values()))["per_class_d_test"])
    per_class = {c: float(np.mean([r["per_class_d_test"][c]
                                   for r in cells.values()]))
                 for c in class_names}
    return {
        "n_cells": len(cells),
        "d_cv_pooled": float(np.mean(d_cv)),
        "d_test_pooled": float(np.mean(d_test)),
        "max_abs_d_cv_cell": float(np.max(np.abs(d_cv))),
        "per_class_d_test_pooled": per_class,
        "sk_acc_pooled": float(np.mean([r["sk_test_acc_mean"]
                                        for r in cells.values()])),
        "cells": cells,
    }


# Families whose round-2 20-seed means sat near the per-family bound —
# re-measured at high seed count to separate bias from variance.
BIAS_BOUND_FAMILIES = ("assatigue/small", "popolar/mini", "popolar/small")


def run_bias_bound(seed_plan=None, verbose=True):
    """Deep-seed pass: per-family bias with a 95% CI.

    Round-4 plan (VERDICT round-3 directive #3): seed counts per family
    are chosen so every CI95 lands under the 0.01 gate — the mini family
    (the cheapest AND noisiest cell) gets 1000 seeds, the small families
    400 — so the gate ``|d| <= 0.01 and ci95 <= 0.01`` cannot be
    satisfied by variance."""
    plan = seed_plan or BIAS_SEEDS
    out = {}
    feats = {}
    for fam, n_seeds in plan.items():
        area, size = fam.split("/")
        if area not in feats:
            feats[area] = make_area_features(area)
        X, y = feats[area]
        n_per, n_est = SIZES[size]
        r = run_family(X, y, n_per, n_est, seeds=range(n_seeds))
        # CI of the MEAN paired diff: std/sqrt(n) * 1.96
        ci = 1.96 * r["d_cv_std"] / np.sqrt(n_seeds)
        ci_t = 1.96 * r["d_test_std"] / np.sqrt(n_seeds)
        out[fam] = {"d_cv_mean": r["d_cv_mean"], "ci95": float(ci),
                    "d_test_mean": r["d_test_mean"],
                    "ci95_test": float(ci_t), "n_seeds": n_seeds}
        if verbose:
            print(f"bias {fam}: d_cv {r['d_cv_mean']:+.4f} ± {ci:.4f}, "
                  f"d_test {r['d_test_mean']:+.4f} ± {ci_t:.4f} "
                  f"(95% CI, {n_seeds} seeds)", flush=True)
    return out


def run_replication(parts_dir="reports/parity_parts", verbose=True):
    """Disjoint-seed replication of ALL SIX suites at the BASELINE budget
    (VERDICT round-3 directive #1; replaces the round-3 gaussian-only
    replication).

    Each suite checkpoints to its own ``replication_{suite}.json`` (with
    its seed-plan fingerprint) so a single suite can be deepened without
    invalidating the others."""
    conds = suite_conditions()
    out = {}
    for suite in REPLICATION_SUITES:
        sub = [c for c in conds if (c[1] or "clean") == suite]
        seeds = REPL_SEEDS_CLEAN if suite == "clean" else REPL_SEEDS
        plan = _plan_fingerprint(seeds=seeds, sizes=list(SIZES),
                                 conds=[c[0] for c in sub], hw=HW)
        ck = os.path.join(parts_dir, f"replication_{suite}.json")
        res = run_suites(seeds=seeds, conds=sub, checkpoint=ck,
                         plan=plan, verbose=verbose)
        agg = res[suite]
        agg["seeds"] = {size: f"{r.start}-{r.stop - 1}"
                        for size, r in seeds.items()}
        agg["why"] = (
            "every cell of the main grid shares one seed set and one "
            "image pool per area, so cell deltas are CORRELATED and "
            "pooled standard errors overstate precision; this replication "
            "reruns the full suite with disjoint seeds (1000+) at deep "
            "counts so pooled and per-class deltas are asserted at the "
            "BASELINE 0.5% budget itself.  Caveat: the replication reuses "
            "the per-area image pools (blend seed 7), so only the "
            "split/bootstrap-seed half of the campaign correlation is "
            "removed; the suites_combined estimate remains correlated "
            "through the imagery draw.")
        out[suite] = agg
        if verbose:
            pc = " ".join(f"{c}:{v:+.4f}" for c, v in
                          agg["per_class_d_test_pooled"].items())
            print(f"replication/{suite}: dcv {agg['d_cv_pooled']:+.4f} "
                  f"dtest {agg['d_test_pooled']:+.4f} [{pc}]", flush=True)
    return out


# hybrid columns: [advanced_stats 54 | wst 486] (features/extractor.py:82-88)
METHOD_SLICES = {"advanced_stats": slice(0, 54), "wst": slice(54, 540),
                 "hybrid": slice(0, 540)}


def run_factorial(seeds=FACTORIAL_SEEDS, ks=FACTORIAL_KS, verbose=True,
                  checkpoint=None, plan=None):
    """The reference's method x k factorial axes
    (src/training/train_and_save_model.py:320-344): 3 methods x 4 k values
    on the small size, 3 areas, clean imagery.  k=2 is the tie-heaviest
    selection regime; advanced/wst stress different feature-correlation
    structure than hybrid."""
    cells = {}
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint) as f:
            cells = json.load(f)
        if cells.pop("__plan__", None) != plan:
            print(f"# discarding stale checkpoint {checkpoint}", flush=True)
            cells = {}
    n_per, n_est = SIZES["small"]
    for area in AREAS:
        if all(f"{area}/{m}/k{k}" in cells
               for m in METHOD_SLICES for k in ks):
            continue
        u8, y = _blended_images(area, HW, 40, alpha=0.4, seed=7)
        X = condition_features(u8, None, 0.0)
        for method, sl in METHOD_SLICES.items():
            for k in ks:
                key = f"{area}/{method}/k{k}"
                if key in cells:
                    continue
                r = run_family(X[:, sl], y, n_per, n_est, k=k, seeds=seeds)
                cells[key] = r
                if verbose:
                    print(f"factorial {key}: ovl {r['selection_overlap']}"
                          f"/{k} dcv {r['d_cv_mean']:+.4f} "
                          f"dtest {r['d_test_mean']:+.4f}", flush=True)
                if checkpoint:
                    with open(checkpoint, "w") as f:
                        json.dump({"__plan__": plan, **cells}, f)
    by_mk = {}
    for method in METHOD_SLICES:
        for k in ks:
            sub = [cells[f"{area}/{method}/k{k}"] for area in AREAS]
            by_mk[f"{method}/k{k}"] = {
                "n_cells": len(sub),
                "d_cv_pooled": float(np.mean([r["d_cv_mean"] for r in sub])),
                "d_test_pooled": float(np.mean([r["d_test_mean"]
                                                for r in sub])),
                "min_selection_overlap": int(min(r["selection_overlap"]
                                                 for r in sub)),
                "k": k,
            }
    return {"cells": cells, "by_method_k": by_mk,
            "n_seeds": len(list(seeds))}


def run_family_128(areas=AREAS, seeds=None, verbose=True,
                   checkpoint=None, plan=None):
    """ALL THREE areas at the production 128x128 patch shape, at the
    bias_bound seed treatment (round-4 VERDICT directive #2; supersedes
    the round-4 single-area pass): mini 1000 seeds / small 400 /
    original 40, each cell scored against BOTH oracles — stock sklearn
    (the reference oracle) and decoupled sklearn (the semantics oracle,
    :func:`_decoupled_rf_proba`).

    The 128x128 feature distribution is where the stock/decoupled gap
    lives: selected features there include exact-duplicate value columns
    that make split ties common, and stock sklearn's bootstrap<->splitter
    seed coupling costs it ~1.5-2% CV accuracy at mini
    (reports/FAMILY128_BIAS.md).  The parity gate therefore asserts the
    DECOUPLED delta at the same 0.01/0.01 form as bias_bound, and bounds
    the stock delta by the measured coupling artifact."""
    seeds = seeds or FAMILY128_SEEDS
    cells = {}
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint) as f:
            cells = json.load(f)
        if cells.pop("__plan__", None) != plan:
            print(f"# discarding stale checkpoint {checkpoint}", flush=True)
            cells = {}
    for area in areas:
        if all(f"{area}/{size}" in cells for size in SIZES):
            continue
        X, y = make_area_features(area, hw=128)
        for size, (n_per, n_est) in SIZES.items():
            key = f"{area}/{size}"
            if key in cells:
                continue
            r = run_family(X, y, n_per, n_est,
                           seeds=_seeds_for(seeds, size),
                           decoupled_oracle=True)
            cells[key] = r
            if verbose:
                print(f"family_128 {key}: sk {r['sk_test_acc_mean']:.3f}"
                      f" ovl {r['selection_overlap']}/10 "
                      f"dcv {r['d_cv_mean']:+.4f} "
                      f"dcv_dec {r['d_cv_dec_mean']:+.4f} "
                      f"dtest {r['d_test_mean']:+.4f}", flush=True)
            if checkpoint:
                with open(checkpoint, "w") as f:
                    json.dump({"__plan__": plan, **cells}, f)
    return cells


FACTORIAL_REPL_CELLS = (("wst", 20), ("advanced_stats", 2), ("wst", 2),
                        ("hybrid", 2))
FACTORIAL_REPL_SEEDS = range(1000, 1400)


def run_factorial_replication(seeds=FACTORIAL_REPL_SEEDS,
                              cells_spec=FACTORIAL_REPL_CELLS,
                              verbose=True, checkpoint=None, plan=None):
    """Disjoint-seed replication of the factorial's edge cells (round-4
    VERDICT directive #5): wst/k20 (the only cell whose 96-seed delta sat
    ~2 SE above zero) and the three tie-heaviest k=2 cells, at >= 400
    disjoint seeds so each replicated (method, k) group is asserted at
    the 0.005 budget with its CI under it."""
    cells = {}
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint) as f:
            cells = json.load(f)
        if cells.pop("__plan__", None) != plan:
            print(f"# discarding stale checkpoint {checkpoint}", flush=True)
            cells = {}
    n_per, n_est = SIZES["small"]
    for area in AREAS:
        todo = [(m, k) for m, k in cells_spec
                if f"{area}/{m}/k{k}" not in cells]
        if not todo:
            continue
        u8, y = _blended_images(area, HW, 40, alpha=0.4, seed=7)
        X = condition_features(u8, None, 0.0)
        for method, k in todo:
            key = f"{area}/{method}/k{k}"
            r = run_family(X[:, METHOD_SLICES[method]], y, n_per, n_est,
                           k=k, seeds=seeds)
            cells[key] = r
            if verbose:
                print(f"factorial_repl {key}: ovl {r['selection_overlap']}"
                      f"/{k} dcv {r['d_cv_mean']:+.4f} "
                      f"dtest {r['d_test_mean']:+.4f}", flush=True)
            if checkpoint:
                with open(checkpoint, "w") as f:
                    json.dump({"__plan__": plan, **cells}, f)
    by_mk = {}
    for method, k in cells_spec:
        sub = [cells[f"{area}/{method}/k{k}"] for area in AREAS]
        n_tot = sum(r["n_seeds"] for r in sub)
        # CI of the pooled (mean-of-areas) delta: areas are independent
        # cells, so var(mean) = sum(var_i/n_i)/A^2.
        var = sum(r["d_cv_std"] ** 2 / r["n_seeds"] for r in sub) \
            / len(sub) ** 2
        by_mk[f"{method}/k{k}"] = {
            "n_cells": len(sub),
            "n_seeds_total": int(n_tot),
            "d_cv_pooled": float(np.mean([r["d_cv_mean"] for r in sub])),
            "d_cv_ci95": float(1.96 * np.sqrt(var)),
            "d_test_pooled": float(np.mean([r["d_test_mean"]
                                            for r in sub])),
            "min_selection_overlap": int(min(r["selection_overlap"]
                                             for r in sub)),
            "k": k,
        }
    return {"cells": cells, "by_method_k": by_mk,
            "seeds": f"{min(seeds)}-{max(seeds)}"}


def combine_campaigns(suites: dict, replication: dict) -> dict:
    """Per-suite pooled estimate over BOTH measurement campaigns (the
    shared-seed main grid and the disjoint-seed replication): the union of
    cell measurements is the best available estimate of each suite's
    parity, and is what the tightened 0.015 per-class floor is asserted
    on (tests/test_e2e_parity.py).

    Independence caveat: the campaigns draw disjoint split/bootstrap
    seeds but share the per-area image pools (blend seed 7), so the
    combined estimate is independent in the seed dimension only — the
    imagery-draw component of the variance is common to both campaigns."""
    out = {}
    for name, s in suites.items():
        merged = {f"grid:{k}": v for k, v in s["cells"].items()}
        rep = replication.get(name)
        if rep:
            merged.update({f"repl:{k}": v for k, v in rep["cells"].items()})
        agg = aggregate_suite(merged)
        agg.pop("cells")        # summaries only; cells live in their phases
        agg["campaigns"] = 1 + bool(rep)
        out[name] = agg
    return out


PARTS_DIR = "reports/parity_parts"

# Seed plans of the checked-in round-2/3 phase files, which predate plan
# fingerprinting: a part WITHOUT an embedded plan is accepted only while
# the current plan still equals the legacy one (so changing any plan
# invalidates the stale file instead of silently reusing it).
def _phase_plans():
    return {
        "families": _plan_fingerprint(seeds=FAMILY_SEEDS, hw=HW,
                                      kernel=FOREST_VER),
        "bias_bound": _plan_fingerprint(seeds=BIAS_SEEDS,
                                        kernel=FOREST_VER),
        "suites": _plan_fingerprint(seeds=SUITE_SEEDS, hw=HW,
                                    kernel=FOREST_VER),
        "replication": _plan_fingerprint(
            seeds=REPL_SEEDS, clean_seeds=REPL_SEEDS_CLEAN, hw=HW,
            kernel=FOREST_VER),
        "factorial": _plan_fingerprint(seeds=FACTORIAL_SEEDS,
                                       ks=FACTORIAL_KS, hw=HW,
                                       kernel=FOREST_VER),
        "factorial_replication": _plan_fingerprint(
            seeds=FACTORIAL_REPL_SEEDS,
            cells=[f"{m}/k{k}" for m, k in FACTORIAL_REPL_CELLS], hw=HW,
            kernel=FOREST_VER),
        "family_128": _plan_fingerprint(seeds=FAMILY128_SEEDS, hw=128,
                                        areas=list(AREAS),
                                        oracle="stock+decoupled",
                                        kernel=FOREST_VER),
    }


# Frozen literals of the round-2/3 plans (NOT recomputed from the live
# constants — that would make the "legacy file accepted only while the
# current plan equals the legacy one" check vacuous: a plan change could
# never invalidate a no-plan legacy file).
LEGACY_PLANS = {
    "families": '{"hw": 64, "seeds": '
                '{"mini": 400, "original": 20, "small": 160}}',
    "suites": '{"hw": 64, "seeds": '
              '{"mini": 100, "original": 10, "small": 40}}',
}


def _phase(name, fn, plan):
    path = f"{PARTS_DIR}/{name}.json"
    if os.path.exists(path):
        with open(path) as f:
            obj = json.load(f)
        ck_plan = obj.pop("__plan__", LEGACY_PLANS.get(name))
        if ck_plan == plan:
            return obj["data"] if "data" in obj else obj
        print(f"# discarding stale phase file {path} (plan changed)",
              flush=True)
    r = fn()
    with open(path, "w") as f:
        json.dump({"__plan__": plan, "data": r}, f)
    return r


def assemble(phases):
    """reports/PARITY.json from the phase results."""
    res = phases["families"]
    out = {"families": res,
           "max_abs_d_test": max(abs(r["d_test_mean"])
                                 for r in res.values()),
           "max_abs_d_cv": max(abs(r["d_cv_mean"]) for r in res.values()),
           "bias_bound": phases["bias_bound"],
           "suites": phases["suites"],
           "replication": phases["replication"],
           "factorial": phases["factorial"],
           "factorial_replication": phases["factorial_replication"],
           "family_128": phases["family_128"],
           "seed_plans": _phase_plans()}
    out["suites_combined"] = combine_campaigns(phases["suites"],
                                               phases["replication"])
    out["suite_summary"] = {
        s: {"d_cv_pooled": v["d_cv_pooled"],
            "d_test_pooled": v["d_test_pooled"],
            "per_class_d_test_pooled": v["per_class_d_test_pooled"]}
        for s, v in phases["suites"].items()}
    return out


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--device", choices=("cpu", "tpu"), default="cpu",
                    help="tpu: run wst_tpu fits/extraction on the chip "
                         "(sklearn oracle stays on host CPU)")
    ap.add_argument("--phases", default="families,bias_bound,suites,"
                    "replication,factorial,factorial_replication,"
                    "family_128",
                    help="comma-separated subset to (re)compute; PARITY."
                         "json is only written when every phase is ready")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Each phase checkpoints under reports/parity_parts/ so a mid-run crash
    # (or restart) resumes instead of losing hours of CPU work.
    os.makedirs(PARTS_DIR, exist_ok=True)
    plans = _phase_plans()

    runners = {
        "families": run_all,
        "bias_bound": run_bias_bound,
        "suites": lambda: run_suites(
            checkpoint=f"{PARTS_DIR}/suite_cells.json",
            plan=plans["suites"]),
        "replication": run_replication,
        "factorial": lambda: run_factorial(
            checkpoint=f"{PARTS_DIR}/factorial_cells.json",
            plan=plans["factorial"]),
        "factorial_replication": lambda: run_factorial_replication(
            checkpoint=f"{PARTS_DIR}/factorial_repl_cells.json",
            plan=plans["factorial_replication"]),
        "family_128": lambda: run_family_128(
            checkpoint=f"{PARTS_DIR}/family_128_cells.json",
            plan=plans["family_128"]),
    }
    want = [p.strip() for p in args.phases.split(",") if p.strip()]
    phases = {}
    for name in want:
        phases[name] = _phase(name, runners[name], plans[name])

    missing = [n for n in runners if n not in phases]
    for name in missing:    # pick up previously-computed phases from disk
        path = f"{PARTS_DIR}/{name}.json"
        if os.path.exists(path):
            with open(path) as f:
                obj = json.load(f)
            if obj.pop("__plan__", LEGACY_PLANS.get(name)) == plans[name]:
                phases[name] = obj["data"] if "data" in obj else obj

    if all(n in phases for n in runners):
        out = assemble(phases)
        os.makedirs("reports", exist_ok=True)
        with open("reports/PARITY.json", "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps({"max_abs_d_test": out["max_abs_d_test"],
                          "max_abs_d_cv": out["max_abs_d_cv"],
                          "suite_summary": out["suite_summary"]}))
    else:
        print(f"# phases still missing: "
              f"{[n for n in runners if n not in phases]} — "
              f"PARITY.json not rewritten", flush=True)
