"""End-to-end accuracy-parity harness: composed wst_tpu stack vs composed
sklearn stack on identical feature matrices (BASELINE.json 0.5% target).

For each of 3 synthetic areas x 3 dataset sizes, extracts hybrid WST
features once (blended-class + gaussian-noise imagery tuned to the
reference's accuracy regime ~0.85-0.95), then runs over >=20 seeds:

  (a) sklearn: StandardScaler -> SelectKBest(mutual_info_classif, k=10)
      -> RandomForestClassifier(n_estimators per the reference's size
      heuristic, max_features='sqrt', min_samples_split=5,
      min_samples_leaf=2) with stratified 80/20 split + 5-fold stratified
      CV (reference: src/training/train_and_save_model.py:147-198);
  (b) wst_tpu: fit_select_kbest -> TreeEnsembleClassifier with this
      framework's splits (bit-identical to sklearn's) — CV fits batched
      through fit_tree_ensembles.

Prints one JSON dict per family and a summary; usable as a script
(writes reports/PARITY.json) or imported by tests/test_e2e_parity.py.
"""

import json
import os
import sys

import numpy as np


def make_area_features(area: str, hw: int = 64, n_per: int = 40,
                       alpha: float = 0.4, sigma: float = 50.0,
                       seed: int = 7):
    """Blended-class noisy synthetic imagery -> (hybrid features, labels).

    Blending class textures (alpha) + additive gaussian noise (sigma, in
    uint8 units) de-saturates the task so parity is measured at the
    reference's accuracy regime instead of at a vacuous 1.0.
    """
    import zlib

    from wst_tpu.data.dataset import CLASSES, synthesize_patch
    from wst_tpu.features.extractor import FeatureExtractor

    # zlib.crc32, not hash(): str hash is salted per process
    rng = np.random.default_rng(seed + zlib.crc32(area.encode()) % 1000)
    per = {c: [synthesize_patch(rng, c, area, hw=(hw, hw))
               for _ in range(n_per)] for c in CLASSES}
    imgs = []
    for c in CLASSES:
        for i in range(n_per):
            other = per[CLASSES[rng.integers(0, len(CLASSES))]][
                rng.integers(0, n_per)]
            imgs.append(alpha * per[c][i].astype(np.float32)
                        + (1 - alpha) * other.astype(np.float32))
    x = np.stack(imgs).astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    x = np.clip(x + rng.normal(0, sigma / 255, x.shape).astype(np.float32),
                0, 1)
    fx = FeatureExtractor("hybrid", hw, hw, 2, 8)
    return fx.extract_numpy(x), np.repeat(CLASSES, n_per)


def run_family(X, y, n_per: int, n_est: int, k: int = 10,
               seeds=range(20)):
    """-> dict with per-seed paired test/cv accuracy diffs for one family."""
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.feature_selection import mutual_info_classif as sk_mi
    from sklearn.model_selection import (StratifiedKFold, cross_val_score,
                                         train_test_split)
    from sklearn.preprocessing import StandardScaler

    from wst_tpu.features.selection import fit_select_kbest, top_k_indices
    from wst_tpu.models.forest import (fit_tree_ensembles,
                                       predict_tree_ensembles)
    from wst_tpu.train.splits import (stratified_kfold_indices,
                                      stratified_train_test_split)

    idx = np.concatenate([np.where(y == c)[0][:n_per] for c in np.unique(y)])
    Xf, yf = X[idx], y[idx]

    # selection happens once per family in both stacks (it has no seed in
    # the reference; we fix the MI tie-noise stream to random_state=0)
    Xs_sk = StandardScaler().fit_transform(Xf)
    mi = sk_mi(Xs_sk, yf, n_neighbors=3, random_state=0)
    sel = np.sort(np.argsort(mi, kind="mergesort")[-k:])
    Xsel_sk = Xs_sk[:, sel]
    Xsel_us, model = fit_select_kbest(Xf, yf,
                                      [f"f{i}" for i in range(X.shape[1])],
                                      k)
    overlap = len(set(sel) & set(model.selected_indices))

    d_test, d_cv, acc_sk_all = [], [], []
    for s in seeds:
        tr, te = train_test_split(np.arange(len(yf)), test_size=0.2,
                                  stratify=yf, random_state=s)
        rf = RandomForestClassifier(
            n_estimators=n_est, max_features="sqrt", min_samples_split=5,
            min_samples_leaf=2, random_state=s)
        rf.fit(Xsel_sk[tr], yf[tr])
        acc_sk = rf.score(Xsel_sk[te], yf[te])
        cv_sk = cross_val_score(
            RandomForestClassifier(
                n_estimators=n_est, max_features="sqrt",
                min_samples_split=5, min_samples_leaf=2, random_state=s),
            Xsel_sk, yf,
            cv=StratifiedKFold(5, shuffle=True, random_state=s)).mean()

        tr2, te2 = stratified_train_test_split(yf, 0.2, s)
        folds = list(stratified_kfold_indices(yf, 5, s))
        jobs = [(tr2, te2)] + folds
        models = fit_tree_ensembles([Xsel_us[a] for a, _ in jobs],
                                    [yf[a] for a, _ in jobs],
                                    n_estimators=n_est, random_state=s)
        preds = predict_tree_ensembles(models,
                                       [Xsel_us[b] for _, b in jobs])
        accs = [float((p == yf[b]).mean())
                for p, (_, b) in zip(preds, jobs)]
        d_test.append(accs[0] - acc_sk)
        d_cv.append(np.mean(accs[1:]) - cv_sk)
        acc_sk_all.append(acc_sk)

    return {
        "n_per_class": n_per, "n_estimators": n_est, "k": k,
        "selection_overlap": overlap,
        "sk_test_acc_mean": float(np.mean(acc_sk_all)),
        "d_test_mean": float(np.mean(d_test)),
        "d_test_std": float(np.std(d_test)),
        "d_cv_mean": float(np.mean(d_cv)),
        "d_cv_std": float(np.std(d_cv)),
        "n_seeds": len(list(seeds)),
    }


SIZES = {"mini": (5, 3), "small": (15, 10), "original": (40, 50)}
AREAS = ("assatigue", "popolar", "sunset")


def run_all(seeds=range(20), verbose=True):
    results = {}
    for area in AREAS:
        X, y = make_area_features(area)
        for size, (n_per, n_est) in SIZES.items():
            r = run_family(X, y, n_per, n_est, seeds=seeds)
            results[f"{area}/{size}"] = r
            if verbose:
                print(f"{area}/{size}: sk_acc {r['sk_test_acc_mean']:.3f} "
                      f"overlap {r['selection_overlap']}/10 "
                      f"dtest {r['d_test_mean']:+.4f}±{r['d_test_std']:.4f} "
                      f"dcv {r['d_cv_mean']:+.4f}±{r['d_cv_std']:.4f}",
                      flush=True)
    return results


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    res = run_all()
    out = {"families": res,
           "max_abs_d_test": max(abs(r["d_test_mean"]) for r in res.values()),
           "max_abs_d_cv": max(abs(r["d_cv_mean"]) for r in res.values())}
    os.makedirs("reports", exist_ok=True)
    with open("reports/PARITY.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in
                      ("max_abs_d_test", "max_abs_d_cv")}))
