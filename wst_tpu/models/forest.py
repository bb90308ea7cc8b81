"""On-device histogram-split tree ensemble (Random-Forest replacement).

TPU-native substitute for the reference's
``sklearn.ensemble.RandomForestClassifier`` (reference: src/training/
train_and_save_model.py:173-185): bootstrap + Gini trees with
``max_features='sqrt'``, ``min_samples_split=5``, ``min_samples_leaf=2``.

Design (component D5 of SURVEY.md §2.2):

* Features are quantile-binned ONCE per fit (host side, <= 255 candidate
  thresholds per feature).  When a feature has fewer distinct values than
  bins — always true for the reference's <=120-sample datasets — binning is
  exact: every boundary between adjacent sorted values is a candidate, so
  the split search equals sklearn's exact best-split search.
* Trees grow breadth-first over a compacted frontier of active nodes.  For
  every round, one fused segment-sum builds the (node, feature, bin, class)
  weighted histogram for ALL active nodes of ALL trees at once (vmapped over
  trees); cumulative sums over bins give every candidate split's child class
  counts, and the Gini proxy argmax picks the split.  No data-dependent
  Python control flow — the whole fit is one XLA computation.
* sklearn-faithful bootstrap semantics: each tree draws n samples with
  replacement, realised as integer sample weights.  sklearn's splitter
  DROPS zero-weight samples from its sample list at init, so
  ``min_samples_split``/``min_samples_leaf``, candidate thresholds, and
  constant-feature detection all see only the IN-BAG draw — reproduced
  here by counting presence as ``w > 0`` (out-of-bag rows still route
  through the finished tree at predict time, as in sklearn).
* Per-node feature subsampling: ``max_features`` features drawn per node
  (random top-k trick), with sklearn's exact semantics: node-constant
  features do not consume the max_features budget, and equal-proxy ties
  across features break by the random visit order (the subsample draw
  doubles as the priority) — matching the Cython splitter's
  first-strict-improvement scan in distribution.
* Thresholds reproduce sklearn's max-margin rule: the midpoint of the two
  values ADJACENT WITHIN THE NODE around the chosen boundary (computed
  from per-bin value extrema), identical to sklearn's
  (Xf[p_prev] + Xf[p]) / 2 whenever bins are exact (n <= max_bins).

Prediction is a vectorized pointer chase over (tree, sample), averaged into
sklearn-compatible ``predict_proba`` (ties -> lowest class index).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ForestArrays:
    """Flat fitted forest: (n_trees, max_nodes) node tables."""
    feature: np.ndarray      # int32, split feature (valid when not leaf)
    threshold: np.ndarray    # float32, go left when x <= threshold
    left: np.ndarray         # int32 child ids (0 when leaf)
    right: np.ndarray
    is_leaf: np.ndarray      # bool
    probs: np.ndarray        # float32 (n_trees, max_nodes, n_classes)

    def to_dict(self):
        return {k: getattr(self, k).tolist()
                for k in ("feature", "threshold", "left", "right",
                          "is_leaf", "probs")}

    @classmethod
    def from_dict(cls, d):
        return cls(feature=np.asarray(d["feature"], np.int32),
                   threshold=np.asarray(d["threshold"], np.float32),
                   left=np.asarray(d["left"], np.int32),
                   right=np.asarray(d["right"], np.int32),
                   is_leaf=np.asarray(d["is_leaf"], bool),
                   probs=np.asarray(d["probs"], np.float32))


def _max_cells_per_dispatch() -> int:
    """Hard cap on vmapped cells per device dispatch (fit and predict).

    Purely a dispatch-shape knob — results are identical at any value (the
    chunks concatenate).  The remote axon TPU worker reproducibly crashes
    ("kernel fault") on very large vmapped forest fits (a 188-cell fit of
    (36, 20) inputs with 10 trees dies; 72 cells run fine, measured
    2026-08-20), so the default stays comfortably under that.  Override
    with WST_MAX_CELLS_PER_DISPATCH.
    """
    import os
    try:
        return max(1, int(os.environ.get("WST_MAX_CELLS_PER_DISPATCH",
                                         "64")))
    except ValueError:
        return 64


def _active_cap(max_active: int, n: int, min_samples_leaf: int) -> int:
    """Tight frontier bound: every active (splittable) node holds at least
    ``min_samples_leaf`` distinct samples and nodes partition the samples,
    so the frontier can never exceed n // min_samples_leaf.  Shrinking the
    static ``max_active`` to that bound changes no result — it only shrinks
    the (node, feature, bin, class) histogram workspace, which is what
    limits how many cells a vmapped multi-fit can hold in HBM."""
    return min(max_active, max(2, n // max(1, min_samples_leaf)))


def _bin_features(X: np.ndarray, max_bins: int
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                             np.ndarray, np.ndarray]:
    """Quantile binning. Returns (binned (n,F) int32, thresholds
    (F, max_bins-1) float32 padded with +inf, n_thresholds (F,) int32,
    vmin (F, max_bins) float32, vmax (F, max_bins) float32).

    bin b collects values in (thr[b-1], thr[b]]-style intervals:
    binned = searchsorted(thr, x, side='left') so x <= thr[b] -> bin <= b.
    vmin/vmax give each bin's smallest/largest data value so the kernel can
    place the chosen split at the midpoint of the two values ADJACENT
    WITHIN THE NODE (sklearn's max-margin threshold) rather than at a
    global bin boundary; when n <= max_bins every bin is a single unique
    value and the reproduction is exact.
    """
    n, F = X.shape
    thr = np.full((F, max_bins - 1), np.inf, np.float32)
    nthr = np.zeros(F, np.int32)
    binned = np.zeros((n, F), np.int32)
    vmin = np.full((F, max_bins), np.float32(np.inf), np.float32)
    vmax = np.full((F, max_bins), np.float32(-np.inf), np.float32)
    for f in range(F):
        u = np.unique(X[:, f])
        if len(u) > max_bins:
            qs = np.linspace(0, 1, max_bins + 1)[1:-1]
            u = np.unique(np.quantile(X[:, f], qs, method="nearest"))
        mids = (u[:-1] + u[1:]) / 2.0
        k = len(mids)
        thr[f, :k] = mids
        nthr[f] = k
        b = np.searchsorted(mids, X[:, f], side="left")
        binned[:, f] = b
        xf = X[:, f].astype(np.float32)
        np.minimum.at(vmin[f], b, xf)
        np.maximum.at(vmax[f], b, xf)
    return binned, thr, nthr, vmin, vmax


class TreeEnsembleClassifier:
    """sklearn-RF-compatible API over the JAX histogram-split ensemble."""

    def __init__(self, n_estimators: int = 50, max_features: str = "sqrt",
                 min_samples_split: int = 5, min_samples_leaf: int = 2,
                 max_depth: int = 24, max_bins: int = 256,
                 max_active: int = 128, bootstrap: bool = True,
                 random_state: int = 42):
        self.n_estimators = n_estimators
        self.max_features = max_features
        self.min_samples_split = min_samples_split
        self.min_samples_leaf = min_samples_leaf
        self.max_depth = max_depth
        self.max_bins = max_bins
        self.max_active = max_active
        self.bootstrap = bootstrap
        self.random_state = random_state
        self.classes_: Optional[np.ndarray] = None
        self.forest_: Optional[ForestArrays] = None
        self.max_depth_used_: Optional[int] = None

    # ------------------------------------------------------------------ fit

    def fit(self, X, y):
        X = np.asarray(X, np.float32)
        y = np.asarray(y)
        self.classes_, y_enc = np.unique(y, return_inverse=True)
        n, F = X.shape
        C = len(self.classes_)
        if self.max_features == "sqrt":
            mf = max(1, int(math.sqrt(F)))
        elif self.max_features in (None, "all"):
            mf = F
        else:
            mf = max(1, int(self.max_features))
        max_bins = min(self.max_bins, max(2, n + 1))
        binned, thr, nthr, vmin, vmax = _bin_features(X, max_bins)

        depth = min(self.max_depth, max(1, n // self.min_samples_leaf))
        max_nodes = 2 * min(2 ** depth, max(n, 2)) + 1
        max_active = _active_cap(self.max_active, n, self.min_samples_leaf)

        fitted = _fit_forest(
            jnp.asarray(binned), jnp.asarray(thr), jnp.asarray(nthr),
            jnp.asarray(vmin), jnp.asarray(vmax),
            jnp.asarray(y_enc, jnp.int32),
            n_trees=self.n_estimators, n_classes=C, max_features=mf,
            min_samples_split=self.min_samples_split,
            min_samples_leaf=self.min_samples_leaf,
            max_depth=depth, max_active=max_active,
            max_nodes=max_nodes, bootstrap=self.bootstrap,
            seed=self.random_state)
        self.forest_ = ForestArrays(*[np.asarray(a) for a in fitted])
        self.max_depth_used_ = depth
        return self

    # -------------------------------------------------------------- predict

    def predict_proba(self, X) -> np.ndarray:
        f = self.forest_
        # The pointer chase needs exactly tree-depth steps; fall back to
        # the (loose) node-count bound for forests loaded without depth.
        depth = (self.max_depth_used_ if self.max_depth_used_ is not None
                 else f.feature.shape[1])
        out = _predict_forest(
            jnp.asarray(np.asarray(X, np.float32)),
            jnp.asarray(f.feature), jnp.asarray(f.threshold),
            jnp.asarray(f.left), jnp.asarray(f.right),
            jnp.asarray(f.is_leaf), jnp.asarray(f.probs),
            max_depth=depth)
        return np.asarray(out)

    def predict(self, X) -> np.ndarray:
        proba = self.predict_proba(X)
        return self.classes_[np.argmax(proba, axis=1)]

    def score(self, X, y) -> float:
        return float(np.mean(self.predict(X) == np.asarray(y)))


# ---------------------------------------------------------------------------
# Jitted fit / predict kernels.
# ---------------------------------------------------------------------------

_FIT_STATICS = ("n_trees", "n_classes", "max_features",
                "min_samples_split", "min_samples_leaf", "max_depth",
                "max_active", "max_nodes", "bootstrap")


@functools.partial(jax.jit, static_argnames=_FIT_STATICS)
def _fit_forest_cells(binned, thr, nthr, vmin, vmax, y, *, n_trees,
                      n_classes, max_features, min_samples_split,
                      min_samples_leaf, max_depth, max_active, max_nodes,
                      bootstrap, seed):
    """Fit M independent same-shape forests in ONE device dispatch.

    binned: (M, n, F) int32; thr: (M, F, B-1); nthr: (M, F);
    vmin/vmax: (M, F, B) per-bin value extrema; y: (M, n);
    seed: (M,) int32 per-cell random states (traced, so cells with
    different seeds — e.g. one CV sweep per seed — share one dispatch).
    Returns per-cell node tables with a leading M axis — each cell's fit is
    numerically identical to a solo ``_fit_forest`` call with that cell's
    seed (vmap of the same deterministic program with the same per-tree
    keys).  This is what makes the 1,512-cell factorial grid
    dispatch-count-bound rather than tunnel-latency-bound.
    """
    def one(b, t, nt, vmn, vmx, yy, s):
        return _fit_forest_impl(
            b, t, nt, vmn, vmx, yy, s, n_trees=n_trees, n_classes=n_classes,
            max_features=max_features, min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, max_depth=max_depth,
            max_active=max_active, max_nodes=max_nodes, bootstrap=bootstrap)
    return jax.vmap(one)(binned, thr, nthr, vmin, vmax, y, seed)


@functools.partial(jax.jit, static_argnames=_FIT_STATICS)
def _fit_forest(binned, thr, nthr, vmin, vmax, y, *, n_trees, n_classes,
                max_features, min_samples_split, min_samples_leaf,
                max_depth, max_active, max_nodes, bootstrap, seed):
    return _fit_forest_impl(
        binned, thr, nthr, vmin, vmax, y, seed, n_trees=n_trees,
        n_classes=n_classes,
        max_features=max_features, min_samples_split=min_samples_split,
        min_samples_leaf=min_samples_leaf, max_depth=max_depth,
        max_active=max_active, max_nodes=max_nodes, bootstrap=bootstrap)


def _fit_forest_impl(binned, thr, nthr, vmin, vmax, y, seed, *, n_trees,
                     n_classes, max_features, min_samples_split,
                     min_samples_leaf, max_depth, max_active, max_nodes,
                     bootstrap):
    n, F = binned.shape
    B = thr.shape[1] + 1                       # bins per feature
    onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32)   # (n, C)
    valid_thr = (jax.lax.broadcasted_iota(jnp.int32, (F, B - 1), 1)
                 < nthr[:, None])              # (F, B-1) candidate mask

    def fit_one(key):
        # Split BEFORE the bootstrap draw: reusing one key for both
        # randint and the downstream split chain makes the round-0
        # feature-subsample key bit-identical to the threefry words that
        # produced bootstrap indices 2 and 3 (counter overlap), i.e. the
        # in-bag draw and the root feature subset become deterministically
        # coupled — a measured +0.02 ensemble-CV bias vs sklearn at the
        # n=12, 3-tree mini regime.
        kboot, key = jax.random.split(key)
        if bootstrap:
            idx = jax.random.randint(kboot, (n,), 0, n)
            w = jnp.zeros(n, jnp.float32).at[idx].add(1.0)
        else:
            w = jnp.ones(n, jnp.float32)

        feature = jnp.zeros(max_nodes, jnp.int32)
        threshold = jnp.zeros(max_nodes, jnp.float32)
        left = jnp.zeros(max_nodes, jnp.int32)
        right = jnp.zeros(max_nodes, jnp.int32)
        is_leaf = jnp.zeros(max_nodes, bool)
        probs = jnp.zeros((max_nodes, n_classes), jnp.float32)

        node_of = jnp.zeros(n, jnp.int32)       # global node id per sample
        frontier = jnp.full(max_active, -1, jnp.int32).at[0].set(0)
        n_frontier = jnp.int32(1)
        next_free = jnp.int32(1)

        state = (feature, threshold, left, right, is_leaf, probs,
                 node_of, frontier, n_frontier, next_free, key)

        def round_body(d, state):
            (feature, threshold, left, right, is_leaf, probs,
             node_of, frontier, n_frontier, next_free, key) = state
            key, ksub = jax.random.split(key)

            # Slot of each sample's node within the frontier (-1 if none).
            slot_of_node = jnp.full(max_nodes, -1, jnp.int32)
            fslots = jax.lax.broadcasted_iota(jnp.int32, (max_active, 1),
                                              0)[:, 0]
            slot_of_node = slot_of_node.at[
                jnp.where(frontier >= 0, frontier, max_nodes)].set(
                fslots, mode="drop")    # invalid slots -> OOB, dropped
            slot = slot_of_node[node_of]                     # (n,)
            active_sample = slot >= 0

            # Histograms over (slot, feature, bin): weighted class counts
            # and unweighted presence counts, in one segment-sum.
            seg = jnp.where(active_sample[:, None],
                            (slot[:, None] * F
                             + jax.lax.broadcasted_iota(jnp.int32, (n, F), 1))
                            * B + binned,
                            max_active * F * B)              # (n, F)
            # Presence column counts IN-BAG samples only: sklearn's
            # splitter drops zero-weight samples from its sample list at
            # init (verified: n_node_samples counts only w > 0 rows), so
            # min_samples_split/leaf, candidate thresholds, and
            # constant-feature detection all see just the bootstrap draw.
            data = jnp.concatenate(
                [onehot * w[:, None],
                 (w > 0.0).astype(jnp.float32)[:, None]], axis=1)
            data = jnp.broadcast_to(data[:, None, :], (n, F, n_classes + 1))
            hist = jax.ops.segment_sum(
                data.reshape(n * F, n_classes + 1), seg.reshape(n * F),
                num_segments=max_active * F * B + 1)[:-1]
            hist = hist.reshape(max_active, F, B, n_classes + 1)
            whist, phist = hist[..., :n_classes], hist[..., n_classes]

            # Candidate splits: left = bins <= b for b in 0..B-2.
            cw = jnp.cumsum(whist, axis=2)[:, :, :-1, :]     # (K,F,B-1,C)
            cp = jnp.cumsum(phist, axis=2)[:, :, :-1]        # (K,F,B-1)
            totw = jnp.sum(whist, axis=2)                    # (K,F,C)
            totp = jnp.sum(phist, axis=2)                    # (K,F)
            rw = totw[:, :, None, :] - cw
            rp = totp[:, :, None] - cp
            nl = jnp.sum(cw, axis=-1)
            nr = jnp.sum(rw, axis=-1)
            # Gini proxy to maximize: sum_c l_c^2/n_l + sum_c r_c^2/n_r.
            proxy = (jnp.sum(cw * cw, axis=-1) / jnp.maximum(nl, 1e-12)
                     + jnp.sum(rw * rw, axis=-1) / jnp.maximum(nr, 1e-12))
            # Both children must carry bootstrap WEIGHT: sklearn's proxy
            # for a zero-weight side is 0/0 = NaN in C, which never beats
            # the running best — i.e. such candidates are silently skipped.
            # Without this mask a degenerate split (all weight one side)
            # ties the parent's proxy, can win the tie-break, and creates a
            # zero-weight leaf whose all-zero probability vector poisons
            # test predictions (measured: -0.03 single-tree accuracy vs
            # sklearn under identical bootstrap weights).
            ok = ((cp >= min_samples_leaf) & (rp >= min_samples_leaf)
                  & (nl > 0.0) & (nr > 0.0)
                  & valid_thr[None])
            # Per-node random feature subset, reproducing sklearn's
            # Fisher-Yates budget semantics exactly (sklearn 1.7
            # _splitter.pyx node_split_best loop; the subsample draw u is
            # the visit order, ascending = drawn first):
            # 1. EVERY draw consumes one of the max_features budget slots —
            #    including features that turn out node-CONSTANT (sklearn
            #    increments n_visited_features before the constancy check).
            #    The only escape is the all-constants clause
            #    (n_visited <= n_found + n_drawn): the loop keeps drawing
            #    while every visit so far was constant, so at least one
            #    non-constant feature is always evaluated when one exists.
            #    Hence: visits m = max(max_features, rank of the first
            #    non-constant + 1); evaluated = non-constant features among
            #    the first m ranks.  When no drawn feature is node-constant
            #    this reduces BITWISE to "max_features smallest u among
            #    non-constants" (the round-3 rule, correct only in that
            #    regime — the round-5 family_128 bias, +0.026 CV at
            #    mini/128px where 59% of nodes hold a constant selected
            #    feature, came from never charging constants to the
            #    budget).
            # 2. Ties across features break by VISIT ORDER (first strictly
            #    better wins) — among equal-proxy features the smallest u
            #    wins, exactly sklearn's uniform-among-ties distribution,
            #    not a fixed lowest-index preference.  Within a feature
            #    sklearn keeps the LOWEST tied threshold (strict-
            #    improvement scan in increasing order), which argmax's
            #    first-max matches.
            # Constancy here is exact value equality (>= 2 occupied bins);
            # sklearn uses spread <= FEATURE_THRESHOLD (1e-7), which at
            # float32/standardized scale collapses to the same test (1 ulp
            # of 1.0 = 1.2e-7) — measured zero near-duplicate (<=1e-7,
            # nonzero) gaps on the science feature distributions.
            u = jax.random.uniform(ksub, (max_active, F))
            nonconst = jnp.sum((phist > 0).astype(jnp.int32), axis=2) >= 2
            rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)  # visit order
            first_nc_u = jnp.min(jnp.where(nonconst, u, jnp.inf), axis=1)
            first_nc_rank = jnp.sum((u < first_nc_u[:, None]).astype(
                jnp.int32), axis=1)                  # (K,)
            m = jnp.maximum(max_features, first_nc_rank + 1)
            fmask = (rank < m[:, None]) & nonconst   # (K, F)
            score = jnp.where(ok & fmask[:, :, None], proxy, -jnp.inf)
            feat_best = jnp.max(score, axis=2)               # (K, F)
            best_gain = jnp.max(feat_best, axis=1)           # (K,)
            tied = feat_best == best_gain[:, None]
            best_f = jnp.argmin(jnp.where(tied, u, jnp.inf), axis=1)
            best_b = jnp.argmax(
                jnp.take_along_axis(score, best_f[:, None, None],
                                    axis=1)[:, 0, :], axis=1)

            # Total class weights / presence of each node (feature 0's
            # histogram sums over bins to the node totals).
            node_w = totw[:, 0, :]
            node_p = totp[:, 0]
            wsum = jnp.sum(node_w, axis=1)
            pure = (jnp.max(node_w, axis=1) >= wsum - 1e-9)
            can_split = ((frontier >= 0)
                         & (node_p >= min_samples_split)
                         & ~pure
                         & jnp.isfinite(best_gain)
                         & (d < max_depth))

            # Children allocation via compaction.
            split_idx = jnp.cumsum(can_split.astype(jnp.int32)) - 1
            cap_ok = (next_free + 2 * (split_idx + 1) <= max_nodes) & \
                     (2 * (split_idx + 1) <= max_active)
            do_split = can_split & cap_ok
            split_idx = jnp.cumsum(do_split.astype(jnp.int32)) - 1
            lchild = next_free + 2 * split_idx
            rchild = lchild + 1

            # Write node table entries for the frontier.
            safe_nodes = jnp.where(frontier >= 0, frontier, max_nodes - 1)
            write = frontier >= 0
            # sklearn's max-margin threshold: midpoint of the two values
            # ADJACENT WITHIN THE NODE around the chosen boundary (its
            # splitter computes (Xf[p_prev] + Xf[p]) / 2 over node values,
            # falling back to the left value when the midpoint rounds up).
            # All bins in an equal-proxy run share one (occL, occR) pair,
            # so the reproduction is independent of which tied bin won.
            ph = jnp.take_along_axis(phist, best_f[:, None, None],
                                     axis=1)[:, 0, :]       # (K, B)
            occ = ph > 0
            bb2 = jax.lax.broadcasted_iota(jnp.int32, (max_active, B), 1)
            occL = jnp.max(jnp.where(occ & (bb2 <= best_b[:, None]),
                                     bb2, -1), axis=1)
            occR = jnp.min(jnp.where(occ & (bb2 > best_b[:, None]),
                                     bb2, B), axis=1)
            vl = vmax[best_f, jnp.clip(occL, 0, B - 1)]
            vr = vmin[best_f, jnp.clip(occR, 0, B - 1)]
            sel_thr = (vl + vr) * jnp.float32(0.5)
            sel_thr = jnp.where(jnp.isfinite(sel_thr) & (sel_thr != vr),
                                sel_thr, vl)
            feature = feature.at[safe_nodes].set(
                jnp.where(write, jnp.where(do_split, best_f, 0),
                          feature[safe_nodes]))
            threshold = threshold.at[safe_nodes].set(
                jnp.where(write, jnp.where(do_split, sel_thr, 0.0),
                          threshold[safe_nodes]))
            left = left.at[safe_nodes].set(
                jnp.where(write & do_split, lchild, left[safe_nodes]))
            right = right.at[safe_nodes].set(
                jnp.where(write & do_split, rchild, right[safe_nodes]))
            is_leaf = is_leaf.at[safe_nodes].set(
                jnp.where(write, ~do_split, is_leaf[safe_nodes]))
            leaf_probs = node_w / jnp.maximum(wsum, 1e-12)[:, None]
            probs = probs.at[safe_nodes].set(
                jnp.where(write[:, None], leaf_probs, probs[safe_nodes]))

            # Route samples of split nodes to children.
            sf = jnp.where(slot >= 0, best_f[jnp.maximum(slot, 0)], 0)
            sb = jnp.where(slot >= 0, best_b[jnp.maximum(slot, 0)], 0)
            s_split = (slot >= 0) & do_split[jnp.maximum(slot, 0)]
            go_left = jnp.take_along_axis(
                binned, sf[:, None], axis=1)[:, 0] <= sb
            child = jnp.where(go_left, lchild[jnp.maximum(slot, 0)],
                              rchild[jnp.maximum(slot, 0)])
            node_of = jnp.where(s_split, child, node_of)

            # New frontier = all children, compacted.
            n_split = jnp.sum(do_split.astype(jnp.int32))
            new_frontier = jnp.full(max_active, -1, jnp.int32)
            pos = 2 * split_idx
            new_frontier = new_frontier.at[
                jnp.where(do_split, pos, max_active)].set(
                lchild, mode="drop")
            new_frontier = new_frontier.at[
                jnp.where(do_split, pos + 1, max_active)].set(
                rchild, mode="drop")
            n_frontier = 2 * n_split
            next_free = next_free + 2 * n_split

            return (feature, threshold, left, right, is_leaf, probs,
                    node_of, new_frontier, n_frontier, next_free, key)

        # Early-exit frontier loop: once a tree's frontier empties, every
        # further round is a masked no-op (all writes gated on
        # frontier >= 0), so stopping early is bitwise-identical to the
        # fixed-trip loop — real trees finish at depth ~8-15 while the
        # static bound is up to 25 rounds, and under vmap the batch runs
        # only to the DEEPEST live tree instead of always to the bound
        # (measured ~1.5x on original-size CPU fits, same win on TPU
        # dispatch time).
        def cond(carry):
            d, st = carry
            return (d <= max_depth) & (st[8] > 0)      # st[8] = n_frontier

        def body(carry):
            d, st = carry
            return d + 1, round_body(d, st)

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        (feature, threshold, left, right, is_leaf, probs,
         *_rest) = state
        return feature, threshold, left, right, is_leaf, probs

    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i))(
        jnp.arange(n_trees))
    return jax.vmap(fit_one)(keys)


@functools.partial(jax.jit, static_argnames=("max_depth",))
def _predict_forest(X, feature, threshold, left, right, is_leaf, probs,
                    max_depth):
    """X: (m, F) -> (m, C) averaged class probabilities."""
    def one_tree(feat, thr, lft, rgt, leaf, prb):
        def step(_, node):
            f = feat[node]
            t = thr[node]
            x = jnp.take_along_axis(X, f[:, None], axis=1)[:, 0]
            nxt = jnp.where(x <= t, lft[node], rgt[node])
            return jnp.where(leaf[node], node, nxt)

        node = jnp.zeros(X.shape[0], jnp.int32)
        node = jax.lax.fori_loop(0, max_depth + 1, step, node)
        return prb[node]                        # (m, C)

    all_probs = jax.vmap(one_tree)(feature, threshold, left, right,
                                   is_leaf, probs)  # (T, m, C)
    return jnp.mean(all_probs, axis=0)


# ---------------------------------------------------------------------------
# Multi-cell batched fit/predict: the factorial grid runs hundreds of tiny
# same-shape fits (conditions x methods x CV folds); fitting them in one
# vmapped dispatch removes the per-call host->device latency that dominates
# the grid's wall time on remote-PJRT links.
# ---------------------------------------------------------------------------

def fit_tree_ensembles(Xs, ys, n_estimators: int = 50,
                       max_features: str = "sqrt",
                       min_samples_split: int = 5, min_samples_leaf: int = 2,
                       max_depth: int = 24, max_bins: int = 256,
                       max_active: int = 128, bootstrap: bool = True,
                       random_state: int = 42):
    """Fit M same-shape cells in one device call.

    Xs: sequence of (n, F) float matrices (equal shapes); ys: sequence of
    (n,) label arrays.  Returns a list of fitted ``TreeEnsembleClassifier``
    objects identical to fitting each (X, y) separately with the same
    hyperparameters.  Cells whose label sets differ in size fall back to
    per-cell fits (class-count is a static shape).

    ``random_state`` may be an int (shared by all cells, the grid runner's
    mode) or a length-M sequence of per-cell seeds — e.g. one
    (test-split + 5 CV folds) sweep per seed, all in one dispatch, which is
    what makes many-seed parity harnesses tractable.
    """
    M = len(Xs)
    assert M == len(ys) and M > 0
    if np.ndim(random_state) == 0:
        seeds = np.full(M, int(random_state), np.int32)
    else:
        seeds = np.asarray(random_state, np.int32)
        assert seeds.shape == (M,), seeds.shape
    shapes = {np.asarray(X).shape for X in Xs}
    classes = [np.unique(np.asarray(y)) for y in ys]
    same_c = len({len(c) for c in classes}) == 1

    def solo(i):
        m = TreeEnsembleClassifier(
            n_estimators=n_estimators, max_features=max_features,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, max_depth=max_depth,
            max_bins=max_bins, max_active=max_active, bootstrap=bootstrap,
            random_state=int(seeds[i]))
        return m.fit(Xs[i], ys[i])

    if len(shapes) != 1 or not same_c:
        return [solo(i) for i in range(M)]

    n, F = next(iter(shapes))
    C = len(classes[0])
    if max_features == "sqrt":
        mf = max(1, int(math.sqrt(F)))
    elif max_features in (None, "all"):
        mf = F
    else:
        mf = max(1, int(max_features))
    max_bins_eff = min(max_bins, max(2, n + 1))
    depth = min(max_depth, max(1, n // min_samples_leaf))
    max_nodes = 2 * min(2 ** depth, max(n, 2)) + 1
    active_cap = _active_cap(max_active, n, min_samples_leaf)

    binned = np.zeros((M, n, F), np.int32)
    thr = np.zeros((M, F, max_bins_eff - 1), np.float32)
    nthr = np.zeros((M, F), np.int32)
    vmin = np.zeros((M, F, max_bins_eff), np.float32)
    vmax = np.zeros((M, F, max_bins_eff), np.float32)
    y_enc = np.zeros((M, n), np.int32)
    for i in range(M):
        X = np.asarray(Xs[i], np.float32)
        _, y_enc[i] = np.unique(np.asarray(ys[i]), return_inverse=True)
        binned[i], thr[i], nthr[i], vmin[i], vmax[i] = _bin_features(
            X, max_bins_eff)

    # The split search materializes an (M, trees, active, F, bins, C+1)
    # histogram plus a few same-size cumsum pyramids; chunk M so the
    # workspace stays well inside HBM (one compile, several dispatches —
    # still orders of magnitude fewer than per-cell fitting).  The 1 GiB
    # default budget is deliberately conservative: the remote compile
    # helper dies (HTTP 500) on ~3 GiB original-block programs (n=96,
    # 50 trees, 64 cells — measured 2026-08-20), and XLA's padding
    # expansion inflates the estimate ~3x.
    import os
    try:
        budget = int(os.environ.get("WST_FOREST_DISPATCH_BYTES", 1 << 30))
    except ValueError:
        budget = 1 << 30
    bytes_per_cell = (n_estimators * active_cap * F * max_bins_eff
                      * (C + 1) * 4) * 6
    chunk = int(max(1, min(M, budget // max(1, bytes_per_cell),
                           _max_cells_per_dispatch())))

    parts = []
    for lo in range(0, M, chunk):
        hi = min(M, lo + chunk)
        pad = chunk - (hi - lo)
        sl = slice(lo, hi)

        def padded(a):
            return (a[sl] if pad == 0
                    else np.concatenate([a[sl], a[lo:lo + pad]], axis=0))

        fitted = _fit_forest_cells(
            jnp.asarray(padded(binned)), jnp.asarray(padded(thr)),
            jnp.asarray(padded(nthr)), jnp.asarray(padded(vmin)),
            jnp.asarray(padded(vmax)), jnp.asarray(padded(y_enc)),
            n_trees=n_estimators, n_classes=C, max_features=mf,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, max_depth=depth,
            max_active=active_cap, max_nodes=max_nodes,
            bootstrap=bootstrap, seed=jnp.asarray(padded(seeds)))
        parts.append([np.asarray(a)[:hi - lo] for a in fitted])
    fitted = [np.concatenate([p[j] for p in parts], axis=0)
              for j in range(len(parts[0]))]           # each (M, T, ...)

    models = []
    for i in range(M):
        m = TreeEnsembleClassifier(
            n_estimators=n_estimators, max_features=max_features,
            min_samples_split=min_samples_split,
            min_samples_leaf=min_samples_leaf, max_depth=max_depth,
            max_bins=max_bins, max_active=max_active, bootstrap=bootstrap,
            random_state=int(seeds[i]))
        m.classes_ = classes[i]
        m.forest_ = ForestArrays(*[a[i] for a in fitted])
        m.max_depth_used_ = depth
        models.append(m)
    return models


@functools.partial(jax.jit, static_argnames=("max_depth",))
def _predict_forest_cells(X, feature, threshold, left, right, is_leaf,
                          probs, max_depth):
    """X: (M, m, F) -> (M, m, C); node tables carry a leading M axis."""
    def one(x, fe, th, lf, rg, le, pr):
        return _predict_forest(x, fe, th, lf, rg, le, pr,
                               max_depth=max_depth)
    return jax.vmap(one)(X, feature, threshold, left, right, is_leaf, probs)


def predict_proba_tree_ensembles(models, Xs):
    """Batched ``predict_proba`` over M fitted same-shape cells.

    models: list of fitted TreeEnsembleClassifier (same node-table shapes
    and depth); Xs: sequence of (m, F) matrices (equal shapes).  Returns a
    list of (m, C) probability arrays, one dispatch for all cells; falls
    back to per-cell predicts when shapes differ.
    """
    M = len(models)
    shapes = {np.asarray(X).shape for X in Xs}
    tbl_shapes = {m.forest_.feature.shape for m in models}
    depths = {m.max_depth_used_ for m in models}
    ncls = {len(m.classes_) for m in models}
    if len(shapes) != 1 or len(tbl_shapes) != 1 or len(depths) != 1 \
            or len(ncls) != 1:
        return [m.predict_proba(X) for m, X in zip(models, Xs)]
    X = np.stack([np.asarray(x, np.float32) for x in Xs])
    f = [m.forest_ for m in models]
    tables = [np.stack([g.feature for g in f]),
              np.stack([g.threshold for g in f]),
              np.stack([g.left for g in f]),
              np.stack([g.right for g in f]),
              np.stack([g.is_leaf for g in f]),
              np.stack([g.probs for g in f])]
    depth = next(iter(depths))
    cap = _max_cells_per_dispatch()
    outs = []
    for lo in range(0, M, cap):
        sl = slice(lo, min(M, lo + cap))
        outs.append(np.asarray(_predict_forest_cells(
            jnp.asarray(X[sl]), *[jnp.asarray(t[sl]) for t in tables],
            max_depth=depth)))
    return list(np.concatenate(outs, axis=0))


def predict_tree_ensembles(models, Xs):
    """Batched ``predict``: list of (m,) label arrays (one dispatch)."""
    probas = predict_proba_tree_ensembles(models, Xs)
    return [m.classes_[np.argmax(p, axis=1)]
            for m, p in zip(models, probas)]
