"""Didactic feature visualizations (the reference's visualization layer).

Covers the roles of the reference's three visualization scripts:

* ``visualize_features.py`` (reference: src/visualization/visualize_features
  .py:50-804): seven synthetic test patterns, per-pattern advanced-stats and
  WST dashboards, side-by-side comparisons, and an overall comparison chart.
  Unlike the reference — which hardcodes per-method timings (:653) — the
  timing chart here MEASURES extraction time on the current backend.
* ``compare_wst_coefficients.py`` (reference: src/visualization/
  compare_wst_coefficients.py:79-165): clean-vs-noisy scattering coefficient
  comparison (J=3 transform, per-order coefficient maps and deltas).
* ``verify_output.py`` (reference: src/visualization/verify_output.py:11-89):
  existence/size check of the expected artifact set.

All figures render with the Agg backend (headless-safe).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from wst_tpu.ops.scattering import get_scattering
from wst_tpu.ops.stats import STAT_NAMES, advanced_stats


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


# ---------------------------------------------------------------------------
# Test patterns (grayscale, [0, 1]).
# ---------------------------------------------------------------------------

def generate_test_patterns(size: int = 128) -> Dict[str, np.ndarray]:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float64) / (size - 1)
    rng = np.random.default_rng(42)
    patterns = {
        "horizontal_gradient": xx,
        "vertical_gradient": yy,
        "checkerboard": (((xx * 8).astype(int) + (yy * 8).astype(int)) % 2
                         ).astype(np.float64),
        "circles": (np.sin(2 * np.pi * 4 * np.hypot(xx - 0.5, yy - 0.5))
                    * 0.5 + 0.5),
        "random_texture": rng.random((size, size)),
        "vertical_texture": (np.sin(2 * np.pi * 16 * xx) * 0.5 + 0.5),
        "edge": (xx > 0.5).astype(np.float64),
    }
    return {k: v.astype(np.float32) for k, v in patterns.items()}


# ---------------------------------------------------------------------------
# Dashboards.
# ---------------------------------------------------------------------------

def _gray_stats(pattern: np.ndarray) -> np.ndarray:
    """18 advanced stats of a grayscale pattern (single channel)."""
    x = pattern[None, None]                      # (1, 1, H, W)
    return np.asarray(advanced_stats(x))[0]


def visualize_original(pattern: np.ndarray, name: str, output_dir) -> str:
    """Plain rendering of the input pattern — the reference emits one
    ``{pattern}_original.png`` per pattern and its verifier requires it
    (reference: src/visualization/verify_output.py:23-25)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(pattern, cmap="gray")
    ax.set_title(name)
    ax.axis("off")
    fig.tight_layout()
    path = Path(output_dir) / f"original_{name}.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(path)


def visualize_advanced_stats(pattern: np.ndarray, name: str,
                             output_dir) -> str:
    plt = _plt()
    stats = _gray_stats(pattern)
    fig, axes = plt.subplots(1, 2, figsize=(12, 5),
                             gridspec_kw={"width_ratios": [1, 2]})
    axes[0].imshow(pattern, cmap="gray")
    axes[0].set_title(name)
    axes[0].axis("off")
    axes[1].bar(range(len(STAT_NAMES)), stats)
    axes[1].set_xticks(range(len(STAT_NAMES)))
    axes[1].set_xticklabels(STAT_NAMES, rotation=60, ha="right", fontsize=8)
    axes[1].set_title("Advanced statistics (18 features)")
    axes[1].grid(True, alpha=0.3)
    fig.tight_layout()
    path = Path(output_dir) / f"advanced_stats_{name}.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(path)


def visualize_wst(pattern: np.ndarray, name: str, output_dir,
                  J: int = 2, L: int = 8) -> str:
    plt = _plt()
    H, W = pattern.shape
    sc = get_scattering(J, L, H, W)
    S = np.asarray(sc(pattern[None]))[0]         # (K, h, w)
    meta = sc.bank.meta

    fig = plt.figure(figsize=(14, 9))
    gs = fig.add_gridspec(3, L + 1)
    ax = fig.add_subplot(gs[0, 0])
    ax.imshow(pattern, cmap="gray")
    ax.set_title(name, fontsize=9)
    ax.axis("off")
    ax = fig.add_subplot(gs[0, 1])
    ax.imshow(S[0], cmap="viridis")
    ax.set_title("S0 (low-pass)", fontsize=8)
    ax.axis("off")

    # Order-1 maps by (j, theta).
    for j in range(J):
        for t in range(L):
            ax = fig.add_subplot(gs[1, t] if j == 0 else gs[2, t])
            idx = 1 + j * L + t
            ax.imshow(S[idx], cmap="viridis")
            ax.set_title(f"j={j} θ={t}", fontsize=6)
            ax.axis("off")

    # Per-order energy bars.
    ax = fig.add_subplot(gs[1:, L])
    orders = np.array([p[0] for p in meta.paths])
    energies = [float(np.mean(S[orders == o] ** 2)) for o in range(3)]
    ax.bar(["S0", "order1", "order2"], energies)
    ax.set_title("Mean energy per order", fontsize=8)
    fig.suptitle(f"Wavelet scattering (J={J}, L={L}) — {name}")
    fig.tight_layout()
    path = Path(output_dir) / f"wst_{name}.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(path)


def create_comparison_dashboard(pattern: np.ndarray, name: str,
                                output_dir) -> str:
    plt = _plt()
    stats = _gray_stats(pattern)
    H, W = pattern.shape
    sc = get_scattering(2, 8, H, W)
    feats = np.asarray(sc.features(pattern[None]))[0]   # (162,)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.5))
    axes[0].imshow(pattern, cmap="gray")
    axes[0].set_title(name)
    axes[0].axis("off")
    axes[1].bar(range(len(stats)), stats, color="tab:blue")
    axes[1].set_title("Advanced stats (18)")
    axes[1].grid(True, alpha=0.3)
    axes[2].bar(range(len(feats)), feats, color="tab:orange", width=1.0)
    axes[2].set_title("WST mean/std features (162)")
    axes[2].grid(True, alpha=0.3)
    fig.tight_layout()
    path = Path(output_dir) / f"comparison_{name}.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(path)


def create_overall_comparison(patterns: Dict[str, np.ndarray],
                              output_dir) -> str:
    """Dimensionality + MEASURED per-method extraction latency."""
    plt = _plt()
    import jax
    stack = np.stack(list(patterns.values()))[:, None]   # (P, 1, H, W)
    rgb = np.repeat(stack, 3, axis=1).astype(np.float32)
    H, W = rgb.shape[-2:]
    sc = get_scattering(2, 8, H, W)

    def timed(fn):
        fn()                                             # warmup/compile
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        return (time.perf_counter() - t0) / len(rgb)

    t_stats = timed(lambda: advanced_stats(rgb))
    t_wst = timed(lambda: sc.features(rgb))

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    axes[0].bar(["advanced_stats", "wst", "hybrid"], [54, 486, 540])
    axes[0].set_title("Feature dimensionality (RGB)")
    axes[0].grid(True, alpha=0.3)
    axes[1].bar(["advanced_stats", "wst", "hybrid"],
                [t_stats * 1e3, t_wst * 1e3, (t_stats + t_wst) * 1e3])
    axes[1].set_title(f"Measured extraction latency per image (ms, "
                      f"batch={len(rgb)})")
    axes[1].grid(True, alpha=0.3)
    fig.tight_layout()
    path = Path(output_dir) / "overall_comparison.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return str(path)


# ---------------------------------------------------------------------------
# Clean-vs-noisy scattering comparison (C20).
# ---------------------------------------------------------------------------

def compare_wst_coefficients(clean: np.ndarray, noisy: np.ndarray,
                             output_dir, J: int = 3, L: int = 6,
                             name: str = "clean_vs_noisy") -> dict:
    """Per-order coefficient comparison of two grayscale images.

    Returns per-order mean/std deltas and writes a dashboard figure —
    the reference's scattering-disk comparison (reference: src/visualization/
    compare_wst_coefficients.py:79-165) re-expressed as per-order
    coefficient-energy panels.
    """
    plt = _plt()
    H, W = clean.shape
    sc = get_scattering(J, L, H, W)
    Sc = np.asarray(sc(clean[None].astype(np.float32)))[0]
    Sn = np.asarray(sc(noisy[None].astype(np.float32)))[0]
    orders = np.array([p[0] for p in sc.bank.meta.paths])

    deltas = {}
    for o in range(3):
        c, n = Sc[orders == o], Sn[orders == o]
        deltas[f"order{o}"] = {
            "clean_mean": float(c.mean()), "noisy_mean": float(n.mean()),
            "clean_std": float(c.std()), "noisy_std": float(n.std()),
            "mean_delta": float(n.mean() - c.mean()),
            "rel_energy_change": float(
                (np.mean(n ** 2) - np.mean(c ** 2))
                / max(np.mean(c ** 2), 1e-12)),
        }

    fig, axes = plt.subplots(2, 3, figsize=(13, 7))
    for col, (img, S, label) in enumerate(
            [(clean, Sc, "clean"), (noisy, Sn, "noisy")]):
        axes[col, 0].imshow(img, cmap="gray")
        axes[col, 0].set_title(f"{label} input")
        axes[col, 0].axis("off")
        axes[col, 1].imshow(S[0], cmap="viridis")
        axes[col, 1].set_title(f"{label} S0")
        axes[col, 1].axis("off")
        per_coeff = S.mean(axis=(-2, -1))
        axes[col, 2].bar(range(len(per_coeff)), per_coeff, width=1.0)
        axes[col, 2].set_title(f"{label} per-coefficient mean")
        axes[col, 2].grid(True, alpha=0.3)
    fig.tight_layout()
    path = Path(output_dir) / f"wst_compare_{name}.png"
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    deltas["figure"] = str(path)
    return deltas


# ---------------------------------------------------------------------------
# Scattering-disk polar rendering (the reference's signature C20 visual;
# reference: src/visualization/compare_wst_coefficients.py:41-77).
# ---------------------------------------------------------------------------

def plot_scattering_disks(S: np.ndarray, J: int, L: int, fig, subplot_spec,
                          order: int = 1) -> None:
    """Render one image's scattering output as polar disks, one disk per
    spatial window.

    ``order=1``: each disk shows the J*L first-order coefficients as
    grayscale wedges — orientation = the filter's angle
    ((L - L/2 - 1 - l) * pi / L, plus the antipodal wedge since the modulus
    is orientation-symmetric), radial band [2^(-j-1), 2^(-j)] for scale j.
    ``order=2``: each first-order sector is subdivided radially into the
    j2 > j1 scales and angularly into the theta2 orientations, showing all
    L^2 * J(J-1)/2 second-order paths in one disk (the reference normalizes
    a second-order mapper the same way; its plotting loop covers order 1 —
    this renders both, a superset).

    S: (n_coeffs, h, w) scattering maps in the canonical path order.
    """
    import matplotlib as mpl
    import matplotlib.cm as cm
    from matplotlib import gridspec

    plt = _plt()
    n1 = J * L
    rows, cols = S.shape[1:]
    grid = gridspec.GridSpecFromSubplotSpec(rows, cols,
                                            subplot_spec=subplot_spec)
    l_offset = int(L - L / 2 - 1)

    if order == 1:
        block = S[1:1 + n1]
        norm = mpl.colors.Normalize(block.min(), block.max(), clip=True)
        mapper = cm.ScalarMappable(norm=norm, cmap="gray")
        for r in range(rows):
            for c in range(cols):
                ax = fig.add_subplot(grid[r, c], projection="polar")
                ax.axis("off")
                for j in range(J):
                    for l in range(L):
                        color = mapper.to_rgba(block[l + j * L, r, c])
                        angle = (l_offset - l) * np.pi / L
                        radius = 2.0 ** (-j - 1)
                        for a in (angle, angle + np.pi):
                            ax.bar(x=a, height=radius, width=np.pi / L,
                                   bottom=radius, color=color)
        return

    block = S[1 + n1:]
    norm = mpl.colors.Normalize(block.min(), block.max(), clip=True)
    mapper = cm.ScalarMappable(norm=norm, cmap="gray")
    for r in range(rows):
        for c in range(cols):
            ax = fig.add_subplot(grid[r, c], projection="polar")
            ax.axis("off")
            i = 0
            for j1 in range(J):
                for l1 in range(L):
                    angle1 = (l_offset - l1) * np.pi / L
                    for j2 in range(j1 + 1, J):
                        for l2 in range(L):
                            color = mapper.to_rgba(block[i, r, c])
                            # subdivide the (j1, l1) sector: radial band by
                            # j2, angular sliver by l2
                            radius = 2.0 ** (-j1 - 1) * (
                                1.0 + (j2 - j1 - 1) / max(J - j1 - 1, 1))
                            width = np.pi / L / L
                            a0 = angle1 - np.pi / (2 * L) + (l2 + 0.5) * width
                            for a in (a0, a0 + np.pi):
                                ax.bar(x=a, height=radius / max(J - 1, 1),
                                       width=width, bottom=radius,
                                       color=color)
                            i += 1


def compare_wst_disks(clean: np.ndarray, noisy: np.ndarray, output_dir,
                      J: int = 3, L: int = 6,
                      name: str = "clean_vs_noisy") -> str:
    """Clean-vs-noisy polar scattering-disk figure, the reference's layout
    (reference: src/visualization/compare_wst_coefficients.py:120-146):
    row per image, [input | order-1 disk grid | order-2 disk grid].
    Coefficients are negated like the reference ("invert colors", :39).
    """
    from matplotlib import gridspec

    plt = _plt()
    H, W = clean.shape
    sc = get_scattering(J, L, H, W)
    Sc = -np.asarray(sc(clean[None].astype(np.float32)))[0]
    Sn = -np.asarray(sc(noisy[None].astype(np.float32)))[0]

    fig = plt.figure(figsize=(18, 10))
    gs = gridspec.GridSpec(2, 3, wspace=0.2, hspace=0.3)
    for row, (img, S, label) in enumerate([(clean, Sc, "Clean"),
                                           (noisy, Sn, "Noisy")]):
        ax = fig.add_subplot(gs[row, 0])
        ax.imshow(img, cmap="gray", interpolation="nearest", aspect="auto")
        ax.set_title(f"{label} image", fontsize=13)
        ax.axis("off")
        plot_scattering_disks(S, J, L, fig, gs[row, 1], order=1)
        plot_scattering_disks(S, J, L, fig, gs[row, 2], order=2)
    fig.suptitle(f"WST scattering disks: {name} "
                 f"(left: order 1, right: order 2)", fontsize=15)
    Path(output_dir).mkdir(parents=True, exist_ok=True)
    path = Path(output_dir) / f"wst_disks_{name}.png"
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return str(path)


# ---------------------------------------------------------------------------
# Output verification (C21).
# ---------------------------------------------------------------------------

def expected_outputs(pattern_names: List[str]) -> List[str]:
    """4 figures per pattern + overall + the clean-vs-noisy pair — a
    superset of the reference's 4/pattern + 1 = 29-file contract
    (reference: src/visualization/verify_output.py:23-27)."""
    out = ["overall_comparison.png",
           "wst_compare_checkerboard_g50.png",
           "wst_disks_checkerboard_g50.png"]
    for n in pattern_names:
        out += [f"original_{n}.png", f"advanced_stats_{n}.png",
                f"wst_{n}.png", f"comparison_{n}.png"]
    return out


def verify_output(output_dir, pattern_names: Optional[List[str]] = None
                  ) -> Tuple[List[str], List[str]]:
    """Check the expected figure set exists; returns (present, missing)."""
    names = pattern_names or sorted(generate_test_patterns(8).keys())
    present, missing = [], []
    for f in expected_outputs(names):
        p = Path(output_dir) / f
        if p.exists() and p.stat().st_size > 0:
            present.append(f)
            print(f"  OK {f} ({p.stat().st_size} bytes)")
        else:
            missing.append(f)
            print(f"  MISSING {f}")
    print(f"{len(present)} present, {len(missing)} missing")
    return present, missing


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description="Generate feature visualizations")
    p.add_argument("--output-dir", "-o", default="visualization_output")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--verify", action="store_true",
                   help="only verify an existing output directory")
    args = p.parse_args(argv)

    out = Path(args.output_dir)
    patterns = generate_test_patterns(args.size)
    if args.verify:
        _, missing = verify_output(out, sorted(patterns))
        return 1 if missing else 0

    out.mkdir(parents=True, exist_ok=True)
    for name, pat in patterns.items():
        visualize_original(pat, name, out)
        visualize_advanced_stats(pat, name, out)
        visualize_wst(pat, name, out)
        create_comparison_dashboard(pat, name, out)
    create_overall_comparison(patterns, out)
    # clean-vs-noisy comparison + polar scattering disks (C20) on the
    # checkerboard pattern
    rng = np.random.default_rng(0)
    noisy = np.clip(patterns["checkerboard"]
                    + rng.normal(0, 0.5 * 0.3, patterns["checkerboard"].shape),
                    0, 1).astype(np.float32)
    compare_wst_coefficients(patterns["checkerboard"][:32, :32],
                             noisy[:32, :32], out, name="checkerboard_g50")
    compare_wst_disks(patterns["checkerboard"][:32, :32],
                      noisy[:32, :32], out, name="checkerboard_g50")
    _, missing = verify_output(out, sorted(patterns))
    print(f"Visualizations written to {out}")
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
