"""Visualization layer: patterns, dashboards, comparison, verify_output."""

import numpy as np

from wst_tpu.viz.visualize import (compare_wst_coefficients,
                                   create_comparison_dashboard,
                                   create_overall_comparison,
                                   generate_test_patterns, verify_output,
                                   visualize_advanced_stats, visualize_wst)


def test_patterns():
    pats = generate_test_patterns(32)
    assert len(pats) == 7
    for name, p in pats.items():
        assert p.shape == (32, 32) and p.dtype == np.float32
        assert 0.0 <= p.min() and p.max() <= 1.0
    # deterministic
    pats2 = generate_test_patterns(32)
    np.testing.assert_array_equal(pats["random_texture"],
                                  pats2["random_texture"])


def test_full_visualization_flow(tmp_path):
    """main() emits the COMPLETE expected set: 4 figures x 7 patterns +
    overall + the clean-vs-noisy comparison pair = 31 files — a superset
    of the reference verifier's 4/pattern + 1 = 29-file contract
    (reference: src/visualization/verify_output.py:23-27)."""
    from wst_tpu.viz.visualize import main
    rc = main(["-o", str(tmp_path), "--size", "32"])
    assert rc == 0
    present, missing = verify_output(tmp_path)
    assert missing == []
    assert len(present) == 4 * 7 + 3 == 31
    assert (tmp_path / "original_checkerboard.png").exists()
    assert (tmp_path / "wst_disks_checkerboard_g50.png").exists()


def test_verify_reports_missing(tmp_path):
    present, missing = verify_output(tmp_path, ["checkerboard"])
    assert present == [] and len(missing) == 4 + 3


def test_compare_wst_coefficients(tmp_path, rng):
    clean = rng.random((32, 32)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.3, clean.shape), 0, 1
                    ).astype(np.float32)
    res = compare_wst_coefficients(clean, noisy, tmp_path, J=3, L=4)
    assert set(res) == {"order0", "order1", "order2", "figure"}
    # additive noise raises order-1 energy of a random texture
    assert res["order1"]["noisy_mean"] != res["order1"]["clean_mean"]
    import os
    assert os.path.getsize(res["figure"]) > 1000


def test_scattering_disk_figure(tmp_path):
    """C20 polar scattering-disk rendering (reference:
    src/visualization/compare_wst_coefficients.py:41-77)."""
    from wst_tpu.viz.visualize import compare_wst_disks
    rng = np.random.default_rng(0)
    clean = rng.random((32, 32)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.2, (32, 32)), 0, 1).astype(np.float32)
    path = compare_wst_disks(clean, noisy, tmp_path, J=3, L=6, name="t")
    import os
    assert os.path.exists(path)
    assert os.path.getsize(path) > 50_000  # a real multi-panel figure
