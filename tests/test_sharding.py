"""Mesh/sharding layer: 8-device CPU mesh, shard-count invariance of the
distributed step, and agreement with the single-device pipeline."""

import jax
import numpy as np
import pytest

from wst_tpu.parallel.distributed import DistributedTrainer, _device_bin
from wst_tpu.parallel.mesh import (data_sharding, make_mesh,
                                   replicated_sharding, shard_batch)


def _data(rng, n, hw=16):
    imgs = rng.random((n, 3, hw, hw), dtype=np.float32)
    y = np.tile(np.arange(3), n // 3 + 1)[:n].astype(np.int32)
    # make classes learnable: shift brightness per class
    imgs += y[:, None, None, None] * 0.25
    return np.clip(imgs, 0, 1.5), y


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_devices=8, model_axis=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_devices=6, model_axis=4)


def test_shard_batch_pads():
    mesh = make_mesh(n_devices=8)
    x = np.arange(10, dtype=np.float32)[:, None]
    xs, n = shard_batch(x, mesh)
    assert n == 10 and xs.shape[0] == 16
    np.testing.assert_array_equal(np.asarray(xs)[:10], x)


def test_extract_sharded_matches_single(rng):
    imgs, _ = _data(rng, 16)
    t8 = DistributedTrainer(make_mesh(n_devices=8), "hybrid", 16, 16,
                            J=2, L=4, k_features=4, n_estimators=4)
    t1 = DistributedTrainer(make_mesh(n_devices=1), "hybrid", 16, 16,
                            J=2, L=4, k_features=4, n_estimators=4)
    f8 = np.asarray(t8.extract_features(imgs))
    f1 = np.asarray(t1.extract_features(imgs))
    assert f8.shape == (16, 54 + 2 * 25 * 3)  # J=2,L=4 -> 25 coeffs
    np.testing.assert_allclose(f8, f1, atol=1e-4)


def test_train_step_shard_invariance(rng):
    imgs, y = _data(rng, 24)
    timgs, ty = _data(rng, 8)
    outs = {}
    for nd, ma in [(1, 1), (8, 2)]:
        tr = DistributedTrainer(make_mesh(n_devices=nd, model_axis=ma),
                                "advanced_stats", 16, 16, k_features=4,
                                n_estimators=8)
        o = tr.train_step(imgs, y, timgs, ty, seed=0)
        outs[nd] = {k: np.asarray(v) for k, v in o.items()
                    if k in ("accuracy", "confusion_matrix", "selected",
                             "proba")}
    # Identical results regardless of device count (determinism across
    # shardings — the SPMD 'race detector' of SURVEY.md §5).
    np.testing.assert_array_equal(outs[1]["selected"], outs[8]["selected"])
    np.testing.assert_allclose(outs[1]["proba"], outs[8]["proba"],
                               atol=1e-5)
    np.testing.assert_allclose(outs[1]["confusion_matrix"],
                               outs[8]["confusion_matrix"], atol=1e-5)
    assert outs[8]["confusion_matrix"].sum() == 8
    # sanity: learnable classes give nontrivial accuracy
    assert outs[8]["accuracy"] >= 0.5


def test_device_bin_roundtrip(rng):
    X = rng.normal(size=(20, 3)).astype(np.float32)
    binned, thr, nthr, vmin, vmax = jax.jit(_device_bin)(X)
    binned = np.asarray(binned)
    # order-preserving: higher value -> higher-or-equal bin
    for f in range(3):
        order = np.argsort(X[:, f])
        assert (np.diff(binned[order, f]) >= 0).all()
    assert (np.asarray(nthr) == 19).all()
    # per-bin extrema bracket exactly the values that landed in each bin
    vmin, vmax = np.asarray(vmin), np.asarray(vmax)
    for f in range(3):
        for b in range(vmin.shape[1]):
            vals = X[binned[:, f] == b, f]
            if len(vals):
                assert vmin[f, b] == vals.min() and vmax[f, b] == vals.max()
            else:
                assert vmin[f, b] == np.inf and vmax[f, b] == -np.inf


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 540)
    g.dryrun_multichip(8)


def test_distributed_pallas_extraction_parity(rng):
    """mode='pallas' (fused kernel, interpret off-TPU) inside the sharded
    trainer matches the XLA extraction path (VERDICT round-1 next-step #5)."""
    from wst_tpu.parallel.distributed import DistributedTrainer
    from wst_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_devices=8, model_axis=2)
    x = rng.random((16, 3, 16, 16)).astype(np.float32)
    kw = dict(mesh=mesh, method="wst", H=16, W=16, J=2, L=4,
              k_features=5, n_estimators=4, n_classes=3)
    f_pallas = DistributedTrainer(mode="pallas", **kw).extract_features(x)
    f_xla = DistributedTrainer(**kw).extract_features(x)
    np.testing.assert_allclose(np.asarray(f_pallas), np.asarray(f_xla),
                               atol=2e-4, rtol=2e-3)
