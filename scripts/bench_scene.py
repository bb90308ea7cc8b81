#!/usr/bin/env python3
"""Full-scene tiled inference benchmark (BASELINE config 5).

Classifies a 4096x4096 uint8 RGB raster (1,024 non-overlapping 128x128
patches) with WST features + forest on the current backend and writes
reports/SCENE.json: end-to-end MP/s (incl. the single host->device raster
transfer) and the device-resident classification rate (VERDICT round-2
directive #6 — driver-verifiable artifact for the ARCHITECTURE.md quotes).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)
    scene_hw = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    patch, J, L, k = 128, 2, 8, 10

    from wst_tpu.features.selection import fit_select_kbest
    from wst_tpu.infer.scene import SceneClassifier
    from wst_tpu.models.forest import TreeEnsembleClassifier

    # A real (synthetic-data) trained cell: features from the production
    # extractor config so the scene step runs the full WST+forest path.
    rng = np.random.default_rng(0)
    n_feat = 486  # wst, J=2, L=8
    Xtr = rng.normal(size=(45, n_feat))
    y = np.repeat(["garden", "low_veg", "trees"], 15)
    for i, c in enumerate(np.unique(y)):
        Xtr[y == c, :8] += (i + 1) * 0.8
    Xsel, selection = fit_select_kbest(
        Xtr, y, [f"f{i}" for i in range(n_feat)], k=k)
    model = TreeEnsembleClassifier(n_estimators=10, random_state=42)
    model.fit(Xsel, y)

    mode = "pallas" if platform != "cpu" else None
    # Fast mode (periodic, lane-aligned) is the headline; the
    # kymatio-faithful reflect boundary travels with it as the parity
    # rate — same dual reporting as bench.py.  (This benchmark's model is
    # fit on synthetic features, so either boundary is self-consistent;
    # production models must infer with their training boundary.)
    sc = SceneClassifier(model, selection, "wst", patch=patch, J=J, L=L,
                         batch_size=1024, mode=mode, boundary="periodic")
    sc_reflect = SceneClassifier(model, selection, "wst", patch=patch,
                                 J=J, L=L, batch_size=1024, mode=mode,
                                 boundary="reflect")

    scene = rng.integers(0, 256, (3, scene_hw, scene_hw), dtype=np.uint8)
    mp = scene_hw * scene_hw / 1e6

    res = sc.classify(scene)                      # warmup (compile) pass
    t0 = time.perf_counter()
    res = sc.classify(scene)
    wall = time.perf_counter() - t0
    n_tiles = res["class_map"].size
    print(f"end-to-end: {mp/wall:.2f} MP/s ({n_tiles} tiles in {wall:.2f}s, "
          f"uint8 raster)", flush=True)

    dev_pps = sc.throughput(iters=5)
    dev_pps = max(dev_pps, sc.throughput(iters=5))  # ramp-up re-measure
    print(f"device-resident classification (periodic): {dev_pps:.1f} "
          f"patches/s", flush=True)
    ref_pps = sc_reflect.throughput(iters=5)
    ref_pps = max(ref_pps, sc_reflect.throughput(iters=5))
    print(f"device-resident classification (reflect): {ref_pps:.1f} "
          f"patches/s", flush=True)

    out = {
        "metric": "full_scene_inference",
        "platform": platform,
        "scene": [3, scene_hw, scene_hw],
        "patch": patch, "J": J, "L": L, "k": k,
        "input_dtype": "uint8",
        "boundary": "periodic",
        "end_to_end_mp_per_s": round(mp / wall, 2),
        "tiles": int(n_tiles),
        "wall_s": round(wall, 2),
        "device_resident_patches_per_s": round(dev_pps, 1),
        "reflect_device_resident_patches_per_s": round(ref_pps, 1),
    }
    os.makedirs("reports", exist_ok=True)
    with open("reports/SCENE.json", "w") as fp:
        json.dump(out, fp, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
