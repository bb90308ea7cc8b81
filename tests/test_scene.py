"""Full-scene tiled inference: tiling geometry, mesh-sharded classification,
and agreement with patch-by-patch prediction."""

import numpy as np
import pytest

from wst_tpu.data.dataset import synthesize_patch
from wst_tpu.features.extractor import FeatureExtractor
from wst_tpu.features.selection import fit_select_kbest
from wst_tpu.infer.scene import SceneClassifier, tile_scene
from wst_tpu.models.forest import TreeEnsembleClassifier
from wst_tpu.parallel.mesh import make_mesh


def test_tile_scene_geometry():
    scene = np.zeros((3, 100, 70), np.float32)
    tiles, grid = tile_scene(scene, 32)
    assert grid == (4, 3)           # ceil coverage with clamped edge tiles
    assert tiles.shape == (12, 3, 32, 32)
    tiles2, grid2 = tile_scene(scene, 32, stride=16)
    assert grid2 == (6, 4)
    with pytest.raises(ValueError):
        tile_scene(np.zeros((3, 16, 16), np.float32), 32)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    imgs, labels = [], []
    for cls in ("garden", "low_veg", "trees"):
        for i in range(10):
            r = np.random.default_rng(hash((cls, i)) % 2**32)
            p = synthesize_patch(r, cls, "sunset", (32, 32))
            imgs.append(p.transpose(2, 0, 1).astype(np.float32) / 255.0)
            labels.append(cls)
    imgs, labels = np.stack(imgs), np.asarray(labels)
    fx = FeatureExtractor("advanced_stats", 32, 32)
    X = fx.extract_numpy(imgs)
    X_sel, selection = fit_select_kbest(X, labels, fx.feature_names, 5)
    model = TreeEnsembleClassifier(n_estimators=10, random_state=0)
    model.fit(X_sel, labels)
    return model, selection


def test_scene_classification(trained):
    model, selection = trained
    sc = SceneClassifier(model, selection, "advanced_stats", patch=32,
                         mesh=make_mesh(8), batch_size=16)
    # scene: left half garden texture, right half trees texture
    r = np.random.default_rng(1)
    left = synthesize_patch(r, "garden", "sunset", (96, 64))
    right = synthesize_patch(r, "trees", "sunset", (96, 64))
    scene = np.concatenate([left, right], axis=1).transpose(2, 0, 1
                                                            ) / 255.0
    out = sc.classify(scene.astype(np.float32))
    assert out["class_map"].shape == out["grid"] == (3, 4)
    assert out["confidence"].shape == (3, 4)
    labels = out["labels"]
    left_classes = labels[out["class_map"][:, :2]].ravel()
    right_classes = labels[out["class_map"][:, 2:]].ravel()
    assert (left_classes == "garden").mean() >= 0.5
    assert (right_classes == "trees").mean() >= 0.5


def test_scene_uint8_matches_float(trained):
    """A native-uint8 raster (transferred 4x smaller, converted on device)
    classifies identically to its float32 version."""
    model, selection = trained
    sc = SceneClassifier(model, selection, "advanced_stats", patch=32,
                         mesh=make_mesh(4), batch_size=8)
    rng = np.random.default_rng(3)
    scene_u8 = rng.integers(0, 256, (3, 70, 100), dtype=np.uint8)
    out_u8 = sc.classify(scene_u8)
    out_f32 = sc.classify(scene_u8.astype(np.float32) / 255.0)
    np.testing.assert_array_equal(out_u8["class_map"], out_f32["class_map"])


def test_scene_matches_patchwise(trained):
    model, selection = trained
    sc = SceneClassifier(model, selection, "advanced_stats", patch=32,
                         mesh=make_mesh(4), batch_size=8)
    rng = np.random.default_rng(2)
    scene = rng.random((3, 64, 64)).astype(np.float32)
    out = sc.classify(scene)
    tiles, _ = tile_scene(scene, 32)
    fx = FeatureExtractor("advanced_stats", 32, 32)
    X = selection.transform(fx.extract_numpy(tiles))
    want = model.predict(X)
    got = out["labels"][out["class_map"]].ravel()
    np.testing.assert_array_equal(got, want)
