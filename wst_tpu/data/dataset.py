"""Dataset IO: the `{root}/{area}/{class}/*.png` directory convention.

Mirrors the reference's loaders (reference: src/training/
train_and_save_model.py:51-56,114-145): PNG -> float32 (3, H, W) in [0, 1],
class label = class directory name, classes sorted lexicographically.

Because the reference's UAV imagery is git-ignored upstream, this module also
provides a deterministic synthetic dataset generator with class-dependent
texture statistics (distinct spatial frequencies + base reflectance per
class), so every pipeline stage is exercisable end-to-end and golden tests
are reproducible.
"""

from __future__ import annotations

import os
import zlib
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

AREAS = ("assatigue", "popolar", "sunset")
CLASSES = ("garden", "low_veg", "trees")
SIZES = {"mini": 5, "small": 15, "original": 40}


def load_rgb_image(file_path) -> np.ndarray:
    """PNG -> float32 (3, H, W) in [0, 1] (HWC -> CHW)."""
    image = Image.open(file_path).convert("RGB")
    arr = np.asarray(image).astype(np.float32) / 255.0
    return np.transpose(arr, (2, 0, 1))


def save_rgb_image(arr_u8_hwc: np.ndarray, file_path) -> None:
    Image.fromarray(arr_u8_hwc, mode="RGB").save(file_path)


def list_areas(root_dir) -> List[str]:
    return sorted(d for d in os.listdir(root_dir)
                  if os.path.isdir(os.path.join(root_dir, d)))


def load_area_images_and_labels(
        root_dir, area_name: str,
        sample_per_class: Optional[int] = None,
        sample_seed: Optional[int] = None,
        ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Load every PNG of `{root}/{area}/{class}/` (classes sorted).

    Returns (images (N, 3, H, W) float32, labels (N,) str array, paths).
    With ``sample_per_class`` set, draws that many files per class without
    replacement (numpy RandomState(sample_seed) choice, the reference's
    inference-time sampling, reference: src/inference/inference.py:322-352).
    """
    area_path = os.path.join(root_dir, area_name)
    if not os.path.isdir(area_path):
        raise ValueError(f"Area directory not found: {area_path}")
    class_dirs = sorted(d for d in os.listdir(area_path)
                        if os.path.isdir(os.path.join(area_path, d)))
    all_paths, labels = [], []
    rng = np.random.RandomState(sample_seed)
    for class_dir in class_dirs:
        class_path = os.path.join(area_path, class_dir)
        files = sorted(f for f in os.listdir(class_path)
                       if f.lower().endswith(".png"))
        if sample_per_class is not None and len(files) > sample_per_class:
            idx = rng.choice(len(files), sample_per_class, replace=False)
            files = [files[i] for i in sorted(idx)]
        for f in files:
            all_paths.append(os.path.join(class_path, f))
            labels.append(class_dir)

    # Fast path: native multithreaded batch decode into one buffer.
    images, kept_labels, kept_paths = None, labels, all_paths
    try:
        from wst_tpu.data import fastpng
        if all_paths and fastpng.available():
            h, w = fastpng.png_info(all_paths[0])
            batch, failures = fastpng.load_batch_rgb(all_paths, h, w)
            if failures == 0:
                images = batch.astype(np.float32).transpose(0, 3, 1, 2) \
                    / 255.0
    except Exception:
        images = None

    if images is None:  # PIL fallback (mixed sizes / unreadable / no g++)
        imgs, kept_labels, kept_paths = [], [], []
        for p, lab in zip(all_paths, labels):
            try:
                imgs.append(load_rgb_image(p))
            except Exception as e:  # unreadable file: skip, keep going
                print(f"Error loading {p}: {e}")
                continue
            kept_labels.append(lab)
            kept_paths.append(p)
        if not imgs:
            raise ValueError(f"No images found for area: {area_name}")
        images = np.stack(imgs)
    elif len(images) == 0:
        raise ValueError(f"No images found for area: {area_name}")
    return images, np.asarray(kept_labels), kept_paths


# ---------------------------------------------------------------------------
# Synthetic data.
# ---------------------------------------------------------------------------

def synthesize_patch(rng: np.random.Generator, class_name: str,
                     area_name: str, hw: Tuple[int, int] = (128, 128)
                     ) -> np.ndarray:
    """One synthetic (H, W, 3) uint8 patch with class-specific texture.

    garden: regular low-frequency furrows; low_veg: mid-frequency isotropic
    blobs; trees: high-frequency speckled canopy.  The area shifts the hue
    so areas are statistically distinct, like the three Chesapeake sites.
    """
    H, W = hw
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    area_shift = {"assatigue": 0.0, "popolar": 0.12, "sunset": -0.10}.get(
        area_name, 0.0)
    phase = rng.uniform(0, 2 * np.pi)
    angle = rng.uniform(0, np.pi)
    c, s = np.cos(angle), np.sin(angle)
    if class_name == "garden":
        base, freq, amp = 0.45, 3.0, 0.18
        tex = np.sin(2 * np.pi * freq * (c * xx + s * yy) / W + phase)
    elif class_name == "low_veg":
        base, freq, amp = 0.40, 8.0, 0.14
        tex = (np.sin(2 * np.pi * freq * xx / W + phase)
               * np.cos(2 * np.pi * freq * yy / H + phase / 2))
    else:  # trees
        base, freq, amp = 0.30, 20.0, 0.16
        tex = (np.sin(2 * np.pi * freq * (c * xx + s * yy) / W + phase)
               * np.sin(2 * np.pi * (freq * 0.7) * (c * yy - s * xx) / H))
    noise = rng.normal(0, 0.05, (H, W))
    g = np.clip(base + amp * tex + noise + area_shift * 0.3, 0, 1)
    rgb = np.stack([
        np.clip(g * (0.55 + area_shift), 0, 1),
        np.clip(g * 0.85, 0, 1),
        np.clip(g * (0.45 - area_shift), 0, 1),
    ], axis=-1)
    return (rgb * 255).astype(np.uint8)


def make_synthetic_dataset(root_dir, size: str = "small",
                           areas: Sequence[str] = AREAS,
                           classes: Sequence[str] = CLASSES,
                           n_per_class: Optional[int] = None,
                           hw: Tuple[int, int] = (128, 128),
                           seed: int = 42) -> str:
    """Write `{root}/{size}/{area}/{class}/patch_###.png` and return the
    dataset path (`{root}/{size}`), mirroring the reference's
    dataset_rgb_clean/{mini,small,original} layout."""
    n = n_per_class if n_per_class is not None else SIZES[size]
    ds_root = Path(root_dir) / size
    for area in areas:
        for cls in classes:
            d = ds_root / area / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                tag = f"{seed}/{size}/{area}/{cls}/{i}".encode()
                rng = np.random.default_rng(zlib.crc32(tag))
                save_rgb_image(synthesize_patch(rng, cls, area, hw),
                               d / f"patch_{i:03d}.png")
    return str(ds_root)
