"""Noisy-dataset generator CLI — device-side batch version of the
reference's ``add_noise.py`` (reference: src/preprocessing/add_noise.py:
122-191).

Walks an input dataset tree, applies one noise family at one intensity to
every PNG/JPG on device (batched, counter-based PRNG keyed by a stable hash
of each file's relative path), and mirrors the tree into
``datasets_{type}_{intensity}/dataset_rgb_{type}_{intensity}/`` — the same
output naming convention as the reference, so downstream tooling finds it.

Usage:
    python -m wst_tpu.data.noise_gen --noise-type gaussian -i 30 \
        --input-dir <dataset_root> [--seed 42] [--batch-size 256]
"""

from __future__ import annotations

import argparse
import os
import zlib
from pathlib import Path
from typing import List

import numpy as np
from PIL import Image

from wst_tpu.ops.noise import NOISE_TYPES, add_noise_batch


def _image_id(rel_path: str) -> int:
    """Stable per-file id: noise depends only on (seed, relative path)."""
    return zlib.crc32(rel_path.encode()) & 0x7FFFFFFF


def generate_noisy_dataset(input_dir, noise_type: str, intensity: int,
                           seed: int = 42, batch_size: int = 256,
                           output_root=None) -> str:
    input_dir = Path(input_dir)
    if not input_dir.exists():
        raise FileNotFoundError(f"Input directory {input_dir} does not exist")
    if noise_type not in NOISE_TYPES:
        raise ValueError(f"Unknown noise type: {noise_type}")
    if not 0 <= intensity <= 100:
        raise ValueError("Intensity must be between 0 and 100")

    parent = (Path(output_root) if output_root is not None
              else input_dir.parent) / f"datasets_{noise_type}_{intensity}"
    out_dir = parent / f"dataset_rgb_{noise_type}_{intensity}"
    out_dir.mkdir(parents=True, exist_ok=True)

    files: List[str] = []
    for root, _dirs, names in os.walk(input_dir):
        for name in names:
            if name.lower().endswith((".png", ".jpg", ".jpeg")):
                files.append(os.path.relpath(os.path.join(root, name),
                                             input_dir))
    files.sort()

    processed = 0
    # Group by image shape so each batch is uniform.
    by_shape = {}
    for rel in files:
        with Image.open(input_dir / rel) as im:
            shape = (im.height, im.width)
        by_shape.setdefault(shape, []).append(rel)

    for shape, rels in by_shape.items():
        for i in range(0, len(rels), batch_size):
            chunk = rels[i:i + batch_size]
            imgs = np.stack([
                np.asarray(Image.open(input_dir / r).convert("RGB"),
                           dtype=np.uint8) for r in chunk])
            ids = np.asarray([_image_id(r) for r in chunk], np.int32)
            noisy = np.asarray(add_noise_batch(seed, ids, imgs, noise_type,
                                               float(intensity)))
            for r, arr in zip(chunk, noisy):
                dst = out_dir / r
                dst.parent.mkdir(parents=True, exist_ok=True)
                Image.fromarray(arr, mode="RGB").save(dst)
                processed += 1

    print(f"Successfully processed: {processed} images -> {out_dir}")
    return str(out_dir)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Add noise to images in a dataset directory (on device)")
    p.add_argument("--noise-type", "-t", choices=list(NOISE_TYPES),
                   required=True)
    p.add_argument("--intensity", "-i", type=int, required=True)
    p.add_argument("--input-dir", "-d", required=True)
    p.add_argument("--seed", "-s", type=int, default=42)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--output-root", default=None)
    args = p.parse_args(argv)
    generate_noisy_dataset(args.input_dir, args.noise_type, args.intensity,
                           args.seed, args.batch_size, args.output_root)


if __name__ == "__main__":
    main()
