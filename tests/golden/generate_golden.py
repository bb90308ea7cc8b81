"""Generate checked-in golden scattering coefficients from the independent
kymatio-0.3.0 transcription (``kymatio_oracle.py``).

Run from the repo root:  python tests/golden/generate_golden.py

Writes tests/golden/scattering_J{J}_L{L}_{H}x{W}.npz with:
  inputs  : (n, H, W)  float32 test images
  coeffs  : (n, n_paths, H/2^J, W/2^J) float64 scattering outputs

Configs cover the reference's two Scattering2D call sites:
  * J=2, L=8, 128x128 — training/inference extractor
    (/root/reference/src/training/train_and_save_model.py:346-378)
  * J=3, L=6, 32x32   — WST clean-vs-noisy comparator
    (/root/reference/src/visualization/compare_wst_coefficients.py:30-39)
plus a deep-J config (J=4, L=8, 64x64) exercised by the fused Pallas path
and the BASELINE config-1 shape (J=2, L=8, 64x64 patches).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import kymatio_oracle as KO  # noqa: E402

OUT_DIR = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [(2, 8, 128, 128), (3, 6, 32, 32), (4, 8, 64, 64), (2, 8, 64, 64)]


def make_inputs(H, W):
    """Three deterministic images spanning the relevant signal classes."""
    rng = np.random.default_rng(20260819)
    noise = rng.random((H, W), dtype=np.float64)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    gradient = (xx / (W - 1) + yy / (H - 1)) / 2.0
    texture = 0.5 + 0.25 * np.sin(2 * np.pi * xx / 9.0) \
        * np.cos(2 * np.pi * yy / 5.0) + 0.1 * rng.standard_normal((H, W))
    texture = np.clip(texture, 0.0, 1.0)
    return np.stack([noise, gradient, texture]).astype(np.float32)


def main():
    for J, L, H, W in CONFIGS:
        inputs = make_inputs(H, W)
        coeffs = np.stack([KO.scattering2d(img, J, L) for img in inputs])
        path = os.path.join(OUT_DIR, f"scattering_J{J}_L{L}_{H}x{W}.npz")
        np.savez_compressed(path, inputs=inputs, coeffs=coeffs)
        print(f"wrote {path}: inputs {inputs.shape} coeffs {coeffs.shape}")


if __name__ == "__main__":
    main()
