"""Native PNG batch decoder vs PIL ground truth."""

import numpy as np
import pytest
from PIL import Image

from wst_tpu.data import fastpng

pytestmark = pytest.mark.skipif(not fastpng.available(),
                                reason="no native toolchain")


def _write(tmp_path, name, arr, mode):
    p = tmp_path / name
    Image.fromarray(arr, mode=mode).save(p)
    return p


def test_decode_rgb_matches_pil(tmp_path, rng):
    arr = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    p = _write(tmp_path, "rgb.png", arr, "RGB")
    assert fastpng.png_info(p) == (48, 64)
    got = fastpng.decode_rgb(p, 48, 64)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_decode_gray_and_rgba(tmp_path, rng):
    gray = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    p = _write(tmp_path, "gray.png", gray, "L")
    got = fastpng.decode_rgb(p, 32, 32)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)

    rgba = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    p = _write(tmp_path, "rgba.png", rgba, "RGBA")
    got = fastpng.decode_rgb(p, 32, 32)
    np.testing.assert_array_equal(got, rgba[..., :3])


def test_decode_palette(tmp_path, rng):
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    img = Image.fromarray(arr, "RGB").convert(
        "P", palette=Image.Palette.ADAPTIVE)
    p = tmp_path / "pal.png"
    img.save(p)
    got = fastpng.decode_rgb(p, 16, 16)
    want = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, want)


def test_batch_parallel(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(20):
        a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        paths.append(_write(tmp_path, f"b{i}.png", a, "RGB"))
        arrays.append(a)
    out, failures = fastpng.load_batch_rgb(paths, 32, 32, n_threads=4)
    assert failures == 0
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_batch_failures_zeroed(tmp_path, rng):
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = _write(tmp_path, "good.png", a, "RGB")
    bad = tmp_path / "missing.png"
    out, failures = fastpng.load_batch_rgb([good, bad], 8, 8)
    assert failures == 1
    np.testing.assert_array_equal(out[0], a)
    assert (out[1] == 0).all()


def test_wrong_dims_rejected(tmp_path, rng):
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    p = _write(tmp_path, "small.png", a, "RGB")
    with pytest.raises(ValueError):
        fastpng.decode_rgb(p, 16, 16)
