"""Native C++ JPEG decode pool vs PIL reference."""

import os

import numpy as np
import pytest

from object_detector_tpu.data import native_decode


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(640, 480), (123, 457), (64, 64)]):
        # Smooth gradient content so JPEG loss stays small.
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx * 255 / w).astype(np.uint8),
                (yy * 255 / h).astype(np.uint8),
                np.full((h, w), 60 + 40 * i, np.uint8),
            ],
            axis=-1,
        )
        p = str(root / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_available():
    assert native_decode.available(), "native decoder failed to build/load"


def test_decode_batch_matches_pil(jpeg_files):
    size = 96
    result = native_decode.decode_batch(jpeg_files, size, num_threads=2)
    assert result is not None
    out, ok = result
    assert out.shape == (len(jpeg_files), size, size, 3)
    assert ok.all()
    from PIL import Image

    for i, p in enumerate(jpeg_files):
        with Image.open(p) as im:
            ref = np.asarray(
                im.convert("RGB").resize((size, size), Image.BILINEAR), np.int16
            )
        diff = np.abs(out[i].astype(np.int16) - ref)
        # Different resample filters (area vs bilinear) — tolerate small
        # differences on smooth gradients.
        assert np.mean(diff) < 8.0, f"mean abs diff {np.mean(diff):.1f} too high"


def test_decode_bad_file_zero_fills(tmp_path):
    bad = str(tmp_path / "not_a_jpeg.jpg")
    with open(bad, "wb") as f:
        f.write(b"hello world")
    result = native_decode.decode_batch([bad], 32)
    assert result is not None
    out, ok = result
    assert (out == 0).all()
    assert not ok[0]  # caller re-decodes via PIL
