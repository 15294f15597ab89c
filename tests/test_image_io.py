"""PNG codec + image-stack export tests (≙ the reference's image_io layer;
round-trip replaces the reference's untested libpng wrappers with an
actually-verified codec)."""

import numpy as np
import pytest

from volumeraytracer_tpu.utils import image_io


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(tmp_path, channels):
    rng = np.random.default_rng(channels)
    shape = (13, 17) if channels == 1 else (13, 17, channels)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    f = tmp_path / "t.png"
    image_io.write_png(f, img)
    back = image_io.read_png(f)
    np.testing.assert_array_equal(back, img.reshape(13, 17, channels))


def test_png_rejects_bad_input(tmp_path):
    with pytest.raises(ValueError):
        image_io.write_png(tmp_path / "x.png", np.zeros((4, 4), np.float32))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    with pytest.raises(ValueError):
        image_io.read_png(bad)


def test_export_image_stack(tmp_path):
    vol = np.linspace(0.0, 1.0, 4 * 5 * 6, dtype=np.float32).reshape(4, 5, 6)
    n = image_io.export_image_stack(tmp_path / "stack", vol)
    assert n == 4
    files = sorted((tmp_path / "stack").glob("slice_*.png"))
    assert len(files) == 4
    first = image_io.read_png(files[0])
    assert first.shape == (5, 6, 1)
    # slice 0 holds the smallest values, slice 3 the largest
    last = image_io.read_png(files[-1])
    assert first.mean() < last.mean()
    assert last.max() == 255


def test_export_2d(tmp_path):
    img = np.arange(30, dtype=np.float32).reshape(5, 6)
    n = image_io.export_image_stack(tmp_path, img, prefix="f")
    assert n == 1
    back = image_io.read_png(tmp_path / "f_0000.png")
    assert back.shape == (5, 6, 1)
