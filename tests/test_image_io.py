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


def test_jpeg_roundtrip_and_cross_decoder(tmp_path):
    """Baseline JPEG write/read (≙ IMG_IO::write_jpeg/load_jpeg,
    image_io.h:19-22): our own round-trip stays within lossy tolerance and,
    when PIL (libjpeg) is available, cross-decodes both ways."""
    from volumeraytracer_tpu.utils.jpeg import read_jpeg, write_jpeg

    h, w = 72, 100
    yy, xx = np.mgrid[0:h, 0:w]
    gray = ((np.sin(xx / 17.0) + np.cos(yy / 11.0)) * 55 + 128).clip(0, 255).astype(np.uint8)
    rgb = np.stack([gray, 255 - gray, (xx * 255 // w).astype(np.uint8)], -1)

    for name, img in (("g.jpg", gray), ("c.jpg", rgb)):
        p = tmp_path / name
        write_jpeg(p, img, quality=92)
        back = read_jpeg(p)
        assert back.shape == img.shape
        assert np.abs(back.astype(float) - img.astype(float)).mean() < 3.0

    try:
        from PIL import Image
    except ImportError:
        return
    # libjpeg must decode our files ...
    ours = np.asarray(Image.open(tmp_path / "c.jpg").convert("RGB"))
    assert np.abs(ours.astype(float) - rgb.astype(float)).mean() < 3.0
    # ... and we must decode libjpeg's (incl. 4:2:0 subsampling, odd size)
    p = tmp_path / "pil420.jpg"
    Image.fromarray(rgb[: h - 3, : w - 5]).save(p, quality=88, subsampling=2)
    dec = read_jpeg(p)
    assert dec.shape == (h - 3, w - 5, 3)
    pil = np.asarray(Image.open(p))
    assert np.abs(dec.astype(float) - pil.astype(float)).mean() < 3.0


def test_jpeg_rejects_garbage(tmp_path):
    from volumeraytracer_tpu.utils.jpeg import read_jpeg

    p = tmp_path / "bad.jpg"
    p.write_bytes(b"not a jpeg at all")
    with pytest.raises(ValueError):
        read_jpeg(p)


def test_export_image_stack_jpeg(tmp_path):
    from volumeraytracer_tpu.utils.image_io import export_image_stack, read_jpeg

    vol = np.linspace(0, 1, 4 * 16 * 16, dtype=np.float32).reshape(4, 16, 16)
    n = export_image_stack(tmp_path, vol, format="jpeg")
    assert n == 4
    img = read_jpeg(tmp_path / "slice_0000.jpg")
    assert img.shape == (16, 16)
    with pytest.raises(ValueError):
        export_image_stack(tmp_path, vol, format="bmp")
