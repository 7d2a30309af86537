"""Native C++ codec runtime (librealsr_io.so): round-trips + PIL parity.

Skipped when the library isn't built (CI builds it via native/CMakeLists).
"""

import numpy as np
import pytest

from realsr_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="librealsr_io.so not built"
)


@pytest.fixture
def rgb(rng):
    return rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)


@pytest.fixture
def rgba(rng):
    return rng.integers(0, 256, (14, 19, 4), dtype=np.uint8)


def test_png_roundtrip_lossless(tmp_path, rgb, rgba):
    for img, name in ((rgb, "a.png"), (rgba, "b.png")):
        p = str(tmp_path / name)
        assert native.encode(p, img, "png")
        back = native.decode(p)
        np.testing.assert_array_equal(back, img)


def test_webp_roundtrip_lossless(tmp_path, rgba):
    """The reference encodes webp LOSSLESS (webp_image.h:66-76). libwebp's
    simple lossless API may rewrite RGB under fully-transparent pixels
    (exact=false) — the reference uses the same API, so that behavior IS
    parity; compare where alpha > 0."""
    p = str(tmp_path / "a.webp")
    assert native.encode(p, rgba, "webp")
    back = native.decode(p)
    np.testing.assert_array_equal(back[..., 3], rgba[..., 3])
    vis = rgba[..., 3] > 0
    np.testing.assert_array_equal(back[vis], rgba[vis])


def test_jpg_roundtrip_close(tmp_path):
    # smooth gradient (noise is pathological for JPEG); quality 100
    # (main.cpp:391) should reproduce it closely
    yy, xx = np.mgrid[0:32, 0:32]
    rgb = np.stack([yy * 8, xx * 8, (yy + xx) * 4], axis=-1).astype(np.uint8)
    p = str(tmp_path / "a.jpg")
    assert native.encode(p, rgb, "jpg")
    back = native.decode(p)
    assert back.shape == rgb.shape
    assert np.abs(back.astype(int) - rgb.astype(int)).mean() < 3


def test_gray_promotion(tmp_path):
    """Grayscale files decode as RGB (main.cpp:247-260 semantics)."""
    from PIL import Image

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "g.png")
    Image.fromarray(g, mode="L").save(p)
    back = native.decode(p)
    assert back.shape == (8, 8, 3)
    np.testing.assert_array_equal(back[..., 0], g)
    np.testing.assert_array_equal(back[..., 1], g)


def test_decode_failure_returns_none(tmp_path):
    p = str(tmp_path / "junk.png")
    open(p, "wb").write(b"not an image")
    assert native.decode(p) is None
