"""Strip-parallel PNG encoder tests (io.pngz + the native twin).

The save stage is the reference's throughput floor (stb encode measured
1.8 MP/s vs the device's ~24 MP/s, BASELINE.md round-5 save-stage
table); pngz replaces it with a SUB-filtered, strip-parallel zlib
stream. These tests pin: bit-exact round-trips through an independent
decoder (PIL) across shapes/channel counts, strip-boundary correctness
(multi-strip streams), the env level knob, and Python/native agreement
on decodability.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from realsr_tpu.io import pngz


def roundtrip(img: np.ndarray, **kw) -> np.ndarray:
    data = pngz.encode_png_bytes(img, **kw)
    back = np.asarray(Image.open(io.BytesIO(data)))
    if back.ndim == 2:
        back = back[:, :, None]
    return back.reshape(img.shape) if img.ndim == 3 else back


@pytest.mark.parametrize(
    "shape",
    [(1, 1, 3), (7, 5, 3), (64, 64, 4), (33, 17, 1), (5, 3, 2), (130, 257, 3)],
)
def test_roundtrip_shapes(shape, rng):
    img = rng.integers(0, 256, shape, np.uint8)
    np.testing.assert_array_equal(roundtrip(img), img)


def test_roundtrip_2d_gray(rng):
    img = rng.integers(0, 256, (19, 23), np.uint8)
    data = pngz.encode_png_bytes(img)
    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(data))), img
    )


def test_multi_strip_stream(rng, monkeypatch):
    """Force many strips (tiny strip budget) — the concatenated
    Z_FULL_FLUSH fragments must still form one valid zlib stream."""
    monkeypatch.setattr(pngz, "_STRIP_BYTES", 256)
    img = rng.integers(0, 256, (64, 32, 3), np.uint8)
    np.testing.assert_array_equal(roundtrip(img), img)
    np.testing.assert_array_equal(roundtrip(img, threads=4), img)


def test_level_env_knob(rng, monkeypatch):
    img = rng.integers(0, 256, (128, 128, 3), np.uint8)
    monkeypatch.setenv("REALSR_TPU_PNG_LEVEL", "9")
    high = pngz.encode_png_bytes(img)
    monkeypatch.delenv("REALSR_TPU_PNG_LEVEL")
    fast = pngz.encode_png_bytes(img)
    np.testing.assert_array_equal(
        np.asarray(Image.open(io.BytesIO(high))), img
    )
    # level 9/deflate compresses random noise no worse than RLE
    assert len(high) <= len(fast)


def test_compressed_content_smaller_than_raw():
    """Smooth SR-like content must actually compress (the SUB filter
    turns gradients into near-constant streams)."""
    ramp = np.tile(np.arange(256, dtype=np.uint8), (64, 3, 1))
    img = np.moveaxis(ramp, 1, 2)  # [64, 256, 3] horizontal ramps
    data = pngz.encode_png_bytes(img)
    assert len(data) < img.nbytes / 4
    np.testing.assert_array_equal(roundtrip(img), img)


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        pngz.encode_png_bytes(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        pngz.encode_png_bytes(np.zeros((4, 4, 5), np.uint8))
    with pytest.raises(ValueError):
        pngz.encode_png_bytes(np.zeros((0, 4, 3), np.uint8))


def test_encode_png_file(tmp_path, rng):
    img = rng.integers(0, 256, (20, 30, 3), np.uint8)
    path = str(tmp_path / "out.png")
    assert pngz.encode_png(path, img)
    np.testing.assert_array_equal(np.asarray(Image.open(path)), img)
    assert not pngz.encode_png(str(tmp_path / "no/dir/out.png"), img)


def test_codecs_uses_pngz(tmp_path, rng, monkeypatch):
    """codecs.encode_image must route png through pngz when the native
    module is absent (and produce a PIL-readable file either way)."""
    from realsr_tpu.io import codecs

    monkeypatch.setattr(codecs, "_native", lambda: None)
    img = rng.integers(0, 256, (21, 17, 4), np.uint8)
    path = str(tmp_path / "o.png")
    assert codecs.encode_image(path, img)
    np.testing.assert_array_equal(np.asarray(Image.open(path)), img)


def test_native_encoder_matches_python(tmp_path, rng):
    """The native strip-parallel encoder (realsr_io.cpp) implements the
    same design; both outputs must decode bit-exactly to the input."""
    from realsr_tpu.io import native

    if not native.available():
        pytest.skip("native io module not built")
    for shape in [(9, 7, 3), (64, 48, 4), (33, 3, 1)]:
        img = np.ascontiguousarray(rng.integers(0, 256, shape, np.uint8))
        p = str(tmp_path / "n.png")
        assert native.encode(p, img, "png")
        back = np.asarray(Image.open(p))
        if back.ndim == 2:
            back = back[:, :, None]
        np.testing.assert_array_equal(back.reshape(img.shape), img)
