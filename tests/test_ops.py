"""Numerics-contract tests: reflect-101, D4 TTA, ncnn-parity resize."""

import jax.numpy as jnp
import numpy as np
import pytest

from realsr_tpu.ops.pad import reflect101_indices, reflect101_pad2d
from realsr_tpu.ops.resize import bicubic_x4, nearest_x2, resize_nhwc
from realsr_tpu.ops.tta import (
    NUM_TRANSFORMS,
    d4_inverse,
    d4_merge_mean,
    d4_forward_all,
    d4_transform,
)


def shader_mirror(x: int, n: int) -> int:
    """The preproc shader's index math (realsr_preproc.comp:56-62)."""
    x = abs(x)
    return (n - 1) - abs(x - (n - 1))


def test_reflect101_indices_match_shader():
    for n in (5, 11, 40):
        for pad in (1, 4, 10):
            if pad > n - 1:
                continue
            idx = reflect101_indices(n, pad, pad)
            expect = [shader_mirror(i, n) for i in range(-pad, n + pad)]
            assert list(idx) == expect


def test_reflect101_pad_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.random((12, 9, 3), dtype=np.float32)
    ours = np.asarray(reflect101_pad2d(jnp.asarray(img), 4))
    ref = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="reflect")
    np.testing.assert_array_equal(ours, ref)


def test_reflect101_pad_tiny_image():
    # pad >= dim: jnp.pad(reflect) can't, index-gather path must handle it
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    out = np.asarray(reflect101_pad2d(jnp.asarray(img), 3))
    assert out.shape == (8, 8, 3)
    # period-2 mirror: row pattern for n=2 is [... 0 1 0 1 ...] reflected
    np.testing.assert_array_equal(out[3:5, 3:5], img)


def test_d4_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 5, 7, 3), dtype=np.float32))
    for k in range(NUM_TRANSFORMS):
        y = d4_transform(x, k)
        if k >= 4:
            assert y.shape == (2, 7, 5, 3)
        np.testing.assert_array_equal(np.asarray(d4_inverse(y, k)), np.asarray(x))


def test_d4_transforms_match_reference_loops():
    """Transform table vs the CPU pointer loops (realsr.cpp:638-661)."""
    rng = np.random.default_rng(2)
    a = rng.random((4, 6), dtype=np.float32)
    x = jnp.asarray(a[None, :, :, None])
    h, w = a.shape
    expect = [np.zeros((h, w), np.float32) for _ in range(4)] + [
        np.zeros((w, h), np.float32) for _ in range(4)
    ]
    for i in range(h):
        for j in range(w):
            v = a[i, j]
            expect[0][i, j] = v
            expect[1][h - 1 - i, j] = v
            expect[2][i, w - 1 - j] = v
            expect[3][h - 1 - i, w - 1 - j] = v
            expect[4][j, i] = v
            expect[5][w - 1 - j, i] = v
            expect[6][j, h - 1 - i] = v
            expect[7][w - 1 - j, h - 1 - i] = v
    for k in range(8):
        got = np.asarray(d4_transform(x, k))[0, :, :, 0]
        np.testing.assert_array_equal(got, expect[k], err_msg=f"transform {k}")


def test_d4_merge_mean_identity():
    """mean over the ensemble of a D4-equivariant identity op == input."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 6, 6, 3), dtype=np.float32))
    ys = d4_forward_all(x)
    merged = np.asarray(d4_merge_mean(ys))
    np.testing.assert_allclose(merged, np.asarray(x), rtol=1e-6)


def test_nearest_x2_is_pixel_replication():
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 2, 4, 1))
    y = np.asarray(nearest_x2(x))
    np.testing.assert_array_equal(y[0, :, :, 0], np.repeat(np.repeat(
        np.arange(8).reshape(2, 4), 2, 0), 2, 1))


def test_bicubic_matches_opencv():
    """cv2 INTER_CUBIC uses the same A=-0.75 kernel and half-pixel mapping
    as ncnn's Interp bicubic — a strong independent oracle."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(4)
    img = rng.random((13, 9), dtype=np.float32) * 255.0
    ours = np.asarray(bicubic_x4(jnp.asarray(img[None, :, :, None])))[0, :, :, 0]
    ref = cv2.resize(img, (9 * 4, 13 * 4), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-3)


def test_bilinear_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    img = rng.random((10, 16), dtype=np.float32)
    ours = np.asarray(
        resize_nhwc(jnp.asarray(img[None, :, :, None]), 25, 40, "bilinear")
    )[0, :, :, 0]
    ref = cv2.resize(img, (40, 25), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
