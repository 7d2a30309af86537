"""Image resize ops with ncnn ``Interp`` numerics.

The reference uses ncnn's Interp layer in two places:

- nearest x2 inside the RRDBNet upsampler (models/models-DF2K/x4.param lines
  ``Interp Resize_1204/1235 ... 0=1 1=2.0 2=2.0``),
- bicubic x4 for the alpha channel (src/realsr.cpp:128-140, resize_type=3).

ncnn's bicubic uses the Catmull-Rom-style cubic with ``A = -0.75`` (the
OpenCV INTER_CUBIC kernel) and half-pixel coordinate mapping
``fx = (x + 0.5) / scale - 0.5`` with replicate-clamped borders. That does
NOT match ``jax.image.resize``'s Keys kernel (A = -0.5), so we build the
separable interpolation weights ourselves and apply them as two dense
matmuls — which is also the TPU-friendly formulation (rides the MXU instead
of gathers).

All functions take/return NHWC arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_coeffs(fx: np.ndarray, a: float = -0.75) -> np.ndarray:
    """4-tap cubic convolution coefficients, ncnn/OpenCV formulation."""
    fx1 = fx + 1.0
    c0 = ((a * fx1 - 5.0 * a) * fx1 + 8.0 * a) * fx1 - 4.0 * a
    c1 = ((a + 2.0) * fx - (a + 3.0)) * fx * fx + 1.0
    omfx = 1.0 - fx
    c2 = ((a + 2.0) * omfx - (a + 3.0)) * omfx * omfx + 1.0
    c3 = 1.0 - c0 - c1 - c2
    return np.stack([c0, c1, c2, c3], axis=-1)


@functools.lru_cache(maxsize=128)
def _resize_matrix(in_size: int, out_size: int, kind: str) -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix (f32).

    half-pixel mapping ``src = (dst + 0.5) * in/out - 0.5``; taps clamped to
    the valid range (replicate border), matching ncnn resize_*_image.
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if kind == "nearest":
        # ncnn resize_nearest: floor(x * scale), clamped
        idx = np.clip(np.floor(dst * scale).astype(np.int64), 0, in_size - 1)
        m[np.arange(out_size), idx] = 1.0
    elif kind == "bilinear":
        sx = np.floor(src).astype(np.int64)
        fx = src - sx
        for tap, w in ((0, 1.0 - fx), (1, fx)):
            idx = np.clip(sx + tap, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), w)
    elif kind == "bicubic":
        sx = np.floor(src).astype(np.int64)
        fx = src - sx
        coeffs = _cubic_coeffs(fx)
        for tap in range(4):
            idx = np.clip(sx - 1 + tap, 0, in_size - 1)
            np.add.at(m, (np.arange(out_size), idx), coeffs[:, tap])
    else:
        raise ValueError(f"unknown resize kind {kind!r}")
    return m.astype(np.float32)


def resize_nhwc(x: jnp.ndarray, out_h: int, out_w: int, kind: str) -> jnp.ndarray:
    """Separable resize of NHWC ``x`` to (out_h, out_w) via two matmuls."""
    n, h, w, c = x.shape
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # HIGHEST precision: TPU matmuls default to bf16 passes, which would
    # cost ~7 bits of alpha-channel parity; these matrices are tiny.
    hp = jax.lax.Precision.HIGHEST
    if out_h != h:
        my = jnp.asarray(_resize_matrix(h, out_h, kind))  # [out_h, h]
        xf = jnp.einsum("oh,nhwc->nowc", my, xf, precision=hp)
    if out_w != w:
        mx = jnp.asarray(_resize_matrix(w, out_w, kind))  # [out_w, w]
        xf = jnp.einsum("ow,nhwc->nhoc", mx, xf, precision=hp)
    return xf.astype(orig_dtype)


def nearest_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (ncnn Interp 0=1 1=2.0 2=2.0).

    For exact integer scale-2, ncnn's mapping floor(x/2) is pixel
    replication, which we express as reshape-broadcast (cheap on TPU).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def bicubic_x4(x: jnp.ndarray) -> jnp.ndarray:
    """ncnn-parity bicubic 4x (alpha passthrough, src/realsr.cpp:326-331)."""
    n, h, w, c = x.shape
    return resize_nhwc(x, h * 4, w * 4, "bicubic")
