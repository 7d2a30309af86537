"""Reflect-101 padding with ncnn/reference-parity semantics.

The reference mirrors out-of-bounds tile coordinates with
``x = abs(x); x = (w-1) - abs(x - (w-1))`` (src/realsr_preproc.comp:56-62),
i.e. reflect WITHOUT edge duplication (aka reflect-101 / OpenCV
BORDER_REFLECT_101), the same semantics as ncnn ``copy_make_border`` type 2
used by the CPU path (src/realsr.cpp:613, 764) and numpy's ``mode="reflect"``.

The preproc shader mirrors within the uploaded row band, but bands are
clipped to the image (src/realsr.cpp:180-181), so band mirroring == whole-
image mirroring; we therefore pad the whole image once and slice tiles out
of it (cheaper on TPU: one fused pad, then static-shape dynamic-slices).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def reflect101_indices(n: int, pad_lo: int, pad_hi: int) -> np.ndarray:
    """Source index for each position of a padded axis (host-side, static)."""
    idx = np.arange(-pad_lo, n + pad_hi)
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * (n - 1)
    idx = np.abs(idx) % period
    return np.where(idx > n - 1, period - idx, idx)


def reflect101_pad_w(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Pad ONLY the W axis of [..., H, W, C] by ``pad`` with reflect-101.

    Used by band-streamed processing (engine._process_banded): the band
    already carries its vertical context rows (real neighbor rows, or
    reflect-101 of the FULL image at the global edges), so only the
    horizontal halo needs padding — mirroring within a clipped band equals
    whole-image mirroring horizontally (src/realsr.cpp:180-186 semantics).
    """
    w = img.shape[-2]
    if pad < w:
        pads = [(0, 0)] * img.ndim
        pads[img.ndim - 2] = (pad, pad)
        return jnp.pad(img, pads, mode="reflect")
    xi = jnp.asarray(reflect101_indices(w, pad, pad))
    return jnp.take(img, xi, axis=img.ndim - 2)


def reflect101_pad2d(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Pad H and W of [H, W, C] (or [N, H, W, C]) by ``pad`` with reflect-101.

    Uses jnp.pad(mode="reflect") when the dims allow it (pad < dim), and the
    index-gather formulation otherwise (tiny images, where the reference's
    double-mirror arithmetic is the ground truth).
    """
    spatial = (-3, -2)
    h, w = img.shape[-3], img.shape[-2]
    if pad < h and pad < w:
        pads = [(0, 0)] * img.ndim
        pads[img.ndim - 3] = (pad, pad)
        pads[img.ndim - 2] = (pad, pad)
        return jnp.pad(img, pads, mode="reflect")
    yi = jnp.asarray(reflect101_indices(h, pad, pad))
    xi = jnp.asarray(reflect101_indices(w, pad, pad))
    out = jnp.take(img, yi, axis=img.ndim - 3)
    out = jnp.take(out, xi, axis=img.ndim - 2)
    return out
