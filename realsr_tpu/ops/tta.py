"""8-way dihedral (D4) test-time-augmentation transforms.

The reference's TTA mode runs the net on all 8 symmetries of each tile and
averages the inverse-transformed outputs x0.125 (src/realsr_preproc_tta.comp
:104-111 scatter, src/realsr_postproc_tta.comp:76-85 gather-average; CPU
loops src/realsr.cpp:617-664, 690-724).

Transform table (matching the CPU loops; (i,j) = (row, col) of the input):
  0: identity
  1: vertical flip        out[h-1-i, j]
  2: horizontal flip      out[i, w-1-j]
  3: rotate 180           out[h-1-i, w-1-j]
  4: transpose            out[j, i]
  5: transpose+vflip      out[w-1-j, i]
  6: transpose+hflip      out[j, h-1-i]
  7: anti-transpose       out[w-1-j, h-1-i]

Transforms 0-3 preserve (h, w); 4-7 swap to (w, h). On TPU these batch as
two groups (one batch when tiles are square), so the 8 ensemble passes ride
the MXU as a single batched forward instead of 8 sequential submits
(reference does 8x submit_and_wait, src/realsr.cpp:302-318).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

NUM_TRANSFORMS = 8


def d4_transform(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Apply D4 transform k to NHWC batch x (spatial axes 1, 2)."""
    if k == 0:
        return x
    if k == 1:
        return jnp.flip(x, 1)
    if k == 2:
        return jnp.flip(x, 2)
    if k == 3:
        return jnp.flip(x, (1, 2))
    t = jnp.swapaxes(x, 1, 2)
    if k == 4:
        return t
    if k == 5:
        return jnp.flip(t, 1)
    if k == 6:
        return jnp.flip(t, 2)
    if k == 7:
        return jnp.flip(t, (1, 2))
    raise ValueError(f"bad D4 index {k}")


# Each D4 element's inverse: flips are involutions; 5 and 6 are the two
# rotations (order 4), which are each other's inverse.
_INVERSE = [0, 1, 2, 3, 4, 6, 5, 7]


def d4_inverse(y: jnp.ndarray, k: int) -> jnp.ndarray:
    """Undo d4_transform(_, k) on an NHWC batch (shape-transposed for 4-7)."""
    return d4_transform(y, _INVERSE[k])


def d4_forward_all(x: jnp.ndarray) -> List[jnp.ndarray]:
    """All 8 transforms of an NHWC batch (list: shapes differ for 4-7)."""
    return [d4_transform(x, k) for k in range(NUM_TRANSFORMS)]


def d4_merge_mean(ys: List[jnp.ndarray]) -> jnp.ndarray:
    """Inverse-transform the 8 outputs and average x0.125 in f32
    (src/realsr_postproc_tta.comp:85; src/realsr.cpp:719)."""
    acc = None
    for k, y in enumerate(ys):
        v = d4_inverse(y, k).astype(jnp.float32)
        acc = v if acc is None else acc + v
    return acc * (1.0 / NUM_TRANSFORMS)
