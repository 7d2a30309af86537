"""TPU-first RRDBNet (ESRGAN-style) forward pass.

The RealSR DF2K graph (models/models-DF2K/x4.param; structure documented in
SURVEY.md §2.8) is: conv_first(3->nf) -> 23x RRDB -> trunk_conv + long skip
-> 2x (nearest-x2 upsample + conv + lrelu) -> HRconv + lrelu -> conv_last
(nf->3). Each RRDB = 3 residual dense blocks (RDB); each RDB is 5 densely
concatenated 3x3 convs (nf->gc, nf+gc->gc, ..., nf+4gc->nf) with
LeakyReLU(0.2) on the first four and residual ``0.2*c5 + x``; the RRDB
residual is ``0.2*(chain) + x`` (x4.param Eltwise coeffs ``[0.2, 1.0]``).

Instead of unrolling 999 ncnn layers (the generic executor does that and is
kept as the parity oracle), the 23 identical RRDB blocks are STACKED along a
leading axis and driven by ``lax.scan`` — one block body is traced/compiled
once, which keeps XLA compile time flat in the number of blocks.

Precision mirrors the reference's fp16-storage/fp32-arithmetic policy
(src/realsr.cpp:43-47): convs run with ``storage_dtype`` operands (f32 or
bf16) and f32 accumulation; residual adds are computed in f32 and rounded
back to storage.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from realsr_tpu.ops.resize import nearest_x2

LRELU_SLOPE = 0.2
RESIDUAL_SCALE = 0.2


@dataclasses.dataclass(frozen=True)
class RRDBNetSpec:
    """Static architecture hyperparameters recovered from the .param graph."""

    num_rrdb: int = 23
    num_rdb_per_rrdb: int = 3
    nf: int = 64
    gc: int = 32
    in_ch: int = 3
    out_ch: int = 3
    num_upsample: int = 2  # nearest-x2 stages => scale = 2**num_upsample

    @property
    def scale(self) -> int:
        return 2**self.num_upsample


def _conv3x3(x, w, b, slope=None):
    """3x3 stride-1 pad-1 conv, f32 accumulation, optional LeakyReLU.

    Returns f32; caller decides storage rounding.
    """
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b.astype(jnp.float32)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * slope)
    return y


def _rdb(x, p, storage_dtype):
    """Residual dense block. ``x`` is storage-dtype NHWC; returns same."""
    feats = x
    c1 = _conv3x3(feats, p["w1"], p["b1"], LRELU_SLOPE).astype(storage_dtype)
    feats = jnp.concatenate([x, c1], axis=-1)
    c2 = _conv3x3(feats, p["w2"], p["b2"], LRELU_SLOPE).astype(storage_dtype)
    feats = jnp.concatenate([x, c1, c2], axis=-1)
    c3 = _conv3x3(feats, p["w3"], p["b3"], LRELU_SLOPE).astype(storage_dtype)
    feats = jnp.concatenate([x, c1, c2, c3], axis=-1)
    c4 = _conv3x3(feats, p["w4"], p["b4"], LRELU_SLOPE).astype(storage_dtype)
    feats = jnp.concatenate([x, c1, c2, c3, c4], axis=-1)
    c5 = _conv3x3(feats, p["w5"], p["b5"])  # f32, no activation
    y = RESIDUAL_SCALE * c5 + x.astype(jnp.float32)
    return y.astype(storage_dtype)


def rrdbnet_forward(
    params: Dict[str, Any],
    x: jnp.ndarray,
    spec: RRDBNetSpec,
    storage_dtype=jnp.float32,
) -> jnp.ndarray:
    """Forward pass: normalized NHWC f32 in [0,1] -> NHWC f32 (pre-denorm).

    ``params`` layout (all HWIO convs):
      conv_first: {w,b}
      rdb:        {w1..w5, b1..b5} stacked [num_rrdb, num_rdb, ...]
      trunk:      {w,b}
      up:         {w,b} stacked [num_upsample, ...]
      hr:         {w,b}
      last:       {w,b}
    """
    x = x.astype(storage_dtype)
    fea = _conv3x3(x, params["conv_first"]["w"], params["conv_first"]["b"])
    fea = fea.astype(storage_dtype)

    num_rdb = spec.num_rdb_per_rrdb

    def rrdb_body(t, block_p):
        u = t
        for j in range(num_rdb):
            pj = jax.tree.map(lambda a: a[j], block_p)
            t = _rdb(t, pj, storage_dtype)
        t = (RESIDUAL_SCALE * t.astype(jnp.float32) + u.astype(jnp.float32)).astype(
            storage_dtype
        )
        return t, None

    body, _ = jax.lax.scan(rrdb_body, fea, params["rdb"])

    trunk = _conv3x3(body, params["trunk"]["w"], params["trunk"]["b"])
    fea = (fea.astype(jnp.float32) + trunk).astype(storage_dtype)

    for s in range(spec.num_upsample):
        up = jax.tree.map(lambda a: a[s], params["up"])
        fea = nearest_x2(fea)
        fea = _conv3x3(fea, up["w"], up["b"], LRELU_SLOPE).astype(storage_dtype)

    fea = _conv3x3(fea, params["hr"]["w"], params["hr"]["b"], LRELU_SLOPE).astype(
        storage_dtype
    )
    out = _conv3x3(fea, params["last"]["w"], params["last"]["b"])
    return out  # f32


def init_rrdbnet_params(
    spec: RRDBNetSpec, seed: int = 0, dtype=np.float32
) -> Dict[str, Any]:
    """Random (deterministic) parameters in the stacked layout.

    Used for benchmarking and tests — the reference snapshot ships no
    ``x4.bin`` weights (/root/reference/.MISSING_LARGE_BLOBS).
    """
    rng = np.random.default_rng(seed)
    nf, gc = spec.nf, spec.gc

    def conv(cin, cout, *lead):
        shape_w = (*lead, 3, 3, cin, cout)
        shape_b = (*lead, cout)
        # Small scale keeps activations in a sane range through 23 blocks.
        w = rng.normal(0, 0.05, size=shape_w).astype(dtype)
        b = rng.normal(0, 0.01, size=shape_b).astype(dtype)
        return w, b

    nb = (spec.num_rrdb, spec.num_rdb_per_rrdb)
    rdb_cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    rdb_couts = [gc, gc, gc, gc, nf]
    rdb = {}
    for i, (cin, cout) in enumerate(zip(rdb_cins, rdb_couts), start=1):
        w, b = conv(cin, cout, *nb)
        rdb[f"w{i}"] = w
        rdb[f"b{i}"] = b

    upw, upb = conv(nf, nf, spec.num_upsample)
    fw, fb = conv(spec.in_ch, nf)
    tw, tb = conv(nf, nf)
    hw, hb = conv(nf, nf)
    lw, lb = conv(nf, spec.out_ch)
    return {
        "conv_first": {"w": fw, "b": fb},
        "rdb": rdb,
        "trunk": {"w": tw, "b": tb},
        "up": {"w": upw, "b": upb},
        "hr": {"w": hw, "b": hb},
        "last": {"w": lw, "b": lb},
    }
