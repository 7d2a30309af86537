"""Model loading: ncnn files -> a unified forward-callable bundle.

Replaces ncnn's ``Net::load_param/load_model`` + ``Extractor`` contract
(reference: src/realsr.cpp:38-77, 304-312) with: parse the .param, read the
.bin, try the RRDBNet structural matcher for the `lax.scan` fast path, and
fall back to the generic graph executor for arbitrary ncnn models. Either
way the result is one pure function ``forward(params, x[B,h,w,3]) ->
f32[B, h*s, w*s, 3]`` plus its parameter pytree (host numpy; the engine
device_puts it where it runs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from realsr_tpu.graph.executor import build_forward, convert_weights_nhwc
from realsr_tpu.graph.rrdb_match import extract_stacked_params, match_rrdbnet
from realsr_tpu.models.rrdbnet import RRDBNetSpec, repack_scatter, rrdbnet_forward
from realsr_tpu.ncnn.bin import load_weights
from realsr_tpu.ncnn.param import ParamGraph, parse_param_file


@dataclasses.dataclass
class ModelBundle:
    forward: Callable[[Any, jnp.ndarray], jnp.ndarray]
    params: Any  # host numpy pytree
    scale: int
    spec: Optional[RRDBNetSpec]  # None => generic executor path
    graph: ParamGraph

    @property
    def is_fast_path(self) -> bool:
        return self.spec is not None


def _infer_scale(forward, params, in_ch: int = 3) -> int:
    """Output/input spatial ratio via abstract evaluation (no compute)."""
    x = jax.ShapeDtypeStruct((1, 8, 8, in_ch), jnp.float32)
    y = jax.eval_shape(lambda p, x: forward(p, x), params, x)
    scale_h, rem_h = divmod(y.shape[1], 8)
    scale_w, rem_w = divmod(y.shape[2], 8)
    if rem_h or rem_w or scale_h != scale_w:
        raise ValueError(f"non-uniform model scale: 8x8 -> {y.shape[1]}x{y.shape[2]}")
    return scale_h


def load_model(
    param_path: str,
    bin_path: str,
    storage_dtype=jnp.float32,
    allow_fast_path: bool = True,
    variant: str = "dense",
    op_dtype=None,
) -> ModelBundle:
    """``variant``: RDB conv formulation for the fast path — 'dense' keeps
    the graph's concat-input convs; 'scatter' repacks weights by source
    (models.rrdbnet.repack_scatter; identical math, different MXU shape);
    'pallas' packs for the fused TPU kernel (ops.rdb_kernel; identical
    math, ~2.2x the XLA conv throughput on v5e, single-device TPU only).

    ``op_dtype``: conv/matmul operand dtype (default = storage_dtype).
    storage f32 + op bf16 = mixed mode (f32 carried state, bf16 MXU
    operands — models.rrdbnet docstring). The generic-graph fallback has
    no f32-carry formulation; it computes at op_dtype like before.
    """
    graph = parse_param_file(param_path)
    weights = convert_weights_nhwc(load_weights(graph, bin_path))
    op_dtype = jnp.dtype(op_dtype) if op_dtype is not None else jnp.dtype(storage_dtype)

    match = match_rrdbnet(graph) if allow_fast_path else None
    if match is not None:
        spec = match.spec
        params = extract_stacked_params(match, weights)
        if variant == "scatter":
            params = repack_scatter(params)  # numpy in -> numpy out
        elif variant == "pallas":
            from realsr_tpu.ops.rdb_kernel import pack_rdb_params

            params = dict(params)
            params["rdb"] = pack_rdb_params(
                repack_scatter(params)["rdb"], dtype=op_dtype
            )

        def forward(p, x):
            return rrdbnet_forward(
                p, x, spec, storage_dtype=storage_dtype, variant=variant,
                op_dtype=op_dtype,
            )

        return ModelBundle(forward, params, spec.scale, spec, graph)

    generic = build_forward(graph, storage_dtype=op_dtype)

    def forward(p, x):
        return generic(p, x).astype(jnp.float32)

    scale = _infer_scale(forward, weights)
    return ModelBundle(forward, weights, scale, None, graph)
