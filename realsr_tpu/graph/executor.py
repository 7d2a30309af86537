"""Generic jittable executor for parsed ncnn graphs.

This is the TPU-native replacement for ncnn's ``Net``/``Extractor`` graph
runtime (consumed by the reference at src/realsr.cpp:304-312, 420-428,
670-675): instead of interpreting the graph per inference on device, we
trace it ONCE into a JAX computation and let XLA compile/fuse it.

Layout is NHWC (TPU-idiomatic: channels map to vector lanes / MXU columns),
whereas ncnn blobs are CHW — the channel axis maps ncnn axis 0 -> NHWC
axis 3. Convolution weights are converted OIHW -> HWIO at load time
(:func:`convert_weights_nhwc`).

Precision model mirrors the reference's "fp16 storage, fp32 arithmetic"
(src/realsr.cpp:43-47): blobs are kept in ``storage_dtype`` (f32 or bf16),
convolutions accumulate in f32 via ``preferred_element_type``, and
elementwise math upcasts to f32 before rounding back to storage.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from realsr_tpu.ncnn.param import Layer, ParamGraph
from realsr_tpu.ops.resize import nearest_x2, resize_nhwc

# ncnn 3D blobs are CHW; batch-extended NHWC axis for each ncnn axis.
_NCNN_AXIS_TO_NHWC = {0: 3, 1: 1, 2: 2}


def convert_weights_nhwc(
    weights: Dict[str, Dict[str, np.ndarray]],
) -> Dict[str, Dict[str, np.ndarray]]:
    """OIHW (ncnn .bin layout) -> HWIO (JAX conv convention)."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for name, rec in weights.items():
        new = dict(rec)
        w = rec.get("weight")
        if w is None:  # weight-less record (e.g. PReLU slopes)
            out[name] = new
            continue
        if w.ndim == 4:  # Convolution: [O, I, kh, kw] -> [kh, kw, I, O]
            new["weight"] = np.transpose(w, (2, 3, 1, 0)).copy()
        elif w.ndim == 5:  # ConvolutionDepthWise: [g, O/g, I/g, kh, kw]
            g, og, ig, kh, kw = w.shape
            new["weight"] = (
                np.transpose(w, (3, 4, 2, 0, 1)).reshape(kh, kw, ig, g * og).copy()
            )
        out[name] = new
    return out


def _apply_activation(x: jnp.ndarray, layer: Layer) -> jnp.ndarray:
    """Fused conv activation (ncnn Convolution param 9 + -23310)."""
    act = layer.pi(9)
    if act == 0:
        return x
    if act == 1:
        return jnp.maximum(x, 0)
    if act == 2:
        slope = layer.pa(10, [0.0])[0]
        return jnp.where(x >= 0, x, x * slope)
    if act == 3:
        lo, hi = layer.pa(10, [0.0, 6.0])[:2]
        return jnp.clip(x, lo, hi)
    if act == 4:
        return jax.nn.sigmoid(x)
    if act == 5:
        return x * jnp.tanh(jax.nn.softplus(x))  # mish
    if act == 6:
        p = layer.pa(10, [1.0 / 6.0, 0.5])
        return x * jnp.clip(x * p[0] + p[1], 0.0, 1.0)  # hardswish
    raise NotImplementedError(f"{layer.name}: activation_type {act}")


def _conv(
    x: jnp.ndarray, layer: Layer, params: Dict[str, jnp.ndarray], storage_dtype
) -> jnp.ndarray:
    kw = layer.pi(1)
    kh = layer.pi(11, kw)
    dw = layer.pi(2, 1)
    dh = layer.pi(12, dw)
    sw = layer.pi(3, 1)
    sh = layer.pi(13, sw)
    pad_left = layer.pi(4, 0)
    pad_right = layer.pi(15, pad_left)
    pad_top = layer.pi(14, pad_left)
    pad_bottom = layer.pi(16, pad_top)
    groups = layer.pi(7, 1) if layer.type == "ConvolutionDepthWise" else 1

    w = params["weight"].astype(storage_dtype)
    from realsr_tpu.models.rrdbnet import _precision

    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(sh, sw),
        padding=((pad_top, pad_bottom), (pad_left, pad_right)),
        rhs_dilation=(dh, dw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=_precision(x.dtype),
    )
    if layer.pi(5):
        y = y + params["bias"].astype(jnp.float32)
    y = _apply_activation(y, layer)
    return y.astype(storage_dtype)


def _eltwise(inputs: List[jnp.ndarray], layer: Layer, storage_dtype) -> jnp.ndarray:
    op = layer.pi(0)
    xs = [x.astype(jnp.float32) for x in inputs]
    if op == 0:  # PROD
        y = xs[0]
        for x in xs[1:]:
            y = y * x
    elif op == 1:  # SUM, optional per-input coeffs (x4.param: [0.2, 1.0])
        coeffs = layer.pa(1, [])
        if coeffs:
            y = xs[0] * coeffs[0]
            for x, c in zip(xs[1:], coeffs[1:]):
                y = y + x * c
        else:
            y = xs[0]
            for x in xs[1:]:
                y = y + x
    elif op == 2:  # MAX
        y = xs[0]
        for x in xs[1:]:
            y = jnp.maximum(y, x)
    else:
        raise NotImplementedError(f"{layer.name}: eltwise op {op}")
    return y.astype(storage_dtype)


def _binary_op(inputs: List[jnp.ndarray], layer: Layer, storage_dtype) -> jnp.ndarray:
    op = layer.pi(0)
    if layer.pi(1):  # with_scalar
        a = inputs[0].astype(jnp.float32)
        b = jnp.float32(layer.pf(2))
    else:
        a = inputs[0].astype(jnp.float32)
        b = inputs[1].astype(jnp.float32)
    fns: Dict[int, Callable] = {
        0: jnp.add,
        1: jnp.subtract,
        2: jnp.multiply,
        3: jnp.divide,
        4: jnp.maximum,
        5: jnp.minimum,
        6: jnp.power,
        7: lambda a, b: b - a,
        8: lambda a, b: b / a,
    }
    if op not in fns:
        raise NotImplementedError(f"{layer.name}: binary op {op}")
    return fns[op](a, b).astype(storage_dtype)


def _interp(x: jnp.ndarray, layer: Layer) -> jnp.ndarray:
    rtype = layer.pi(0)
    kind = {1: "nearest", 2: "bilinear", 3: "bicubic"}.get(rtype)
    if kind is None:
        raise NotImplementedError(f"{layer.name}: resize_type {rtype}")
    out_h = layer.pi(3, 0)
    out_w = layer.pi(4, 0)
    if not out_h:
        out_h = int(round(x.shape[1] * layer.pf(1, 1.0)))
    if not out_w:
        out_w = int(round(x.shape[2] * layer.pf(2, 1.0)))
    if kind == "nearest" and out_h == 2 * x.shape[1] and out_w == 2 * x.shape[2]:
        return nearest_x2(x)
    return resize_nhwc(x, out_h, out_w, kind)


def _pixel_shuffle(x: jnp.ndarray, layer: Layer) -> jnp.ndarray:
    r = layer.pi(0, 1)
    mode = layer.pi(1, 0)
    n, h, w, c = x.shape
    co = c // (r * r)
    if mode == 0:  # ncnn default: in channel = co*r*r + sh*r + sw
        x = x.reshape(n, h, w, co, r, r)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # n h rh w rw co
    else:  # mode 1: in channel = (sh*r + sw)*co + c
        x = x.reshape(n, h, w, r, r, co)
        x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, co)


def _padding(x: jnp.ndarray, layer: Layer, storage_dtype) -> jnp.ndarray:
    top, bottom = layer.pi(0), layer.pi(1)
    left, right = layer.pi(2), layer.pi(3)
    ptype = layer.pi(4)
    pads = ((0, 0), (top, bottom), (left, right), (0, 0))
    if ptype == 0:
        return jnp.pad(x, pads, constant_values=layer.pf(5)).astype(storage_dtype)
    if ptype == 1:
        return jnp.pad(x, pads, mode="edge")
    if ptype == 2:
        # ncnn reflect = reflect-101 (no edge duplication), numpy "reflect"
        return jnp.pad(x, pads, mode="reflect")
    raise NotImplementedError(f"{layer.name}: padding type {ptype}")


def _pooling(x: jnp.ndarray, layer: Layer, storage_dtype) -> jnp.ndarray:
    ptype = layer.pi(0, 0)  # 0 = max, 1 = avg
    if ptype not in (0, 1):
        raise NotImplementedError(f"{layer.name}: pooling_type {ptype}")
    xf = x.astype(jnp.float32)
    if layer.pi(4, 0):  # global pooling -> [N, 1, 1, C] like ncnn's [C] blob
        red = jnp.max if ptype == 0 else jnp.mean
        return red(xf, axis=(1, 2), keepdims=True).astype(storage_dtype)
    kw = layer.pi(1, 0)
    kh = layer.pi(11, kw)
    sw = layer.pi(2, 1)
    sh = layer.pi(12, sw)
    if any(layer.pi(k, 0) for k in (3, 13, 14, 15)):
        # explicitly padded pooling is not used by any SR graph this
        # framework targets; extend when a model needs it
        raise NotImplementedError(f"{layer.name}: padded pooling")
    pad_mode = layer.pi(5, 0)
    if pad_mode == 0:
        # ncnn default 'full' mode CEILS the output extent (tail-pads a
        # partial window); this implementation floors (VALID) — identical
        # only when windows tile the input exactly, which we can check at
        # trace time since shapes are static
        if (x.shape[1] - kh) % sh or (x.shape[2] - kw) % sw:
            raise NotImplementedError(
                f"{layer.name}: full-pad (ceil) pooling with a partial "
                f"tail window"
            )
    elif pad_mode != 1:  # 1 = valid (floor) — exactly what VALID computes
        raise NotImplementedError(f"{layer.name}: pad_mode {pad_mode}")
    init, op = (
        (-jnp.inf, jax.lax.max) if ptype == 0 else (0.0, jax.lax.add)
    )
    y = jax.lax.reduce_window(
        xf, init, op,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )
    if ptype == 1:
        y = y / (kh * kw)
    return y.astype(storage_dtype)


def _crop(x: jnp.ndarray, layer: Layer) -> jnp.ndarray:
    woff, hoff, coff = layer.pi(0), layer.pi(1), layer.pi(2)
    outw, outh, outc = layer.pi(3), layer.pi(4), layer.pi(5)
    n, h, w, c = x.shape
    outw = outw if outw else w - woff
    outh = outh if outh else h - hoff
    outc = outc if outc else c - coff
    return x[:, hoff : hoff + outh, woff : woff + outw, coff : coff + outc]


def _inner_product(
    x: jnp.ndarray, layer: Layer, params: Dict[str, jnp.ndarray], storage_dtype
) -> jnp.ndarray:
    # ncnn flattens CHW; transpose NHWC -> NCHW first for matching order.
    # Already-flat input (e.g. after a Flatten layer) passes through.
    n = x.shape[0]
    flat = x if x.ndim == 2 else x.transpose(0, 3, 1, 2).reshape(n, -1)
    w = params["weight"].astype(storage_dtype)  # [num_output, in_features]
    y = jnp.dot(flat, w.T, preferred_element_type=jnp.float32)
    if layer.pi(1):
        y = y + params["bias"].astype(jnp.float32)
    y = _apply_activation(y, layer)
    return y.astype(storage_dtype)


def build_forward(
    graph: ParamGraph,
    input_blob: Optional[str] = None,
    output_blob: Optional[str] = None,
    storage_dtype=jnp.float32,
) -> Callable[[Dict[str, Dict[str, jnp.ndarray]], jnp.ndarray], jnp.ndarray]:
    """Build ``fn(params, x_nhwc) -> y_nhwc`` executing the graph.

    ``params`` is the NHWC-converted weight pytree from
    :func:`convert_weights_nhwc`. The function is pure and jittable.
    """
    inputs = graph.input_blobs()
    if input_blob is None:
        if len(inputs) != 1:
            raise ValueError(f"graph has {len(inputs)} inputs; specify input_blob")
        input_blob = inputs[0]
    if output_blob is None:
        outs = graph.output_blobs()
        if len(outs) != 1:
            raise ValueError(f"graph has {len(outs)} outputs; specify output_blob")
        output_blob = outs[0]

    # Validate wiring at build time: every consumed blob must have been
    # produced by an earlier layer (ncnn's loader enforces the same
    # ordering). A mis-wired graph is a malformed model file — raise
    # ValueError here, at load, not KeyError at trace time.
    produced = {input_blob}
    for layer in graph.layers:
        for b in layer.inputs:
            if b not in produced:
                raise ValueError(
                    f"{layer.name}: input blob {b!r} is not produced by "
                    "any earlier layer"
                )
        produced.update(layer.outputs)
    if output_blob not in produced:
        raise ValueError(f"output blob {output_blob!r} is never produced")

    # Precompute blob liveness so eager execution frees intermediates.
    last_use: Dict[str, int] = {output_blob: len(graph.layers)}
    for idx, layer in enumerate(graph.layers):
        for b in layer.inputs:
            last_use[b] = max(last_use.get(b, -1), idx)

    def forward(params, x):
        blobs: Dict[str, jnp.ndarray] = {input_blob: x.astype(storage_dtype)}
        for idx, layer in enumerate(graph.layers):
            t = layer.type
            if t == "Input":
                if layer.outputs[0] != input_blob:
                    raise ValueError(
                        f"graph input {layer.outputs[0]!r} != bound {input_blob!r}"
                    )
                continue
            ins = [blobs[b] for b in layer.inputs]
            if t == "Split":
                outs = [ins[0]] * len(layer.outputs)
            elif t in ("Convolution", "ConvolutionDepthWise"):
                outs = [_conv(ins[0], layer, params[layer.name], storage_dtype)]
            elif t == "Concat":
                axis = _NCNN_AXIS_TO_NHWC[layer.pi(0, 0)]
                outs = [jnp.concatenate(ins, axis=axis)]
            elif t == "Eltwise":
                outs = [_eltwise(ins, layer, storage_dtype)]
            elif t == "BinaryOp":
                outs = [_binary_op(ins, layer, storage_dtype)]
            elif t == "Interp":
                outs = [_interp(ins[0], layer)]
            elif t == "ReLU":
                slope = layer.pf(0, 0.0)
                xf = ins[0].astype(jnp.float32)
                y = jnp.maximum(xf, 0) if slope == 0 else jnp.where(xf >= 0, xf, xf * slope)
                outs = [y.astype(storage_dtype)]
            elif t == "PReLU":
                # per-channel learned slope (slope_data from .bin); a single
                # slope broadcasts like ncnn's num_slope==1 mode
                s = jnp.asarray(params[layer.name]["slope"], jnp.float32)
                xf = ins[0].astype(jnp.float32)
                s = s.reshape((1,) * (xf.ndim - 1) + (-1,)) if s.size > 1 else s
                outs = [jnp.where(xf >= 0, xf, xf * s).astype(storage_dtype)]
            elif t == "Pooling":
                outs = [_pooling(ins[0], layer, storage_dtype)]
            elif t == "Clip":
                outs = [
                    jnp.clip(
                        ins[0].astype(jnp.float32), layer.pf(0), layer.pf(1)
                    ).astype(storage_dtype)
                ]
            elif t == "Sigmoid":
                outs = [jax.nn.sigmoid(ins[0].astype(jnp.float32)).astype(storage_dtype)]
            elif t == "TanH":
                outs = [jnp.tanh(ins[0].astype(jnp.float32)).astype(storage_dtype)]
            elif t == "AbsVal":
                outs = [jnp.abs(ins[0])]
            elif t == "Dropout":
                scale = layer.pf(0, 1.0)
                outs = [ins[0] if scale == 1.0 else (ins[0] * scale).astype(storage_dtype)]
            elif t == "PixelShuffle":
                outs = [_pixel_shuffle(ins[0], layer)]
            elif t == "Padding":
                outs = [_padding(ins[0], layer, storage_dtype)]
            elif t == "Crop":
                outs = [_crop(ins[0], layer)]
            elif t == "Flatten":
                n = ins[0].shape[0]
                outs = [ins[0].transpose(0, 3, 1, 2).reshape(n, -1)]
            elif t == "InnerProduct":
                outs = [_inner_product(ins[0], layer, params[layer.name], storage_dtype)]
            elif t in ("Noop", "Packing", "Cast"):
                # ncnn-internal layout/dtype plumbing (compiled into the
                # reference's runtime, src/CMakeLists.txt:110-204): Packing
                # reorders SIMD lanes and Cast converts storage dtype —
                # both are owned by XLA here, so graphs that carry them
                # execute as pass-throughs.
                outs = [ins[0]] * max(1, len(layer.outputs))
            else:
                raise NotImplementedError(f"{layer.name}: layer type {t!r}")
            for b, v in zip(layer.outputs, outs):
                blobs[b] = v
            # Free dead blobs (keeps eager-mode memory bounded; no-op impact
            # under jit where XLA owns liveness).
            for b in layer.inputs:
                if last_use.get(b, -1) <= idx and b in blobs and b != output_blob:
                    del blobs[b]
        return blobs[output_blob]

    return forward
