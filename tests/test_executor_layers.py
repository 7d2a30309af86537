"""Generic-executor layer-zoo tests beyond the RRDBNet layer set.

The reference build compiles in Crop/Padding/Flatten/InnerProduct/ReLU for
ncnn internals (reference src/CMakeLists.txt:110-204; SURVEY.md §2.8); the
executor interprets them straight from .param/.bin. Each test checks a
hand-written graph against a numpy oracle.
"""

import numpy as np
import pytest

import jax

from realsr_tpu.graph.executor import build_forward, convert_weights_nhwc
from realsr_tpu.ncnn.bin import load_weights, write_weights
from realsr_tpu.ncnn.param import parse_param


def _param(lines):
    body = "\n".join(lines)
    n_layers = len(lines)
    blobs = set()
    for ln in lines:
        toks = ln.split()
        nin, nout = int(toks[2]), int(toks[3])
        blobs.update(toks[4 : 4 + nin + nout])
    return f"7767517\n{n_layers} {len(blobs)}\n{body}\n"


def test_padding_crop_roundtrip(rng):
    text = _param([
        "Input            in  0 1 data",
        "Padding          pad 1 1 data p 0=2 1=2 2=3 3=3 4=2",  # reflect-101
        "Crop             crp 1 1 p out 0=3 1=2 2=0",
    ])
    g = parse_param(text)
    fwd = build_forward(g)
    x = rng.random((1, 6, 5, 4), dtype=np.float32)
    y = np.asarray(jax.jit(fwd)({}, x))
    ref = np.pad(x, ((0, 0), (2, 2), (3, 3), (0, 0)), mode="reflect")
    ref = ref[:, 2 : 2 + 6 + 4 - 2, 3 : 3 + 5 + 6 - 3, :]
    np.testing.assert_allclose(y, ref.astype(np.float32), rtol=1e-6)


def test_flatten_innerproduct_with_bin_roundtrip(tmp_path, rng):
    """Flatten + InnerProduct graph, weights written to and read back from
    a real .bin file (InnerProduct record support)."""
    cin, h, w, nout = 3, 4, 5, 7
    feats = cin * h * w
    text = _param([
        "Input            in  0 1 data",
        "Flatten          fl  1 1 data flat",
        f"InnerProduct     fc  1 1 flat out 0={nout} 1=1 2={nout * feats} 9=1",
    ])
    g = parse_param(text)
    W = rng.normal(0, 0.1, (nout, feats)).astype(np.float32)
    b = rng.normal(0, 0.1, (nout,)).astype(np.float32)
    path = str(tmp_path / "m.bin")
    write_weights(g, {"fc": {"weight": W, "bias": b}}, path)
    loaded = load_weights(g, path)
    np.testing.assert_array_equal(loaded["fc"]["weight"], W)
    np.testing.assert_array_equal(loaded["fc"]["bias"], b)

    fwd = build_forward(g)
    x = rng.random((2, h, w, cin), dtype=np.float32)
    y = np.asarray(jax.jit(fwd)(convert_weights_nhwc(loaded), x))
    # ncnn flattens CHW order; activation 9=1 is ReLU
    flat = x.transpose(0, 3, 1, 2).reshape(2, -1)
    ref = np.maximum(flat @ W.T + b, 0.0)
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=1e-6)


def test_activation_layers(rng):
    text = _param([
        "Input            in  0 1 data",
        "ReLU             r   1 1 data a 0=0.1",  # leaky slope 0.1
        "Clip             c   1 1 a b 0=-0.2 1=0.5",
        "Sigmoid          s   1 1 b c",
        "TanH             t   1 1 c d",
        "AbsVal           v   1 1 d out",
    ])
    g = parse_param(text)
    fwd = build_forward(g)
    x = (rng.random((1, 3, 3, 2), dtype=np.float32) - 0.5) * 4
    y = np.asarray(jax.jit(fwd)({}, x))
    ref = np.where(x >= 0, x, 0.1 * x)
    ref = np.clip(ref, -0.2, 0.5)
    ref = 1 / (1 + np.exp(-ref))
    ref = np.tanh(ref)
    ref = np.abs(ref)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_prelu_with_bin_roundtrip(tmp_path, rng):
    """PReLU per-channel slopes through a real .bin record (raw f32, no
    tag — ncnn loads slope_data with load(num_slope, 1))."""
    text = _param([
        "Input            in  0 1 data",
        "PReLU            pr  1 1 data out 0=3",
    ])
    g = parse_param(text)
    slope = np.asarray([0.1, 0.25, 0.4], np.float32)
    path = str(tmp_path / "m.bin")
    write_weights(g, {"pr": {"slope": slope}}, path)
    loaded = load_weights(g, path)
    np.testing.assert_array_equal(loaded["pr"]["slope"], slope)
    fwd = build_forward(g)
    x = (rng.random((2, 4, 5, 3), dtype=np.float32) - 0.5) * 2
    y = np.asarray(jax.jit(fwd)(convert_weights_nhwc(loaded), x))
    ref = np.where(x >= 0, x, x * slope.reshape(1, 1, 1, 3))
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_prelu_without_num_slope_rejected(tmp_path):
    """ncnn's load_param default num_slope is 0 (no data); silently reading
    4 bytes would shift every later record — must be a clean error."""
    text = _param([
        "Input            in  0 1 data",
        "PReLU            pr  1 1 data out",
    ])
    g = parse_param(text)
    (tmp_path / "m.bin").write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError, match="num_slope"):
        load_weights(g, str(tmp_path / "m.bin"))


def test_pooling_max_avg_global(rng):
    x = rng.random((1, 6, 8, 3), dtype=np.float32)

    def run(line):
        g = parse_param(_param(["Input in 0 1 data", line]))
        return np.asarray(jax.jit(build_forward(g))({}, x))

    y = run("Pooling p 1 1 data out 0=0 1=2 2=2")  # max 2x2 stride 2
    ref = x.reshape(1, 3, 2, 4, 2, 3).max(axis=(2, 4))
    np.testing.assert_allclose(y, ref, rtol=1e-6)

    y = run("Pooling p 1 1 data out 0=1 1=2 2=2")  # avg 2x2 stride 2
    ref = x.reshape(1, 3, 2, 4, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(y, ref, rtol=1e-6)

    y = run("Pooling p 1 1 data out 0=1 4=1")  # global avg
    np.testing.assert_allclose(
        y, x.mean(axis=(1, 2), keepdims=True), rtol=1e-6
    )

    # pad_mode 1 (valid/floor) truncates the partial tail window: 8 wide,
    # k=3 s=2 -> 3 windows
    y = run("Pooling p 1 1 data out 0=0 1=3 2=2 5=1")
    assert y.shape == (1, 2, 3, 3)

    with pytest.raises(NotImplementedError):
        run("Pooling p 1 1 data out 0=0 1=2 2=2 3=1")  # padded: unsupported
    with pytest.raises(NotImplementedError):
        # ncnn default pad_mode 0 CEILS (tail-pads a partial window):
        # 8 wide, k=3 s=2 leaves a partial tail -> must refuse, not
        # silently floor
        run("Pooling p 1 1 data out 0=0 1=3 2=2")


def test_cast_packing_passthrough(rng):
    """Cast/Packing are ncnn-internal dtype/SIMD-layout plumbing (compiled
    into the reference runtime, src/CMakeLists.txt:110-204); under XLA they
    must pass values through untouched."""
    text = _param([
        "Input            in  0 1 data",
        "Cast             c   1 1 data a 0=1 1=2",
        "Packing          p   1 1 a out 0=4",
    ])
    fwd = build_forward(parse_param(text))
    x = rng.random((1, 3, 4, 2), dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(jax.jit(fwd)({}, x)), x)


def test_unknown_layer_raises(rng):
    text = _param([
        "Input            in  0 1 data",
        "FancyNewLayer    f   1 1 data out",
    ])
    fwd = build_forward(parse_param(text))
    with pytest.raises(NotImplementedError):
        fwd({}, np.zeros((1, 2, 2, 3), np.float32))
