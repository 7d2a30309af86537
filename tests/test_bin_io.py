"""Round-trip tests for the ncnn .bin weight reader/writer."""

import struct

import numpy as np

from realsr_tpu.ncnn.bin import TAG_FP16, load_weights, write_weights
from realsr_tpu.ncnn.param import parse_param
from realsr_tpu.ncnn.synth import make_rrdbnet_param_text, synth_weights
from tests.conftest import TINY_SPEC


def test_roundtrip(tmp_path):
    graph = parse_param(make_rrdbnet_param_text(TINY_SPEC))
    weights = synth_weights(graph, seed=3)
    p = tmp_path / "m.bin"
    write_weights(graph, weights, str(p))
    loaded = load_weights(graph, str(p))
    assert set(loaded) == set(weights)
    for name in weights:
        np.testing.assert_array_equal(loaded[name]["weight"], weights[name]["weight"])
        np.testing.assert_array_equal(loaded[name]["bias"], weights[name]["bias"])


def test_fp16_records(tmp_path):
    text = "\n".join(
        [
            "7767517",
            "2 2",
            "Input in 0 1 data",
            "Convolution c 1 1 data out 0=2 1=3 4=1 5=1 6=54",
        ]
    )
    graph = parse_param(text)
    w = np.linspace(-1, 1, 54).astype(np.float16)
    bias = np.array([0.5, -0.5], dtype=np.float32)
    payload = struct.pack("<I", TAG_FP16) + w.tobytes()
    # fp16 payload of 54 elems = 108 bytes, already 4-aligned
    payload += bias.tobytes()
    p = tmp_path / "m.bin"
    p.write_bytes(payload)
    loaded = load_weights(graph, str(p))
    np.testing.assert_allclose(
        loaded["c"]["weight"].ravel(), w.astype(np.float32), rtol=0
    )
    np.testing.assert_array_equal(loaded["c"]["bias"], bias)


def test_truncated_bin_raises(tmp_path):
    graph = parse_param(make_rrdbnet_param_text(TINY_SPEC))
    weights = synth_weights(graph, seed=3)
    p = tmp_path / "m.bin"
    write_weights(graph, weights, str(p))
    data = p.read_bytes()
    p.write_bytes(data[: len(data) // 2])
    try:
        load_weights(graph, str(p))
        raised = False
    except ValueError:
        raised = True
    assert raised
