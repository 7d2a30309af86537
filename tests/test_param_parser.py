"""Unit tests for the ncnn .param parser against the real reference graph."""

import os

import pytest

from realsr_tpu.ncnn.param import parse_param, parse_param_file

REF_PARAM = "/root/reference/models/models-DF2K/x4.param"


def test_reference_counts():
    """SURVEY.md §2.8: 999 layers, 1782 blobs."""
    if not os.path.exists(REF_PARAM):
        pytest.skip("reference not mounted")
    g = parse_param_file(REF_PARAM)
    assert g.layer_count == 999
    assert g.blob_count == 1782
    assert g.input_blobs() == ["data"]
    assert g.output_blobs() == ["output"]


def test_reference_layer_histogram():
    if not os.path.exists(REF_PARAM):
        pytest.skip("reference not mounted")
    g = parse_param_file(REF_PARAM)
    hist = {}
    for l in g.layers:
        hist[l.type] = hist.get(l.type, 0) + 1
    assert hist == {
        "Convolution": 351,
        "Split": 276,
        "Concat": 276,
        "Eltwise": 92,
        "Interp": 2,
        "Input": 1,
        "BinaryOp": 1,
    }


def test_reference_conv_first_params():
    if not os.path.exists(REF_PARAM):
        pytest.skip("reference not mounted")
    g = parse_param_file(REF_PARAM)
    conv0 = next(l for l in g.layers if l.type == "Convolution")
    assert conv0.pi(0) == 64  # num_output
    assert conv0.pi(1) == 3  # kernel
    assert conv0.pi(4) == 1  # pad
    assert conv0.pi(5) == 1  # bias
    assert conv0.pi(6) == 1728  # 3*64*9


def test_array_param_parsing():
    text = "\n".join(
        [
            "7767517",
            "2 2",
            "Input in 0 1 data",
            "Convolution c 1 1 data out 0=4 1=3 4=1 5=1 6=108 9=2 -23310=1,2.000000e-01",
        ]
    )
    g = parse_param(text)
    conv = g.layers[1]
    assert conv.pa(10) == [pytest.approx(0.2)]
    assert conv.pi(9) == 2


def test_eltwise_coeffs():
    if not os.path.exists(REF_PARAM):
        pytest.skip("reference not mounted")
    g = parse_param_file(REF_PARAM)
    elt = next(l for l in g.layers if l.type == "Eltwise")
    assert elt.pi(0) == 1  # SUM
    assert elt.pa(1) == [pytest.approx(0.2), pytest.approx(1.0)]


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        parse_param("123\n1 1\nInput in 0 1 data")
