"""Matcher tests: recognize RRDBNet in synthesized and real reference graphs."""

import os

import pytest

from realsr_tpu.graph.rrdb_match import match_rrdbnet
from realsr_tpu.ncnn.param import parse_param, parse_param_file
from realsr_tpu.ncnn.synth import make_rrdbnet_param_text
from tests.conftest import TINY_SPEC

REF_PARAM = "/root/reference/models/models-DF2K/x4.param"


def test_match_tiny():
    g = parse_param(make_rrdbnet_param_text(TINY_SPEC))
    m = match_rrdbnet(g)
    assert m is not None
    assert m.spec == TINY_SPEC
    assert len(m.rdb_convs) == TINY_SPEC.num_rrdb
    assert all(len(b) == 3 and all(len(r) == 5 for r in b) for b in m.rdb_convs)


def test_match_reference_graph():
    """The real x4.param must match as 23-block nf=64 gc=32 RRDBNet x4."""
    if not os.path.exists(REF_PARAM):
        pytest.skip("reference not mounted")
    g = parse_param_file(REF_PARAM)
    m = match_rrdbnet(g)
    assert m is not None
    assert m.spec.num_rrdb == 23
    assert m.spec.nf == 64
    assert m.spec.gc == 32
    assert m.spec.in_ch == 3
    assert m.spec.out_ch == 3
    assert m.spec.num_upsample == 2
    assert m.spec.scale == 4
    # 23*3*5 + conv_first + trunk + 2 up + hr + last = 351 convs total
    assert 23 * 3 * 5 + 6 == 351


def test_non_rrdb_graph_falls_through():
    text = "\n".join(
        [
            "7767517",
            "3 3",
            "Input in 0 1 data",
            "Convolution c1 1 1 data mid 0=8 1=3 4=1 5=1 6=216",
            "Convolution c2 1 1 mid out 0=3 1=3 4=1 5=1 6=216 9=2 -23310=1,2.000000e-01",
        ]
    )
    assert match_rrdbnet(parse_param(text)) is None
