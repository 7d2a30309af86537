"""ncnn model-format interop: .param graph parser and .bin weight reader/writer."""

from realsr_tpu.ncnn.param import Layer, ParamGraph, parse_param, parse_param_file
from realsr_tpu.ncnn.bin import load_weights, write_weights

__all__ = [
    "Layer",
    "ParamGraph",
    "parse_param",
    "parse_param_file",
    "load_weights",
    "write_weights",
]
