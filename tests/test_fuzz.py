"""Malformed-input robustness (fuzz) tests.

The reference returns an error code from ncnn's ``load_param``/``load_model``
on corrupt model files and the CLI exits with a diagnostic (it never
crashes with a raw stack fault). Our contract is the same, expressed in
Python terms: **any** mutation of a model file must surface as ValueError
(or OSError at the file layer) — the exception classes the engine/CLI load
path catches for its clean ``load model failed`` diagnostic (cli.py) —
never IndexError/KeyError/UnboundLocalError or a hang.

Mutations are deterministic (seeded) so failures reproduce exactly.
"""

import random

import numpy as np
import pytest

from realsr_tpu.models.rrdbnet import RRDBNetSpec
from realsr_tpu.ncnn.bin import load_weights, write_weights
from realsr_tpu.ncnn.param import parse_param
from realsr_tpu.ncnn.synth import make_rrdbnet_param_text, synth_weights

SPEC = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)


def _mutations(text: str, n: int, seed: int):
    """Deterministic structural mutations of a .param text."""
    lines = text.splitlines()
    rng = random.Random(seed)
    garbage = ["x", "-999", "1e99", "", "0=,", "-23300=abc", "7=", "=3"]
    for _ in range(n):
        ls = list(lines)
        op = rng.randrange(5)
        if op == 0 and len(ls) > 3:
            del ls[rng.randrange(len(ls))]
        elif op == 1:
            ls.insert(rng.randrange(len(ls)), ls[rng.randrange(len(ls))])
        elif op == 2:
            i = rng.randrange(len(ls))
            toks = ls[i].split()
            if toks:
                toks[rng.randrange(len(toks))] = rng.choice(garbage)
                ls[i] = " ".join(toks)
        elif op == 3:  # truncate mid-file/mid-line
            ls = text[: rng.randrange(len(text))].splitlines()
        else:  # chop one line short
            i = rng.randrange(len(ls))
            ls[i] = ls[i][: rng.randrange(max(1, len(ls[i])))]
        yield "\n".join(ls)


def test_param_parser_never_crashes_on_mutations():
    text = make_rrdbnet_param_text(SPEC)
    for mutated in _mutations(text, 500, seed=0):
        try:
            parse_param(mutated)
        except ValueError:
            pass  # the clean diagnostic path


def test_param_parser_rejects_structural_garbage():
    # a sample of specific shapes a clean message is expected for
    for bad in [
        "",
        "7767517",
        "7767517\nnot numbers",
        "7767517\n2 3 4",
        "7767517\n1 2\nConvolution",
        "7767517\n1 2\nConvolution conv1 2 1 a",  # declares 2 ins, has 1
        "7767517\n1 2\nConvolution conv1 -1 1 a b",
        "7767517\n1 2\nInput data 0 1 data 0=,",
        "7767517\n1 2\nInput data 0 1 data -23310=2,1.0",  # count mismatch
    ]:
        with pytest.raises(ValueError):
            parse_param(bad)


def test_load_path_never_crashes_on_miswired_graphs(tmp_path):
    """Parseable-but-wrong graphs (mis-wired blobs, zeroed channel counts,
    swapped layer types) through the full load path — load_weights +
    match_rrdbnet + build_forward must raise only the classes the engine
    load path handles (this fuzz found ZeroDivisionError on 0=0 conv dims
    and TypeError from scalar-vs-array params before the guards)."""
    from realsr_tpu.graph.executor import build_forward
    from realsr_tpu.graph.rrdb_match import match_rrdbnet

    text = make_rrdbnet_param_text(SPEC)
    graph = parse_param(text)
    binp = str(tmp_path / "x4.bin")
    write_weights(graph, synth_weights(graph, seed=0), binp)

    lines = text.splitlines()
    rng = random.Random(2)
    for _ in range(120):
        ls = list(lines)
        i = rng.randrange(2, len(ls))
        toks = ls[i].split()
        op = rng.randrange(3)
        if op == 0 and len(toks) > 5:
            toks[rng.randrange(4, len(toks))] = rng.choice(
                ["bogus_blob", "data", "output"]
            )
        elif op == 1:
            for j, t in enumerate(toks):
                if "=" in t:
                    k, _, _v = t.partition("=")
                    toks[j] = f"{k}={rng.choice(['0', '1', '999', '7'])}"
                    break
        else:
            toks[0] = rng.choice(
                ["Convolution", "Eltwise", "Pooling", "Sigmoid", "Split"]
            )
        ls[i] = " ".join(toks)
        try:
            g2 = parse_param("\n".join(ls))
            load_weights(g2, binp)
            match_rrdbnet(g2)
            build_forward(g2)
        except (ValueError, OSError, NotImplementedError):
            # ValueError/OSError: the load path's diagnostic classes.
            # NotImplementedError: executor's unsupported-layer guard
            # (also ValueError-adjacent: a clean named reason, no crash).
            continue


def test_engine_load_diagnostic_on_miswired_graph(tmp_path):
    """The engine facade itself must turn a wrong-but-parseable model into
    its clean load failure, like ncnn's error return (realsr.cpp:75)."""
    from realsr_tpu.engine import EngineConfig, RealSR

    text = make_rrdbnet_param_text(SPEC)
    # zero out conv_first's output channels: parses fine, impossible model
    bad = text.replace(" 0=16 ", " 0=0 ", 1)
    assert bad != text
    pp = tmp_path / "x4.param"
    bp = tmp_path / "x4.bin"
    pp.write_text(bad)
    graph = parse_param(text)
    write_weights(graph, synth_weights(graph, seed=0), str(bp))
    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=16))
    with pytest.raises((ValueError, OSError)):
        eng.load(str(pp), str(bp))


def test_bin_reader_never_crashes_on_mutations(tmp_path):
    graph = parse_param(make_rrdbnet_param_text(SPEC))
    path = str(tmp_path / "x4.bin")
    write_weights(graph, synth_weights(graph, seed=0), path)
    blob = np.fromfile(path, dtype=np.uint8)
    rng = random.Random(1)
    for trial in range(30):
        mut = blob.copy()
        op = rng.randrange(3)
        if op == 0:  # truncate
            mut = mut[: rng.randrange(len(mut))]
        elif op == 1:  # flip a quantize tag to a bogus value
            off = rng.randrange(0, len(mut) - 4, 4)
            mut[off : off + 4] = rng.choice(
                [[255, 255, 255, 255], [7, 0, 0, 0], [222, 173, 190, 239]]
            )
        else:  # zero-length file / tiny prefix
            mut = mut[: rng.randrange(16)]
        p = str(tmp_path / f"m{trial}.bin")
        mut.tofile(p)
        try:
            load_weights(graph, p)
        except (ValueError, OSError):
            pass  # the engine/CLI load path's clean diagnostic classes
