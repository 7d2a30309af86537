"""Parity: generic graph executor == scan-based fast path == expected shapes.

The generic executor interprets the ncnn graph layer-by-layer (the oracle);
the fast path runs stacked scan blocks. Bit-level agreement (up to f32
associativity) proves the stacking/matching is faithful — this is the
framework's substitute for golden outputs, which cannot be generated because
the reference snapshot has no weights (/root/reference/.MISSING_LARGE_BLOBS).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realsr_tpu.graph.executor import build_forward, convert_weights_nhwc
from realsr_tpu.graph.rrdb_match import extract_stacked_params, match_rrdbnet
from realsr_tpu.models.rrdbnet import rrdbnet_forward
from realsr_tpu.ncnn.param import parse_param
from realsr_tpu.ncnn.synth import make_rrdbnet_param_text, synth_weights
from tests.conftest import TINY_SPEC


@pytest.fixture(scope="module")
def tiny_graph_and_weights():
    graph = parse_param(make_rrdbnet_param_text(TINY_SPEC))
    weights = convert_weights_nhwc(synth_weights(graph, seed=11))
    return graph, weights


def test_executor_output_shape(tiny_graph_and_weights):
    graph, weights = tiny_graph_and_weights
    fwd = build_forward(graph)
    x = np.random.default_rng(0).random((1, 12, 10, 3), dtype=np.float32)
    y = jax.jit(fwd)(weights, x)
    assert y.shape == (1, 48, 40, 3)


def test_fast_path_matches_executor(tiny_graph_and_weights):
    graph, weights = tiny_graph_and_weights
    m = match_rrdbnet(graph)
    assert m is not None
    stacked = extract_stacked_params(m, weights)

    x = np.random.default_rng(1).random((2, 9, 11, 3), dtype=np.float32)
    y_exec = jax.jit(build_forward(graph))(weights, x)
    y_fast = jax.jit(
        lambda p, x: rrdbnet_forward(p, x, TINY_SPEC, storage_dtype=jnp.float32)
    )(stacked, x)
    np.testing.assert_allclose(
        np.asarray(y_exec), np.asarray(y_fast), rtol=2e-5, atol=2e-6
    )


def test_fast_path_bf16_close_to_f32(tiny_graph_and_weights):
    graph, weights = tiny_graph_and_weights
    m = match_rrdbnet(graph)
    stacked = extract_stacked_params(m, weights)
    x = np.random.default_rng(2).random((1, 16, 16, 3), dtype=np.float32)
    y32 = rrdbnet_forward(stacked, jnp.asarray(x), TINY_SPEC, jnp.float32)
    y16 = rrdbnet_forward(stacked, jnp.asarray(x), TINY_SPEC, jnp.bfloat16)
    # bf16 storage keeps results in the same ballpark (sanity, not parity)
    err = np.abs(np.asarray(y32) - np.asarray(y16, dtype=np.float32)).mean()
    assert err < 0.05


def test_executor_bf16_storage_runs(tiny_graph_and_weights):
    graph, weights = tiny_graph_and_weights
    fwd = build_forward(graph, storage_dtype=jnp.bfloat16)
    x = np.random.default_rng(3).random((1, 8, 8, 3), dtype=np.float32)
    y = jax.jit(fwd)(weights, x)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (1, 32, 32, 3)


def test_scatter_variant_matches_dense(tiny_graph_and_weights):
    """repack_scatter is an exact algebraic regrouping (models.rrdbnet)."""
    from realsr_tpu.models.rrdbnet import repack_scatter

    graph, weights = tiny_graph_and_weights
    m = match_rrdbnet(graph)
    stacked = extract_stacked_params(m, weights)
    x = np.random.default_rng(3).random((2, 9, 11, 3), dtype=np.float32)
    y_dense = jax.jit(
        lambda p, x: rrdbnet_forward(p, x, TINY_SPEC, storage_dtype=jnp.float32)
    )(stacked, x)
    y_scat = jax.jit(
        lambda p, x: rrdbnet_forward(
            p, x, TINY_SPEC, storage_dtype=jnp.float32, variant="scatter"
        )
    )(repack_scatter(stacked), x)
    np.testing.assert_allclose(
        np.asarray(y_dense), np.asarray(y_scat), rtol=2e-4, atol=2e-5
    )


def test_loader_scatter_variant(tmp_path):
    """load_model(variant='scatter') produces the same engine output."""
    from realsr_tpu.loader import load_model
    from realsr_tpu.ncnn.synth import make_model_dir

    make_model_dir(str(tmp_path), TINY_SPEC, seed=5)
    x = np.random.default_rng(4).random((1, 8, 8, 3), dtype=np.float32)
    outs = []
    for v in ("dense", "scatter"):
        b = load_model(
            str(tmp_path / "x4.param"), str(tmp_path / "x4.bin"), variant=v
        )
        outs.append(np.asarray(jax.jit(b.forward)(b.params, x)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-5)


def test_mixed_mode_psnr_ordering_trained_stats():
    """Measured numerics contract (goldens/README.md table): on
    non-amplifying (trained-statistics) weights, the mixed mode tracks f32
    at parity grade and beats the all-bf16 legacy mode. CPU dense-variant
    version of the TPU psnr_matrix measurement."""
    import jax.numpy as jnp

    from realsr_tpu.graph.rrdb_match import extract_stacked_params, match_rrdbnet
    from realsr_tpu.graph.executor import convert_weights_nhwc
    from realsr_tpu.models.rrdbnet import RRDBNetSpec, rrdbnet_forward
    from realsr_tpu.ncnn.param import parse_param
    from realsr_tpu.ncnn.synth import make_rrdbnet_param_text, synth_weights

    spec = RRDBNetSpec(num_rrdb=6, nf=32, gc=16)
    graph = parse_param(make_rrdbnet_param_text(spec))
    weights = convert_weights_nhwc(synth_weights(graph, seed=2, stats="trained"))
    params = extract_stacked_params(match_rrdbnet(graph), weights)
    x = np.random.default_rng(4).random((1, 40, 40, 3)).astype(np.float32)

    def run(storage, op=None):
        return np.asarray(
            rrdbnet_forward(params, x, spec, storage_dtype=storage, op_dtype=op)
        )

    ref = run(jnp.float32)

    def psnr(a):
        mse = np.mean((a - ref) ** 2)
        peak = ref.max() - ref.min()
        return 10 * np.log10(peak**2 / mse)

    p_mixed = psnr(run(jnp.float32, jnp.bfloat16))
    p_bf16 = psnr(run(jnp.bfloat16))
    assert p_mixed > 45, p_mixed
    assert p_mixed > p_bf16, (p_mixed, p_bf16)
