"""Test harness config.

Tests run on the JAX CPU backend with 8 virtual devices so multi-device
sharding is exercised without TPU hardware (SURVEY.md §4: the reference's
``-g -1`` CPU path proves backend-agnosticism; we fake a mesh with
``xla_force_host_platform_device_count``). Must be set before jax imports.
"""

import os

# Override, not setdefault: the base environment exports JAX_PLATFORMS=axon
# (the real TPU) and a sitecustomize hook registers that backend at
# interpreter start, so plain env vars set here are too late — use
# jax.config, which works until the first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from realsr_tpu.models.rrdbnet import RRDBNetSpec

# Small spec: fast to execute/compile but exercises every structural element
# (multiple RRDBs, dense concats, both upsample stages).
TINY_SPEC = RRDBNetSpec(num_rrdb=2, num_rdb_per_rrdb=3, nf=16, gc=8, num_upsample=2)


@pytest.fixture(autouse=True)
def _reset_trace_time_flags():
    """RealSR.load() sets trace-time module flags (packed tail, resident
    trunk) as the pallas-path defaults; in production every load() sets
    them explicitly so nothing leaks between engines. Tests, however, mix
    engine loads with DIRECT rrdbnet_forward calls that rely on the module
    defaults — restore the flags around every test so an engine-default
    test can't leak a pallas-only mode into a CPU-path forward."""
    from realsr_tpu.models import rrdbnet as R

    names = (
        "PACKED_TAIL", "PACKED_TAIL_KERNEL", "RESIDENT_TRUNK",
        "CHAINED_TRUNK", "PAIRED_CARRY", "UPCONV_PHASE",
    )
    saved = {n: getattr(R, n) for n in names}
    try:
        yield
    finally:
        for n, v in saved.items():
            setattr(R, n, v)


@pytest.fixture(scope="session")
def tiny_model_dir(tmp_path_factory):
    from realsr_tpu.ncnn.synth import make_model_dir

    d = tmp_path_factory.mktemp("models") / "models-TINY"
    make_model_dir(str(d), TINY_SPEC, seed=7)
    return str(d)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
