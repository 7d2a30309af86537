"""Tracing subsystem tests (utils/trace.py — SURVEY.md §5's additive
observability; the default stderr contract must stay untouched)."""

import io
import subprocess
import sys
import threading

from realsr_tpu.utils.trace import StageTimer

from tests.test_cli import REPO, run_cli


def test_stage_timer_disabled_is_silent():
    t = StageTimer(enabled=False)
    with t.span("x"):
        pass
    buf = io.StringIO()
    t.report(file=buf)
    assert buf.getvalue() == ""


def test_stage_timer_aggregates_across_threads():
    t = StageTimer(enabled=True)

    def work():
        for _ in range(10):
            with t.span("stage"):
                pass

    ths = [threading.Thread(target=work) for _ in range(4)]
    [th.start() for th in ths]
    [th.join() for th in ths]
    with t.span("other"):
        pass
    buf = io.StringIO()
    t.report(file=buf)
    out = buf.getvalue()
    assert "n=40" in out and "stage" in out and "other" in out


def test_cli_trace_env_prints_stage_report(cli_model_dir_trace, tmp_path):
    """REALSR_TPU_TRACE=1 on a real CLI run prints the per-stage table at
    exit; without it, stderr keeps the bare reference contract."""
    import os

    out = tmp_path / "o.png"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["REALSR_TPU_TRACE"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", cli_model_dir_trace[1],
         "-o", str(out), "-m", cli_model_dir_trace[0], "-g", "-1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "realsr-tpu stage timing" in r.stderr
    for stage in ("decode", "dispatch", "encode"):
        assert stage in r.stderr
    # default run: no timing table (reference stderr contract untouched)
    r2 = run_cli(["-i", cli_model_dir_trace[1], "-o", str(out),
                  "-m", cli_model_dir_trace[0], "-g", "-1"])
    assert r2.returncode == 0
    assert "stage timing" not in r2.stderr


def test_cli_profile_env_writes_trace(cli_model_dir_trace, tmp_path):
    """REALSR_TPU_PROFILE=<dir> wraps the run in a jax.profiler trace and
    leaves artifacts in the directory (viewable in xprof/TensorBoard)."""
    import os

    prof = tmp_path / "prof"
    out = tmp_path / "o.png"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["REALSR_TPU_PROFILE"] = str(prof)
    r = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", cli_model_dir_trace[1],
         "-o", str(out), "-m", cli_model_dir_trace[0], "-g", "-1"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    files = [f for _, _, fs in os.walk(prof) for f in fs]
    assert files, "profiler directory is empty"


import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def cli_model_dir_trace(tmp_path_factory, rng):
    from realsr_tpu.ncnn.synth import make_model_dir
    from tests.conftest import TINY_SPEC

    d = tmp_path_factory.mktemp("tracemodels") / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=5)
    img = tmp_path_factory.mktemp("traceimg") / "a.png"
    Image.fromarray(
        np.random.default_rng(3).integers(0, 256, (12, 10, 3), dtype=np.uint8)
    ).save(img)
    return str(d), str(img)
