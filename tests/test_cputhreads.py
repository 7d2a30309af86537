"""-j → XLA:CPU intra-op pool mapping (utils.cputhreads).

The reference gives its CPU engine ``jobs_proc`` OpenMP threads
(src/main.cpp:734-746); XLA:CPU sizes its pool from the schedulable-cpu
count at client creation, which configure_cpu_threads bounds via the
process affinity mask."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_returns_false_when_backend_initialized():
    import jax

    jax.devices()  # pool already exists in the test process
    from realsr_tpu.utils.cputhreads import configure_cpu_threads

    assert configure_cpu_threads(2) is False


def test_notice_message(capsys):
    from realsr_tpu.utils.cputhreads import notice_cpu_threads_ignored

    notice_cpu_threads_ignored()
    assert "does not tune CPU inference" in capsys.readouterr().err


def test_preinit_subprocess_applies_and_restores():
    """In a fresh process the bound applies before backend init and the
    affinity mask is restored afterward (codec threads keep the machine)."""
    code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
before = os.sched_getaffinity(0)
from realsr_tpu.utils.cputhreads import configure_cpu_threads
ok = configure_cpu_threads(1)
after = os.sched_getaffinity(0)
assert ok is True, "pre-init bound must apply"
assert after == before, "affinity mask must be restored"
assert len(jax.devices("cpu")) >= 1
print("OK")
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
