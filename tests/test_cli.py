"""CLI tests: flag surface, validation exit codes, end-to-end runs.

Runs the CLI in-process (arg handling) and as a subprocess (end-to-end),
matching the reference's behaviors at src/main.cpp:419-673.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from realsr_tpu.cli import main, parse_int_array, parse_jobs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "realsr_tpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


# ---- pure arg parsing ---------------------------------------------------


def test_parse_int_array():
    assert parse_int_array("0,0,0") == [0, 0, 0]
    assert parse_int_array("-1") == [-1]
    assert parse_int_array("2:2") == [2]  # atoi semantics


def test_parse_jobs():
    assert parse_jobs("1:2:2") == (1, [2], 2)
    assert parse_jobs("1:2,2,2:4") == (1, [2, 2, 2], 4)


def test_missing_args_prints_usage(capsys):
    assert main([]) == -1
    assert "Usage:" in capsys.readouterr().err


def test_invalid_scale(capsys):
    assert main(["-i", "a.png", "-o", "b.png", "-s", "2"]) == -1
    assert "invalid scale argument" in capsys.readouterr().err


def test_invalid_tilesize(capsys):
    assert main(["-i", "a.png", "-o", "b.png", "-t", "16"]) == -1
    assert "invalid tilesize argument" in capsys.readouterr().err


def test_tilesize_gpu_mismatch(capsys):
    assert main(["-i", "a", "-o", "b.png", "-t", "0,0", "-g", "0"]) == -1
    assert "invalid tilesize argument" in capsys.readouterr().err


def test_invalid_output_ext(capsys):
    assert main(["-i", "a.png", "-o", "b.tiff"]) == -1
    assert "invalid outputpath extension type" in capsys.readouterr().err


def test_unknown_model_dir(capsys, tmp_path):
    src = tmp_path / "in.png"
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(src)
    assert main(["-i", str(src), "-o", str(tmp_path / "o.png"), "-m", "models-XYZ"]) == -1
    assert "unknown model dir type" in capsys.readouterr().err


def test_mixed_file_dir(capsys, tmp_path):
    src = tmp_path / "in.png"
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(src)
    assert main(["-i", str(src), "-o", str(tmp_path)]) == -1
    assert "must be either file or directory" in capsys.readouterr().err


def test_invalid_jobs(capsys):
    assert main(["-i", "a.png", "-o", "b.png", "-j", "0:2:2"]) == -1
    assert "invalid thread count argument" in capsys.readouterr().err


# ---- end-to-end (subprocess, CPU backend, tiny synth model) -------------


@pytest.fixture(scope="module")
def cli_model_dir(tmp_path_factory):
    from realsr_tpu.ncnn.synth import make_model_dir
    from tests.conftest import TINY_SPEC

    d = tmp_path_factory.mktemp("climodels") / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=5)
    return str(d)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    rng = np.random.default_rng(9)
    d = tmp_path_factory.mktemp("imgs")
    for name, shape in [("a.png", (17, 23, 3)), ("b.png", (8, 9, 3))]:
        Image.fromarray(rng.integers(0, 256, shape, np.uint8)).save(d / name)
    Image.fromarray(rng.integers(0, 256, (10, 11, 4), np.uint8)).save(d / "c.png")
    return str(d)


def test_single_file_e2e(cli_model_dir, img_dir, tmp_path):
    out = tmp_path / "out.png"
    r = run_cli(
        ["-i", f"{img_dir}/a.png", "-o", str(out), "-m", cli_model_dir, "-g", "-1", "-v"]
    )
    assert r.returncode == 0, r.stderr
    assert "done" in r.stderr
    arr = np.asarray(Image.open(out))
    assert arr.shape == (68, 92, 3)


def test_directory_e2e_with_alpha_and_formats(cli_model_dir, img_dir, tmp_path):
    outdir = tmp_path / "out"
    outdir.mkdir()
    r = run_cli(
        ["-i", img_dir, "-o", str(outdir), "-m", cli_model_dir, "-g", "-1",
         "-f", "webp", "-j", "2:2:2"]
    )
    assert r.returncode == 0, r.stderr
    names = sorted(os.listdir(outdir))
    assert names == ["a.webp", "b.webp", "c.webp"]
    arr = np.asarray(Image.open(outdir / "c.webp"))
    assert arr.shape == (40, 44, 4)  # alpha survives lossless webp


def test_corrupt_model_clean_error(cli_model_dir, img_dir, tmp_path):
    """Truncated .bin / garbage .param exit with a clean diagnostic, not a
    traceback (reference: ncnn load failure path exits with a message)."""
    import shutil

    bad = tmp_path / "models-DF2K"
    bad.mkdir()
    shutil.copy(f"{cli_model_dir}/x4.param", bad / "x4.param")
    (bad / "x4.bin").write_bytes(open(f"{cli_model_dir}/x4.bin", "rb").read()[:100])
    r = run_cli(["-i", f"{img_dir}/a.png", "-o", str(tmp_path / "o.png"),
                 "-m", str(bad), "-g", "-1"])
    assert r.returncode != 0
    assert "load model failed" in r.stderr and "Traceback" not in r.stderr

    (bad / "x4.param").write_text("garbage\n")
    shutil.copy(f"{cli_model_dir}/x4.bin", bad / "x4.bin")
    r = run_cli(["-i", f"{img_dir}/a.png", "-o", str(tmp_path / "o.png"),
                 "-m", str(bad), "-g", "-1"])
    assert r.returncode != 0
    assert "load model failed" in r.stderr and "not an ncnn" in r.stderr


def test_precompile_warmup_env(cli_model_dir, img_dir, tmp_path):
    """REALSR_TPU_PRECOMPILE=1 AOT-warms the first image's programs before
    the pipeline starts; outputs identical to the lazy-compile run."""
    out1, out2 = tmp_path / "lazy", tmp_path / "warm"
    out1.mkdir(), out2.mkdir()
    base = ["-i", img_dir, "-o", None, "-m", cli_model_dir, "-g", "-1", "-v"]
    r = run_cli([a if a else str(out1) for a in base])
    assert r.returncode == 0, r.stderr
    env_args = [a if a else str(out2) for a in base]
    import subprocess as sp

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["REALSR_TPU_PRECOMPILE"] = "1"
    r2 = sp.run(
        [sys.executable, "-m", "realsr_tpu", *env_args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r2.returncode == 0, r2.stderr
    assert "precompiled" in r2.stderr
    for n in os.listdir(out1):
        a = np.asarray(Image.open(out1 / n))
        b = np.asarray(Image.open(out2 / n))
        np.testing.assert_array_equal(a, b)


def test_multi_device_work_stealing(cli_model_dir, img_dir, tmp_path):
    """-g 0,1: one engine per device id pulling from the shared queue
    (reference multi-GPU mode, main.cpp:778-791) — runs on two of the
    virtual CPU devices; outputs match the single-device run."""
    out1, out2 = tmp_path / "one", tmp_path / "two"
    out1.mkdir()
    out2.mkdir()
    r = run_cli(["-i", img_dir, "-o", str(out1), "-m", cli_model_dir,
                 "-g", "-1"])
    assert r.returncode == 0, r.stderr
    r = run_cli(["-i", img_dir, "-o", str(out2), "-m", cli_model_dir,
                 "-g", "0,1", "-j", "1:1,1:1"])
    assert r.returncode == 0, r.stderr
    for name in os.listdir(out1):
        a = np.asarray(Image.open(out1 / name))
        b = np.asarray(Image.open(out2 / name))
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 0.01


def test_mesh_mode_cli(cli_model_dir, img_dir, tmp_path):
    """REALSR_TPU_MESH=all: one engine sharding tile batches over the
    8-device virtual mesh, from the CLI surface; outputs identical to the
    single-device run (engine-level mesh==single equality holds on the
    same backend, tests/test_sharding.py)."""
    out1, out2 = tmp_path / "single.png", tmp_path / "mesh.png"
    r = run_cli(["-i", f"{img_dir}/a.png", "-o", str(out1),
                 "-m", cli_model_dir, "-g", "-1"])
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["REALSR_TPU_MESH"] = "all"
    r2 = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", f"{img_dir}/a.png",
         "-o", str(out2), "-m", cli_model_dir, "-v"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r2.returncode == 0, r2.stderr
    assert "mesh mode: 8 devices" in r2.stderr
    np.testing.assert_array_equal(
        np.asarray(Image.open(out1)), np.asarray(Image.open(out2))
    )
    # invalid index list
    env["REALSR_TPU_MESH"] = "0,99"
    r3 = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", f"{img_dir}/a.png",
         "-o", str(out2), "-m", cli_model_dir],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r3.returncode != 0 and "invalid REALSR_TPU_MESH" in r3.stderr


def test_alpha_jpg_redirect(cli_model_dir, img_dir, tmp_path):
    out = tmp_path / "out.jpg"
    r = run_cli(
        ["-i", f"{img_dir}/c.png", "-o", str(out), "-m", cli_model_dir, "-g", "-1"]
    )
    assert r.returncode == 0, r.stderr
    assert "has alpha channel" in r.stderr
    assert os.path.exists(str(out) + ".png")  # main.cpp:279-288 semantics


def test_shard_identity_from_jax_distributed(tmp_path, monkeypatch):
    """Without REALSR_TPU_SHARD env, an initialized jax.distributed runtime
    supplies process_index/process_count as the shard identity."""
    import numpy as np

    from realsr_tpu.io.codecs import encode_image
    from realsr_tpu.ncnn.synth import make_model_dir
    from tests.conftest import TINY_SPEC

    ind, outd = tmp_path / "in", tmp_path / "out"
    ind.mkdir(), outd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        encode_image(str(ind / f"{i}.png"),
                     rng.integers(0, 256, (6, 5, 3), dtype=np.uint8))
    mdir = tmp_path / "m-models-DF2K"
    make_model_dir(str(mdir), TINY_SPEC, seed=0)

    import jax
    from jax._src import distributed as jdist

    from realsr_tpu import cli

    jax.devices()  # init the backend BEFORE faking the distributed client
    monkeypatch.delenv("REALSR_TPU_NUM_SHARDS", raising=False)
    monkeypatch.setattr(jdist.global_state, "client", object())
    # the CLI must read the state directly (NOT jax.process_index(),
    # which would initialize the backend before platform pinning)
    monkeypatch.setattr(jdist.global_state, "process_id", 1)
    monkeypatch.setattr(jdist.global_state, "num_processes", 2)
    rc = cli.main(["-i", str(ind), "-o", str(outd), "-g", "-1",
                   "-m", str(mdir), "-t", "32"])
    assert rc == 0
    # process 1 of 2 handles the odd-indexed files only
    assert sorted(os.listdir(outd)) == ["1.png", "3.png"]


def test_usage_exit_code(cli_model_dir):
    r = run_cli(["-h"])
    assert r.returncode == 255
    assert "Usage:" in r.stderr


def test_multihost_file_shard(tmp_path, monkeypatch, capsys):
    """REALSR_TPU_SHARD/NUM_SHARDS split the directory file list (the
    multi-host DCN mode: hosts never communicate, SURVEY.md §5)."""
    import numpy as np

    from realsr_tpu.io.codecs import encode_image
    from realsr_tpu.ncnn.synth import make_model_dir
    from tests.conftest import TINY_SPEC

    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    outd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        encode_image(
            str(ind / f"{i}.png"),
            rng.integers(0, 256, (6, 5, 3), dtype=np.uint8),
        )
    mdir = tmp_path / "m-models-DF2K"
    make_model_dir(str(mdir), TINY_SPEC, seed=0)

    from realsr_tpu import cli

    monkeypatch.setenv("REALSR_TPU_NUM_SHARDS", "2")
    monkeypatch.setenv("REALSR_TPU_SHARD", "1")
    rc = cli.main(
        ["-i", str(ind), "-o", str(outd), "-g", "-1", "-m", str(mdir), "-t", "32"]
    )
    assert rc == 0
    got = sorted(p.name for p in outd.iterdir())
    assert got == ["1.png", "3.png"]  # shard 1 of 2 over the sorted listing


def test_multihost_two_process_e2e(cli_model_dir, tmp_path):
    """VERDICT r2 #7: REAL two-process sharding e2e — launch two CLI
    processes with REALSR_TPU_SHARD=0/1 over one directory and assert
    their output sets are disjoint, complete, and byte-identical to a
    single-process run (multi-host DCN contract, SURVEY.md §5)."""
    rng = np.random.default_rng(21)
    ind = tmp_path / "in"
    ind.mkdir()
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 256, (9, 8, 3), np.uint8)
        ).save(ind / f"{i}.png")

    def launch(outdir, shard=None):
        outdir.mkdir()
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        if shard is not None:
            env["REALSR_TPU_SHARD"] = str(shard)
            env["REALSR_TPU_NUM_SHARDS"] = "2"
        else:
            env.pop("REALSR_TPU_SHARD", None)
            env.pop("REALSR_TPU_NUM_SHARDS", None)
        return subprocess.Popen(
            [sys.executable, "-m", "realsr_tpu", "-i", str(ind), "-o",
             str(outdir), "-m", cli_model_dir, "-g", "-1", "-t", "32"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )

    d0, d1, dref = tmp_path / "s0", tmp_path / "s1", tmp_path / "ref"
    procs = [launch(d0, 0), launch(d1, 1), launch(dref)]
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()

    got0 = {p.name for p in d0.iterdir()}
    got1 = {p.name for p in d1.iterdir()}
    ref = {p.name for p in dref.iterdir()}
    assert got0 and got1 and not (got0 & got1)  # disjoint
    assert got0 | got1 == ref  # complete
    for name in ref:  # byte-identical to the single-process run
        src = d0 if name in got0 else d1
        assert (src / name).read_bytes() == (dref / name).read_bytes()


def test_cpu_jobs_thread_notice(cli_model_dir, img_dir, tmp_path, capsys):
    """-j proc counts on CPU either bound the XLA intra-op pool or print
    an explicit deviation notice — never silently ignored (reference gives
    the CPU engine OpenMP num_threads, main.cpp:734-746)."""
    import jax

    jax.devices()  # ensure the backend is initialized in this process
    out = tmp_path / "o.png"
    rc = main(["-i", f"{img_dir}/b.png", "-o", str(out), "-m", cli_model_dir,
               "-g", "-1", "-j", "1:3:1"])
    err = capsys.readouterr().err
    assert rc == 0
    # in-process the pool pre-exists, so the explicit notice must appear
    assert "does not tune CPU inference" in err


def test_zero_setup_default_model(tmp_path):
    """VERDICT r2 #4 Done-criterion: `realsr-tpu -i a.png -o b.png` works
    from a fresh clone with the default -m (committed graph + first-use
    weight synthesis, full 999-layer RRDBNet)."""
    rng = np.random.default_rng(3)
    inp = tmp_path / "in.png"
    Image.fromarray(rng.integers(0, 256, (12, 12, 3), np.uint8)).save(inp)
    out = tmp_path / "out.png"
    r = run_cli(["-i", str(inp), "-o", str(out), "-g", "-1"])
    assert r.returncode == 0, r.stderr
    assert np.asarray(Image.open(out)).shape == (48, 48, 3)
