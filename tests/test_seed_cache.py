"""tools/seed_cache.py: build / install / info round-trip on the CPU
backend with the tiny synth model (the release-tarball cold-start story —
VERDICT r4 weak #3's "ship a seed cache keyed by device kind").
"""

import io
import json
import os
import subprocess
import sys
import tarfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "seed_cache.py")


def _run(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, TOOL, *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


@pytest.fixture(scope="module")
def seed_tarball(tmp_path_factory):
    """Build once; reused by the install/info tests below."""
    from realsr_tpu.ncnn.synth import make_model_dir

    from conftest import TINY_SPEC

    # the CLI validates the dir basename like the reference does
    d = tmp_path_factory.mktemp("seedmodel") / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=7)
    out = tmp_path_factory.mktemp("seed") / "seed.tar.gz"
    r = _run(["build", str(out), "-m", str(d), "--sizes", "96x64"])
    assert r.returncode == 0, r.stderr[-2000:]
    manifest = json.loads(r.stdout.strip().splitlines()[-1])
    manifest["model_dir_abs"] = str(d)  # test-local, not part of the tool
    return str(out), manifest


def test_build_captures_programs(seed_tarball):
    out, manifest = seed_tarball
    assert os.path.exists(out)
    assert manifest["entries"] > 0
    assert manifest["bytes"] > 0
    assert manifest["sizes"][0]["programs"] > 0
    assert manifest["backend"] == "cpu"
    assert len(manifest["fingerprint"]) == 10


def test_info(seed_tarball):
    out, manifest = seed_tarball
    r = _run(["info", out])
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout)
    assert info["fingerprint"] == manifest["fingerprint"]
    assert info["files"] >= manifest["entries"]


def test_install_matching_host(seed_tarball, tmp_path):
    out, manifest = seed_tarball
    base = tmp_path / "cachebase"
    r = _run(["install", out, "--cache-base", str(base)])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout)
    # built by a subprocess with the same env -> fingerprints match and
    # the entries land in the subdir the engine will read
    assert res["fingerprint_match"] is True
    sub = base / manifest["fingerprint"]
    assert sub.is_dir()
    n_files = sum(len(fs) for _, _, fs in os.walk(sub))
    assert n_files >= manifest["entries"]
    assert "WARNING" not in r.stderr


def test_seeded_process_hits_every_program(seed_tarball, tmp_path):
    """The payoff: a FRESH process pointed at an installed seed compiles
    nothing — every program of the seeded shape is a persistent-cache
    hit. Regression for the cache-key location bug: jax embeds the
    XLA:GPU sub-cache paths (inside the cache dir) into every cache key
    by default, so a seed built in a temp dir could never hit under a
    different runtime base; engine._enable_compilation_cache disables
    those sub-caches to make keys relocatable."""
    from PIL import Image
    import numpy as np

    out, manifest = seed_tarball
    base = tmp_path / "seededbase"
    r = _run(["install", out, "--cache-base", str(base)])
    assert r.returncode == 0, r.stderr[-2000:]

    png = tmp_path / "in.png"
    rng = np.random.default_rng(3)
    Image.fromarray(
        (rng.random((64, 96, 3)) * 255).astype("uint8")
    ).save(png)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["REALSR_TPU_CACHE"] = str(base)
    env["JAX_LOG_COMPILES"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", str(png),
         "-o", str(tmp_path / "out.png"), "-s", "4",
         "-m", manifest["model_dir_abs"]],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for prog in ("jit_prep", "jit_extract_chunk", "jit_compute_chunk",
                 "jit_scatter_chunk"):
        assert f"cache hit for '{prog}'" in r.stderr, (
            prog + " missed the seed:\n" + r.stderr[-3000:])


def test_seed_hits_for_different_weights(seed_tarball, tmp_path):
    """A seed built with ONE x4.bin covers ANY other weights of the same
    architecture: the compute program takes params as a runtime argument
    (engine.compute_chunk), so the cache key depends only on shapes and
    dtypes. Before the round-5 refactor the closed-over params tree baked
    the weight bytes into the key and this test's run would recompile."""
    from PIL import Image
    import numpy as np

    from realsr_tpu.ncnn.synth import make_model_dir

    from conftest import TINY_SPEC

    out, manifest = seed_tarball
    base = tmp_path / "xwbase"
    r = _run(["install", out, "--cache-base", str(base)])
    assert r.returncode == 0, r.stderr[-2000:]

    # same architecture, different weights than the seed was built with
    other = tmp_path / "models-DF2K_JPEG"
    make_model_dir(str(other), TINY_SPEC, seed=4242)

    png = tmp_path / "in.png"
    rng = np.random.default_rng(5)
    Image.fromarray(
        (rng.random((64, 96, 3)) * 255).astype("uint8")
    ).save(png)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["REALSR_TPU_CACHE"] = str(base)
    env["JAX_LOG_COMPILES"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", str(png),
         "-o", str(tmp_path / "out.png"), "-s", "4",
         "-m", str(other)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for prog in ("jit_prep", "jit_extract_chunk", "jit_compute_chunk",
                 "jit_scatter_chunk"):
        assert f"cache hit for '{prog}'" in r.stderr, (
            prog + " recompiled for new weights:\n" + r.stderr[-3000:])


def test_install_refuses_path_traversal(tmp_path):
    evil = tmp_path / "evil.tar.gz"
    with tarfile.open(evil, "w:gz") as tar:
        mdata = json.dumps({"fingerprint": "aaaaaaaaaa"}).encode()
        mi = tarfile.TarInfo("aaaaaaaaaa/seed_cache_manifest.json")
        mi.size = len(mdata)
        tar.addfile(mi, io.BytesIO(mdata))
        ti = tarfile.TarInfo("../outside")
        ti.size = 1
        tar.addfile(ti, io.BytesIO(b"x"))
    r = _run(["install", str(evil), "--cache-base", str(tmp_path / "b")])
    assert r.returncode != 0
    assert "unsafe member path" in (r.stdout + r.stderr)
    assert not (tmp_path / "outside").exists()


def test_install_refuses_symlink_members(tmp_path):
    """A symlink member passes a realpath check at inspection time (its
    target does not exist yet) but would redirect a later member's write
    outside the base on the py<3.12 plain-extractall fallback — refuse
    links outright (code review round 5)."""
    evil = tmp_path / "evil_link.tar.gz"
    outside = tmp_path / "outside_dir"
    outside.mkdir()
    with tarfile.open(evil, "w:gz") as tar:
        mdata = json.dumps({"fingerprint": "aaaaaaaaaa"}).encode()
        mi = tarfile.TarInfo("aaaaaaaaaa/seed_cache_manifest.json")
        mi.size = len(mdata)
        tar.addfile(mi, io.BytesIO(mdata))
        li = tarfile.TarInfo("aaaaaaaaaa/x")
        li.type = tarfile.SYMTYPE
        li.linkname = str(outside)
        tar.addfile(li)
        ti = tarfile.TarInfo("aaaaaaaaaa/x/payload")
        ti.size = 1
        tar.addfile(ti, io.BytesIO(b"x"))
    r = _run(["install", str(evil), "--cache-base", str(tmp_path / "b")])
    assert r.returncode != 0
    assert "non-file member" in (r.stdout + r.stderr)
    assert not (outside / "payload").exists()
