"""End-to-end tests of the native C++ CLI binary (native/build/realsr-tpu).

The reference ships a single C++ binary (src/main.cpp); these tests run
ours the way a user would — subprocess, real flags, real files — and
check behavioral parity: output pixels (vs the Python CLI on the same
model), gpu-id validation, exe-relative model resolution
(filesystem_utils.h:167-173). Skipped when the binary isn't built
(CI builds it; `cmake -S native -B native/build && cmake --build ...`).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = os.path.join(REPO, "native", "build", "realsr-tpu")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BINARY), reason="native CLI binary not built"
)


def run_binary(args, cwd=None, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    return subprocess.run(
        [BINARY] + args, capture_output=True, text=True, env=env, cwd=cwd,
        # generous: a mesh-mode GSPMD compile on a heavily loaded shared
        # host (this bench env exposes ONE schedulable cpu) was observed
        # to blow a 900 s ceiling when the suite ran concurrently with
        # TPU jobs; passes in ~15 s standalone (r3 full-suite flake)
        timeout=1800,
    )


@pytest.fixture(scope="module")
def dl2k_model_dir(tmp_path_factory):
    """Tiny-spec model in a DF2K-named dir (the CLI keys prepadding on the
    dir name, main.cpp:661-667)."""
    from realsr_tpu.ncnn.synth import make_model_dir
    from tests.conftest import TINY_SPEC

    d = tmp_path_factory.mktemp("native_models") / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=7)
    return str(d)


def test_binary_e2e_matches_python_cli(tmp_path, rng, dl2k_model_dir):
    from PIL import Image

    img = rng.integers(0, 256, (20, 18, 3), dtype=np.uint8)
    inp = tmp_path / "in.png"
    Image.fromarray(img).save(inp)

    out_native = tmp_path / "native.png"
    r = run_binary(
        ["-i", str(inp), "-o", str(out_native), "-m", dl2k_model_dir, "-g", "-1"]
    )
    assert r.returncode == 0, r.stderr
    assert out_native.exists()

    out_py = tmp_path / "py.png"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    rp = subprocess.run(
        [sys.executable, "-m", "realsr_tpu", "-i", str(inp), "-o", str(out_py),
         "-m", dl2k_model_dir, "-g", "-1"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert rp.returncode == 0, rp.stderr
    a = np.asarray(Image.open(out_native))
    b = np.asarray(Image.open(out_py))
    assert a.shape == b.shape == (80, 72, 3)
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.01  # f32 reassociation only


def test_binary_invalid_gpu_id(tmp_path, dl2k_model_dir):
    (tmp_path / "in.png").write_bytes(b"")
    r = run_binary(
        ["-i", str(tmp_path / "in.png"), "-o", str(tmp_path / "o.png"),
         "-m", dl2k_model_dir, "-g", "99"]
    )
    assert r.returncode != 0
    assert "invalid gpu device" in r.stderr  # main.cpp:723-732 contract


def test_binary_exe_relative_model_fallback(tmp_path, rng, dl2k_model_dir):
    """-m with a relative dir that only exists next to the binary resolves
    exe-relative (filesystem_utils.h:167-173)."""
    from PIL import Image

    exe_dir = os.path.dirname(BINARY)
    target = os.path.join(exe_dir, "models-DF2K-testfallback")
    shutil.copytree(dl2k_model_dir, target, dirs_exist_ok=True)
    try:
        img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
        inp = tmp_path / "in.png"
        Image.fromarray(img).save(inp)
        out = tmp_path / "out.png"
        r = run_binary(
            ["-i", str(inp), "-o", str(out), "-m", "models-DF2K-testfallback",
             "-g", "-1"],
            cwd=str(tmp_path),  # cwd does NOT contain the model dir
        )
        assert r.returncode == 0, r.stderr
        assert out.exists()
    finally:
        shutil.rmtree(target, ignore_errors=True)


def test_binary_image_batching_matches_singles(tmp_path, rng, dl2k_model_dir):
    """REALSR_TPU_IMAGE_BATCH drains same-shape queued tasks into one
    device batch (bridge process_batch_async); outputs equal the unbatched
    run's."""
    from PIL import Image

    ind = tmp_path / "in"
    out1 = tmp_path / "o1"
    out2 = tmp_path / "o2"
    for d in (ind, out1, out2):
        d.mkdir()
    for i in range(5):
        img = rng.integers(0, 256, (14, 12, 3), dtype=np.uint8)
        Image.fromarray(img).save(ind / f"{i}.png")
    base = ["-i", str(ind), "-m", dl2k_model_dir, "-g", "-1"]
    r = run_binary(base + ["-o", str(out1)])
    assert r.returncode == 0, r.stderr
    r = run_binary(base + ["-o", str(out2), "-j", "1:1:1"],
                   extra_env={"REALSR_TPU_IMAGE_BATCH": "4"})
    assert r.returncode == 0, r.stderr
    for i in range(5):
        a = np.asarray(Image.open(out1 / f"{i}.png"))
        b = np.asarray(Image.open(out2 / f"{i}.png"))
        d = np.abs(a.astype(int) - b.astype(int))
        assert a.shape == (56, 48, 3)
        assert d.max() <= 1 and (d > 0).mean() < 0.01


def test_binary_mesh_mode_matches_single(tmp_path, rng, dl2k_model_dir):
    """REALSR_TPU_MESH=all through the C++ binary (bridge mesh engine on
    the virtual 8-device mesh): outputs match the single-device run up to
    the standard uint8 quantization tolerance — the GSPMD-partitioned
    program fuses/reduces in a different order than the single-device one
    under the embedded interpreter's thread pool (±1ulp across the
    floor(v+0.5) threshold; same class the batching test allows)."""
    from PIL import Image

    img = rng.integers(0, 256, (20, 18, 3), dtype=np.uint8)
    inp = tmp_path / "in.png"
    Image.fromarray(img).save(inp)
    out1, out2 = tmp_path / "single.png", tmp_path / "mesh.png"
    r = run_binary(["-i", str(inp), "-o", str(out1), "-m", dl2k_model_dir,
                    "-g", "-1"])
    assert r.returncode == 0, r.stderr
    r = run_binary(["-i", str(inp), "-o", str(out2), "-m", dl2k_model_dir],
                   extra_env={"REALSR_TPU_MESH": "all"})
    assert r.returncode == 0, r.stderr
    # the binary prints-and-continues on a per-image failure (exit 0, no
    # output file) — surface its stderr instead of a bare PIL open error
    assert out1.exists() and out2.exists(), r.stderr
    a = np.asarray(Image.open(out1)).astype(int)
    b = np.asarray(Image.open(out2)).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())


def test_binary_precompile_warmup(tmp_path, rng, dl2k_model_dir):
    """REALSR_TPU_PRECOMPILE=1 through the C++ binary AOT-warms the first
    input's programs (bridge.warmup); outputs identical to the lazy run."""
    from PIL import Image

    img = rng.integers(0, 256, (14, 12, 3), dtype=np.uint8)
    inp = tmp_path / "in.png"
    Image.fromarray(img).save(inp)
    out1, out2 = tmp_path / "lazy.png", tmp_path / "warm.png"
    r = run_binary(["-i", str(inp), "-o", str(out1), "-m", dl2k_model_dir,
                    "-g", "-1"])
    assert r.returncode == 0, r.stderr
    r = run_binary(["-i", str(inp), "-o", str(out2), "-m", dl2k_model_dir,
                    "-g", "-1", "-v"],
                   extra_env={"REALSR_TPU_PRECOMPILE": "1"})
    assert r.returncode == 0, r.stderr
    assert "precompiled" in r.stderr
    np.testing.assert_array_equal(
        np.asarray(Image.open(out1)), np.asarray(Image.open(out2))
    )


def test_binary_tta_flag(tmp_path, rng, dl2k_model_dir):
    """-x through the C++ binary: tta_mode reaches the engine via the
    bridge config; output matches the library's TTA engine (up to the
    standard u8 quantization tolerance)."""
    from PIL import Image

    from realsr_tpu.engine import EngineConfig, RealSR

    img = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    inp = tmp_path / "in.png"
    Image.fromarray(img).save(inp)
    out = tmp_path / "tta.png"
    r = run_binary(["-i", str(inp), "-o", str(out), "-m", dl2k_model_dir,
                    "-g", "-1", "-x"])
    assert r.returncode == 0, r.stderr
    eng = RealSR(gpuid=-1, tta_mode=True, config=EngineConfig())
    eng.load(dl2k_model_dir + "/x4.param", dl2k_model_dir + "/x4.bin")
    ref = eng.process(img)
    got = np.asarray(Image.open(out))
    d = np.abs(got.astype(int) - ref.astype(int))
    assert got.shape == (40, 36, 3)
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())


def test_binary_usage_error():
    r = run_binary([])
    assert r.returncode != 0
    assert "Usage" in r.stderr


def test_binary_synthesizes_missing_weights(tmp_path, rng):
    """Out-of-box model experience (VERDICT r2 #4): a DF2K dir with the
    graph but no x4.bin gets placeholder weights synthesized through
    realsr_tpu.modelzoo — same path as the Python CLI."""
    from PIL import Image

    from realsr_tpu.ncnn.synth import make_model_dir
    from tests.conftest import TINY_SPEC

    d = tmp_path / "models-DF2K"
    make_model_dir(str(d), TINY_SPEC, seed=7)
    os.remove(d / "x4.bin")

    img = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    inp = tmp_path / "in.png"
    Image.fromarray(img).save(inp)
    out = tmp_path / "out.png"
    r = run_binary(["-i", str(inp), "-o", str(out), "-m", str(d), "-g", "-1"])
    assert r.returncode == 0, r.stderr
    assert "placeholder weights" in r.stderr
    assert out.exists() and os.path.getsize(d / "x4.bin") > 0
