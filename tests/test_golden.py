"""Golden-output regression + numerics parity (SURVEY.md §4, VERDICT r1 #2).

Runs the reference project's own sample (/root/reference/images/0.png,
README.md:102-130) through the engine on the REAL 999-layer DF2K graph and
compares against the committed golden (goldens/0_crop80_synth0_t48_f32.png,
f32 generic config — see goldens/README.md for the pinned config).

The real-weights parity test activates automatically when a real x4.bin
and a reference-produced output land (the snapshot ships neither,
/root/reference/.MISSING_LARGE_BLOBS).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import make_goldens as G  # noqa: E402
from psnr import bit_exact_rate, compare, psnr  # noqa: E402

GOLDEN = os.path.join(REPO, "goldens", "0_crop80_synth0_t48_f32.png")
REF_OUT = os.path.join(REPO, "goldens", "ref", "0.png")


def _resolve_ref_bin() -> str:
    """Find real DF2K weights in ANY form: an explicit env path, an
    x4.bin (reference tree or this repo's models dir), or a public
    PyTorch/npz/safetensors checkpoint dropped into models/models-DF2K/ —
    converted on the fly via tools/import_esrgan.py so the parity test
    lights up without code changes (VERDICT r3 next #3)."""
    env = os.environ.get("REALSR_TPU_REF_BIN")
    if env:
        return env
    mdir = os.path.join(REPO, "models", "models-DF2K")
    for cand in (
        "/root/reference/models/models-DF2K/x4.bin",
        os.path.join(mdir, "x4.bin"),
    ):
        if os.path.exists(cand):
            return cand
    import glob

    for ext in (".pth", ".pt", ".npz", ".safetensors"):
        for ckpt in sorted(glob.glob(os.path.join(mdir, "*" + ext))):
            out = os.path.join("/tmp", "realsr_imported_x4.bin")
            try:
                import import_esrgan

                import_esrgan.convert(
                    os.path.join(mdir, "x4.param"), ckpt, out, verbose=False
                )
                return out
            except Exception as exc:  # unconvertible file -> keep skipping
                print(f"checkpoint {ckpt} did not convert: {exc}")
    return "/root/reference/models/models-DF2K/x4.bin"


REF_BIN = _resolve_ref_bin()

needs_sample = pytest.mark.skipif(
    not os.path.exists(G.REF_IMAGE), reason="reference sample image missing"
)


def _load(path):
    from PIL import Image

    return np.asarray(Image.open(path))


def test_psnr_tool():
    a = np.zeros((4, 4), np.uint8)
    assert psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0] = 16  # MSE = 256/16 = 16 -> 10*log10(255^2/16)
    assert abs(psnr(a, b) - 10 * np.log10(255.0**2 / 16.0)) < 1e-9
    assert bit_exact_rate(a, b) == 15 / 16
    with pytest.raises(ValueError):
        psnr(a, np.zeros((5, 4), np.uint8))


@needs_sample
def test_golden_regression_f32():
    """f32 engine output on the pinned config must match the committed
    golden — locks the whole stack (parser, weights synth, graph match,
    tiling, merge, rounding) against regressions."""
    golden = _load(GOLDEN)
    out = G.run_engine("float32", "dense")
    stats = compare(golden, out)
    print(f"golden f32 regression: {stats}")
    # identical on the generating machine; >=50 dB absorbs cross-machine
    # XLA:CPU reassociation while still far beyond visible difference
    assert stats["psnr_db"] >= 50.0, stats


@needs_sample
def test_fp16_storage_close_to_f32():
    """storage=float16 (the reference's GPU numerics mode,
    src/realsr.cpp:43-47) must stay close to f32 — measured 49.6 dB with
    synthetic weights (goldens/README.md)."""
    golden = _load(GOLDEN)
    out = G.run_engine("float16", "dense")
    stats = compare(golden, out)
    print(f"fp16 vs f32 golden: {stats}")
    assert stats["psnr_db"] >= 45.0, stats


@needs_sample
def test_bf16_storage_sanity():
    """bfloat16 (TPU throughput default) numerics floor — measured 32 dB
    with synthetic weights (random weights amplify storage noise; trained
    weights land much closer). Guards against gross bf16-path breakage."""
    golden = _load(GOLDEN)
    out = G.run_engine("bfloat16", "dense")
    stats = compare(golden, out)
    print(f"bf16 vs f32 golden: {stats}")
    assert stats["psnr_db"] >= 28.0, stats


@pytest.mark.skipif(
    not (os.path.exists(REF_BIN) and os.path.exists(REF_OUT)),
    reason="real x4.bin / reference output not present "
    "(auto-activates when they land — goldens/README.md)",
)
def test_real_weights_parity_50db():
    """THE north-star check (BASELINE.json): engine with REAL weights vs
    the reference binary's own output, >= 50 dB. fp16 storage = the
    reference's GPU numerics mode."""
    from realsr_tpu.engine import EngineConfig, RealSR

    ref = _load(REF_OUT)
    eng = RealSR(
        gpuid=-1,
        config=EngineConfig(
            tilesize=G.TILESIZE, storage="float16", variant="dense"
        ),
    )
    eng.load(G.REF_PARAM, REF_BIN)
    from PIL import Image

    img = np.asarray(Image.open(G.REF_IMAGE).convert("RGB"))
    out = eng.process(img.copy())
    stats = compare(ref, out)
    print(f"REAL-WEIGHTS parity vs reference output: {stats}")
    assert stats["psnr_db"] >= 50.0, stats
