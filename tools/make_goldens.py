"""(Re)generate committed golden outputs under goldens/.

Golden convention (see goldens/README.md):

- ``goldens/0_crop80_synth0_t48_f32.png`` — the engine's f32 reference
  output for the PINNED config: input = center 80x80 crop of
  /root/reference/images/0.png (the reference project's own sample,
  README.md:102-130), graph = the real models-DF2K/x4.param (999 layers),
  weights = synthetic seed 0 (the snapshot ships no real weights,
  /root/reference/.MISSING_LARGE_BLOBS), storage float32, variant dense,
  tilesize 48 (forces a 2x2 tile grid + merge), prepadding 10.

  Tiling is part of the config: the RRDBNet receptive field exceeds the
  halo of 10, so a different tile size produces a materially different
  image — comparisons must reproduce the tiling exactly.

- ``goldens/ref/`` — TRUE reference outputs (made by the reference binary
  with real weights). Committing ``goldens/ref/0.png`` together with a
  real ``x4.bin`` (path via REALSR_TPU_REF_BIN or the reference tree)
  auto-activates the real-parity test in tests/test_golden.py.

Run: ``python tools/make_goldens.py`` (CPU; ~30 s).
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
GOLDEN_DIR = os.path.join(REPO, "goldens")
REF_PARAM = "/root/reference/models/models-DF2K/x4.param"
REF_IMAGE = "/root/reference/images/0.png"

# the pinned golden config — tests and bench must reproduce this exactly
CROP = 80
TILESIZE = 48
SEED = 0


def golden_model_dir(cache: str = "/tmp/realsr_tpu_golden_model") -> str:
    """Real DF2K graph + synthetic seed-0 weights, cached on disk."""
    from realsr_tpu.ncnn.bin import write_weights
    from realsr_tpu.ncnn.param import parse_param_file
    from realsr_tpu.ncnn.synth import synth_weights

    d = os.path.join(cache, "models-DF2K")
    if not (os.path.exists(d + "/x4.param") and os.path.exists(d + "/x4.bin")):
        os.makedirs(d, exist_ok=True)
        shutil.copy(REF_PARAM, d + "/x4.param")
        graph = parse_param_file(REF_PARAM)
        write_weights(graph, synth_weights(graph, seed=SEED), d + "/x4.bin")
    return d


def golden_input() -> "np.ndarray":
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(REF_IMAGE).convert("RGB"))
    h, w, _ = img.shape
    return img[
        h // 2 - CROP // 2 : h // 2 + CROP // 2,
        w // 2 - CROP // 2 : w // 2 + CROP // 2,
    ].copy()


def run_engine(storage: str, variant: str, tta: bool = False) -> "np.ndarray":
    from realsr_tpu.engine import EngineConfig, RealSR

    d = golden_model_dir()
    eng = RealSR(
        gpuid=-1 if variant == "dense" else 0,
        tta_mode=tta,
        config=EngineConfig(tilesize=TILESIZE, storage=storage, variant=variant),
    )
    eng.load(d + "/x4.param", d + "/x4.bin")
    return eng.process(golden_input())


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out = run_engine("float32", "dense")
    path = os.path.join(GOLDEN_DIR, "0_crop80_synth0_t48_f32.png")
    Image.fromarray(out).save(path)
    print(f"wrote {path} {out.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
