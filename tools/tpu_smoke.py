#!/usr/bin/env python3
"""On-hardware smoke validation of the engine's flagship guarantees.

The test suite runs on the CPU backend (virtual mesh); this tool re-checks
the core invariants on the REAL accelerator and the production (Pallas bf16)
path, where Mosaic — not XLA:CPU — generates the code:

  1. band-streamed output is BIT-IDENTICAL to full-image output,
  2. process_batch == per-image process (same-shape stack sharing chunks),
  3. the committed f32 golden is reproduced within the storage mode's
     documented PSNR band (goldens/README.md),
  4. TTA on a D4-SYMMETRIC (constant) image equals non-TTA up to one
     quantization step — all 8 dihedral variants are identical there, so
     the ensemble mean must reproduce the single forward; on a random
     image the ensemble must actually differ (it is averaging 8 genuinely
     different passes). Exact D4 mean semantics are unit-tested on CPU;
     this validates the batched TTA path through Mosaic codegen.

Run: ``python tools/tpu_smoke.py [--tta]``. Uses the golden pinned config
(tile 48) so warm hosts reuse the persistent compile cache.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tta", action="store_true", help="include the TTA check")
    args = ap.parse_args()

    import numpy as np

    import make_goldens as G
    from psnr import psnr
    from realsr_tpu.engine import EngineConfig, RealSR

    mdir = G.golden_model_dir()
    eng = RealSR(gpuid=0, config=EngineConfig(tilesize=G.TILESIZE))
    eng.load(mdir + "/x4.param", mdir + "/x4.bin")
    dev = eng.device
    print(f"device: {dev.platform} / variant {eng.variant} / "
          f"storage {np.dtype(eng.storage_dtype).name}")
    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        failures += 0 if ok else 1

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (150, 130, 4), dtype=np.uint8)  # ragged+alpha

    t0 = time.perf_counter()
    full = eng.process(img)
    print(f"full-image run {time.perf_counter() - t0:.1f}s (incl. compile)")

    t0 = time.perf_counter()
    banded = eng.process_banded(img, band_tile_rows=1)
    check(
        "band-stream bit-identity",
        bool(np.array_equal(full, banded)),
        f"({time.perf_counter() - t0:.1f}s)",
    )

    imgs = [rng.integers(0, 256, (60, 60, 3), dtype=np.uint8) for _ in range(3)]
    singles = [eng.process(i) for i in imgs]
    batched = eng.process_batch(imgs)
    ok = all(np.array_equal(a, b) for a, b in zip(singles, batched))
    check("process_batch == singles", ok)

    gpath = os.path.join(G.GOLDEN_DIR, "0_crop80_synth0_t48_f32.png")
    if os.path.exists(gpath) and os.path.exists(G.REF_IMAGE):
        from PIL import Image

        golden = np.asarray(Image.open(gpath))
        out = eng.process(G.golden_input())
        db = psnr(golden, out)
        # goldens/README.md bands (iid golden weights): mixed ~37.1 dB,
        # bf16 ~32, f16 ~49.6, f32 exact
        st = np.dtype(eng.storage_dtype).name
        op = np.dtype(eng.op_dtype).name
        mode = st if st == op else "mixed"
        floor = {
            "mixed": 33.0, "bfloat16": 28.0, "float16": 45.0, "float32": 60.0,
        }[mode]
        check("golden PSNR in band", db >= floor, f"({db:.2f} dB >= {floor})")

    if args.tta:
        tta = RealSR(gpuid=0, tta_mode=True,
                     config=EngineConfig(tilesize=G.TILESIZE))
        tta.load(mdir + "/x4.param", mdir + "/x4.bin")
        # constant image is invariant under all 8 dihedral transforms, so
        # the ensemble mean must equal the plain forward (±1 u8 step for
        # the x0.125 averaging of 8 bit-identical f32 values)
        const = np.full((60, 60, 3), 137, np.uint8)
        d = np.abs(
            tta.process(const).astype(int) - eng.process(const).astype(int)
        )
        check("tta == plain on D4-symmetric input", int(d.max()) <= 1,
              f"(max |diff| {int(d.max())})")
        d2 = np.abs(
            tta.process(imgs[0]).astype(int) - singles[0].astype(int)
        ).mean()
        check("tta ensembles on random input", d2 > 0.0,
              f"(mean |diff| {d2:.2f}; synthetic weights are not "
              f"equivariant, large values are expected)")

    print(f"{'OK' if not failures else 'FAILURES: %d' % failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
