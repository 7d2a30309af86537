"""TTA throughput sweep (VERDICT r1 #9): measure MP/s in TTA mode across
tile sizes and TTA chunk granules (tiles per dispatch; the conv batch is
granule x 8 dihedral variants).

The bar: the reference runs 8 sequential extractor submits per tile
(src/realsr.cpp:302-318); round-1 shipped 3.75 MP/s (6.9x cost for 8x
compute). Run on the TPU: ``python tools/tta_sweep.py``.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    import numpy as np

    from realsr_tpu.engine import EngineConfig, RealSR

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_goldens as G

    mdir = G.golden_model_dir()
    size = int(os.environ.get("REALSR_TTA_SWEEP_SIZE", "1024"))
    reps = int(os.environ.get("REALSR_TTA_SWEEP_REPS", "3"))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)

    tiles = tuple(
        int(t) for t in os.environ.get("REALSR_TTA_TILES", "128,192,256").split(",")
    )
    granules = tuple(
        int(g) for g in os.environ.get("REALSR_TTA_GRANULES", "1,2,4").split(",")
    )
    results = []
    for tile in tiles:
        for granule in granules:
            eng = RealSR(
                gpuid=0,
                tta_mode=True,
                config=EngineConfig(tilesize=tile, max_batch=granule),
            )
            eng.load(mdir + "/x4.param", mdir + "/x4.bin")
            buf = eng.process_device(img)  # compile + warm
            np.asarray(buf.ravel()[0])
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                buf = eng.process_device(img)
                np.asarray(buf.ravel()[0])
                ts.append(time.perf_counter() - t0)
            mps = (size * 4) ** 2 / 1e6 / min(ts)
            results.append((tile, granule, mps))
            print(f"tile={tile} granule={granule}: {mps:.2f} MP/s", flush=True)

    best = max(results, key=lambda r: r[2])
    print(f"BEST: tile={best[0]} granule={best[1]} {best[2]:.2f} MP/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
