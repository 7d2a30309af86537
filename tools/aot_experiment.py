#!/usr/bin/env python3
"""Measure compile time + serialized executable size of the production
compute program (VERDICT r2 #2 warm-start diagnosis).

Warm starts on this host are dominated by SHIPPING the compiled executable
to the PJRT server through the tunnel (123-249MB cache entries at
~13MB/s). This tool compiles the forward for one production bucket shape
into a FRESH persistent-cache dir and reports wall time, entry count and
bytes — run with --inner-scan 0/1 to A/B the RDB_INNER_SCAN layout
(one Mosaic binary vs three in the executable).

  PYTHONPATH=/root/repo:/root/.axon_site python tools/aot_experiment.py \
      --inner-scan 1 [--tile 256] [--batch 8] [--runtime 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner-scan", type=int, default=1)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--storage", default="auto")
    ap.add_argument("--runtime", type=int, default=0, help="also time 3 runs")
    ap.add_argument("--cache", default="")
    args = ap.parse_args()

    cache = args.cache or f"/tmp/aot_cache_{args.inner_scan}_{args.tile}_{os.getpid()}"
    os.environ["REALSR_TPU_CACHE"] = cache

    from realsr_tpu.models import rrdbnet

    rrdbnet.RDB_INNER_SCAN = bool(args.inner_scan)

    import numpy as np

    from realsr_tpu.engine import EngineConfig, RealSR

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_goldens as G

    d = G.golden_model_dir()
    eng = RealSR(
        gpuid=0,
        config=EngineConfig(
            tilesize=args.tile, storage=args.storage, max_batch=args.batch
        ),
    )
    eng.load(d + "/x4.param", d + "/x4.bin")

    ph = args.tile + 2 * eng.prepadding
    import jax
    import jax.numpy as jnp

    tiles = jax.ShapeDtypeStruct((args.batch, ph, ph, 3), eng.storage_dtype)
    atiles = jax.ShapeDtypeStruct((args.batch, 0, 0, 0), jnp.float32)
    t0 = time.perf_counter()
    low = eng._compute_chunk.lower(
        eng._params, tiles, atiles, ph, ph, args.tile, args.tile, False, False
    )
    comp = low.compile()
    compile_s = time.perf_counter() - t0

    nbytes = nfiles = 0
    for root, _, fs in os.walk(cache):
        for f in fs:
            nfiles += 1
            nbytes += os.path.getsize(os.path.join(root, f))
    print(
        f"inner_scan={bool(args.inner_scan)} tile={args.tile} "
        f"batch={args.batch} storage={np.dtype(eng.storage_dtype).name}/"
        f"{np.dtype(eng.op_dtype).name} compile_s={compile_s:.1f} "
        f"cache_files={nfiles} cache_mb={nbytes / 1e6:.1f}",
        flush=True,
    )

    if args.runtime:
        rng = np.random.default_rng(0)
        x = jax.device_put(
            jnp.asarray(
                rng.random((args.batch, ph, ph, 3), np.float32),
                eng.storage_dtype,
            ),
            eng.device,
        )
        a = jax.device_put(jnp.zeros((args.batch, 0, 0, 0), jnp.float32), eng.device)
        out = eng._compute_chunk(eng._params, x, a, ph, ph, args.tile, args.tile, False, False)
        np.asarray(out[0, 0, 0])  # fence (tunnel block_until_ready no-op)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = eng._compute_chunk(
                eng._params, x, a, ph, ph, args.tile, args.tile, False, False
            )
            np.asarray(out[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        px = args.batch * (args.tile * 4) ** 2 / 1e6
        best = min(ts)
        print(
            f"runtime_s={[round(t, 3) for t in ts]} best={best:.3f} "
            f"({px / best:.1f} out-MP/s for this chunk)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
