#!/usr/bin/env python3
"""Tile/batch/variant sweep of the RRDBNet forward on the local accelerator.

The reference picks tile size from GPU heap budget alone (src/main.cpp:748-775).
On TPU the right (tile, batch, conv formulation) is a throughput property of
the MXU + XLA's conv lowering, so we measure it: for each config, time the
full flagship forward (23-block scan) and report EFFECTIVE output MP/s —
useful (halo-cropped) output pixels per second — which is what the engine's
end-to-end number is made of.

Timing note: on the axon-tunneled TPU, ``block_until_ready`` does not block,
so each measurement is fenced by fetching one element of the result (adds one
RPC, subtracted via a measured sync baseline).

Usage: python tools/tpu_sweep.py [--quick] [--out sweep.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer configs/reps")
    ap.add_argument("--out", default="")
    ap.add_argument("--reps", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        repack_scatter,
        rrdbnet_forward,
    )

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    def sync(x):
        return np.asarray(jax.device_get(x.ravel()[0]))

    warm = jnp.zeros((8, 128), jnp.float32)
    sync(warm)
    t0 = time.perf_counter()
    for _ in range(10):
        sync(warm)
    sync_s = (time.perf_counter() - t0) / 10
    print(f"# sync baseline {sync_s * 1e3:.1f}ms", file=sys.stderr)

    spec = RRDBNetSpec()
    params = init_rrdbnet_params(spec, seed=0)

    pad = 10
    reps = args.reps or (3 if args.quick else 6)
    grid = [
        (128, 4), (128, 8), (128, 12), (128, 16),
        (192, 2), (192, 4), (192, 8),
        (256, 2), (256, 4),
        (384, 1), (384, 2),
    ]
    if args.quick:
        grid = [(128, 8), (128, 16), (192, 4), (256, 2)]

    results = []
    rng = np.random.default_rng(0)
    variants = ("pallas", "dense", "scatter")
    if jax.devices()[0].platform == "cpu":
        variants = ("dense", "scatter")  # Mosaic kernels are TPU-only
    for variant in variants:
        if variant == "scatter":
            p = repack_scatter(params)
        elif variant == "pallas":
            from realsr_tpu.ops.rdb_kernel import pack_rdb_params

            p = dict(params)
            p["rdb"] = pack_rdb_params(
                repack_scatter(params)["rdb"], dtype=jnp.bfloat16
            )
        else:
            p = params
        p = jax.device_put(p)
        for tile, batch in grid:
            side = tile + 2 * pad
            x = jnp.asarray(
                rng.random((batch, side, side, 3), np.float32)
            )

            fwd = jax.jit(
                lambda p, x: rrdbnet_forward(
                    p, x, spec, storage_dtype=jnp.bfloat16, variant=variant
                )
            )
            try:
                t_compile0 = time.perf_counter()
                r = fwd(p, x)
                sync(r)
                compile_s = time.perf_counter() - t_compile0
                times = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    r = fwd(p, x)
                    sync(r)
                    times.append(time.perf_counter() - t0 - sync_s)
                dt = float(np.median(times))
            except Exception as e:  # OOM etc.
                print(f"{variant} t{tile} b{batch}: FAILED {e}", file=sys.stderr)
                continue
            useful_out_mp = batch * (tile * 4) ** 2 / 1e6
            mps = useful_out_mp / dt
            rec = {
                "variant": variant,
                "tile": tile,
                "batch": batch,
                "ms": round(dt * 1e3, 2),
                "eff_out_mps": round(mps, 2),
                "compile_s": round(compile_s, 1),
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

    results.sort(key=lambda r: -r["eff_out_mps"])
    print("# best:", json.dumps(results[0]) if results else "none", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
