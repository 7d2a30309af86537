"""A/B the paired (hi+lo bf16) carry vs the f32 mixed carry on TPU.

The mixed default carries the 69-RDB chain state in f32 through HBM; its
measured 16% trunk cost over all-bf16 is dominated by f32 window-DMA bytes
(BASELINE.md round-3 decomposition). The paired carry keeps the SAME MXU
operand values (hi = bf16 of the f32 state) but ships half the window
bytes, with the rounding remainder in a second bf16 plane riding the
blocked Pallas pipeline.

Protocol (BASELINE.md "Planner anchors"): same-process, interleaved
min-of-rounds; fenced by fetching one output element.

Usage:  python tools/paired_ab.py [B H rounds]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

from realsr_tpu.models import rrdbnet as R
from realsr_tpu.ops import rdb_kernel as K


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 276
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spec = R.RRDBNetSpec()
    p = R.init_rrdbnet_params(spec, seed=0)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(R.repack_scatter(p)["rdb"], dtype=jnp.bfloat16),
    )
    pp = jax.device_put(pp)  # params on device BEFORE timing (BASELINE.md)
    x = jax.device_put(
        np.random.default_rng(1).random((B, H, H, 3)).astype(np.float32)
    )

    def build(paired):
        def f(params, img):
            old = R.PAIRED_CARRY
            R.PAIRED_CARRY = paired
            try:
                return R.rrdbnet_forward(
                    params, img, spec, storage_dtype=jnp.float32,
                    variant="pallas", op_dtype=jnp.bfloat16,
                )
            finally:
                R.PAIRED_CARRY = old

        return jax.jit(f)

    outs = {}
    fns = {}
    for name in ("mixed", "paired"):
        fns[name] = build(name == "paired")
        t0 = time.perf_counter()
        outs[name] = fns[name](pp, x)
        float(outs[name][0, 0, 0, 0])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)

    a = np.asarray(outs["mixed"])
    b = np.asarray(outs["paired"])
    print(f"closeness: max|mixed-paired| = {np.abs(a - b).max():.3e} "
          f"(operand-flip class expected, not 0)", flush=True)

    best = {"mixed": 1e9, "paired": 1e9}
    for rnd in range(rounds):
        for name in ("mixed", "paired"):
            t0 = time.perf_counter()
            y = fns[name](pp, x)
            float(y[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  r{rnd} {name}: {dt * 1e3:.1f} ms", flush=True)
    mp = B * (H - 20) ** 2 * 16 / 1e6  # output MP at scale 4 (tile area)
    print(
        f"min mixed {best['mixed']*1e3:.1f} ms | paired "
        f"{best['paired']*1e3:.1f} ms | speedup "
        f"{best['mixed']/best['paired']:.3f}x | paired chunk rate "
        f"~{mp/best['paired']:.1f} MP/s"
    )


if __name__ == "__main__":
    main()
