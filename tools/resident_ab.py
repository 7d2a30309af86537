"""A/B the VMEM-resident whole-trunk kernel vs the unchained trunk on TPU.

Old = the shipped per-RDB rdb_apply + re_apron composition (mixed
default); new = ops.rdb_kernel.rdb_apply_resident — the entire 69-RDB
trunk in ONE pallas call with the f32 chain state held in a 3-plane VMEM
rotation (zero state HBM traffic; weights streamed per-RDB).

Protocol (BASELINE.md "Planner anchors"): same-process, interleaved
min-of-rounds — the shared v5e host swings 30-60% between processes, so
only within-process ratios are trustworthy. Timing is fenced by fetching
one output element (the tunnel's block_until_ready is a no-op).

Usage:  python tools/resident_ab.py [B H rounds]
        REALSR_AB_OP=float32 for the all-f32 (no-mixed) comparison.
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from realsr_tpu.models import rrdbnet as R
from realsr_tpu.ops import rdb_kernel as K


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 276
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    od = jnp.dtype(os.environ.get("REALSR_AB_OP", "bfloat16"))
    spec = R.RRDBNetSpec()
    p = R.init_rrdbnet_params(spec, seed=0)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(R.repack_scatter(p)["rdb"], dtype=od),
    )
    pp = jax.device_put(pp)  # params on device BEFORE timing (BASELINE.md)
    x = jax.device_put(
        np.random.default_rng(1).random((B, H, H, 3)).astype(np.float32)
    )
    wb = K.round_wb(H)
    print(
        f"plan: unchained BLK/nblk {K.plan_rows(H, wb=wb)}, resident "
        f"{K.plan_rows_resident(H, wb, state_bytes=4, op_bytes=od.itemsize)}"
    )

    def build(resident):
        def f(params, img):
            old = R.RESIDENT_TRUNK
            R.RESIDENT_TRUNK = resident
            try:
                return R.rrdbnet_forward(
                    params, img, spec, storage_dtype=jnp.float32,
                    variant="pallas", op_dtype=od,
                )
            finally:
                R.RESIDENT_TRUNK = old

        return jax.jit(f)

    outs = {}
    fns = {}
    for name in ("old", "new"):
        fns[name] = build(name == "new")
        t0 = time.perf_counter()
        outs[name] = fns[name](pp, x)
        float(outs[name][0, 0, 0, 0])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")

    a = np.asarray(outs["old"])
    b = np.asarray(outs["new"])
    print(f"exactness: max|old-new| = {np.abs(a - b).max():.3e}")

    best = {"old": 1e9, "new": 1e9}
    for rnd in range(rounds):
        for name in ("old", "new"):
            t0 = time.perf_counter()
            y = fns[name](pp, x)
            float(y[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  r{rnd} {name}: {dt * 1e3:.1f} ms")
    mp = B * (H - 20) ** 2 * 16 / 1e6  # output MP at scale 4 (tile area)
    print(
        f"min old {best['old']*1e3:.1f} ms | new {best['new']*1e3:.1f} ms | "
        f"speedup {best['old']/best['new']:.3f}x | "
        f"new chunk rate ~{mp/best['new']:.1f} MP/s"
    )


if __name__ == "__main__":
    main()
