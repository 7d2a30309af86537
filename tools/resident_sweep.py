"""Sweep the resident trunk kernel's row block (BLK) on hardware.

The analytic plan (ops.rdb_kernel.plan_rows_resident) picks the largest
BLK whose 3-plane VMEM footprint fits the 118MB budget; this sweep
measures neighboring BLKs through the REALSR_TPU_RESIDENT_BLK trace-time
hook (models/rrdbnet) to check the analytic pick against the hardware —
an over-budget BLK fails loudly at Mosaic compile, mapping the real VMEM
edge. Protocol: same-process interleaved min-of-rounds (BASELINE.md),
fenced by a one-element fetch.

Usage:  python tools/resident_sweep.py [H B rounds] [BLK...]
        default BLK candidates bracket the analytic plan by +-8.
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
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 276
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    od = jnp.bfloat16
    spec = R.RRDBNetSpec()
    p = R.init_rrdbnet_params(spec, seed=0)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray, K.pack_rdb_params(R.repack_scatter(p)["rdb"], dtype=od)
    )
    pp = jax.device_put(pp)
    x = jax.device_put(
        np.random.default_rng(1).random((B, H, H, 3)).astype(np.float32)
    )
    wb = K.round_wb(H)
    base = K.plan_rows_resident(H, wb, state_bytes=4, op_bytes=2)
    cands = [int(a) for a in sys.argv[4:]] or sorted(
        {max(8, base[0] - 8), base[0] - 4, base[0], base[0] + 4, base[0] + 8}
    )
    # plan_rows rounds a target through nblk=ceil(H/target), so nearby
    # targets can resolve to the SAME (BLK, nblk) — dedup on the RESOLVED
    # plan and label output with it, not the requested target.
    plans = {}
    for t in cands:
        plans.setdefault(K.plan_rows(H, target_blk=t, wb=wb), t)
    cands = sorted(plans.values())
    print(f"analytic plan {base}; resolved plans {sorted(plans)}")

    R.RESIDENT_TRUNK = True
    fns, ok = {}, []
    for blk in cands:
        os.environ["REALSR_TPU_RESIDENT_BLK"] = str(blk)

        def f(params, img, _blk=blk):
            os.environ["REALSR_TPU_RESIDENT_BLK"] = str(_blk)
            return R.rrdbnet_forward(
                params, img, spec, storage_dtype=jnp.float32,
                variant="pallas", op_dtype=od,
            )

        fn = jax.jit(f)
        t0 = time.perf_counter()
        try:
            y = fn(pp, x)
            float(y[0, 0, 0, 0])
        except Exception as e:
            print(f"BLK {blk}: FAILED to compile/run: {str(e)[:160]}")
            continue
        plan = K.plan_rows(H, target_blk=blk, wb=wb)
        est = K._resident_vmem_bytes(
            plan[0], plan[1], wb, nf=64, gc=32, ch=K._CH, sb=4, ob=2
        ) / 1e6
        print(
            f"BLK {blk} -> plan {plan} (~{est:.0f}MB est): "
            f"compile+first {time.perf_counter() - t0:.1f}s"
        )
        fns[blk] = fn
        ok.append(blk)

    best = {b: 1e9 for b in ok}
    for rnd in range(rounds):
        for b in ok:
            t0 = time.perf_counter()
            y = fns[b](pp, x)
            float(y[0, 0, 0, 0])
            best[b] = min(best[b], time.perf_counter() - t0)
    for b in ok:
        tag = " <- analytic" if b == base[0] else ""
        print(f"BLK {b}: min {best[b]*1e3:.1f} ms{tag}")


if __name__ == "__main__":
    main()
