"""A/B the K-packed matmul schedule vs the scatter schedule on TPU.

Protocol (BASELINE.md "Planner anchors"): same-process, interleaved
min-of-rounds — the shared v5e host swings 30-60% between processes, so
only within-process ratios are trustworthy. Timing is fenced by fetching
one output element (the tunnel's block_until_ready is a no-op).

The packed schedule (ops/rdb_kernel.SCHED = "packed", VERDICT r3 next #1)
cuts padded MXU tile-passes 25 -> 23 per RDB by computing the
{x,c1,c2} x {c3,c4,c5} rectangle as one zero-padding M=128 / K=1152
matmul, at 1.5x the tap-store VPU work.

Usage:  python tools/sched_ab.py [B H rounds] [--trunk-only]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from realsr_tpu.models import rrdbnet as R
from realsr_tpu.ops import rdb_kernel as K


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if len(args) > 0 else 8
    H = int(args[1]) if len(args) > 1 else 276
    rounds = int(args[2]) if len(args) > 2 else 5
    trunk_only = "--trunk-only" in sys.argv
    spec = R.RRDBNetSpec(num_rrdb=10 if trunk_only else 23)
    p = R.init_rrdbnet_params(spec, seed=0)

    def pack(sched):
        pp = dict(p)
        pp["rdb"] = jax.tree.map(
            np.asarray,
            K.pack_rdb_params(
                R.repack_scatter(p)["rdb"], dtype=jnp.bfloat16, sched=sched
            ),
        )
        return jax.device_put(pp)

    params = {s: pack(s) for s in ("scatter", "packed")}
    x = jax.device_put(
        np.random.default_rng(1).random((B, H, H, 3)).astype(np.float32)
    )

    def build(sched):
        def f(prm, img):
            old = K.SCHED
            K.SCHED = sched
            try:
                return R.rrdbnet_forward(
                    prm, img, spec, storage_dtype=jnp.float32,
                    variant="pallas", op_dtype=jnp.bfloat16,
                )
            finally:
                K.SCHED = old

        return jax.jit(f)

    outs = {}
    fns = {}
    for name in ("scatter", "packed"):
        fns[name] = build(name)
        t0 = time.perf_counter()
        outs[name] = fns[name](params[name], x)
        float(outs[name][0, 0, 0, 0])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")

    a = np.asarray(outs["scatter"], dtype=np.float32)
    b = np.asarray(outs["packed"], dtype=np.float32)
    print(f"closeness: max|scatter-packed| = {np.abs(a - b).max():.3e}")

    best = {"scatter": 1e9, "packed": 1e9}
    for rnd in range(rounds):
        for name in ("scatter", "packed"):
            t0 = time.perf_counter()
            y = fns[name](params[name], x)
            float(y[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  r{rnd} {name}: {dt * 1e3:.1f} ms")
    mp = B * (H - 20) ** 2 * 16 / 1e6  # output MP at scale 4 (tile area)
    print(
        f"min scatter {best['scatter']*1e3:.1f} ms | "
        f"packed {best['packed']*1e3:.1f} ms | "
        f"speedup {best['scatter']/best['packed']:.3f}x | "
        f"packed chunk rate ~{mp/best['packed']:.1f} MP/s"
    )


if __name__ == "__main__":
    main()
