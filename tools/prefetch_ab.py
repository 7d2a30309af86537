"""A/B the double-buffered window-DMA prefetch vs the synchronous fetch.

Protocol (BASELINE.md "Planner anchors"): same-process, interleaved
min-of-rounds; fenced by a one-element fetch. The prefetch
(ops/rdb_kernel.DMA_PREFETCH) overlaps each grid step's ~7.5 MB f32
window fetch with the previous step's matmuls at +8 MB VMEM.

Usage:  python tools/prefetch_ab.py [B H rounds]
"""

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
    spec = R.RRDBNetSpec()
    p = R.init_rrdbnet_params(spec, seed=0)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(R.repack_scatter(p)["rdb"], dtype=jnp.bfloat16),
    )
    pp = jax.device_put(pp)
    x = jax.device_put(
        np.random.default_rng(1).random((B, H, H, 3)).astype(np.float32)
    )

    def build(prefetch):
        def f(prm, img):
            old = K.DMA_PREFETCH
            K.DMA_PREFETCH = prefetch
            try:
                return R.rrdbnet_forward(
                    prm, img, spec, storage_dtype=jnp.float32,
                    variant="pallas", op_dtype=jnp.bfloat16,
                )
            finally:
                K.DMA_PREFETCH = old

        return jax.jit(f)

    outs = {}
    fns = {}
    for name in ("sync", "prefetch"):
        fns[name] = build(name == "prefetch")
        t0 = time.perf_counter()
        outs[name] = fns[name](pp, x)
        float(outs[name][0, 0, 0, 0])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)

    a = np.asarray(outs["sync"], dtype=np.float32)
    b = np.asarray(outs["prefetch"], dtype=np.float32)
    print(f"exactness: max|sync-prefetch| = {np.abs(a - b).max():.3e}")

    best = {"sync": 1e9, "prefetch": 1e9}
    for rnd in range(rounds):
        for name in ("sync", "prefetch"):
            t0 = time.perf_counter()
            y = fns[name](pp, x)
            float(y[0, 0, 0, 0])
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  r{rnd} {name}: {dt * 1e3:.1f} ms", flush=True)
    mp = B * (H - 20) ** 2 * 16 / 1e6
    print(
        f"min sync {best['sync']*1e3:.1f} ms | "
        f"prefetch {best['prefetch']*1e3:.1f} ms | "
        f"speedup {best['sync']/best['prefetch']:.3f}x | "
        f"prefetch chunk rate ~{mp/best['prefetch']:.1f} MP/s"
    )


if __name__ == "__main__":
    main()
