"""A/B the packed-phase tail vs the interleaved tail on TPU.

Times the FULL tail (_pallas_tail: trunk conv + skip + up1/up2 + HRconv +
conv_last) with models.rrdbnet.PACKED_TAIL off/on at the production chunk
shape, in mixed-mode dtypes (f32 storage, bf16 operands — the accelerator
default). Inputs are generated ON DEVICE (a device_put of the 2x
[B,H,H,64] f32 activations costs minutes through the axon tunnel).

Protocol: same-process interleaved min-of-rounds, fenced by a one-element
fetch (BASELINE.md).

Usage:  python tools/packed_tail_ab.py [B H rounds]
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


def fence(y):
    float(np.asarray(jax.device_get(y[(0,) * y.ndim])))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 276
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    nf = 64
    od = jnp.bfloat16
    spec = R.RRDBNetSpec()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    fea = jax.random.normal(ks[0], (B, H, H, nf), jnp.float32)
    body = jax.random.normal(ks[1], (B, H, H, nf), jnp.float32)
    params = {
        "trunk": {"w": jax.random.normal(ks[2], (3, 3, nf, nf)) * 0.05,
                  "b": jax.random.normal(ks[3], (nf,)) * 0.01},
        "up": {"w": jax.random.normal(ks[4], (2, 3, 3, nf, nf)) * 0.05,
               "b": jax.random.normal(ks[5], (2, nf)) * 0.01},
        "hr": {"w": jax.random.normal(ks[6], (3, 3, nf, nf)) * 0.05,
               "b": jax.random.normal(ks[7], (nf,)) * 0.01},
        "last": {"w": jax.random.normal(ks[8], (3, 3, nf, 3)) * 0.05,
                 "b": jax.random.normal(ks[9], (3,)) * 0.01},
    }

    # REALSR_AB_VARIANTS selects a subset (comma list) — mode-2 compiles
    # are minutes-scale, so a 2-variant run fits a bounded session
    VARIANTS = tuple(
        v
        for v in ("interleaved", "packed", "packed_kernel", "packed_kernel2")
        if v in os.environ.get(
            "REALSR_AB_VARIANTS",
            "interleaved,packed,packed_kernel,packed_kernel2",
        ).split(",")
    )
    KMODE = {"packed_kernel": 1, "packed_kernel2": 2}

    def build(name):
        def f(p, a, bd):
            old = (R.PACKED_TAIL, R.PACKED_TAIL_KERNEL)
            R.PACKED_TAIL = name != "interleaved"
            R.PACKED_TAIL_KERNEL = KMODE.get(name, 0)
            try:
                return R._pallas_tail(
                    p, a, bd, spec, jnp.float32, od, od
                )
            finally:
                R.PACKED_TAIL, R.PACKED_TAIL_KERNEL = old

        return jax.jit(f)

    fns, outs = {}, {}
    for name in VARIANTS:
        fns[name] = build(name)
        t0 = time.perf_counter()
        outs[name] = fns[name](params, fea, body)
        fence(outs[name])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
    for name in VARIANTS[1:]:
        d = float(jnp.max(jnp.abs(outs["interleaved"] - outs[name])))
        print(f"closeness {name}: max|diff| = {d:.3e}", flush=True)
    del outs

    best = {n: 1e9 for n in VARIANTS}
    for rnd in range(rounds):
        for name in VARIANTS:
            t0 = time.perf_counter()
            y = fns[name](params, fea, body)
            fence(y)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"  r{rnd} {name}: {dt*1e3:.1f} ms", flush=True)
    base = best["interleaved"]
    print(" | ".join(
        f"{n} {best[n]*1e3:.1f} ms ({base/best[n]:.3f}x)" for n in VARIANTS
    ))


if __name__ == "__main__":
    main()
