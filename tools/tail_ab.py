"""A/B the tail upsampler formulations on TPU + per-stage tail profile.

Variants: transposed (stride-2 lhs-dilated conv, the current default) vs
phase (VALID 2x2 conv with 4 phase output groups + interleave — 2.25x
fewer MACs, no zero-insertion). Also times each tail stage separately to
locate the remaining non-trunk cost (BASELINE.md: tail ~37ms/chunk).

Protocol: same-process interleaved min-of-rounds; fenced by fetching one
element (tunnel block_until_ready is a no-op).

Usage:  python tools/tail_ab.py [B H rounds]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from realsr_tpu.models import rrdbnet as R


def fence(y):
    # fetch ONE element (tunnel block_until_ready is a no-op); plain
    # integer indexing — ravel() would copy the whole buffer on device
    float(np.asarray(jax.device_get(y[(0,) * y.ndim])))


def timeit(fn, *a, rounds=5):
    y = fn(*a)  # compile + warm
    fence(y)
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        y = fn(*a)
        fence(y)
        best = min(best, time.perf_counter() - t0)
    return best, y


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 276
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rng = np.random.default_rng(0)
    nf = 64
    od = jnp.bfloat16

    fea = jax.device_put(rng.random((B, H, H, nf)).astype(np.float32))
    w_up = [
        jax.device_put(rng.normal(0, 0.05, (3, 3, nf, nf)).astype(np.float32))
        for _ in range(2)
    ]
    b_up = [
        jax.device_put(rng.normal(0, 0.01, (nf,)).astype(np.float32))
        for _ in range(2)
    ]
    w_hr = jax.device_put(rng.normal(0, 0.05, (3, 3, nf, nf)).astype(np.float32))
    b_hr = jax.device_put(rng.normal(0, 0.01, (nf,)).astype(np.float32))
    w_last = jax.device_put(rng.normal(0, 0.05, (3, 3, nf, 3)).astype(np.float32))
    b_last = jax.device_put(rng.normal(0, 0.01, (3,)).astype(np.float32))

    def tail(upfn, x):
        y = x
        for s in range(2):
            y = upfn(y, w_up[s], b_up[s], od).astype(jnp.float32)
        y = R._conv3x3(y, w_hr, b_hr, R.LRELU_SLOPE, od).astype(jnp.float32)
        return R._conv3x3(y, w_last, b_last, None, od)

    t_old = jax.jit(lambda x: tail(R._upconv_x2, x))
    t_new = jax.jit(lambda x: tail(R._upconv_x2_phase, x))

    a, ya = timeit(t_old, fea, rounds=rounds)
    b, yb = timeit(t_new, fea, rounds=rounds)
    d = float(jnp.max(jnp.abs(ya - yb)))
    del ya, yb
    print(f"tail old {a*1e3:.1f} ms | phase {b*1e3:.1f} ms | "
          f"speedup {a/b:.3f}x | max|diff| {d:.3e}", flush=True)

    # per-stage, computed sequentially to bound live HBM
    s_up1o = jax.jit(lambda x: R._upconv_x2(x, w_up[0], b_up[0], od))
    s_up1n = jax.jit(lambda x: R._upconv_x2_phase(x, w_up[0], b_up[0], od))
    s_up2o = jax.jit(lambda x: R._upconv_x2(x, w_up[1], b_up[1], od))
    s_up2n = jax.jit(lambda x: R._upconv_x2_phase(x, w_up[1], b_up[1], od))
    s_hr = jax.jit(lambda x: R._conv3x3(x, w_hr, b_hr, R.LRELU_SLOPE, od))
    s_last = jax.jit(lambda x: R._conv3x3(x, w_last, b_last, None, od))

    t, up1 = timeit(s_up1o, fea, rounds=rounds)
    print(f"  up1(+2x) old: {t*1e3:.1f} ms", flush=True)
    t, _ = timeit(s_up1n, fea, rounds=rounds)
    print(f"  up1(+2x) phase: {t*1e3:.1f} ms", flush=True)
    t, up2 = timeit(s_up2o, up1, rounds=rounds)
    print(f"  up2(+4x) old: {t*1e3:.1f} ms", flush=True)
    t, _ = timeit(s_up2n, up1, rounds=rounds)
    print(f"  up2(+4x) phase: {t*1e3:.1f} ms", flush=True)
    del up1
    t, hr = timeit(s_hr, up2, rounds=rounds)
    print(f"  hrconv(4x): {t*1e3:.1f} ms", flush=True)
    del up2
    t, _ = timeit(s_last, hr, rounds=rounds)
    print(f"  conv_last(4x): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
