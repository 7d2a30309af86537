"""Per-stage tail timing on TPU (locate the 37ms: up1/up2/hr/last).

Times each tail stage standalone, fenced by a one-element fetch; the
~30 ms tunnel-fence constant is measured explicitly via a no-op jit and
subtracted in the report.

Usage:  python tools/tail_stages.py [B H rounds]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from realsr_tpu.models import rrdbnet as R


def fence(y):
    float(np.asarray(jax.device_get(y[(0,) * y.ndim])))


def timeit(fn, *a, rounds=5):
    y = fn(*a)
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
    w = jax.device_put(rng.normal(0, 0.05, (3, 3, nf, nf)).astype(np.float32))
    b = jax.device_put(rng.normal(0, 0.01, (nf,)).astype(np.float32))
    w3 = jax.device_put(rng.normal(0, 0.05, (3, 3, nf, 3)).astype(np.float32))
    b3 = jax.device_put(rng.normal(0, 0.01, (3,)).astype(np.float32))

    noop = jax.jit(lambda x: x[:1, :1, :1, :1] + 1.0)
    t0, _ = timeit(noop, fea, rounds=rounds)
    print(f"fence constant: {t0*1e3:.1f} ms", flush=True)

    s_up1 = jax.jit(lambda x: R._upconv_x2(x, w, b, od))
    t, up1 = timeit(s_up1, fea, rounds=rounds)
    print(f"up1 -> 2x: {(t - t0)*1e3:.1f} ms (+fence)", flush=True)
    s_up2 = jax.jit(lambda x: R._upconv_x2(x, w, b, od))
    t, up2 = timeit(s_up2, up1, rounds=rounds)
    print(f"up2 -> 4x: {(t - t0)*1e3:.1f} ms (+fence)", flush=True)
    del up1
    s_hr = jax.jit(lambda x: R._conv3x3(x, w, b, R.LRELU_SLOPE, od))
    t, hr = timeit(s_hr, up2, rounds=rounds)
    print(f"hrconv 4x: {(t - t0)*1e3:.1f} ms (+fence)", flush=True)
    del up2
    s_last = jax.jit(lambda x: R._conv3x3(x, w3, b3, None, od))
    t, _ = timeit(s_last, hr, rounds=rounds)
    print(f"conv_last 4x (cout=3): {(t - t0)*1e3:.1f} ms (+fence)", flush=True)

    # conv_last with cout padded to 64 (prove/disprove the M=3 padding tax)
    w64 = jnp.concatenate([w3] + [jnp.zeros_like(w3)] * 21, axis=-1)[..., :64]
    b64 = jnp.pad(b3, (0, 61))
    s_last64 = jax.jit(lambda x: R._conv3x3(x, w64, b64, None, od))
    t, _ = timeit(s_last64, hr, rounds=rounds)
    print(f"conv_last 4x (cout=64 probe): {(t - t0)*1e3:.1f} ms (+fence)",
          flush=True)


if __name__ == "__main__":
    main()
