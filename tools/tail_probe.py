"""Probe WHY XLA's 4x-resolution tail convs run at 6-12% MFU (v5e).

tools/tail_stages.py located the tail cost in hrconv/conv_last at 4x
resolution and disproved the M=3 output-padding theory (cout=64 measures
the same). This probes the remaining hypotheses on the SAME shape
([B, 4H, 4W, 64] ~ the production chunk's 4x activations):

  nhwc      current formulation (conv_general_dilated NHWC/HWIO, bf16
            operands, f32 accum)
  nchw      NCHW/OIHW dimension numbers (XLA:TPU sometimes picks a
            different internal layout)
  out_bf16  preferred_element_type=bf16 (halves the 2.5 GB f32 output
            write; numerics probe only - accum may round)
  f32_ops   f32 operands (no bf16 cast; is the cast/pack the cost?)
  bf16_in   bf16-resident input (halves the input read traffic)
  rows4     batch-reshaped [4B, H, 4W, 64] (halo-incorrect, timing only:
            does XLA's spatial tiling improve on shorter images?)
  matmul    [N, 576] @ [576, 64] of matching FLOPs - the im2col-free MXU
            ceiling for this (M=64, K=576) shape class.

Protocol: fenced one-element fetch, no-op fence constant subtracted,
min-of-rounds (BASELINE.md).

One variant per process (the f32 activations are 2.5 GB each at the
production shape; co-resident variants OOM a shared device). All inputs
are generated ON DEVICE: a 2.5 GB device_put through the axon tunnel
(0.3-15 MB/s) costs minutes-to-hours and is NOT part of what's probed.

Usage:  python tools/tail_probe.py VARIANT [B H4 rounds]  # H4 = 4x side
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

from realsr_tpu.engine import _enable_compilation_cache

_enable_compilation_cache()  # re-runs must not pay today's 900s+ compiles


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


def conv(x, w, dn, od, pet=jnp.float32):
    return jax.lax.conv_general_dilated(
        x.astype(od), w.astype(od), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn, preferred_element_type=pet,
        precision=jax.lax.Precision.DEFAULT if od == jnp.bfloat16
        else jax.lax.Precision.HIGHEST,
    )


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "nhwc"
    known = ("nhwc", "nchw", "out_bf16", "bf16_in", "f32_ops", "rows4",
             "matmul")
    if variant not in known:
        # a typo must not silently measure the nhwc baseline under the
        # typo'd label and end up pasted into BASELINE.md as evidence
        raise SystemExit(f"unknown variant {variant!r}; one of {known}")
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H4 = int(sys.argv[3]) if len(sys.argv) > 3 else 1104
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    nf = 64
    flops = 2 * B * H4 * H4 * 9 * nf * nf
    key = jax.random.PRNGKey(0)

    w = jax.random.normal(key, (3, 3, nf, nf), jnp.float32) * 0.05

    def report(name, t, t0, note=""):
        dt = t - t0
        print(f"{name:9s}: {dt*1e3:7.1f} ms  {flops/dt/1e12:6.1f} TF/s{note}",
              flush=True)

    if variant == "matmul":
        # matmul ceiling at the conv's (M, K); N/8 rows, x8-scaled
        N = B * H4 * H4
        a = jax.random.uniform(key, (N // 8, 9 * nf)).astype(jnp.bfloat16)
        wm = (jax.random.normal(key, (9 * nf, nf)) * 0.05).astype(jnp.bfloat16)
        noop = jax.jit(lambda v: v[:1, :1] + 1.0)
        t0, _ = timeit(noop, a, rounds=rounds)
        print(f"fence constant: {t0*1e3:.1f} ms", flush=True)
        mm = jax.jit(lambda p, q: jnp.dot(
            p, q, preferred_element_type=jnp.float32))
        t, _ = timeit(mm, a, wm, rounds=rounds)
        report("matmul", t0 + (t - t0) * 8, t0,
               " (x8-scaled [N/8, 576]@[576, 64])")
        return

    if variant == "nchw":
        x = jax.random.uniform(key, (B, nf, H4, H4), jnp.float32)
        w = jnp.transpose(w, (3, 2, 0, 1))
    elif variant == "rows4":
        assert H4 % 4 == 0
        x = jax.random.uniform(key, (B * 4, H4 // 4, H4, nf), jnp.float32)
    elif variant == "bf16_in":
        x = jax.random.uniform(key, (B, H4, H4, nf)).astype(jnp.bfloat16)
    else:
        x = jax.random.uniform(key, (B, H4, H4, nf), jnp.float32)
    x = jax.block_until_ready(jax.jit(lambda v: v)(x))

    noop = jax.jit(lambda v: v[(slice(0, 1),) * 3 + (slice(0, 1),)] + 1.0)
    t0, _ = timeit(noop, x, rounds=rounds)
    print(f"fence constant: {t0*1e3:.1f} ms", flush=True)

    dn = ("NCHW", "OIHW", "NCHW") if variant == "nchw" else (
        "NHWC", "HWIO", "NHWC")
    od = jnp.float32 if variant == "f32_ops" else jnp.bfloat16
    pet = jnp.bfloat16 if variant == "out_bf16" else jnp.float32
    t, _ = timeit(jax.jit(lambda v: conv(v, w, dn, od, pet=pet)),
                  x, rounds=rounds)
    report(variant, t, t0)


if __name__ == "__main__":
    main()
