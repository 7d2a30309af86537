"""Map the CLI's ``-j`` proc thread count onto XLA:CPU intra-op threads.

The reference gives its CPU engine ``jobs_proc`` OpenMP threads
(src/main.cpp:734-746, src/realsr.cpp:17: the CPU ncnn Net computes with
``num_threads``). XLA:CPU has no public thread-count option — the TFRT CPU
client sizes its Eigen intra-op pool from the number of SCHEDULABLE cpus
(TSL ``port::NumSchedulableCPUs`` = ``CPU_COUNT`` of ``sched_getaffinity``)
at client creation. So the TPU-native equivalent is: restrict the process
affinity mask to ``n`` cpus, force the CPU client to initialize (its pool
threads inherit the restricted mask and the pool size is fixed for the
client's lifetime), then restore the original mask so load/save codec
workers keep the full machine — the same split as the reference's
"jobs_proc intra-op threads for inference, jobs_load/jobs_save threads for
codecs".
"""

from __future__ import annotations

import os
import sys


def configure_cpu_threads(n: int, verbose: bool = False) -> bool:
    """Bound the XLA:CPU intra-op pool to ``n`` threads.

    Returns True when the bound is in effect (or no restriction was
    needed); False when it cannot be applied — callers print the
    user-visible deviation notice in that case, so ``-j`` is never
    silently ignored on CPU.
    """
    if n < 1:
        return False
    try:
        import jax._src.xla_bridge as xb

        if xb._backends:
            # a backend already initialized in this process: the pool size
            # is fixed and affinity tricks can no longer change it
            return False
    except Exception:
        return False
    try:
        cur = os.sched_getaffinity(0)
    except (AttributeError, OSError):
        return False  # non-Linux: no affinity control
    if n >= len(cur):
        return True  # asking for >= all cpus: the default pool already is
    try:
        os.sched_setaffinity(0, set(sorted(cur)[:n]))
        try:
            import jax

            # force CPU client creation NOW, under the restricted mask;
            # its pool threads inherit it and the size sticks
            jax.devices("cpu")
        finally:
            os.sched_setaffinity(0, cur)
    except Exception:
        return False
    if verbose:
        print(f"cpu intra-op threads: {n}", file=sys.stderr)
    return True


def notice_cpu_threads_ignored() -> None:
    """The explicit user-visible message for when the bound can't apply."""
    print(
        "warning: -j proc thread count does not tune CPU inference in this "
        "session (XLA's intra-op pool was already initialized)",
        file=sys.stderr,
    )
