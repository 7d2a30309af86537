"""Measure first-image latency on a COLD host (empty persistent cache),
with and without fast start (engine.EngineConfig.fast_start, VERDICT r3
next #6).

Protocol: fresh isolated REALSR_TPU_CACHE per run (like
tools/aot_experiment.py), auto tile, 1024x1024 uint8 input, timed from
process_device() dispatch to a one-element fence. With fast start the
first image runs on FAST_START_TILE (Mosaic compile ~9 s at the 84-padded
shape) while the production-tile programs compile in background threads;
the tool then polls until the engine switches to the production tile and
reports that latency too.

``--seed TARBALL`` installs a tools/seed_cache.py tarball into the fresh
cache base before measuring — i.e. the DEPLOYMENT cold start: a new host
that received the release seed but has never compiled anything.

Usage: python tools/coldstart_measure.py [--no-fast] [--seed TAR] [size]
"""

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# isolate the cache BEFORE jax/engine imports enable it
_tmp = tempfile.mkdtemp(prefix="realsr_coldstart_")
os.environ["REALSR_TPU_CACHE"] = _tmp

import numpy as np  # noqa: E402


def main() -> int:
    fast = "--no-fast" not in sys.argv
    argv = list(sys.argv[1:])
    seed = None
    if "--seed" in argv:
        i = argv.index("--seed")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("usage: --seed TARBALL (path required)", file=sys.stderr)
            return 2
        seed = argv[i + 1]
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    size = int(args[0]) if args else 1024

    if seed:
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "seed_cache.py"),
             "install", seed, "--cache-base", _tmp],
            capture_output=True, text=True,
        )
        print(r.stdout.strip(), flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], flush=True)
            return 1

    from realsr_tpu.engine import EngineConfig, RealSR

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_goldens as G

    mdir = G.golden_model_dir()
    eng = RealSR(gpuid=0, config=EngineConfig(fast_start=fast))
    t0 = time.perf_counter()
    eng.load(mdir + "/x4.param", mdir + "/x4.bin")
    t_load = time.perf_counter() - t0

    img = np.random.default_rng(0).integers(
        0, 256, (size, size, 3), np.uint8
    )
    t0 = time.perf_counter()
    buf = eng.process_device(img)
    np.asarray(buf[0, 0, 0])  # fence (tunnel block_until_ready is a no-op)
    t_first = time.perf_counter() - t0
    print(
        f"fast_start={fast}: load {t_load:.1f}s, FIRST image "
        f"{t_first:.1f}s at tile {eng.last_tilesize} "
        f"(cache dir {_tmp}, empty at start)",
        flush=True,
    )

    if fast and eng.last_tilesize != 256:
        # poll until the background production compile lands
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < 900:
            buf = eng.process_device(img)
            np.asarray(buf[0, 0, 0])
            if eng.last_tilesize >= 192:
                print(
                    f"switched to production tile {eng.last_tilesize} "
                    f"after {time.perf_counter() - t0:.1f}s of background "
                    "compilation (images kept flowing throughout)",
                    flush=True,
                )
                break
            time.sleep(5)
        else:
            print("production program did not land within 900s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
