#!/usr/bin/env python3
"""File-to-file directory benchmark: the product the reference actually is.

Every BENCH_r* headline stops at the device output buffer; the reference
is a batch tool whose unit of work is decode -> infer -> encode
(src/main.cpp:179-416). This tool measures THAT: a directory of images
through the CLI with the SHIPPED defaults (fast_start on, auto tile,
packed tail, resident trunk), wall-clock from process start to the last
output byte on disk, with a per-stage breakdown and the user-visible
per-image completion time-series (first image / switch to production
tile / steady state).

Runners:
  python (default) — in-process ``realsr_tpu.cli.main``; completions are
      timestamped inside the save stage (exact), stage totals read from
      the tracer, the fast-start tile recorded per image.
  native — the C++ binary (native/build/realsr-tpu) as a subprocess;
      completions from output-file polling, stage totals parsed from the
      trace report on stderr.

Usage: e2e_bench.py [--runner python|native] [--n 6] [--size 1024]
                    [--mixed] [--cold] [--fmt png] [--tta]

Prints ONE JSON line. Timing notes for this environment (BASELINE.md):
the tunnel D2H runs at 5-15 MB/s (vs GB/s PCIe on a real TPU host) and
the bench host has ONE CPU core, so decode/encode cannot overlap-scale;
the stage breakdown exists precisely to attribute those environment
shares honestly.
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(dir_: str, n: int, size: int, mixed: bool, fmt: str) -> float:
    """Create n deterministic SR-like inputs; returns total input MP."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(7)
    total_px = 0
    os.makedirs(dir_, exist_ok=True)
    for i in range(n):
        if mixed:
            w, h = [(size, size), (size * 3 // 4, size), (size // 2, size // 2)][
                i % 3
            ]
            ext = ["png", "jpg"][i % 2]
        else:
            w, h = size, size
            ext = fmt if fmt in ("png", "jpg") else "png"
        base = rng.integers(0, 256, (max(16, h // 16), max(16, w // 16), 3), np.uint8)
        img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
        img.save(os.path.join(dir_, f"img{i:03d}.{ext}"))
        total_px += w * h
    return total_px / 1e6


def run_python(indir, outdir, args, extra_env) -> dict:
    """In-process CLI run; returns completions + stage totals."""
    for k, v in extra_env.items():
        os.environ[k] = v
    os.environ.setdefault("REALSR_TPU_TRACE", "1")

    import collections

    completions = []  # (t_done, outpath, bytes, tilesize)
    # tile attribution rides a FIFO, not a shared "last" cell: the save
    # worker encodes image k while the proc thread is already processing
    # k+1 (pipeline overlap), so reading a last-written cell at encode
    # time could attribute k the tile of k+1 — corrupting exactly the
    # fast-start switch metric this tool measures. Encode calls consume
    # the save queue in process order, so pairing the k-th encode with
    # the k-th process is exact.
    tile_q = collections.deque()

    import realsr_tpu.cli as cli
    import realsr_tpu.pipeline as pipeline
    from realsr_tpu.engine import RealSR
    from realsr_tpu.io import codecs
    from realsr_tpu.utils.trace import tracer

    real_encode = pipeline.encode_image  # the binding save_worker calls
    real_process = RealSR.process_device
    real_banded = RealSR.process_banded

    def rec_process(self, image, progress_cb=None):
        out = real_process(self, image, progress_cb)
        tile_q.append(self.last_tilesize)
        return out

    def rec_banded(self, image, progress_cb=None, band_tile_rows=0):
        out = real_banded(self, image, progress_cb, band_tile_rows)
        tile_q.append(self.last_tilesize)
        return out

    def rec_encode(path, image, fmt=None):
        tile = tile_q.popleft() if tile_q else 0
        ok = real_encode(path, image, fmt)
        if ok:
            completions.append(
                (time.perf_counter(), path, os.path.getsize(path), tile)
            )
        return ok

    pipeline.encode_image = rec_encode
    RealSR.process_device = rec_process
    RealSR.process_banded = rec_banded
    try:
        t0 = time.perf_counter()
        rc = cli.main(["-i", indir, "-o", outdir, "-m", args.model] + args.cli)
        wall = time.perf_counter() - t0
    finally:
        pipeline.encode_image = real_encode
        RealSR.process_device = real_process
        RealSR.process_banded = real_banded
    with tracer._lock:
        stages = {k: round(v, 2) for k, v in tracer._total.items()}
    return {
        "rc": rc,
        "wall_s": wall,
        "completions": [
            (round(t - t0, 2), os.path.basename(p), nbytes, ts)
            for t, p, nbytes, ts in sorted(completions)
        ],
        "stage_totals_s": stages,
    }


def run_native(indir, outdir, args, extra_env) -> dict:
    """Subprocess run of the native binary; poll outputs for completion."""
    import subprocess

    binary = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "build", "realsr-tpu",
    )
    if not os.path.exists(binary):
        return {"rc": -1, "error": f"native binary not built: {binary}"}
    env = dict(os.environ, REALSR_TPU_TRACE="1", **extra_env)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )

    completions = []
    stop = threading.Event()
    t0 = time.perf_counter()

    def poll():
        seen = {}
        while not stop.is_set():
            try:
                for e in os.scandir(outdir):
                    sz = e.stat().st_size
                    prev = seen.get(e.name)
                    if sz > 0 and prev is not None and prev[1] == sz and prev[0] is None:
                        seen[e.name] = (time.perf_counter(), sz)
                        completions.append(
                            (time.perf_counter(), e.name, sz, 0)
                        )
                    elif prev is None or (prev[0] is None and prev[1] != sz):
                        seen[e.name] = (None, sz)
            except OSError:
                pass
            time.sleep(0.1)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    proc = subprocess.run(
        [binary, "-i", indir, "-o", outdir, "-m", args.model] + args.cli,
        env=env, capture_output=True, text=True,
        timeout=int(os.environ.get("REALSR_E2E_TIMEOUT", "3600")),
    )
    wall = time.perf_counter() - t0
    stop.set()
    th.join(timeout=2)
    # The process has exited, so every output file is final. Record any
    # file the two-stable-polls heuristic hadn't confirmed yet — the
    # LAST image is systematically in that state (written immediately
    # before exit), and dropping it skewed steady_interval/total_file_mb
    # while n_images still reported the full count.
    done = {name for _, name, _, _ in completions}
    try:
        for e in os.scandir(outdir):
            sz = e.stat().st_size
            if e.name not in done and sz > 0:
                completions.append((t0 + wall, e.name, sz, 0))
    except OSError:
        pass
    stages = {}
    for line in proc.stderr.splitlines():
        parts = line.split()
        if len(parts) >= 4 and parts[1] == "total" and parts[2].endswith("ms"):
            stages[parts[0]] = round(float(parts[2][:-2]) / 1e3, 2)
    return {
        "rc": proc.returncode,
        "wall_s": wall,
        "completions": [
            (round(t - t0, 2), name, sz, ts)
            for t, name, sz, ts in sorted(completions)
        ],
        "stage_totals_s": stages,
        "stderr_tail": proc.stderr[-800:] if proc.returncode else "",
    }


def summarize(res: dict, in_mp: float, scale: int, n: int) -> dict:
    comps = res.get("completions", [])
    out_mp = in_mp * scale * scale
    wall = res.get("wall_s", 0.0)
    out = {
        "runner": res.get("runner"),
        "rc": res.get("rc"),
        "n_images": n,
        "output_mp": round(out_mp, 1),
        "wall_s": round(wall, 1),
        "e2e_mps": round(out_mp / wall, 2) if wall else 0.0,
        "stage_totals_s": res.get("stage_totals_s", {}),
        "completions": comps,
    }
    if comps:
        times = [c[0] for c in comps]
        out["first_image_s"] = times[0]
        deltas = [b - a for a, b in zip(times, times[1:])]
        if deltas:
            tail = deltas[len(deltas) // 2 :]
            med = sorted(tail)[len(tail) // 2]
            per_img_mp = out_mp / n
            out["steady_interval_s"] = round(med, 2)
            out["steady_mps"] = round(per_img_mp / med, 2) if med else None
        # fast-start switch: first completion at the production tile.
        # If the run never left the fast-start tile (short job, deferred
        # packed stage, loaded window), say so instead of aliasing
        # switch_s to the first image's time.
        prod = comps[-1][3]
        if prod:
            out["production_tile"] = prod
            if prod != comps[0][3]:
                sw = next(c for c in comps if c[3] == prod)
                out["switch_s"] = sw[0]
            else:
                out["switch_s"] = None  # no mid-run tile switch observed
        out["total_file_mb"] = round(sum(c[2] for c in comps) / 1e6, 1)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runner", choices=("python", "native"), default="python")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--cold", action="store_true",
                    help="fresh compile-cache dir (true cold start)")
    ap.add_argument("--fmt", default="png")
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--model", default="")
    ap.add_argument("cli", nargs="*", help="extra CLI flags after --")
    args = ap.parse_args()

    if not args.model:
        mdir = os.environ.get(
            "REALSR_BENCH_MODEL", "/tmp/realsr_bench/models-DF2K"
        )
        if not os.path.exists(os.path.join(mdir, "x4.bin")):
            from realsr_tpu.models.rrdbnet import RRDBNetSpec
            from realsr_tpu.ncnn.synth import make_model_dir

            make_model_dir(mdir, RRDBNetSpec(), seed=0)
        args.model = mdir
    if args.tta:
        args.cli.append("-x")

    tmp = tempfile.mkdtemp(prefix="realsr_e2e_")
    indir, outdir = os.path.join(tmp, "in"), os.path.join(tmp, "out")
    os.makedirs(outdir)
    in_mp = make_inputs(indir, args.n, args.size, args.mixed, args.fmt)

    extra_env = {}
    if args.cold:
        extra_env["REALSR_TPU_CACHE"] = os.path.join(tmp, "cache")

    runner = run_python if args.runner == "python" else run_native
    res = runner(indir, outdir, args, extra_env)
    res["runner"] = args.runner
    out = summarize(res, in_mp, 4, args.n)
    out["config"] = {
        "size": args.size, "mixed": args.mixed, "cold": args.cold,
        "fmt": args.fmt, "extra_cli": args.cli,
    }
    print(json.dumps(out))
    return 0 if res.get("rc") == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
