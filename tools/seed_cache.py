"""Build / install a SEED COMPILE CACHE for release tarballs.

VERDICT r4 weak #3 named three cold-start attacks; two shipped in-round
(concurrent first-dispatch compiles, packed-tail deferral). This tool is
the third: "ship a seed cache in the release tarball keyed by device
kind". The reference cold-starts in seconds because its device programs
are tiny online-compiled SPIR-V (/root/reference/src/realsr.cpp:89-126);
our Mosaic kernels compile in ~10-500 s depending on shape. A seed cache
moves that cost to RELEASE BUILD time: the release host runs `build` once
per device kind, ships the tarball, and a production host `install`s it —
after which every program the shipped default needs is a persistent-cache
HIT (sub-second deserialize on a local-PJRT host; BASELINE.md round-3
warm-start diagnosis).

Safety: the cache base is scoped by the engine's host fingerprint
(engine._host_features — machine/ISA/jax/jaxlib/backend). The tarball
carries the BUILD host's fingerprint subdir verbatim, so installing on a
mismatched host is inert by construction (the engine reads a different
subdir) — `install` additionally says so out loud.

Weight-independence (round 5): the compute program takes the params tree
as a runtime ARGUMENT (engine.compute_chunk), so the lowered module — and
therefore every cache key this tool seeds — depends only on the model
ARCHITECTURE (shapes/dtypes), not the weight values. One seed built with
any x4.bin (the committed synth weights included) covers DF2K, DF2K_JPEG,
and any future imported checkpoint of the same graph; dropping in real
weights never recompiles (tests/test_engine.py::
test_compute_program_is_weight_independent).

Usage:
  python tools/seed_cache.py build  out.tar.gz [-m MODELDIR]
         [--sizes 1024x1024,512x512] [--tta] [--alpha] [--gpuid 0]
  python tools/seed_cache.py install out.tar.gz [--cache-base DIR]
  python tools/seed_cache.py info    out.tar.gz
"""

import argparse
import json
import os
import sys
import tarfile
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

MANIFEST = "seed_cache_manifest.json"


def _cache_base(explicit=None) -> str:
    return explicit or os.environ.get(
        "REALSR_TPU_CACHE", os.path.expanduser("~/.cache/realsr_tpu_xla")
    )


def _fingerprint():
    """(sha10, full feature string) of THIS host — matches the subdir the
    engine will read (engine._enable_compilation_cache)."""
    import hashlib

    import jax

    # honor an explicit JAX_PLATFORMS even under this environment's
    # sitecustomize backend registration (same fix as the native bridge);
    # must precede the first backend initialization
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            jax.config.update("jax_platforms", plats)
        except Exception:
            pass  # backend already initialized — fingerprint reflects it

    from realsr_tpu.engine import _host_features

    feats = _host_features()
    return hashlib.sha1(feats.encode()).hexdigest()[:10], feats


def _dir_stats(path):
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f == MANIFEST:
                continue
            n += 1
            total += os.path.getsize(os.path.join(root, f))
    return n, total


def cmd_build(args) -> int:
    # The engine reads REALSR_TPU_CACHE once (lru-cached enable) — pin the
    # build dir BEFORE anything imports realsr_tpu.
    base = tempfile.mkdtemp(prefix="realsr_seedcache_")
    os.environ["REALSR_TPU_CACHE"] = base

    import jax

    # honor an explicit JAX_PLATFORMS even under this environment's
    # sitecustomize backend registration (same fix as the native bridge)
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        jax.config.update("jax_platforms", plats)

    from realsr_tpu.engine import EngineConfig, RealSR, _enable_compilation_cache

    _enable_compilation_cache()
    # A seed must capture EVERYTHING the production dispatch compiles,
    # including the seconds-scale glue programs the runtime default
    # (min_compile_time 1.0 s) would skip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    fp, feats = _fingerprint()
    mdir = args.model
    if mdir is None:
        if os.path.exists(os.path.join(REPO, "models/models-DF2K/x4.bin")):
            mdir = os.path.join(REPO, "models/models-DF2K")
        else:
            sys.path.insert(0, os.path.join(REPO, "tools"))
            import make_goldens as G

            mdir = G.golden_model_dir()

    # default config (fast_start on): the seed must mirror what a shipped-
    # default process runs — precompile(serving=True) covers the
    # production set incl. the packed-tail upgrade, and fast_start_ramp
    # (below) covers the tile-64 foreground programs the seeded process's
    # first images serve on (the ramp only lowers when this engine would
    # ramp, which requires the default fast_start=True config).
    eng = RealSR(gpuid=args.gpuid, tta_mode=args.tta,
                 config=EngineConfig())
    eng.load(mdir + "/x4.param", mdir + "/x4.bin")

    sizes = []
    built = 0
    t0 = time.perf_counter()
    for tok in args.sizes.split(","):
        w, h = (int(x) for x in tok.lower().split("x"))
        for channels in ([3, 4] if args.alpha else [3]):
            t1 = time.perf_counter()
            # fast_start_ramp: the seeded process is a DIFFERENT process
            # with an empty AOT table — its default-path first image runs
            # on the FAST_START_TILE ramp, so the seed must cover those
            # programs too.
            n = eng.precompile(w, h, channels=channels, fast_start_ramp=True)
            dt = time.perf_counter() - t1
            built += n
            sizes.append({"w": w, "h": h, "channels": channels,
                          "programs": n, "compile_s": round(dt, 1)})
            print(f"seed_cache: {w}x{h} c{channels}: {n} programs "
                  f"in {dt:.1f}s", file=sys.stderr)

    # cache writes are synchronous in-process, but poll briefly anyway so a
    # late background flush can't truncate the tarball.
    deadline = time.time() + 10
    entries, size_b = _dir_stats(base)
    while time.time() < deadline:
        time.sleep(1.0)
        n2, s2 = _dir_stats(base)
        if (n2, s2) == (entries, size_b):
            break
        entries, size_b = n2, s2

    manifest = {
        "fingerprint": fp,
        "host_features": feats,
        "backend": eng.device.platform,
        "device_kind": getattr(eng.device, "device_kind", ""),
        "model_dir": os.path.basename(os.path.abspath(mdir)),
        "tta": bool(args.tta),
        "sizes": sizes,
        "entries": entries,
        "bytes": size_b,
        "build_wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(os.path.join(base, fp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)

    with tarfile.open(args.out, "w:gz") as tar:
        # archive the fingerprint SUBDIR (install extracts into the base)
        tar.add(os.path.join(base, fp), arcname=fp)
    print(json.dumps({**manifest, "tarball": args.out,
                      "tarball_bytes": os.path.getsize(args.out)}))
    return 0 if entries > 0 else 1


def _read_manifest(tar_path):
    with tarfile.open(tar_path, "r:gz") as tar:
        for m in tar.getmembers():
            if os.path.basename(m.name) == MANIFEST:
                return json.load(tar.extractfile(m)), tar.getmembers()
    raise SystemExit(f"{tar_path}: no {MANIFEST} inside — not a seed cache")


def cmd_info(args) -> int:
    manifest, members = _read_manifest(args.tarball)
    manifest["files"] = sum(1 for m in members if m.isfile())
    print(json.dumps(manifest, indent=1))
    return 0


def cmd_install(args) -> int:
    manifest, _members = _read_manifest(args.tarball)
    base = _cache_base(args.cache_base)
    os.makedirs(base, exist_ok=True)
    with tarfile.open(args.tarball, "r:gz") as tar:
        # refuse path traversal: every member must stay under the base,
        # and only regular files/dirs are allowed — a symlink member
        # passes the realpath check at inspection time (its target does
        # not exist yet) but would redirect a LATER member's write
        # outside the base on the py<3.12 plain-extractall fallback.
        # A seed cache has no business containing links of any kind.
        for m in tar.getmembers():
            if not (m.isreg() or m.isdir()):
                raise SystemExit(
                    f"refusing non-file member: {m.name} ({m.type!r})"
                )
            dest = os.path.realpath(os.path.join(base, m.name))
            if not dest.startswith(os.path.realpath(base) + os.sep):
                raise SystemExit(f"refusing unsafe member path: {m.name}")
        try:
            tar.extractall(base, filter="data")
        except TypeError:  # Python < 3.12: manual checks above suffice
            tar.extractall(base)
    fp, feats = _fingerprint()
    match = fp == manifest.get("fingerprint")
    print(json.dumps({
        "installed_to": os.path.join(base, manifest.get("fingerprint", "")),
        "fingerprint_match": match,
        "this_host": fp,
        "seed_host": manifest.get("fingerprint"),
    }))
    if not match:
        print(
            "seed_cache: WARNING — this host's fingerprint differs from the "
            "seed's (different device kind / jax build / ISA); the installed "
            "entries are inert (the engine reads a different subdir). Build "
            "a seed on a matching host for this deployment.",
            file=sys.stderr,
        )
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="precompile + tar a seed cache")
    b.add_argument("out", help="output .tar.gz path")
    b.add_argument("-m", "--model", default=None,
                   help="model dir (default: repo models/models-DF2K)")
    b.add_argument("--sizes", default="1024x1024",
                   help="comma list of WxH input sizes to precompile")
    b.add_argument("--tta", action="store_true")
    b.add_argument("--alpha", action="store_true",
                   help="also precompile the 4-channel (alpha) programs")
    b.add_argument("--gpuid", type=int, default=0)
    b.set_defaults(fn=cmd_build)

    i = sub.add_parser("install", help="extract a seed into the cache base")
    i.add_argument("tarball")
    i.add_argument("--cache-base", default=None,
                   help="cache base dir (default: $REALSR_TPU_CACHE or "
                        "~/.cache/realsr_tpu_xla)")
    i.set_defaults(fn=cmd_install)

    n = sub.add_parser("info", help="print a seed tarball's manifest")
    n.add_argument("tarball")
    n.set_defaults(fn=cmd_info)

    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
