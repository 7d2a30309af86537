"""Decompose the cold first-image latency into its slices (VERDICT r4
weak #3: ~32.6 s calm-window first image, of which engine load 3.3 s and
the tile-64 Mosaic compile ~9 s were accounted — this tool measures where
the other ~20 s live so they can be attacked, not guessed).

Slices, each individually fenced on a fresh isolated cache:

  load_parse_s      parse param/bin + build jits (host only)
  params_h2d_s      explicit device_put of the 66.8 MB param tree + fence
                    (through THIS environment's tunnel; PCIe on a real
                    host)
  prep_compile_s    full-image prep program (image-size-dependent)
  extract_compile_s tile-extract program (image-size-dependent)
  compute_lower_s   foreground tile-64 trace+lower (GIL-bound Python)
  compute_compile_s foreground tile-64 XLA+Mosaic compile
  scatter_compile_s scatter program (image-size-dependent)
  h2d_prep_run_s    image upload + prep execute + fence
  first_chunk_s     first chunk dispatch (all programs warm) + fence
  rest_chunks_s     remaining chunks + final fence

Usage: python tools/coldstart_decompose.py [size] [tile]
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

_tmp = tempfile.mkdtemp(prefix="realsr_colddec_")
os.environ["REALSR_TPU_CACHE"] = _tmp

import numpy as np  # noqa: E402


def main() -> int:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    import jax

    from realsr_tpu.engine import FAST_START_TILE, EngineConfig, RealSR
    from realsr_tpu.tiling.planner import plan_tiles

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_goldens as G

    mdir = G.golden_model_dir()
    t = {}

    # load WITHOUT the implicit device_put fence: measure parse+jit-build
    # and the params H2D separately
    eng = RealSR(gpuid=0, config=EngineConfig(fast_start=False, tilesize=tile))
    t0 = time.perf_counter()
    eng.load(mdir + "/x4.param", mdir + "/x4.bin")
    t["load_parse_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.tree.map(
        lambda a: np.asarray(a.ravel()[0]) if hasattr(a, "ravel") else a,
        eng._params,
    )
    t["params_h2d_s"] = time.perf_counter() - t0

    tile = tile or FAST_START_TILE  # what a fast-start first image runs
    pad = eng.prepadding
    plan = plan_tiles(size, size, tile, pad)
    if len(plan.buckets) != 1:
        # this tool decomposes the SINGLE-bucket case (the default
        # 1024/64 grid); dispatching edge tiles through the interior
        # bucket's programs would time the wrong shapes and compute
        # garbage. Pick a size divisible by the tile.
        print(
            f"coldstart_decompose: {size}x{size} at tile {tile} plans "
            f"{len(plan.buckets)} tile buckets; this tool requires a "
            "single-bucket grid (size divisible by tile).",
            file=sys.stderr,
        )
        return 2
    (ph, pw), idxs = next(iter(plan.buckets.items()))
    bsz, _ = eng._chunking(tile, len(idxs))
    hn, wn = ph - 2 * pad, pw - 2 * pad

    S = jax.ShapeDtypeStruct
    img_s = S((1, size, size, 3), np.uint8)
    t0 = time.perf_counter()
    eng._prep.lower(img_s, pad).compile()
    t["prep_compile_s"] = time.perf_counter() - t0

    padded_s = S((1, size + 2 * pad, size + 2 * pad, 3), eng.storage_dtype)
    alpha_s = S((1, size, size, 0), np.float32)
    ivec = S((bsz,), np.int32)
    t0 = time.perf_counter()
    eng._extract_chunk.lower(
        padded_s, alpha_s, ivec, ivec, ivec, ph, pw, hn, wn, False
    ).compile()
    t["extract_compile_s"] = time.perf_counter() - t0

    import functools

    SD = functools.partial(
        jax.ShapeDtypeStruct,
        sharding=jax.sharding.SingleDeviceSharding(eng.device),
    )
    tiles_s = SD((bsz, ph, pw, 3), eng.storage_dtype)
    atiles_s = SD((bsz, 0, 0, 0), np.float32)
    t0 = time.perf_counter()
    low = eng._compute_chunk.lower(
        eng._params, tiles_s, atiles_s, ph, pw, hn, wn, False, False
    )
    t["compute_lower_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    comp = low.compile()
    t["compute_compile_s"] = time.perf_counter() - t0
    eng._aot_compute[(ph, pw, bsz, False, False)] = comp

    out_s = S((1, size * 4, size * 4, 3), np.uint8)
    tiles_u8_s = S((bsz, hn * 4, wn * 4, 3), np.uint8)
    t0 = time.perf_counter()
    eng._scatter_chunk.lower(out_s, tiles_u8_s, ivec, ivec, ivec).compile()
    t["scatter_compile_s"] = time.perf_counter() - t0

    # now run the first image with every program warm, splitting H2D+prep
    # from the chunk stream
    img = np.random.default_rng(0).integers(0, 256, (size, size, 3), np.uint8)
    t0 = time.perf_counter()
    dev = jax.device_put(img[None], eng.device)
    padded, alpha = eng._prep(dev, pad)
    np.asarray(padded[0, 0, 0, 0])
    t["h2d_prep_run_s"] = time.perf_counter() - t0

    out_buf = eng._alloc_out((1, size * 4, size * 4, 3))
    triples = [(0, pt.x0, pt.y0) for pt in plan.tiles]
    n = len(triples)
    nc = -(-n // bsz)
    triples += [triples[-1]] * (nc * bsz - n)
    imgs = np.asarray([x[0] for x in triples], np.int32).reshape(nc, bsz)
    xs = np.asarray([x[1] for x in triples], np.int32).reshape(nc, bsz)
    ys = np.asarray([x[2] for x in triples], np.int32).reshape(nc, bsz)

    def chunk(k):
        nonlocal out_buf
        tl, al = eng._extract_chunk(
            padded, alpha, imgs[k], xs[k], ys[k], ph, pw, hn, wn, False
        )
        u8 = comp(eng._params, tl, al)
        out_buf = eng._scatter_chunk(out_buf, u8, imgs[k], xs[k], ys[k])

    t0 = time.perf_counter()
    chunk(0)
    np.asarray(out_buf[0, 0, 0, 0])
    t["first_chunk_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for k in range(1, nc):
        chunk(k)
    np.asarray(out_buf[0, 0, 0, 0])
    t["rest_chunks_s"] = time.perf_counter() - t0

    t = {k: round(v, 2) for k, v in t.items()}
    t["total_s"] = round(sum(t.values()), 2)
    t["config"] = {
        "size": size, "tile": tile, "bucket": [ph, pw], "bsz": bsz,
        "n_chunks": nc, "cache": _tmp,
    }
    print(json.dumps(t), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
