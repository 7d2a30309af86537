"""Embedded-interpreter bridge for the C++ CLI (native/cli/main.cpp).

The C++ binary owns argument parsing, file listing, the bounded task queue
and the codec threads (the reference's native surface, src/main.cpp); it
calls into this module only for the device work:

    init(config_json) -> [scale]     build one engine per device id
    process(engine_idx, pixels, w, h, c) -> bytes   uint8 HWC in/out

Buffers cross the boundary as raw bytes (C contiguous HWC uint8); at relay
transfer rates the extra copy is noise next to H2D/D2H.
"""

from __future__ import annotations

import json
import os
from typing import List

_engines: List = []


def init(config_json: str) -> int:
    """Build engines per the CLI's parsed config. Returns the model scale."""
    cfg = json.loads(config_json)
    gpuid = cfg["gpuid"]

    if gpuid and all(g == -1 for g in gpuid):
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if all(g == -1 for g in gpuid):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from realsr_tpu.engine import EngineConfig, RealSR

    global _engines
    _engines = []
    storage = os.environ.get("REALSR_TPU_STORAGE", "auto")
    for i, g in enumerate(gpuid):
        ec = EngineConfig(
            tilesize=cfg["tilesize"][i],
            prepadding=cfg["prepadding"],
            storage=storage,
        )
        e = RealSR(
            gpuid=g,
            tta_mode=cfg["tta_mode"],
            num_threads=cfg["jobs_proc"][i],
            config=ec,
        )
        e.load(cfg["parampath"], cfg["modelpath"])
        _engines.append(e)
    return _engines[0].scale


def process(engine_idx: int, pixels: bytes, w: int, h: int, c: int) -> bytes:
    """Run one image through engine ``engine_idx``; returns scaled u8 HWC."""
    import numpy as np
    import sys

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, c)
    eng = _engines[engine_idx]

    def cb(frac):  # per-tile progress contract (realsr.cpp:481)
        print(f"{frac * 100.0:.2f}%", file=sys.stderr)

    out = eng.process(img, progress_cb=cb)
    return out.tobytes()


def num_engines() -> int:
    return len(_engines)
