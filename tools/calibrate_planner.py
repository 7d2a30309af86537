"""Re-measure tiling/planner._RATE_ANCHORS at the current kernel config
(VERDICT r1 #10: the anchors drive pick_tilesize; make them reproducible).

Protocol: the full-model forward on batch-8 padded tiles at each anchor
side, INTERLEAVED rounds with min-of-rounds per side — the shared TPU
host's absolute throughput swings 30-60% between processes, so only
within-process ratios are trusted. Prints the measured per-padded-pixel
cost ratios in _RATE_ANCHORS format and compares with the shipped table.

Run on the TPU: ``python tools/calibrate_planner.py``.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SIDES = (148, 212, 276)  # padded sides of tiles 128/192/256 at halo 10
BATCH = 8
ROUNDS = int(os.environ.get("REALSR_CAL_ROUNDS", "5"))


def main() -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from realsr_tpu.engine import EngineConfig, RealSR
    from realsr_tpu.tiling.planner import _RATE_ANCHORS

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_goldens as G

    mdir = G.golden_model_dir()
    eng = RealSR(gpuid=0, config=EngineConfig(tilesize=256))
    eng.load(mdir + "/x4.param", mdir + "/x4.bin")
    fwd = jax.jit(eng.bundle.forward)

    rng = np.random.default_rng(0)
    xs = {
        s: jnp.asarray(
            rng.normal(0, 0.3, (BATCH, s, s, 3)).astype(np.float32),
            dtype=eng.storage_dtype,
        )
        for s in SIDES
    }
    for s in SIDES:  # compile + first-run warm, excluded from timing
        np.asarray(fwd(eng._params, xs[s]).ravel()[0])
        print(f"side {s} compiled", flush=True)

    best = {s: float("inf") for s in SIDES}
    for r in range(ROUNDS):
        for s in SIDES:  # interleaved
            t0 = time.perf_counter()
            np.asarray(fwd(eng._params, xs[s]).ravel()[0])
            best[s] = min(best[s], time.perf_counter() - t0)

    us_px = {s: best[s] * 1e6 / (BATCH * s * s) for s in SIDES}
    base = us_px[SIDES[0]]
    anchors = tuple((s, round(us_px[s] / base, 3)) for s in SIDES)
    print(f"measured us/padded-px: " +
          ", ".join(f"{s}: {us_px[s]:.3f}" for s in SIDES))
    print(f"_RATE_ANCHORS measured: {anchors}")
    print(f"_RATE_ANCHORS shipped:  {_RATE_ANCHORS}")
    drift = max(
        abs(m - dict(_RATE_ANCHORS).get(s, m)) for s, m in anchors
    )
    print(f"max anchor drift: {drift:.3f} "
          f"({'OK, within noise' if drift < 0.08 else 'UPDATE the table'})")
    val = ",".join(f"{s}:{r}" for s, r in anchors)
    if drift >= 0.08:
        # apply without editing code: the planner reads this env override
        # (tiling.planner._anchors)
        print(f"apply with: export REALSR_TPU_RATE_ANCHORS=\"{val}\"")
    if "--save" in sys.argv:
        # persist install-locally: the planner reads this file whenever the
        # env override is absent (tiling.planner._anchors priority chain)
        import json

        from realsr_tpu.tiling.planner import _anchor_file

        path = _anchor_file()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            # device_kind stamps the calibration's provenance — the engine
            # prints a drift notice when the runtime device differs
            # (tiling.planner.anchor_provenance_notice)
            json.dump(
                {
                    "anchors": val,
                    "us_per_px": us_px,
                    "device_kind": getattr(
                        eng.device, "device_kind", eng.device.platform
                    ),
                },
                f,
            )
        print(f"saved calibration to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
