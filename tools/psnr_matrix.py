#!/usr/bin/env python3
"""PSNR vs weight-statistics class x storage mode (VERDICT r2 #5).

The claim "trained weights land much closer than synthetic at reduced
storage precision" must be MEASURED, not asserted. This tool runs the
pinned golden config (tools/make_goldens.py: 80x80 crop of the reference
sample, full 999-layer DF2K graph, tile 48) for each weight-statistics
class (iid N(0,0.05) amplifying worst case; trained-statistics surrogate,
realsr_tpu.ncnn.synth.synth_weights stats='trained') under every storage
mode, reporting PSNR against the same-weights f32 output.

Run on CPU (dense variant) or TPU (auto -> pallas kernel for
mixed/bfloat16):  python tools/psnr_matrix.py [--modes mixed,bfloat16,...]
Results land in the table in goldens/README.md.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import make_goldens as G  # noqa: E402
from psnr import psnr  # noqa: E402


def model_dir(stats: str, seed: int = 0) -> str:
    from realsr_tpu.ncnn.bin import write_weights
    from realsr_tpu.ncnn.param import parse_param_file
    from realsr_tpu.ncnn.synth import make_rrdbnet_param_text, synth_weights
    from realsr_tpu.models.rrdbnet import RRDBNetSpec

    d = f"/tmp/realsr_psnr_matrix/{stats}{seed}/models-DF2K"
    if not (os.path.exists(d + "/x4.param") and os.path.exists(d + "/x4.bin")):
        os.makedirs(d, exist_ok=True)
        if os.path.exists(G.REF_PARAM):
            import shutil

            shutil.copy(G.REF_PARAM, d + "/x4.param")
        else:
            with open(d + "/x4.param", "w") as f:
                f.write(make_rrdbnet_param_text(RRDBNetSpec()))
        graph = parse_param_file(d + "/x4.param")
        write_weights(
            graph, synth_weights(graph, seed=seed, stats=stats), d + "/x4.bin"
        )
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--modes", default="mixed,bfloat16,float16",
        help="storage modes to compare against float32",
    )
    ap.add_argument("--stats", default="iid,trained")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from realsr_tpu.engine import EngineConfig, RealSR

    img = G.golden_input()
    for stats in args.stats.split(","):
        d = model_dir(stats, args.seed)

        def run(storage):
            # "paired": the mixed config with the hi+lo bf16 carried state
            # (models.rrdbnet.PAIRED_CARRY trace-time flag, pallas only)
            from realsr_tpu.models import rrdbnet as R

            flag = storage == "paired"
            old = R.PAIRED_CARRY
            R.PAIRED_CARRY = flag or old
            try:
                e = RealSR(
                    gpuid=0,
                    config=EngineConfig(
                        tilesize=G.TILESIZE,
                        storage="mixed" if flag else storage,
                    ),
                )
                e.load(d + "/x4.param", d + "/x4.bin")
                out = e.process(img)
            finally:
                R.PAIRED_CARRY = old
            return out, e.variant

        ref, _ = run("float32")
        for mode in args.modes.split(","):
            out, variant = run(mode)
            note = ""
            if mode == "paired" and variant != "pallas":
                # PAIRED_CARRY is read only inside _forward_pallas; on the
                # dense/scatter variant this row would silently equal
                # plain mixed — mark it invalid rather than record it
                note = "  [INVALID: paired needs variant=pallas]"
            print(
                f"stats={stats:8s} storage={mode:9s} variant={variant:7s} "
                f"psnr_vs_f32={psnr(ref, out):6.2f} dB{note}",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
