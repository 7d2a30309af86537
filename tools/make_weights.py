#!/usr/bin/env python3
"""Synthesize x4.bin weights for the DF2K model dirs.

The reference snapshot ships x4.param graphs but no weights
(/root/reference/.MISSING_LARGE_BLOBS). This tool writes deterministic
random weights in the real ncnn .bin format against the REAL reference
x4.param (copied alongside), so the full CLI/bench path runs end-to-end.

Usage: python tools/make_weights.py [outdir] [--seed N]
Creates <outdir>/models-DF2K/x4.{param,bin} and models-DF2K_JPEG/ (seed+1).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realsr_tpu.ncnn.bin import write_weights
from realsr_tpu.ncnn.param import parse_param_file
from realsr_tpu.ncnn.synth import make_rrdbnet_param_text, synth_weights
from realsr_tpu.models.rrdbnet import RRDBNetSpec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="models")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for i, name in enumerate(("models-DF2K", "models-DF2K_JPEG")):
        d = os.path.join(args.outdir, name)
        os.makedirs(d, exist_ok=True)
        param_path = os.path.join(d, "x4.param")
        if not os.path.exists(param_path):  # committed graphs take priority
            with open(param_path, "w") as f:
                f.write(make_rrdbnet_param_text(RRDBNetSpec()))
        graph = parse_param_file(param_path)
        write_weights(
            graph, synth_weights(graph, seed=args.seed + i), os.path.join(d, "x4.bin")
        )
        print(f"wrote {d}/x4.param + x4.bin ({graph.layer_count} layers)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
