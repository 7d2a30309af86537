"""PSNR / bit-exact-rate between two images (files or arrays).

The reference project validated outputs by eye against committed samples
(/root/reference/README.md:102-130); the framework's quality bar is
numeric: PSNR >= 50 dB vs reference outputs (BASELINE.json north_star)
plus the uint8 bit-exact match rate. This tool is the single source of
that comparison for tests, bench.py and manual checks.

CLI: ``python tools/psnr.py a.png b.png`` -> one JSON line.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """PSNR in dB over uint8 (or float) arrays; ``inf`` when identical."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def bit_exact_rate(a: np.ndarray, b: np.ndarray) -> float:
    """Fraction of elements that match exactly."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    return float(np.mean(a == b))


def compare(a: np.ndarray, b: np.ndarray) -> dict:
    d = np.abs(np.asarray(a, np.int64) - np.asarray(b, np.int64))
    return {
        "psnr_db": round(psnr(a, b), 3),
        "bit_exact_rate": round(bit_exact_rate(a, b), 6),
        "max_abs_diff": int(d.max()) if d.size else 0,
        "shape": list(np.asarray(a).shape),
    }


def _load(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA" if "A" in
                      Image.open(path).mode else "RGB"))


def main(argv) -> int:
    if len(argv) != 3:
        print("usage: psnr.py <a.png> <b.png>", file=sys.stderr)
        return 2
    a, b = _load(argv[1]), _load(argv[2])
    if a.shape != b.shape:
        print(json.dumps({"error": f"shape mismatch {a.shape} vs {b.shape}"}))
        return 1
    print(json.dumps(compare(a, b)))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
