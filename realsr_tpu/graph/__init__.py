"""Graph layer: ncnn ParamGraph -> JAX computation.

Two paths:
- :mod:`realsr_tpu.graph.executor` — a generic, jittable interpreter that
  executes any supported ncnn graph (the fallback, and the reference
  implementation for parity tests).
- :mod:`realsr_tpu.graph.rrdb_match` — a structural matcher that recognizes
  the RRDBNet idiom in a parsed graph and extracts stacked parameters for
  the fast `lax.scan`-based model in :mod:`realsr_tpu.models.rrdbnet`.
"""

from realsr_tpu.graph.executor import build_forward, convert_weights_nhwc
from realsr_tpu.graph.rrdb_match import match_rrdbnet

__all__ = ["build_forward", "convert_weights_nhwc", "match_rrdbnet"]
