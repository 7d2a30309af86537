"""Model family implementations (TPU-first, NHWC, scan-structured)."""

from realsr_tpu.models.rrdbnet import RRDBNetSpec, rrdbnet_forward, init_rrdbnet_params

__all__ = ["RRDBNetSpec", "rrdbnet_forward", "init_rrdbnet_params"]
