"""Multi-device execution: tile-batch sharding over a jax.sharding.Mesh."""

from realsr_tpu.parallel.mesh import make_mesh, replicated, tile_sharded

__all__ = ["make_mesh", "replicated", "tile_sharded"]
