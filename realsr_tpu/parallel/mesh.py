"""Device mesh + sharding helpers.

The reference scales across GPUs by running one independent engine per
device and pulling whole images from a shared queue (src/main.cpp:778-791)
— data parallelism over images with zero inter-device traffic. The pipeline
preserves that mode (one RealSR per device id in ``-g``).

This module adds the TPU-native mode the reference cannot express: shard
ONE image's tile batch across an ICI mesh (SURVEY.md §2.2 #3 — tiles are
embarrassingly parallel; the halo is materialized per tile so no neighbor
exchange is needed). Params are replicated, the tile batch axis is sharded,
and the only cross-device movement is XLA's gather of per-device tile
outputs into the replicated output buffer — which rides ICI.

Axis name: "tiles" (dp over the tile batch; the spatial axis of an image is
exactly what it partitions, so it doubles as this domain's sp).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TILE_AXIS = "tiles"


def default_pool() -> list:
    """The accelerator pool device ids index into: all non-CPU devices, or
    every device on a CPU-only host (virtual meshes included) — ONE rule,
    shared by the engine, both CLIs, and make_mesh."""
    return [d for d in jax.devices() if d.platform != "cpu"] or jax.devices()


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the given devices (default: all accelerators)."""
    if devices is None:
        devices = default_pool()
    return Mesh(np.asarray(devices), (TILE_AXIS,))


def mesh_from_env(spec: str) -> Mesh:
    """Build a mesh from a REALSR_TPU_MESH value: ``all`` or a comma list
    of pool indices. Raises ValueError with a clean message on bad input
    (both CLIs surface it as the 'invalid REALSR_TPU_MESH' diagnostic)."""
    pool = default_pool()
    if spec == "all":
        return make_mesh(pool)
    try:
        idxs = [int(s) for s in spec.split(",") if s.strip() != ""]
    except ValueError:
        raise ValueError(f"invalid REALSR_TPU_MESH {spec!r}") from None
    if (
        not idxs
        or any(i < 0 or i >= len(pool) for i in idxs)
        or len(set(idxs)) != len(idxs)  # a Mesh must not repeat a device
    ):
        raise ValueError(
            f"invalid REALSR_TPU_MESH {spec!r} (pool has {len(pool)} devices)"
        )
    return make_mesh([pool[i] for i in idxs])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tile_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (tile-batch) axis."""
    return NamedSharding(mesh, P(TILE_AXIS))
