"""Tiling engine: halo-padded tile planning with static-shape buckets."""

from realsr_tpu.tiling.planner import Tile, TilePlan, auto_tilesize, plan_tiles

__all__ = ["Tile", "TilePlan", "auto_tilesize", "plan_tiles"]
