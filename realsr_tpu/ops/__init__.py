"""Numerics ops: padding, resize, TTA transforms, tile pre/post-processing."""
