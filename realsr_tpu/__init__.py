"""realsr_tpu — a TPU-native image super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nihui/realsr-ncnn-vulkan (reference: /root/reference):

- loads RealSR DF2K / DF2K_JPEG 4x models directly from ncnn ``.param``/``.bin``
  files (reference: src/realsr.cpp:75-76) into a JAX graph,
- runs the ESRGAN-style RRDBNet (23 RRDB blocks, nf=64, gc=32,
  nearest+conv upsampler; reference: models/models-DF2K/x4.param) as
  jit-compiled XLA computations with bf16 storage / f32 accumulation,
- reproduces halo-padded seam-free tiling with reflect-101 borders
  (reference: src/realsr_preproc.comp:56-62), 8-way dihedral TTA
  (reference: src/realsr_preproc_tta.comp), alpha bicubic passthrough
  (reference: src/realsr.cpp:128-140), a threaded load->proc->save pipeline
  (reference: src/main.cpp:117-416) and multi-device tile sharding
  (reference: src/main.cpp:778-791 maps to a jax.sharding.Mesh here).

The public facade is :class:`realsr_tpu.engine.RealSR`, mirroring the
reference's ``RealSR`` class (reference: src/realsr.h:13-42) with a
TPU-idiomatic implementation underneath.
"""

from realsr_tpu.version import __version__

__all__ = ["RealSR", "EngineConfig", "__version__"]


def __getattr__(name):
    # Lazy: importing the facade pulls in jax; keep bare imports light.
    if name in ("RealSR", "EngineConfig"):
        from realsr_tpu import engine

        return getattr(engine, name)
    raise AttributeError(name)
