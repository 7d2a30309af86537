"""RealSR engine facade: tiled, TTA-capable, alpha-aware super-resolution.

TPU-native re-design of the reference's ``RealSR`` class
(src/realsr.h:13-42, src/realsr.cpp:145-523). The reference streams row
bands to the GPU and dispatches one preproc/infer/postproc triple per tile
with a ``submit_and_wait`` sync per tile (src/realsr.cpp:475-479). Here the
whole pipeline is reshaped around XLA:

1. upload the uint8 image once; one fused jit normalizes to storage dtype
   and reflect-101-pads it (src/realsr_preproc.comp semantics),
2. tiles are grouped into <=4 static-shape buckets (tiling.planner) and
   processed as BATCHES — the batch axis replaces the reference's
   sequential tile loop and is what a device mesh shards,
3. outputs are rounded to uint8 on device (``clamp(floor(v*255+0.5))``,
   src/realsr_postproc.comp:66-83) and scattered into a full-resolution
   device buffer; a single D2H per image replaces per-row-band downloads,
4. TTA runs the 8 dihedral variants as one batched forward (two for
   non-square edge tiles) instead of 8 sequential submits
   (src/realsr.cpp:302-318).

Numerics contract (SURVEY.md §2.7): normalize x1/255; reflect-101 halo of
``prepadding`` (10 for DF2K); denorm ``v*255+0.5`` floor-clamp; TTA mean
x0.125; alpha never enters the net — it is bicubic-upscaled (A=-0.75) raw
in 0..255 and merged back.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Callable, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from realsr_tpu.loader import ModelBundle, load_model
from realsr_tpu.ops.pad import reflect101_pad2d
from realsr_tpu.ops.resize import bicubic_x4, resize_nhwc
from realsr_tpu.ops.tta import NUM_TRANSFORMS, d4_inverse, d4_transform
from realsr_tpu.tiling.planner import TilePlan, auto_tilesize, plan_tiles


@dataclasses.dataclass
class EngineConfig:
    tilesize: int = 0  # 0 = auto from device memory (planner.auto_tilesize)
    prepadding: int = 10  # DF2K halo (src/main.cpp:661-667)
    storage: str = "auto"  # "auto" | "float32" | "bfloat16"
    max_batch: int = 0  # 0 = auto from tilesize
    compilation_cache: bool = True


def _storage_dtype(storage: str, device) -> jnp.dtype:
    if storage == "float32":
        return jnp.float32
    if storage == "bfloat16":
        return jnp.bfloat16
    # auto: bf16 storage on accelerator (reference uses fp16 storage on GPU,
    # src/realsr.cpp:45), f32 on CPU (reference CPU path is all-f32).
    return jnp.bfloat16 if device.platform != "cpu" else jnp.float32


def _auto_batch(tilesize: int, tta: bool) -> int:
    px = (tilesize + 20) ** 2
    b = max(1, min(16, int(2_000_000 / px)))
    if tta:
        b = max(1, b // 4)
    return b


def _round_u8(v: jnp.ndarray) -> jnp.ndarray:
    """f32 -> uint8 with the reference's rounding (postproc.comp:66-83)."""
    return jnp.clip(jnp.floor(v * 255.0 + 0.5), 0.0, 255.0).astype(jnp.uint8)


class RealSR:
    """Engine bound to one device; mirrors reference ctor/load/process
    (src/realsr.h:20-27). ``gpuid=-1`` selects the JAX CPU backend."""

    def __init__(
        self,
        gpuid: int = 0,
        tta_mode: bool = False,
        num_threads: int = 1,
        config: Optional[EngineConfig] = None,
        device=None,
    ):
        self.config = config or EngineConfig()
        if device is not None:
            self.device = device
        elif gpuid == -1:
            self.device = jax.devices("cpu")[0]
        else:
            accel = [d for d in jax.devices() if d.platform != "cpu"]
            pool = accel or jax.devices()
            if gpuid >= len(pool):
                raise ValueError(
                    f"device {gpuid} out of range ({len(pool)} available)"
                )
            self.device = pool[gpuid]
        self.tta_mode = tta_mode
        self.num_threads = num_threads  # API parity; XLA owns intra-op threads
        self.bundle: Optional[ModelBundle] = None
        self.scale = 4
        self.prepadding = self.config.prepadding
        self.tilesize = self.config.tilesize or self._auto_tilesize()
        if self.config.compilation_cache:
            _enable_compilation_cache()

    # -- setup ---------------------------------------------------------

    def _auto_tilesize(self) -> int:
        is_cpu = self.device.platform == "cpu"
        budget_mb = 16 * 1024
        try:
            stats = self.device.memory_stats() or {}
            limit = stats.get("bytes_limit")
            in_use = stats.get("bytes_in_use", 0)
            if limit:
                budget_mb = (limit - in_use) // (1024 * 1024)
        except Exception:
            pass
        return auto_tilesize(budget_mb, is_cpu=is_cpu)

    def load(self, parampath: str, modelpath: str) -> int:
        """Parse + load model files, move params to the device, build jits.

        Returns 0 like the reference (src/realsr.cpp:142)."""
        dtype = _storage_dtype(self.config.storage, self.device)
        self.storage_dtype = dtype
        self.bundle = load_model(parampath, modelpath, storage_dtype=dtype)
        self.scale = self.bundle.scale
        self._params = jax.device_put(self.bundle.params, self.device)
        self._build_jits()
        return 0

    def _build_jits(self) -> None:
        forward = self.bundle.forward
        scale = self.scale
        pad = self.prepadding
        dtype = self.storage_dtype

        @functools.partial(jax.jit, static_argnames=("pad_",))
        def prep(img_u8, pad_):
            """u8 HWC -> (reflect-padded normalized storage [H+2p,W+2p,3],
            raw-valued f32 alpha [H,W] or zero-size)."""
            color = img_u8[..., :3].astype(jnp.float32) * (1.0 / 255.0)
            padded = reflect101_pad2d(color.astype(dtype), pad_)
            alpha = img_u8[..., 3:].astype(jnp.float32)  # empty if C==3
            return padded, alpha

        @functools.partial(
            jax.jit, static_argnames=("ph", "pw", "hn", "wn", "tta")
        )
        def run_bucket(params, padded, xs, ys, *, ph, pw, hn, wn, tta):
            """Batched tile forward: extract [B,ph,pw,3] -> u8 [B,hn*s,wn*s,3].

            xs/ys are the tiles' UNPADDED input origins; in padded-image
            coords the halo start is exactly (ys, xs) (planner docstring).
            """

            def extract(x0, y0):
                return jax.lax.dynamic_slice(padded, (y0, x0, 0), (ph, pw, 3))

            tiles = jax.vmap(extract)(xs, ys)  # [B, ph, pw, 3] storage
            if not tta:
                out = forward(params, tiles)  # f32 [B, ph*s, pw*s, 3]
            else:
                groups: List[jnp.ndarray] = []
                square = ph == pw
                if square:
                    batch = jnp.concatenate(
                        [d4_transform(tiles, k) for k in range(NUM_TRANSFORMS)]
                    )
                    y_all = forward(params, batch)
                    groups = list(jnp.split(y_all, NUM_TRANSFORMS))
                else:
                    b0 = jnp.concatenate(
                        [d4_transform(tiles, k) for k in range(4)]
                    )
                    b1 = jnp.concatenate(
                        [d4_transform(tiles, k) for k in range(4, 8)]
                    )
                    y0 = forward(params, b0)
                    y1 = forward(params, b1)
                    groups = list(jnp.split(y0, 4)) + list(jnp.split(y1, 4))
                acc = None
                for k, g in enumerate(groups):
                    v = d4_inverse(g, k).astype(jnp.float32)
                    acc = v if acc is None else acc + v
                out = acc * (1.0 / NUM_TRANSFORMS)
            # crop the halo (postproc.comp crop = prepadding*scale, :64)
            out = out[
                :,
                pad * scale : (pad + hn) * scale,
                pad * scale : (pad + wn) * scale,
                :,
            ]
            return _round_u8(out)

        @functools.partial(jax.jit, static_argnames=("hn", "wn"))
        def alpha_bucket(alpha, xs, ys, *, hn, wn):
            """Alpha tiles: unpadded slice -> bicubic x{scale} -> u8.

            Alpha stays in raw 0..255 through resize (preproc.comp:79-88
            writes it unnormalized), rounded with the same +0.5 floor."""

            def extract(x0, y0):
                return jax.lax.dynamic_slice(alpha, (y0, x0, 0), (hn, wn, 1))

            tiles = jax.vmap(extract)(xs, ys)  # [B, hn, wn, 1] f32
            if scale == 1:
                up = tiles
            elif scale == 4:
                up = bicubic_x4(tiles)
            else:
                up = resize_nhwc(tiles, hn * scale, wn * scale, "bicubic")
            return jnp.clip(jnp.floor(up + 0.5), 0.0, 255.0).astype(jnp.uint8)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scatter(buf, tiles_u8, xs, ys):
            """Write [B, th, tw, C] tiles into the full output buffer."""

            def body(b, t):
                tile, x0, y0 = t
                b = jax.lax.dynamic_update_slice(b, tile, (y0, x0, 0))
                return b, None

            buf, _ = jax.lax.scan(body, buf, (tiles_u8, xs, ys))
            return buf

        self._prep = prep
        self._run_bucket = run_bucket
        self._alpha_bucket = alpha_bucket
        self._scatter = scatter

    # -- inference -----------------------------------------------------

    def process(
        self,
        image: np.ndarray,
        progress_cb: Optional[Callable[[float], None]] = None,
    ) -> np.ndarray:
        """uint8 HWC (C=3|4) -> uint8 [H*scale, W*scale, C].

        Single entry point for every backend (the reference needs separate
        process/process_cpu, src/realsr.cpp:145/525 — here XLA retargets the
        same program)."""
        if self.bundle is None:
            raise RuntimeError("call load() first")
        if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] not in (3, 4):
            raise ValueError("expected uint8 HWC image with 3 or 4 channels")
        h, w, c = image.shape
        s = self.scale
        pad = self.prepadding

        plan = plan_tiles(w, h, self.tilesize, pad)
        img_dev = jax.device_put(image, self.device)
        padded, alpha = self._prep(img_dev, pad_=pad)

        out_buf = jax.device_put(
            jnp.zeros((h * s, w * s, c), dtype=jnp.uint8), self.device
        )

        max_batch = self.config.max_batch or _auto_batch(self.tilesize, self.tta_mode)
        done = 0
        total = len(plan.tiles)
        for (ph, pw), idxs in plan.buckets.items():
            hn, wn = ph - 2 * pad, pw - 2 * pad
            for chunk in _chunks(idxs, max_batch):
                n = len(chunk)
                # pad chunk to a power-of-two batch to bound recompiles;
                # duplicated tiles rewrite identical bytes on scatter.
                bsz = min(max_batch, 1 << (n - 1).bit_length())
                chunk = chunk + [chunk[-1]] * (bsz - n)
                xs = jnp.asarray([plan.tiles[i].x0 for i in chunk], jnp.int32)
                ys = jnp.asarray([plan.tiles[i].y0 for i in chunk], jnp.int32)
                color = self._run_bucket(
                    self._params, padded, xs, ys, ph=ph, pw=pw, hn=hn, wn=wn,
                    tta=self.tta_mode,
                )
                if c == 4:
                    a = self._alpha_bucket(alpha, xs, ys, hn=hn, wn=wn)
                    tiles_u8 = jnp.concatenate([color, a], axis=-1)
                else:
                    tiles_u8 = color
                out_buf = self._scatter(out_buf, tiles_u8, xs * s, ys * s)
                done += n
                if progress_cb is not None:
                    progress_cb(done / total)
        return np.asarray(jax.device_get(out_buf))

    # reference-API alias (src/realsr.h:31): same program, CPU engine is
    # just a RealSR constructed with gpuid=-1.
    process_cpu = process


def _chunks(seq: Sequence[int], n: int) -> List[List[int]]:
    return [list(seq[i : i + n]) for i in range(0, len(seq), n)]


@functools.lru_cache(maxsize=1)
def _enable_compilation_cache() -> None:
    """Persist XLA compiles across runs (23-block net compiles are ~30s)."""
    import os

    path = os.environ.get(
        "REALSR_TPU_CACHE", os.path.expanduser("~/.cache/realsr_tpu_xla")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
