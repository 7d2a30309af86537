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
import os
import sys
import threading
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from realsr_tpu.loader import ModelBundle, load_model
from realsr_tpu.parallel.mesh import TILE_AXIS, replicated
from realsr_tpu.ops.pad import reflect101_pad2d, reflect101_pad_w
from realsr_tpu.ops.resize import bicubic_x4, resize_nhwc
from realsr_tpu.ops.tta import NUM_TRANSFORMS, d4_inverse, d4_transform
from realsr_tpu.tiling.planner import auto_tilesize, pick_tilesize, plan_tiles
from realsr_tpu.utils.trace import maybe_start_profiler, tracer

# one-shot operator notices (e.g. planner-anchor provenance): printed at
# most once per process however many engines load
_PRINTED_NOTICES: set = set()


@dataclasses.dataclass
class EngineConfig:
    tilesize: int = 0  # 0 = auto per image (planner.pick_tilesize)
    prepadding: int = 10  # DF2K halo (src/main.cpp:661-667)
    # "auto" | "float32" | "bfloat16" | "float16" (reference-parity mode;
    # runs on the XLA conv path — Mosaic has no f16)
    storage: str = "auto"
    max_batch: int = 0  # 0 = auto from tilesize
    # RDB conv formulation: "auto" | "dense" | "scatter" | "pallas".
    # auto = the fused Pallas kernel on accelerators (2.7x the XLA conv
    # throughput, ops.rdb_kernel; under a mesh it runs per device inside a
    # shard_map island), plain XLA convs on CPU.
    variant: str = "auto"
    compilation_cache: bool = True
    # Fast start (auto-tile accelerator runs only): serve the first images
    # at a small tile whose Mosaic kernel compiles in seconds while the
    # production-tile compute programs compile in BACKGROUND threads; each
    # image re-checks and switches to the production tile the moment its
    # programs are ready. The reference cold-starts in seconds (runtime
    # SPIR-V compile, src/realsr.cpp:89-126); without this the first image
    # pays the fused kernel's ~2-minute Mosaic compile (BASELINE.md).
    # Ignored when an explicit tilesize is set. REALSR_TPU_FAST_START=0
    # disables.
    fast_start: bool = True


FAST_START_TILE = 64  # padded side 84: Mosaic-compiles in ~9 s (BASELINE.md)

# images an engine must have served before the staged packed-tail compile
# is allowed to start (REALSR_TPU_PACKED_DEFER overrides; 0 = immediate).
# Rationale at engine.__init__._packed_go.
PACKED_DEFER_IMAGES = 16

# Serializes trace-time module-flag flips (models.rrdbnet PACKED_TAIL et
# al.) across background compile threads: tracing under flipped flags is
# seconds and holds this lock; the native compile runs outside it.
_TRACE_FLAG_LOCK = threading.Lock()


def _resolve_precision(storage: str, device) -> tuple:
    """storage mode -> (storage_dtype, op_dtype).

    storage_dtype is what the carried activations/buffers hold between
    ops; op_dtype is what the convs/matmuls read. The reference runs
    fp16-storage/fp32-arithmetic at full GPU speed as its ONE config
    (src/realsr.cpp:43-47); the TPU analog is ``mixed`` — f32 carried
    state (never rounds, so no accumulated error across the 69-RDB chain)
    with bf16 MXU operands (native speed). That is the accelerator
    default. Explicit modes: float32 | bfloat16 (legacy all-bf16
    throughput mode) | float16 (bit-closest parity mode; XLA conv path —
    Mosaic has no f16) | mixed.
    """
    if storage == "float32":
        return jnp.float32, jnp.float32
    if storage == "bfloat16":
        return jnp.bfloat16, jnp.bfloat16
    if storage == "float16":
        return jnp.float16, jnp.float16
    if storage == "mixed":
        return jnp.float32, jnp.bfloat16
    if storage != "auto":
        raise ValueError(f"unknown storage mode {storage!r}")
    if device.platform == "cpu":
        return jnp.float32, jnp.float32  # reference CPU path is all-f32
    return jnp.float32, jnp.bfloat16


def _auto_batch(
    tilesize: int,
    tta: bool,
    budget_bytes: int = 2048 * 1024 * 1024,
    nf: int = 64,
    dsize: int = 2,
) -> int:
    # 8 is XLA:TPU's conv batch-split granule — measured on v5e, batches of
    # 12/16 cost exactly 2x a batch of 8 (tools/tpu_sweep.py), so nothing
    # is gained past 8; smaller only when memory or TTA demands it. The
    # memory cap: a chunk's forward working set is dominated by the tail's
    # nf-channel activations at scale^2=16x the padded tile area
    # (models/rrdbnet.py:319-327), i.e. ~16*px*nf*dsize bytes per tile;
    # the chunk must fit the same device budget that bounds the resident
    # buffers (engine._band_budget_bytes — REALSR_TPU_BAND_BUDGET_MB).
    # At the production candidates (128/192/256 -> 1-2 KB/px/tile against
    # the 2 GB default) the granule-8 ceiling binds, matching the measured
    # optimum; the cap only shrinks batches for far larger tiles.
    px = (tilesize + 20) ** 2
    per_tile = 16 * px * nf * dsize
    b = max(1, min(8, budget_bytes // per_tile))
    if tta:
        # TTA multiplies the net's batch by 8 dihedral variants; keep the
        # effective conv batch at the same granule.
        b = max(1, b // 8)
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
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh — shard each image's tile
        batch across it (TPU-native multi-chip mode; the reference's
        multi-GPU mode of independent per-device engines lives in the
        pipeline layer instead, src/main.cpp:778-791)."""
        self.config = config or EngineConfig()
        self.mesh = mesh
        if mesh is not None:
            self.device = list(np.asarray(mesh.devices).flat)[0]
        elif device is not None:
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
        # optional evidence hook: when set BEFORE the first dispatch, it is
        # called (at trace time) with (shape, sharding) of each bucket's
        # in-flight tile batch — lets tests/dryruns PROVE the batch axis is
        # sharded over the mesh rather than silently replicated.
        self.sharding_probe: Optional[Callable] = None
        # fast-start state: AOT-compiled production compute programs keyed
        # by (ph, pw, bsz, tta, with_alpha), filled by background threads
        self._aot_compute: dict = {}
        self._bg_started: set = set()
        self._bg_lock = threading.Lock()
        # background compiles hold off until the first image's foreground
        # compile completes (or a timeout, e.g. a load()+precompile()-only
        # process that never dispatches)
        self._first_dispatch_done = threading.Event()
        # the packed-tail stage of a staged background compile waits for
        # this: set once the engine has served PACKED_DEFER_IMAGES images,
        # i.e. the process has proven long-lived enough for the ~8-minute
        # server-side Mosaic compile to amortize its +~3% e2e. Measured
        # round 5 (BASELINE.md round-5 e2e section): on a 10-image
        # directory job the packed compile runs the ENTIRE job and its
        # server CPU starves chunk execution ~13x — a pure loss for batch
        # runs, which exit before it could ever pay.
        self._images_served = 0
        self._packed_go = threading.Event()
        # True when the packed-tail kernel applies to this model but only
        # as a background/precompile upgrade (round 5): foreground traces
        # stay interleaved-tail. Set by load().
        self._packed_upgrade = False
        self.bundle: Optional[ModelBundle] = None
        self._cpu_sibling: Optional["RealSR"] = None  # process_cpu's engine
        self.scale = 4
        self.prepadding = self.config.prepadding
        # 0 = auto: on accelerators the tile size is picked PER IMAGE
        # (planner.pick_tilesize minimizes halo+chunk pad waste); on CPU the
        # reference's fixed 200 applies (src/main.cpp:752).
        if self.config.tilesize:
            self.tilesize = self.config.tilesize
        elif self.device.platform == "cpu":
            self.tilesize = self._auto_tilesize()
        else:
            self.tilesize = 0
        self.last_tilesize = self.tilesize
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
        dtype, op_dtype = _resolve_precision(self.config.storage, self.device)
        self.storage_dtype = dtype
        self.op_dtype = op_dtype
        variant = self.config.variant
        if variant == "auto":
            # fused Pallas kernel on TPU-like backends only (Mosaic cannot
            # target CPU or GPU; under a mesh the forward runs per device
            # inside shard_map), plain XLA convs elsewhere.
            variant = (
                "pallas" if self.device.platform not in ("cpu", "gpu") else "dense"
            )
        if variant == "pallas" and dtype == jnp.float16:
            # Mosaic has no f16 ('Unsupported type in mosaic dialect');
            # float16 is the reference-parity mode, not the throughput
            # mode — run it on the XLA conv path.
            variant = "dense"
        self.variant = variant
        if os.environ.get("REALSR_TPU_PACKED_TAIL"):
            # experimental packed-phase tail (trace-time module flags; see
            # models/rrdbnet.PACKED_TAIL and BASELINE.md round-3 notes) —
            # env-reachable so bench.py / the CLIs can A/B it end-to-end.
            # Values: 0 off | 1 einsum form | 2 +HR/last Pallas kernel |
            # 3 +up2 fused in-kernel.
            from realsr_tpu.models import rrdbnet as _R

            # non-digit values ("off", "no", "false", ...) mean OFF — a
            # typo'd opt-out must never silently enable an experimental
            # mode (the einsum form is a measured 2.6x e2e slowdown)
            lvl = os.environ["REALSR_TPU_PACKED_TAIL"]
            lvl = min(int(lvl), 3) if lvl.isdigit() else 0  # 3 = max fusion
            _R.PACKED_TAIL = lvl > 0
            _R.PACKED_TAIL_KERNEL = max(0, lvl - 1)
        if variant == "pallas":
            # anchors/kernel plans are generation-swept: tell the operator
            # once when this device's generation doesn't match (weak #7)
            from realsr_tpu.tiling.planner import anchor_provenance_notice

            note = anchor_provenance_notice(
                getattr(self.device, "device_kind", self.device.platform)
            )
            if note and note not in _PRINTED_NOTICES:
                _PRINTED_NOTICES.add(note)
                print(note, file=sys.stderr)
        sched_env = os.environ.get("REALSR_TPU_SCHED", "")
        if sched_env in ("scatter", "packed"):
            # RDB matmul schedule A/B hook (ops.rdb_kernel.SCHED): must be
            # set BEFORE load_model so weight packing and kernel agree.
            from realsr_tpu.ops import rdb_kernel as _RK

            _RK.SCHED = sched_env
        self._model_paths = (parampath, modelpath)  # for process_cpu's sibling
        self.bundle = load_model(
            parampath, modelpath, storage_dtype=dtype, variant=variant,
            op_dtype=op_dtype,
        )
        if variant == "pallas" and not os.environ.get("REALSR_TPU_PACKED_TAIL"):
            # Packed-phase tail kernel mode 2 stays the pallas answer for
            # production-shaped models (measured 1.169x standalone tail /
            # ~+3% e2e, tools/packed_tail_ab.py, BASELINE.md round-4) —
            # but since round 5 it is a BACKGROUND UPGRADE, never a
            # foreground trace: every foreground program compiles with the
            # interleaved tail (~52 s cold with the resident trunk vs
            # ~470 s packed — BASELINE.md round-4), and the staged
            # fast-start threads compile the packed executable after the
            # deferral threshold and hot-swap it at an image boundary.
            # Consequences: explicit -t runs cold-start 9x faster AND stay
            # bit-stable for the whole run (no upgrade is spawned for
            # them); short directory jobs never pay the minutes-scale
            # server-side compile (round-5 e2e measurement: it ran an
            # entire 10-image job and contended with every chunk). The
            # pinned escape hatch for packed-in-the-foreground is
            # REALSR_TPU_PACKED_TAIL=3 (serving processes, bench
            # protocol). Other nf/out_ch shapes have no packed kernel
            # (fixed at nf=64/out=3; the einsum fallback is a measured
            # loss). Module flags are set explicitly OFF so a prior
            # engine's env-forced state can't leak into foreground traces.
            from realsr_tpu.models import rrdbnet as _R

            ok = (
                self.bundle.spec is not None
                and self.bundle.spec.nf == 64
                and self.bundle.spec.out_ch == 3
            )
            self._packed_upgrade = bool(ok)
            _R.PACKED_TAIL = False
            _R.PACKED_TAIL_KERNEL = 0
        else:
            # env-forced mode (foreground packed / fully off): the staged
            # threads compile exactly the foreground formulation, no
            # upgrade stage
            self._packed_upgrade = False
        if variant == "pallas":
            # VMEM-resident whole-trunk kernel is the pallas default since
            # round 4: the chain state never round-trips HBM, measured
            # 1.098x trunk at the production chunk AND a 3.4x faster Mosaic
            # compile (52s vs 175s, tools/resident_ab.py; BASELINE.md
            # round-4). The forward self-gates: it needs 3 RDBs per RRDB
            # and a fitting VMEM plan (plan_rows_resident), else it falls
            # back to the unchained composition. Env value 0/non-digit
            # opts out; set explicitly so a prior engine's state can't
            # leak between loads.
            from realsr_tpu.models import rrdbnet as _R

            env = os.environ.get("REALSR_TPU_RESIDENT_TRUNK", "")
            _R.RESIDENT_TRUNK = (
                int(env) > 0 if env.isdigit() else False
            ) if env else True
        self.scale = self.bundle.scale
        where = replicated(self.mesh) if self.mesh is not None else self.device
        self._params = jax.device_put(self.bundle.params, where)
        self._build_jits()
        return 0

    def _build_jits(self) -> None:
        forward = self.bundle.forward
        if self.mesh is not None and self.variant == "pallas":
            # GSPMD cannot partition a custom call over the batch, so the
            # kernel path becomes an explicit shard_map island: params
            # replicated, tile batch sharded, zero collectives inside
            # (tiles are embarrassingly parallel — SURVEY.md §2.2 #3).
            # pallas_call outputs carry no varying-mesh-axes metadata, so
            # replication checking must be off (kwarg name differs by
            # jax version: check_vma since 0.8, check_rep before).
            kw = dict(
                mesh=self.mesh,
                in_specs=(P(), P(TILE_AXIS)),
                out_specs=P(TILE_AXIS),
            )
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            try:
                forward = shard_map(self.bundle.forward, check_vma=False, **kw)
            except TypeError:  # pre-0.8 signature: check_rep, not check_vma
                forward = shard_map(self.bundle.forward, check_rep=False, **kw)
        scale = self.scale
        pad = self.prepadding
        dtype = self.storage_dtype

        def prep(img_u8, pad_):
            """u8 HWC -> (reflect-padded normalized storage [H+2p,W+2p,3],
            raw-valued f32 alpha [H,W,1|0])."""
            color = img_u8[..., :3].astype(jnp.float32) * (1.0 / 255.0)
            padded = reflect101_pad2d(color.astype(dtype), pad_)
            alpha = img_u8[..., 3:].astype(jnp.float32)  # empty if C==3
            return padded, alpha

        def prep_band(band_u8, pad_):
            """Band with its 2*pad vertical context rows already attached
            (real neighbor rows; reflect-101 of the FULL image at global
            edges — assembled host-side): pad only W. Tile extraction then
            sees byte-identical padded windows to the full-image path."""
            color = band_u8[..., :3].astype(jnp.float32) * (1.0 / 255.0)
            padded = reflect101_pad_w(color.astype(dtype), pad_)
            alpha = band_u8[:, pad_ : band_u8.shape[1] - pad_, :, 3:].astype(
                jnp.float32
            )
            return padded, alpha

        def tile_color(params, tiles, ph, pw, hn, wn, tta):
            """[B,ph,pw,3] storage -> u8 [B,hn*s,wn*s,3] (forward + TTA +
            halo crop + reference rounding)."""
            if not tta:
                out = forward(params, tiles)  # f32 [B, ph*s, pw*s, 3]
            else:
                if ph == pw:
                    batch = jnp.concatenate(
                        [d4_transform(tiles, k) for k in range(NUM_TRANSFORMS)]
                    )
                    groups = list(jnp.split(forward(params, batch), NUM_TRANSFORMS))
                else:
                    b0 = jnp.concatenate([d4_transform(tiles, k) for k in range(4)])
                    b1 = jnp.concatenate([d4_transform(tiles, k) for k in range(4, 8)])
                    groups = list(jnp.split(forward(params, b0), 4)) + list(
                        jnp.split(forward(params, b1), 4)
                    )
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

        # Each [B] tile-origin chunk runs as THREE dispatches. The split is
        # deliberate: extract/scatter take full-image-shaped buffers (their
        # executables are per image size, but compile in seconds), while
        # compute_chunk — the forward, i.e. the ~2-minute Mosaic compile —
        # sees ONLY (bucket shape, batch) tile stacks, so every image size
        # in a mixed directory reuses the same expensive executable. A
        # fused single program was measured to recompile the kernel for
        # each new image size (BASELINE.md cold-start notes). The extra
        # HBM round trip for the tile stacks is ~50 MB per chunk — noise
        # next to the chunk's compute. Dispatches are async; the single
        # D2H per image is the only sync (vs the reference's per-tile
        # submit_and_wait, src/realsr.cpp:235-482). The chunk loop lives
        # in the HOST, not a lax.scan, so shapes are also independent of
        # the tile COUNT, and per-chunk completion drives the reference's
        # per-tile progress contract (realsr.cpp:481).
        #
        # All buffers carry a leading IMAGE axis (padded [N,Hp,Wp,3],
        # out_buf [N,H*s,W*s,C]) and ``imgs`` selects each tile's image —
        # tiles of many same-sized images batch into the same chunks
        # (process_batch). xs/ys are the tiles' UNPADDED input origins; in
        # padded-image coords the halo start is exactly (ys, xs).

        def extract_chunk(padded, alpha, imgs, xs, ys, ph, pw, hn, wn, with_alpha):
            """Cheap, image-size-dependent: gather the chunk's tile batch
            (and unpadded alpha tiles) out of the padded image stack."""

            def extract(i, x0, y0):
                t = jax.lax.dynamic_slice(padded, (i, y0, x0, 0), (1, ph, pw, 3))
                return t[0]

            def extract_alpha(i, x0, y0):
                t = jax.lax.dynamic_slice(alpha, (i, y0, x0, 0), (1, hn, wn, 1))
                return t[0]

            tiles = jax.vmap(extract)(imgs, xs, ys)
            if with_alpha:
                atiles = jax.vmap(extract_alpha)(imgs, xs, ys)
            else:
                atiles = jnp.zeros((tiles.shape[0], 0, 0, 0), jnp.float32)
            return tiles, atiles

        def compute_chunk(params, tiles, atiles, ph, pw, hn, wn, tta, with_alpha):
            """EXPENSIVE, image-size-INDEPENDENT: forward (+TTA), halo
            crop, reference rounding, alpha bicubic — shapes depend only
            on (bucket shape, batch). ``params`` is a runtime ARGUMENT,
            not a closure constant: the lowered module (and therefore the
            persistent-cache key and any seed tarball,
            tools/seed_cache.py) is weight-INDEPENDENT — DF2K and
            DF2K_JPEG share one executable, and dropping in a real
            ``x4.bin`` never recompiles (round 5; a closed-over params
            tree baked 66.8 MB of weight constants into every compute
            program and keyed the cache on their bytes)."""
            probe = self.sharding_probe
            if probe is not None:
                jax.debug.inspect_array_sharding(
                    tiles,
                    callback=lambda s, _sh=tiles.shape: probe((_sh, s)),
                )
            color = tile_color(params, tiles, ph, pw, hn, wn, tta)
            if not with_alpha:
                return color
            if scale == 1:
                up = atiles
            elif scale == 4:
                up = bicubic_x4(atiles)
            else:
                up = resize_nhwc(atiles, hn * scale, wn * scale, "bicubic")
            a_u8 = jnp.clip(jnp.floor(up + 0.5), 0.0, 255.0).astype(jnp.uint8)
            return jnp.concatenate([color, a_u8], axis=-1)

        def scatter_chunk(out_buf, tiles_u8, imgs, xs, ys):
            """Cheap, image-size-dependent: merge the chunk's uint8 tiles
            into the donated full-resolution buffer at their origins."""

            def scat(b, t):
                tile, i, x0, y0 = t
                return jax.lax.dynamic_update_slice(
                    b, tile[None], (i, y0 * scale, x0 * scale, 0)
                ), None

            out_buf, _ = jax.lax.scan(scat, out_buf, (tiles_u8, imgs, xs, ys))
            return out_buf

        def scatter_chunk_local(out_buf, tiles_u8, imgs, xs, ys):
            """Mesh-mode scatter body (runs per device inside shard_map):
            each device writes only ITS tile shard into a PRIVATE
            [1, n_img, H*s, W*s, C] partial buffer — ZERO collectives per
            chunk (the replicated-buffer form all-gathered every chunk's
            tiles, VERDICT r3 next #8). The partials merge once per image
            in _finish_out."""

            def scat(b, t):
                tile, i, x0, y0 = t
                return jax.lax.dynamic_update_slice(
                    b, tile[None, None], (0, i, y0 * scale, x0 * scale, 0)
                ), None

            out_buf, _ = jax.lax.scan(scat, out_buf, (tiles_u8, imgs, xs, ys))
            return out_buf

        if self.mesh is None:
            self._prep = jax.jit(prep, static_argnums=(1,))
            self._prep_band = jax.jit(prep_band, static_argnums=(1,))
            self._extract_chunk = jax.jit(
                extract_chunk, static_argnums=(5, 6, 7, 8, 9)
            )
            self._compute_chunk = jax.jit(
                compute_chunk, static_argnums=(3, 4, 5, 6, 7, 8)
            )
            self._scatter_chunk = jax.jit(scatter_chunk, donate_argnums=(0,))
        else:
            # Mesh mode: params/image/output replicated, tile batch axis
            # (axis 0 of tiles/imgs/xs/ys) sharded. The only collective is
            # XLA's gather of per-device tiles into the replicated buffer
            # (inside scatter_chunk) — ICI.
            rep = replicated(self.mesh)
            shd_b = NamedSharding(self.mesh, P(TILE_AXIS))
            self._prep = jax.jit(
                prep,
                static_argnums=(1,),
                in_shardings=(rep,),
                out_shardings=(rep, rep),
            )
            self._prep_band = jax.jit(
                prep_band,
                static_argnums=(1,),
                in_shardings=(rep,),
                out_shardings=(rep, rep),
            )
            self._extract_chunk = jax.jit(
                extract_chunk,
                static_argnums=(5, 6, 7, 8, 9),
                in_shardings=(rep, rep, shd_b, shd_b, shd_b),
                out_shardings=(shd_b, shd_b),
            )
            self._compute_chunk = jax.jit(
                compute_chunk,
                static_argnums=(3, 4, 5, 6, 7, 8),
                in_shardings=(rep, shd_b, shd_b),
                out_shardings=shd_b,
            )
            # tiles never cross ICI during scatter: each device owns a
            # private partial output (leading ndev axis, sharded) and
            # writes its own tile shard; _finish_out merges ONCE per image
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            self._scatter_chunk = jax.jit(
                shard_map(
                    scatter_chunk_local,
                    mesh=self.mesh,
                    in_specs=(
                        P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS),
                        P(TILE_AXIS), P(TILE_AXIS),
                    ),
                    out_specs=P(TILE_AXIS),
                ),
                donate_argnums=(0,),
            )
            # tiles are disjoint, pad-duplicates write identical bytes,
            # and unwritten pixels stay 0 <= any written u8 value — so a
            # max over the device axis reconstructs the image exactly.
            # This is the output path's ONE collective per image.
            self._merge_out = jax.jit(
                lambda b: jnp.max(b, axis=0),
                in_shardings=(shd_b,),
                out_shardings=rep,
            )

    # -- inference -----------------------------------------------------

    def _auto_batch(self, tilesize: int) -> int:
        """Memory-honest batch granule for this engine's model/budget."""
        nf = self.bundle.spec.nf if self.bundle and self.bundle.spec else 64
        dsize = (
            jnp.dtype(self.storage_dtype).itemsize
            if hasattr(self, "storage_dtype")
            else 2
        )
        return _auto_batch(
            tilesize, self.tta_mode, self._band_budget_bytes(), nf, dsize
        )

    def _pick_tilesize(self, w: int, h: int, n_img: int = 1) -> int:
        if self.tilesize:
            return self.tilesize
        # model the REAL chunk-pad granule PER CANDIDATE (the dispatch
        # batch depends on the tile size; TTA batches 1 tile x 8 variants;
        # mesh rounds to a device multiple) and restrict to tiles the
        # active conv formulation handles well (the XLA dense path
        # regresses beyond t192, planner._RATE_ANCHORS comment)
        ndev = self.mesh.size if self.mesh is not None else 1

        def granule(t: int) -> int:
            g = self.config.max_batch or self._auto_batch(t)
            return -(-g // ndev) * ndev

        cands = (128, 192, 256) if self.variant == "pallas" else (128, 192)
        return pick_tilesize(
            w, h, self.prepadding, granule=granule, candidates=cands,
            n_img=n_img, ndev=ndev,
        )

    # -- fast start (cold-host first-image latency) ----------------------

    def _fast_start_enabled(self) -> bool:
        return (
            self.config.fast_start
            and not self.config.tilesize  # explicit tile = operator intent
            and self.variant == "pallas"
            and os.environ.get("REALSR_TPU_FAST_START", "1") != "0"
        )

    def _compute_keys(self, w, h, n_img, channels, tilesize):
        """The compute programs a production dispatch at ``tilesize`` will
        need: [(key, (ph, pw, hn, wn, bsz))] per bucket."""
        pad = self.prepadding
        plan = plan_tiles(w, h, tilesize, pad)
        out = []
        for (ph, pw), idxs in plan.buckets.items():
            bsz, _ = self._chunking(tilesize, len(idxs) * n_img)
            key = (ph, pw, bsz, self.tta_mode, channels == 4)
            out.append((key, (ph, pw, ph - 2 * pad, pw - 2 * pad, bsz)))
        return out

    def _maybe_fast_start(self, tilesize, w, h, n_img, channels) -> int:
        """Serve on a seconds-to-compile small tile until the production
        tile's compute programs are ready (compiled by background threads;
        Mosaic compile time scales with the kernel's flat working set —
        84-padded tiles compile in ~9 s where 276-padded takes minutes,
        BASELINE.md cold-start notes). The reference's cold start is a
        runtime SPIR-V compile, i.e. seconds (src/realsr.cpp:89-126)."""
        if not self._fast_start_enabled() or tilesize <= FAST_START_TILE:
            return tilesize
        needed = self._compute_keys(w, h, n_img, channels, tilesize)
        with self._bg_lock:
            missing = [x for x in needed if x[0] not in self._aot_compute]
            to_start = [x for x in missing if x[0] not in self._bg_started]
            self._bg_started.update(k for k, _ in to_start)
        for key, dims in to_start:
            self._spawn_bg_compile(key, dims, channels)
        return tilesize if not missing else FAST_START_TILE

    def _spawn_bg_compile(self, key, dims, channels) -> None:
        ph, pw, hn, wn, bsz = dims
        with_alpha = channels == 4
        if self.mesh is not None:
            # the mesh jit carries explicit in_shardings; bare structs
            # lower against them
            S = jax.ShapeDtypeStruct
        else:
            # pin the executable to THIS engine's device (jit would
            # otherwise lower for the default device)
            S = functools.partial(
                jax.ShapeDtypeStruct,
                sharding=jax.sharding.SingleDeviceSharding(self.device),
            )
        tiles = S((bsz, ph, pw, 3), self.storage_dtype)
        atiles = S(
            (bsz, hn, wn, 1) if with_alpha else (bsz, 0, 0, 0), jnp.float32
        )

        from realsr_tpu.models import rrdbnet as _R

        # STAGED fast start: the production program compiles FIRST with
        # the tail interleaved (~1 min with the resident trunk) and
        # serves production-tile throughput; the packed-tail executable
        # (whose Mosaic compile alone is ~7 min, BASELINE.md round-4)
        # compiles after the long-lived deferral and hot-swaps in at an
        # image boundary (+~3% e2e). Tail formulation, like the
        # fast-start tile switch, changes pixels only within the
        # documented cross-program noise class (BASELINE.md round-4
        # deployment note); pass an explicit -t for bit-reproducibility
        # (explicit-tile runs never spawn these threads).
        # Env-forced modes (REALSR_TPU_PACKED_TAIL set: pinned packed-
        # foreground or fully off) compile exactly the foreground
        # formulation in ONE stage — no interleaved stage, no deferral
        # (load() comment: "the staged threads compile exactly the
        # foreground formulation, no upgrade stage"). Staging applies
        # only to the default background-upgrade path, where
        # _packed_upgrade is True and ambient flags are off.
        staged = bool(
            self._packed_upgrade
            and min(ph, pw) >= _R.PACKED_TAIL_MIN_SIDE
        )

        def lower_program(packed_tail: bool):
            # trace-time module flags: serialize the flip across compile
            # threads; the native XLA/Mosaic compile below runs outside
            # the lock (it releases the GIL and dominates wall time)
            with _TRACE_FLAG_LOCK:
                old = (_R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL)
                if not packed_tail:
                    _R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL = False, 0
                elif self._packed_upgrade and staged:
                    # round 5: ambient flags stay OFF (foreground traces
                    # are interleaved); the packed formulation exists
                    # only in this upgrade compile
                    _R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL = True, 2
                try:
                    # self._params is concrete: only its avals/shardings
                    # enter the lowered module (weight-independent key)
                    return self._compute_chunk.lower(
                        self._params, tiles, atiles, ph, pw, hn, wn,
                        self.tta_mode, with_alpha,
                    )
                finally:
                    _R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL = old

        def work():
            self._first_dispatch_done.wait(timeout=120)
            if staged:
                try:
                    comp = lower_program(False).compile()
                    with self._bg_lock:
                        # the packed-tail stage may have landed first
                        self._aot_compute.setdefault(key, comp)
                except Exception as exc:
                    print(
                        f"realsr-tpu: interleaved-tail stage of the "
                        f"{ph}x{pw} program failed ({exc}); waiting for "
                        "the packed-tail compile",
                        file=sys.stderr,
                    )
                # the production-grade interleaved program is serving;
                # hold the ~8-minute packed-tail compile until the
                # process proves long-lived (counter rationale at
                # __init__._packed_go) — a batch job that exits first
                # never pays the compile's server-CPU contention
                self._packed_go.wait()
            try:
                comp = lower_program(True).compile()
                with self._bg_lock:
                    self._aot_compute[key] = comp
            except Exception as exc:  # stay on the fast tile, loudly
                with self._bg_lock:  # key presence must be read under the
                    present = key in self._aot_compute  # lock the writers hold
                print(
                    f"realsr-tpu: background compile of the {ph}x{pw} "
                    f"program failed ({exc}); continuing on tile "
                    f"{FAST_START_TILE}"
                    if not present
                    else f"realsr-tpu: packed-tail compile of the {ph}x{pw}"
                    f" program failed ({exc}); keeping the interleaved-"
                    "tail program",
                    file=sys.stderr,
                )

        threading.Thread(
            target=work, daemon=True, name=f"realsr-bgcompile-{ph}x{pw}"
        ).start()

    def _chunking(self, tilesize: int, n: int) -> tuple:
        """(chunk batch, chunk count) for ``n`` tiles at ``tilesize``.

        batch = pow2 (x mesh multiple), capped at the measured granule; the
        tile list is padded to whole chunks — duplicated tiles rewrite
        identical bytes on scatter. Shapes stay in a small reusable set so
        jit cache hits dominate across images."""
        ndev = self.mesh.size if self.mesh is not None else 1
        max_batch = self.config.max_batch or self._auto_batch(tilesize)
        max_batch = -(-max_batch // ndev) * ndev  # multiple of mesh size
        bsz = min(max_batch, 1 << (n - 1).bit_length())
        bsz = -(-bsz // ndev) * ndev
        return bsz, -(-n // bsz)

    def precompile(
        self, w: int, h: int, channels: int = 3, n_img: int = 1,
        fast_start_ramp: bool = False,
    ) -> int:
        """AOT-compile every program a (w, h, channels) image will need.

        For serving deployments: call once after :meth:`load` so the first
        request doesn't pay the fused kernel's ~2-minute Mosaic compile
        (BASELINE.md cold-start notes). Uses ``jit.lower().compile()`` on
        ShapeDtypeStructs — no device compute, no image needed — and the
        artifacts also land in the persistent compile cache, warming every
        later process on this host. Returns the number of programs built.

        The per-shape compiles run CONCURRENTLY (tracing/lowering is
        GIL-bound Python, but XLA/Mosaic compilation is native and releases
        the GIL), so a multi-bucket shape warms in ~one compile's wall time
        instead of the sum.

        ``fast_start_ramp``: additionally compile the FAST_START_TILE
        foreground program set a default-config (fast_start on) process
        would serve its first images on. An in-process precompile() fills
        the AOT table so the ramp never runs — but a SEED CACHE built for
        other processes (tools/seed_cache.py) must cover the ramp programs
        too, or a seeded default-path CLI still pays the tile-64 compile
        on its first image.
        """
        if self.bundle is None:
            raise RuntimeError("call load() first")
        if channels not in (3, 4):
            raise ValueError("channels must be 3 or 4")
        if n_img == 1 and self.needs_banding((h, w, channels)):
            # process() will band-stream this shape — precompile the BAND
            # programs the real request will run, not a full-image program
            # set it never touches.
            return self._precompile_banded(w, h, channels)
        tilesize = self._pick_tilesize(w, h, n_img)
        lows = self._lower_image_programs(
            w, h, channels, n_img, tilesize, serving=True
        )
        if fast_start_ramp and self._fast_start_enabled() \
                and tilesize > FAST_START_TILE:
            # the full default-path sequence is THREE program generations:
            # tile-64 interleaved (ramp) -> production-tile interleaved
            # (post-switch foreground, what the staged bg thread compiles
            # first) -> production-tile packed (the serving=True set
            # above). Seed all of them or a seeded process still pays a
            # foreground-class compile at the switch.
            lows.extend(self._lower_image_programs(
                w, h, channels, n_img, FAST_START_TILE, serving=False
            ))
            lows.extend(self._lower_image_programs(
                w, h, channels, n_img, tilesize, serving=False
            ))
        return self._compile_all(lows)

    def _lower_image_programs(
        self, w, h, channels, n_img, tilesize, serving
    ) -> list:
        """Lower the full program set one (w, h, channels, n_img) dispatch
        at ``tilesize`` needs: prep + per-bucket extract/compute/scatter.
        ``serving``: compile the packed-tail upgrade formulation directly
        (precompile's explicit warm-up) vs the foreground interleaved one
        (_warm_first_dispatch must match what the dispatch loop runs)."""
        S = jax.ShapeDtypeStruct
        s, pad = self.scale, self.prepadding
        img = S((n_img, h, w, channels), jnp.uint8)
        lows = [self._prep.lower(img, pad)]
        plan = plan_tiles(w, h, tilesize, pad)
        padded = S((n_img, h + 2 * pad, w + 2 * pad, 3), self.storage_dtype)
        alpha = S((n_img, h, w, 1 if channels == 4 else 0), jnp.float32)
        out_buf = S((n_img, h * s, w * s, channels), jnp.uint8)
        seen = set()
        for (ph, pw), idxs in plan.buckets.items():
            bsz, _ = self._chunking(tilesize, len(idxs) * n_img)
            key = (ph, pw, bsz)
            if key in seen:
                continue
            seen.add(key)
            lows.extend(self._lower_chunk_programs(
                padded, alpha, out_buf, bsz, ph, pw, channels,
                serving=serving,
            ))
        return lows

    def _warm_first_dispatch(self, w, h, n_img, c, tilesize) -> None:
        """Concurrently compile every program the upcoming dispatch needs
        (VERDICT r4 weak #3: the first image paid the prep / extract /
        compute / scatter compiles SERIALLY as each jit was first called;
        XLA compilation releases the GIL, so a 4-thread pool pays ~the
        longest compile instead of the sum). Compute programs land in the
        AOT table (the dispatch loop calls them directly); prep / extract
        / scatter warm the jit path through the in-process persistent
        compile cache. Runs once per shape set; compute entries already
        AOT-compiled (fast-start background threads) are skipped."""
        key = (w, h, n_img, c, tilesize, self.tta_mode)
        warmed = getattr(self, "_warmed_shapes", None)
        if warmed is None:
            warmed = self._warmed_shapes = set()
        if key in warmed:
            return
        warmed.add(key)
        try:
            lows = self._lower_image_programs(
                w, h, c, n_img, tilesize, serving=False
            )
            if not self.config.compilation_cache:
                # the glue (prep/extract/scatter) warms THROUGH the
                # persistent cache — the dispatch loop's jit re-traces and
                # deserializes the cached binary. Without a cache those
                # compiles can't be reused, so warming them would compile
                # each program twice; keep only the compute programs,
                # which dispatch calls directly from the AOT table.
                lows = [l for l in lows if isinstance(l, tuple)]
            with self._bg_lock:
                have = set(self._aot_compute)
            lows = [
                l for l in lows
                if not (isinstance(l, tuple) and l[0] in have)
            ]
            self._compile_all(lows)
        except Exception as exc:  # pragma: no cover - exercised via tests
            # warming is purely a latency optimization: on failure fall
            # back to the dispatch loop's serial jit compiles, which will
            # surface any REAL compile error with proper handling (and set
            # _first_dispatch_done in its finally)
            print(
                f"realsr-tpu: first-dispatch warm-up failed ({exc!r}); "
                "falling back to serial compiles",
                file=sys.stderr,
            )

    def _lower_chunk_programs(
        self, padded, alpha, out_buf, bsz, ph, pw, channels,
        lower_compute: bool = True, serving: bool = True,
    ) -> list:
        """Lower the extract/compute/scatter triple for one (bucket shape,
        batch) against the given full-image ShapeDtypeStructs.

        ``lower_compute=False`` skips the (expensive, image-size- AND
        band-height-independent) compute program — callers that iterate
        several image/band shapes over the same bucket pass it once.
        ``serving=False`` compiles the foreground (interleaved-tail)
        formulation instead of the packed upgrade (_warm_first_dispatch
        must produce exactly what the dispatch loop would jit)."""
        S = jax.ShapeDtypeStruct
        s, pad = self.scale, self.prepadding
        hn, wn = ph - 2 * pad, pw - 2 * pad
        with_alpha = channels == 4
        ivec = S((bsz,), jnp.int32)
        tiles_u8 = S((bsz, hn * s, wn * s, channels), jnp.uint8)
        if self.mesh is not None:
            # mesh scatter takes per-device partials (leading ndev axis)
            out_buf = S((self.mesh.size,) + out_buf.shape, out_buf.dtype)
        lows = [
            self._extract_chunk.lower(
                padded, alpha, ivec, ivec, ivec, ph, pw, hn, wn, with_alpha
            ),
            self._scatter_chunk.lower(out_buf, tiles_u8, ivec, ivec, ivec),
        ]
        if lower_compute:
            if self.mesh is None:
                # pin the AOT executable to THIS engine's device (see
                # _spawn_bg_compile); mesh jits carry explicit shardings
                S = functools.partial(
                    jax.ShapeDtypeStruct,
                    sharding=jax.sharding.SingleDeviceSharding(self.device),
                )
            tiles = S((bsz, ph, pw, 3), self.storage_dtype)
            atiles = S(
                (bsz, hn, wn, 1) if with_alpha else (bsz, 0, 0, 0),
                jnp.float32,
            )
            # the compute trace reads module-level tail flags
            # (models.rrdbnet PACKED_TAIL et al.) that staged fast-start
            # threads flip under _TRACE_FLAG_LOCK — hold it here too, or a
            # precompile() racing a staged stage could bake the wrong tail
            # formulation into a cached production executable (ADVICE r4).
            # precompile() is the explicit serving warm-up, so it compiles
            # the PACKED formulation directly where it applies (round 5:
            # ambient flags stay interleaved for foreground traces; a
            # warmed-up serving process should not wait out the
            # background-upgrade deferral).
            from realsr_tpu.models import rrdbnet as _R

            want_packed = (
                serving
                and self._packed_upgrade
                and min(ph, pw) >= _R.PACKED_TAIL_MIN_SIDE
            )
            with _TRACE_FLAG_LOCK:
                old = (_R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL)
                if want_packed:
                    _R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL = True, 2
                try:
                    low = self._compute_chunk.lower(
                        self._params, tiles, atiles, ph, pw, hn, wn,
                        self.tta_mode, with_alpha,
                    )
                finally:
                    _R.PACKED_TAIL, _R.PACKED_TAIL_KERNEL = old
            # third element: does this program OVERWRITE an existing AOT
            # entry? The packed formulation is the serving-grade upgrade
            # and always wins; interleaved lowers (ramp seeds,
            # _warm_first_dispatch) only fill an empty slot — without the
            # priority, precompile(fast_start_ramp=True)'s concurrent
            # _compile_all raced both formulations under the same key
            # (last-writer-wins) and could leave a serving process
            # permanently on the slower interleaved program.
            lows.append(
                ((ph, pw, bsz, self.tta_mode, with_alpha), low, want_packed)
            )
        return lows

    def _compile_all(self, lowereds) -> int:
        """Compile a list of jax Lowered objects (or (compute-key, Lowered)
        pairs) concurrently; returns the count. XLA compilation releases
        the GIL, so threads overlap the (minutes-scale, BASELINE.md)
        per-program compiles. Keyed compute programs are kept as AOT
        executables so dispatch uses them directly (the fast-start table —
        no jit-cache or persistent-cache round-trip after precompile())."""

        def one(item):
            if isinstance(item, tuple):
                key, low, overwrite = item
            else:
                key, low, overwrite = None, item, False
            comp = low.compile()
            if key is not None:
                with self._bg_lock:
                    if overwrite:
                        self._aot_compute[key] = comp
                    else:
                        # never downgrade a packed entry (bg upgrade or a
                        # concurrent serving=True lower of the same key)
                        self._aot_compute.setdefault(key, comp)

        if len(lowereds) > 1:
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(
                max_workers=min(4, len(lowereds))
            ) as ex:
                list(ex.map(one, lowereds))
        else:
            for l in lowereds:
                one(l)
        return len(lowereds)

    def _precompile_banded(self, w: int, h: int, channels: int) -> int:
        """AOT-compile the band program set :meth:`process_banded` will run
        for a (w, h, channels) image — mirrors its band layout exactly
        (equalized uniform bands + possibly-ragged bottom band)."""
        S = jax.ShapeDtypeStruct
        s, pad = self.scale, self.prepadding
        tilesize = self._pick_tilesize(w, h)
        plan = plan_tiles(w, h, tilesize, pad)
        btr = self._equalized_band_rows(
            plan.ytiles, self._auto_band_tile_rows(w, channels, tilesize)
        )
        by_row: dict = {}
        for t in plan.tiles:
            by_row.setdefault(t.yi, []).append(t)
        lows = []
        seen = set()
        for r0 in range(0, plan.ytiles, btr):
            r1 = min(r0 + btr, plan.ytiles)
            Y0, Y1 = r0 * tilesize, min(r1 * tilesize, h)
            bh = Y1 - Y0
            if ("prep", bh) not in seen:
                seen.add(("prep", bh))
                band = S((1, bh + 2 * pad, w, channels), jnp.uint8)
                lows.append(self._prep_band.lower(band, pad))
            padded = S((1, bh + 2 * pad, w + 2 * pad, 3), self.storage_dtype)
            alpha = S((1, bh, w, 1 if channels == 4 else 0), jnp.float32)
            out_buf = S((1, bh * s, w * s, channels), jnp.uint8)
            buckets: dict = {}
            for yi in range(r0, r1):
                for t in by_row[yi]:
                    buckets.setdefault(t.padded_shape(pad), []).append(t)
            for (ph, pw), tl in buckets.items():
                bsz, _ = self._chunking(tilesize, len(tl))
                key = (bh, ph, pw, bsz)
                if key in seen:
                    continue
                seen.add(key)
                # the compute program is band-height-independent: lower it
                # once per (bucket, batch), not once per band height
                ckey = ("compute", ph, pw, bsz)
                lows.extend(self._lower_chunk_programs(
                    padded, alpha, out_buf, bsz, ph, pw, channels,
                    lower_compute=ckey not in seen,
                ))
                seen.add(ckey)
        return self._compile_all(lows)

    def _process_stack_device(
        self,
        images: np.ndarray,  # [N, H, W, C] uint8
        progress_cb: Optional[Callable[[float], None]] = None,
    ):
        """uint8 NHWC -> DEVICE uint8 buffer [N, H*scale, W*scale, C].

        The core program: tiles of ALL images share the bucket batches, so
        a stack of small same-sized images fills the conv batch granule the
        way one big image's tile grid does."""
        if self.bundle is None:
            raise RuntimeError("call load() first")
        n_img, h, w, c = images.shape
        s = self.scale
        pad = self.prepadding

        maybe_start_profiler()
        tilesize = self._pick_tilesize(w, h, n_img)
        tilesize = self._maybe_fast_start(tilesize, w, h, n_img, c)
        self.last_tilesize = tilesize
        # first time this shape set dispatches: compile its programs
        # CONCURRENTLY instead of paying each jit's compile serially in
        # the loop below (VERDICT r4 weak #3)
        self._warm_first_dispatch(w, h, n_img, c, tilesize)
        plan = plan_tiles(w, h, tilesize, pad)
        where = replicated(self.mesh) if self.mesh is not None else self.device
        with tracer.span("h2d+prep"):
            img_dev = jax.device_put(images, where)
            padded, alpha = self._prep(img_dev, pad)

        out_buf = self._alloc_out((n_img, h * s, w * s, c))

        buckets = {
            shape: [
                (i, plan.tiles[t].x0, plan.tiles[t].y0)
                for i in range(n_img)
                for t in idxs
            ]
            for shape, idxs in plan.buckets.items()
        }
        try:
            out_buf, _ = self._dispatch_buckets(
                padded, alpha, out_buf, buckets, tilesize, c,
                progress_cb, 0, len(plan.tiles) * n_img,
                aot=self._snapshot_aot(),
            )
        finally:
            # unblock background compiles: the foreground jit compile (the
            # expensive part of the first dispatch) is done — or raised —
            # so trace/compile threads no longer contend with it (measured:
            # bg contention took the cold first image 32.6 -> 73.8 s,
            # BASELINE.md round-4). In a finally so a failing first
            # dispatch can't stall the background threads for their full
            # wait timeout.
            self._first_dispatch_done.set()
        self._count_served(n_img)
        return self._finish_out(out_buf)

    def _count_served(self, n: int) -> None:
        """Track served images; past the deferral threshold, release the
        staged packed-tail compiles (rationale at __init__._packed_go)."""
        env = os.environ.get("REALSR_TPU_PACKED_DEFER", "")
        threshold = int(env) if env.isdigit() else PACKED_DEFER_IMAGES
        with self._bg_lock:
            self._images_served += n
            release = self._images_served >= threshold
        if release:
            self._packed_go.set()

    def _snapshot_aot(self) -> dict:
        """Per-IMAGE snapshot of the AOT program table. The staged
        fast-start thread hot-swaps entries (interleaved tail ->
        packed-tail executable) the moment a compile lands; dispatching
        one image from a live view could then compute different chunks of
        ONE output with two tail formulations, whose pixels differ within
        the documented cross-program noise class (BASELINE.md round-4
        deployment note) — a potential visible seam along a chunk
        boundary. Snapshotting once per image (and once per
        process_banded call, covering every band) pins a single executor
        per output; swaps take effect on the next image."""
        with self._bg_lock:
            return dict(self._aot_compute)

    def _alloc_out(self, shape) -> jnp.ndarray:
        """Output buffer for a dispatch run. Mesh mode: one PRIVATE
        partial per device (leading ndev axis, sharded over the mesh) so
        scatter needs no collectives; else a plain device buffer."""
        if self.mesh is None:
            return jax.device_put(jnp.zeros(shape, jnp.uint8), self.device)
        ndev = self.mesh.size
        shd = NamedSharding(self.mesh, P(TILE_AXIS))
        return jax.device_put(jnp.zeros((ndev,) + shape, jnp.uint8), shd)

    def _finish_out(self, out_buf) -> jnp.ndarray:
        """Merge mesh-mode per-device partials (one collective per image);
        identity off-mesh."""
        return out_buf if self.mesh is None else self._merge_out(out_buf)

    def _dispatch_buckets(
        self, padded, alpha, out_buf, buckets, tilesize, c,
        progress_cb, done, total, aot=None,
    ):
        """Dispatch all tile chunks. ``buckets``: {(ph, pw): [(img_idx, x0,
        y0)]} with origins in PADDED-BUFFER coords (y0 is band-local under
        band streaming). ``aot``: the caller's per-image snapshot of the
        AOT program table (see _snapshot_aot) — never read the live table
        here, a background hot-swap mid-image must not change the executor
        within one output. Returns (out_buf, done)."""
        if aot is None:
            aot = self._snapshot_aot()
        pad = self.prepadding
        for (ph, pw), triples in buckets.items():
            hn, wn = ph - 2 * pad, pw - 2 * pad
            n = len(triples)
            bsz, nc = self._chunking(tilesize, n)
            # pad the tile list to whole chunks — duplicated tiles rewrite
            # identical bytes on scatter
            triples = triples + [triples[-1]] * (nc * bsz - n)
            imgs = np.asarray([t[0] for t in triples], np.int32).reshape(nc, bsz)
            xs = np.asarray([t[1] for t in triples], np.int32).reshape(nc, bsz)
            ys = np.asarray([t[2] for t in triples], np.int32).reshape(nc, bsz)
            for k in range(nc):
                with tracer.span("dispatch"):
                    tiles, atiles = self._extract_chunk(
                        padded, alpha, imgs[k], xs[k], ys[k],
                        ph, pw, hn, wn, c == 4,
                    )
                    # a fast-start background thread may have AOT-compiled
                    # this bucket's program — calling the Compiled directly
                    # skips the jit dispatch cache (and, on a fresh host,
                    # a persistent-cache round-trip). Read the per-image
                    # snapshot, not the live table (docstring above).
                    prog = aot.get((ph, pw, bsz, self.tta_mode, c == 4))
                    if prog is not None:
                        tiles_u8 = prog(self._params, tiles, atiles)
                    else:
                        # jit fallback: the FIRST call per shape traces
                        # under the module tail flags — hold the trace
                        # lock then (a staged bg thread may have them
                        # flipped); later calls hit the jit cache and
                        # skip the lock
                        jkey = (ph, pw, bsz, self.tta_mode, c == 4)
                        traced = getattr(self, "_jit_traced", None)
                        if traced is None:
                            traced = self._jit_traced = set()
                        if jkey in traced:
                            tiles_u8 = self._compute_chunk(
                                self._params, tiles, atiles, ph, pw, hn,
                                wn, self.tta_mode, c == 4,
                            )
                        else:
                            with _TRACE_FLAG_LOCK:
                                tiles_u8 = self._compute_chunk(
                                    self._params, tiles, atiles, ph, pw,
                                    hn, wn, self.tta_mode, c == 4,
                                )
                            traced.add(jkey)
                    out_buf = self._scatter_chunk(
                        out_buf, tiles_u8, imgs[k], xs[k], ys[k]
                    )
                done += min(bsz, n - k * bsz)  # exclude pad-duplicate tiles
                if progress_cb is not None:
                    # fence this chunk (one O(1) element fetch — never
                    # ravel/reshape, which dispatches an O(output) copy) so
                    # the reported % reflects COMPLETED work like the
                    # reference's per-tile counter (realsr.cpp:481), not
                    # async dispatch depth.
                    np.asarray(out_buf[0, 0, 0, 0])
                    progress_cb(done / total)
        return out_buf, done

    def process_device(
        self,
        image: np.ndarray,
        progress_cb: Optional[Callable[[float], None]] = None,
    ):
        """uint8 HWC (C=3|4) -> DEVICE uint8 buffer [H*scale, W*scale, C].

        Single entry point for every backend (the reference needs separate
        process/process_cpu, src/realsr.cpp:145/525 — here XLA retargets the
        same program)."""
        if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] not in (3, 4):
            raise ValueError("expected uint8 HWC image with 3 or 4 channels")
        return self._process_stack_device(image[None], progress_cb)[0]

    def fetch(self, out_buf) -> np.ndarray:
        """Device output buffer -> host numpy (the one D2H per image)."""
        with tracer.span("fetch(D2H)"):
            return np.asarray(jax.device_get(out_buf))

    def process(
        self,
        image: np.ndarray,
        progress_cb: Optional[Callable[[float], None]] = None,
    ) -> np.ndarray:
        """uint8 HWC -> uint8 host array (process_device + fetch).

        process_device dispatches asynchronously; callers that want to
        overlap the D2H with the next image's compute (the pipeline's save
        stage does) use process_device/fetch directly. Images whose device
        footprint exceeds the band budget stream through
        :meth:`process_banded` (bit-identical output, O(band) memory).
        """
        if self.needs_banding(image.shape):
            return self.process_banded(image, progress_cb)
        return self.fetch(self.process_device(image, progress_cb))

    # -- band streaming (O(band) device memory for huge images) ---------

    def _band_budget_bytes(self) -> int:
        return (
            int(os.environ.get("REALSR_TPU_BAND_BUDGET_MB", "2048"))
            * 1024 * 1024
        )

    def _footprint_bytes(self, h: int, w: int, c: int) -> int:
        """Device bytes for full-image processing: padded storage input +
        uint8 output (the two resident buffers; chunk working set is
        O(tile^2) on top)."""
        p, s = self.prepadding, self.scale
        dsize = jnp.dtype(self.storage_dtype).itemsize if hasattr(self, "storage_dtype") else 4
        return (h + 2 * p) * (w + 2 * p) * 3 * dsize + h * s * w * s * c

    def needs_banding(self, shape) -> bool:
        """True when a full-image run would exceed the band budget — the
        reference bounds memory at O(tile^2) by streaming row bands
        (src/realsr.cpp:176-228, SURVEY.md §5); this is the engine's
        equivalent for arbitrarily large inputs.

        Mesh mode replicates the padded input and the uint8 output on
        EVERY device (only the tile batch is sharded — engine._build_jits
        mesh shardings), so _footprint_bytes is already the PER-DEVICE
        resident cost and this same budget check caps each chip's HBM:
        oversized images band-stream under a mesh too, keeping every
        device's resident buffers at O(band)."""
        h, w, c = shape
        return self._footprint_bytes(h, w, c) > self._band_budget_bytes()

    def max_batch_images(self, shape) -> int:
        """How many images of ``shape`` a resident device stack can hold
        within the band budget (cross-image batching's memory cap — the
        stack path allocates N x the per-image footprint)."""
        h, w, c = shape
        per = max(1, self._footprint_bytes(h, w, c))
        return max(1, self._band_budget_bytes() // per)

    @staticmethod
    def _equalized_band_rows(ytiles: int, btr: int) -> int:
        """Equalize band heights: ceil-divide the tile rows into the same
        number of bands but at uniform size, so every band (except a ragged
        image bottom) reuses ONE compiled program set instead of compiling
        a second shape for the remainder band."""
        btr = min(btr, ytiles)
        nbands = -(-ytiles // btr)
        return -(-ytiles // nbands)

    def _auto_band_tile_rows(self, w: int, c: int, tilesize: int) -> int:
        per_row = self._footprint_bytes(tilesize, w, c) - self._footprint_bytes(
            0, w, c
        )
        return max(1, self._band_budget_bytes() // max(1, 2 * per_row))

    def process_banded(
        self,
        image: np.ndarray,
        progress_cb: Optional[Callable[[float], None]] = None,
        band_tile_rows: int = 0,
    ) -> np.ndarray:
        """Stream the image through the device in horizontal bands of whole
        tile rows; output is BIT-IDENTICAL to the full-image path.

        Each band ships with its 2*prepadding vertical context rows (real
        neighbor rows; reflect-101 of the full image at the global edges),
        so every tile's padded window is byte-identical to the full-image
        path's — banding changes memory, never pixels. The previous band's
        D2H overlaps the current band's compute (the reference's row-band
        staging pipelined, src/realsr.cpp:184-228)."""
        from realsr_tpu.ops.pad import reflect101_indices

        if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] not in (3, 4):
            raise ValueError("expected uint8 HWC image with 3 or 4 channels")
        h, w, c = image.shape
        s, pad = self.scale, self.prepadding
        tilesize = self._pick_tilesize(w, h)
        self.last_tilesize = tilesize
        plan = plan_tiles(w, h, tilesize, pad)
        btr = band_tile_rows or self._auto_band_tile_rows(w, c, tilesize)
        btr = self._equalized_band_rows(plan.ytiles, btr)
        rows_idx = reflect101_indices(h, pad, pad)
        by_row: dict = {}
        for t in plan.tiles:
            by_row.setdefault(t.yi, []).append(t)
        where = replicated(self.mesh) if self.mesh is not None else self.device
        out = np.empty((h * s, w * s, c), np.uint8)
        total, done = len(plan.tiles), 0
        prev = None  # (Y0, Y1, device buf): fetch overlaps next band
        maybe_start_profiler()
        # ONE snapshot for the whole image: every band of this output uses
        # the same AOT executables even if a staged hot-swap lands mid-run
        aot = self._snapshot_aot()
        try:
            for r0 in range(0, plan.ytiles, btr):
                r1 = min(r0 + btr, plan.ytiles)
                Y0, Y1 = r0 * tilesize, min(r1 * tilesize, h)
                band_ext = image[rows_idx[Y0 : Y1 + 2 * pad]]
                with tracer.span("h2d+prep(band)"):
                    dev = jax.device_put(band_ext[None], where)
                    padded, alpha = self._prep_band(dev, pad)
                buf = self._alloc_out((1, (Y1 - Y0) * s, w * s, c))
                buckets: dict = {}
                for yi in range(r0, r1):
                    for t in by_row[yi]:
                        buckets.setdefault(t.padded_shape(pad), []).append(
                            (0, t.x0, t.y0 - Y0)
                        )
                buf, done = self._dispatch_buckets(
                    padded, alpha, buf, buckets, tilesize, c,
                    progress_cb, done, total, aot=aot,
                )
                buf = self._finish_out(buf)
                if prev is not None:
                    p0, p1, pbuf = prev
                    out[p0 * s : p1 * s] = self.fetch(pbuf)[0]
                prev = (Y0, Y1, buf)
        finally:
            # a banded run's first dispatch unblocks background compiles
            # too (ADVICE r4: only the stack path set this, so a
            # banded-first process stalled bg compiles for the full wait
            # timeout)
            self._first_dispatch_done.set()
        self._count_served(1)
        p0, p1, pbuf = prev
        out[p0 * s : p1 * s] = self.fetch(pbuf)[0]
        return out

    def process_batch(self, images) -> list:
        """Batch of SAME-SHAPE uint8 HWC images -> list of host outputs.

        Tiles from all images share the conv batches — for small images
        (one tile each) this fills the batch granule the reference (and the
        single-image path) cannot: N single-tile images cost ~1/N of N
        separate process() calls on TPU."""
        images = np.stack(list(images))
        if images.dtype != np.uint8 or images.ndim != 4 or images.shape[3] not in (3, 4):
            raise ValueError("expected same-shape uint8 HWC images, C in {3,4}")
        n = images.shape[0]
        cap = self.max_batch_images(images.shape[1:])
        if n > cap:
            # stack would blow the device budget: split into fitting
            # sub-stacks (each image individually over budget band-streams
            # through process())
            out: list = []
            for k in range(0, n, cap):
                sub = images[k : k + cap]
                if len(sub) == 1 or cap == 1:
                    out.extend(self.process(img) for img in sub)
                else:
                    out.extend(self.process_batch(sub))
            return out
        out = self.fetch(self._process_stack_device(images))
        return [out[i] for i in range(out.shape[0])]

    def process_cpu(
        self,
        image: np.ndarray,
        progress_cb: Optional[Callable[[float], None]] = None,
    ) -> np.ndarray:
        """Reference API parity (src/realsr.h:31-33): ``process`` and
        ``process_cpu`` coexist on one instance, and ``process_cpu`` really
        runs on the host even when the engine is device-bound. Here XLA
        retargets the same program: a lazily built CPU sibling engine
        shares this engine's model files and config (storage/variant
        re-resolve per-backend — f32 + XLA convs on CPU, like the
        reference's all-f32 CPU path, src/realsr.cpp:525-838)."""
        if self.device.platform == "cpu":
            return self.process(image, progress_cb)
        sib = self._cpu_sibling
        if sib is None:
            # re-resolve backend-specific choices for the CPU: an explicit
            # variant='pallas' (Mosaic, accelerator-only) must not leak in
            cfg = dataclasses.replace(
                self.config,
                tilesize=0,
                variant="auto" if self.config.variant == "pallas" else self.config.variant,
            )
            sib = RealSR(
                gpuid=-1,
                tta_mode=self.tta_mode,
                num_threads=self.num_threads,
                config=cfg,
            )
            sib.load(*self._model_paths)
            self._cpu_sibling = sib
        return sib.process(image, progress_cb)


def _host_features() -> str:
    """Feature string identifying the (host ISA, XLA backend) pair that
    compiled artifacts embed. XLA:CPU AOT executables are specialized to
    LLVM's view of the host at BUILD time, so the fingerprint must change
    whenever anything that view depends on changes: the machine, the
    kernel's reported ISA flags, the jax/jaxlib build (LLVM feature
    detection lives there), and the backend's own version string. Round 3's
    /proc/cpuinfo-only fingerprint missed a jaxlib/runtime change and let a
    mismatched artifact load (VERDICT r3 weak #2)."""
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    backend = ""
    try:
        import jax.extend.backend

        b = jax.extend.backend.get_backend()
        backend = f"{b.platform}/{b.platform_version}"
    except Exception:
        pass
    import jaxlib

    return "|".join(
        (
            platform.machine(),
            platform.processor(),
            flags,
            jax.__version__,
            getattr(jaxlib, "__version__", ""),
            backend,
        )
    )


@functools.lru_cache(maxsize=1)
def _enable_compilation_cache() -> None:
    """Persist XLA compiles across runs (23-block net compiles are ~30s).

    The cache dir is scoped by a host fingerprint (see _host_features):
    XLA:CPU AOT artifacts embed the build machine's ISA features and
    loading them on a different CPU warns about (and can hit) SIGILL —
    scoping prevents stale artifacts from a previous host generation or
    jax build being loaded."""
    import hashlib
    import os

    base = os.environ.get(
        "REALSR_TPU_CACHE", os.path.expanduser("~/.cache/realsr_tpu_xla")
    )
    try:
        fp = hashlib.sha1(_host_features().encode()).hexdigest()[:10]
        path = os.path.join(base, fp)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.0, not the jax default 1.0: the sub-second glue programs
        # (extract ~0.8 s) must round-trip the cache or
        # _warm_first_dispatch's concurrent glue compiles are wasted —
        # the dispatch loop's jit would silently recompile them (code
        # review round 5). An inference cache full of small entries is
        # cheap; correctness of reuse is not.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # By default jax points the XLA:GPU kernel/autotune sub-caches
        # INSIDE the cache dir and those absolute paths are hashed into
        # every cache key — so entries only hit if the cache base never
        # moves, and a seed tarball built in a temp dir (tools/
        # seed_cache.py) could never hit at runtime. Disable the (GPU-
        # only; we target TPU/CPU) sub-caches to make keys location-
        # independent and seeds relocatable.
        jax.config.update("jax_persistent_cache_enable_xla_caches", "")
    except Exception:
        pass
