"""TPU-first RRDBNet (ESRGAN-style) forward pass.

The RealSR DF2K graph (models/models-DF2K/x4.param; structure documented in
SURVEY.md §2.8) is: conv_first(3->nf) -> 23x RRDB -> trunk_conv + long skip
-> 2x (nearest-x2 upsample + conv + lrelu) -> HRconv + lrelu -> conv_last
(nf->3). Each RRDB = 3 residual dense blocks (RDB); each RDB is 5 densely
concatenated 3x3 convs (nf->gc, nf+gc->gc, ..., nf+4gc->nf) with
LeakyReLU(0.2) on the first four and residual ``0.2*c5 + x``; the RRDB
residual is ``0.2*(chain) + x`` (x4.param Eltwise coeffs ``[0.2, 1.0]``).

Instead of unrolling 999 ncnn layers (the generic executor does that and is
kept as the parity oracle), the 23 identical RRDB blocks are STACKED along a
leading axis and driven by ``lax.scan`` — one block body is traced/compiled
once, which keeps XLA compile time flat in the number of blocks.

Precision mirrors the reference's fp16-storage/fp32-arithmetic policy
(src/realsr.cpp:43-47): convs run with ``storage_dtype`` operands (f32 or
bf16) and f32 accumulation; residual adds are computed in f32 and rounded
back to storage.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from realsr_tpu.ops.resize import nearest_x2

LRELU_SLOPE = 0.2
RESIDUAL_SCALE = 0.2

# Drive the 3 RDBs inside each RRDB with an inner lax.scan instead of
# unrolling: ONE pallas_call instance in the traced program means ONE
# Mosaic kernel binary in the compiled executable instead of three. The
# executable shrinks ~3x, which matters because warm starts must ship it
# to the PJRT server (BASELINE.md: 123-249MB cache entries through a
# ~13MB/s tunnel dominate warm-start latency). Module-level so experiments
# can A/B at trace time.
RDB_INNER_SCAN = True

# Run the 69-RDB trunk in the kernel's resident-apron chained mode:
# every RDB call reads and writes the same aproned flat layout and the
# RRDB outer residual is folded into each 3rd call, so the trunk scan has
# ZERO XLA ops between kernel calls (the per-RDB re_apron pad copy alone
# is ~11% of trunk HBM traffic in mixed mode). Center output bit-identical
# to the unchained composition; module-level for A/B. Default follows the
# measured winner on v5e (BASELINE.md round-3 chained-trunk A/B).
CHAINED_TRUNK = False

# In mixed mode, carry the trunk state as PAIRED bf16 planes (hi + lo)
# instead of one f32 plane: identical MXU operand values (hi = bf16 of the
# f32 state), ~16-bit carried mantissa (between f16 parity and the f32
# carry), at HALF the f32 window-DMA bytes — the dominant term of mixed
# mode's measured 16% trunk cost (BASELINE.md round-3 decomposition).
# Module-level A/B flag like CHAINED_TRUNK; ignored outside mixed mode.
# MEASURED (v5e, 2026-08-17, tools/paired_ab.py, production chunk 8x276²,
# same-process min-of-rounds): 1.031x vs the f32 carry — the lo plane's
# blocked input + second blocked output win back only ~11 ms of the 59 ms
# f32 window+glue cost. Too small to justify trading the f32 carry's
# exact state for a ~16-bit one; kept OFF like CHAINED_TRUNK, with the
# kernel, exactness/error-class tests, and this A/B as the record.
PAIRED_CARRY = False

# Run the ENTIRE trunk (all RRDBs, outer residuals included) in ONE
# pallas call with the chain state resident in a 3-plane VMEM rotation
# (ops.rdb_kernel.rdb_apply_resident): HBM sees only the trunk input
# read, the streamed per-RDB weight blocks, and the final output write —
# the per-RDB f32 state round-trips (+ re_apron pad copies) that make up
# mixed mode's measured ~16% trunk cost disappear entirely. The cost: the
# planes' VMEM footprint forces a smaller row block (plan_rows_resident),
# i.e. more per-window halo recompute. Bit-identical to the unchained
# composition at equal (BLK, nblk) (test_rdb_kernel). Requires
# num_rdb_per_rrdb == 3 and a fitting VMEM plan, else the forward falls
# back to the unchained composition. Module default False (direct
# rrdbnet_forward callers opt in); RealSR.load() sets it True on the
# pallas path since round 4 — measured 1.098x trunk AND a 3.4x faster
# Mosaic compile (tools/resident_ab.py, BASELINE.md round-4) —
# REALSR_TPU_RESIDENT_TRUNK=0 opts out.
RESIDENT_TRUNK = False

# once-per-process guard for the RESIDENT_BLK override warning below
_WARNED_RESIDENT_BLK: list = []

# In mixed mode, optionally carry the TAIL's activations (upsampler at
# 2x/4x resolution) at the operand dtype instead of f32. Measured on v5e
# (2026-08-17, same-process A/B at the production chunk): IDENTICAL
# throughput (22.4 vs 22.3 MP/s) and identical PSNR to 2 decimals on both
# weight classes — the tail is conv-compute-bound, not bandwidth-bound,
# so the f32 tail costs nothing. Default False (strictly less rounding);
# module-level for re-measurement.
MIXED_TAIL_OP_STORAGE = False


@dataclasses.dataclass(frozen=True)
class RRDBNetSpec:
    """Static architecture hyperparameters recovered from the .param graph."""

    num_rrdb: int = 23
    num_rdb_per_rrdb: int = 3
    nf: int = 64
    gc: int = 32
    in_ch: int = 3
    out_ch: int = 3
    num_upsample: int = 2  # nearest-x2 stages => scale = 2**num_upsample

    @property
    def scale(self) -> int:
        return 2**self.num_upsample


def _precision(dtype):
    # f32 operands must really compute in f32 (the reference CPU path is
    # all-f32, src/realsr.cpp:525-838; XLA's DEFAULT conv precision may
    # downcast operands to bf16). bf16 storage keeps DEFAULT: bf16 x bf16
    # with f32 accumulation is the native MXU mode.
    return (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )


def _conv3x3(x, w, b, slope=None, op_dtype=None):
    """3x3 stride-1 pad-1 conv, f32 accumulation, optional LeakyReLU.

    Returns f32; caller decides storage rounding. ``op_dtype`` casts BOTH
    operands (mixed mode: f32 state, bf16 MXU operands — the conv analog
    of the reference's fp16-storage/fp32-arith policy, realsr.cpp:43-47).
    """
    od = jnp.dtype(op_dtype) if op_dtype is not None else x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(od),
        w.astype(od),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=_precision(od),
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    if slope is not None:
        y = jnp.where(y >= 0, y, y * slope)
    return y


def _rdb(x, p, storage_dtype, op_dtype=None):
    """Residual dense block. ``x`` is storage-dtype NHWC; returns same."""
    od = op_dtype
    feats = x
    c1 = _conv3x3(feats, p["w1"], p["b1"], LRELU_SLOPE, od).astype(storage_dtype)
    feats = jnp.concatenate([x, c1], axis=-1)
    c2 = _conv3x3(feats, p["w2"], p["b2"], LRELU_SLOPE, od).astype(storage_dtype)
    feats = jnp.concatenate([x, c1, c2], axis=-1)
    c3 = _conv3x3(feats, p["w3"], p["b3"], LRELU_SLOPE, od).astype(storage_dtype)
    feats = jnp.concatenate([x, c1, c2, c3], axis=-1)
    c4 = _conv3x3(feats, p["w4"], p["b4"], LRELU_SLOPE, od).astype(storage_dtype)
    feats = jnp.concatenate([x, c1, c2, c3, c4], axis=-1)
    c5 = _conv3x3(feats, p["w5"], p["b5"], None, od)  # f32, no activation
    y = RESIDUAL_SCALE * c5 + x.astype(jnp.float32)
    return y.astype(storage_dtype)


def _rdb_scatter(x, p, storage_dtype, op_dtype=None):
    """Dense block, scatter-weight formulation (exact same math as _rdb).

    The dense block's conv_i reads ``concat(x, c1..c_{i-1})``; by linearity
    of convolution over the input-channel dim, conv_i's output equals the
    sum of per-source partial convs. Regroup the weights BY SOURCE instead
    of by destination (see repack_scatter): each feature map is convolved
    ONCE against the concatenation of every slice of it that any later conv
    consumes. This turns five convs with output channels (gc,gc,gc,gc,nf)
    into five with output channels (4gc+nf, 3gc+nf, 2gc+nf, gc+nf, nf) —
    much friendlier to the MXU's 128-lane output tiling when gc=32 — while
    the total MACs are unchanged. On large tiles this measures ~2x faster
    than the concat formulation on TPU v5e; the engine picks per-shape.
    """
    od = op_dtype
    gc = p["b1"].shape[-1]
    px = _conv3x3(x, p["sw0"], None, None, od)  # x -> contributions to c1..c5
    c1 = _lrelu(px[..., :gc] + p["b1"]).astype(storage_dtype)
    p1 = _conv3x3(c1, p["sw1"], None, None, od)  # c1 -> contributions to c2..c5
    c2 = _lrelu(px[..., gc : 2 * gc] + p1[..., :gc] + p["b2"]).astype(storage_dtype)
    p2 = _conv3x3(c2, p["sw2"], None, None, od)
    c3 = _lrelu(
        px[..., 2 * gc : 3 * gc] + p1[..., gc : 2 * gc] + p2[..., :gc] + p["b3"]
    ).astype(storage_dtype)
    p3 = _conv3x3(c3, p["sw3"], None, None, od)
    c4 = _lrelu(
        px[..., 3 * gc : 4 * gc]
        + p1[..., 2 * gc : 3 * gc]
        + p2[..., gc : 2 * gc]
        + p3[..., :gc]
        + p["b4"]
    ).astype(storage_dtype)
    p4 = _conv3x3(c4, p["sw4"], None, None, od)
    c5 = (
        px[..., 4 * gc :]
        + p1[..., 3 * gc :]
        + p2[..., 2 * gc :]
        + p3[..., gc :]
        + p4
        + p["b5"]
    )
    y = RESIDUAL_SCALE * c5 + x.astype(jnp.float32)
    return y.astype(storage_dtype)


def _lrelu(v):
    return jnp.where(v >= 0, v, v * LRELU_SLOPE)


def repack_scatter(params):
    """Stacked 'dense' params -> 'scatter' params (pure; host or traced).

    For source feature s (s=0 is the block input x with nf channels,
    s=1..4 are c1..c4 with gc channels), concatenate along OUTPUT channels
    the slices of w_{i} (i>s) that multiply source s. Input-channel offsets
    in conv_i's weight: x at [0, nf), c_j at [nf+(j-1)*gc, nf+j*gc).

    Stays in numpy for numpy inputs (load-time repacking must not round-trip
    the weights through a device).
    """
    rdb = params["rdb"]
    xp = np if isinstance(rdb["w1"], np.ndarray) else jnp
    nf = rdb["w1"].shape[-2]  # conv1 Cin = nf
    gc = rdb["w1"].shape[-1]

    def src_slice(i, s):  # weight of conv i (1-based), input slice of source s
        w = rdb[f"w{i}"]
        lo = s * gc + (nf - gc if s > 0 else 0)
        hi = lo + (nf if s == 0 else gc)
        return w[..., lo:hi, :]

    out = {f"b{i}": rdb[f"b{i}"] for i in range(1, 6)}
    for s in range(5):
        parts = [src_slice(i, s) for i in range(s + 1, 6)]
        out[f"sw{s}"] = xp.concatenate(parts, axis=-1)
    new = dict(params)
    new["rdb"] = out
    return new


def _upconv_x2(x, w, b, op_dtype=None):
    """``nearest-x2 upsample -> conv3x3 -> lrelu`` as ONE stride-2 transposed
    conv with a 4x4 tap-sum kernel (exact: each output phase of the
    upsampled conv reads each source pixel through sums of adjacent taps;
    verified vs the two-op form). Measured 13% faster than materializing
    the 2x map on v5e — XLA keeps the expansion inside the conv. Tap sums
    are computed in f32 from the stored weights, then cast to the compute
    dtype.
    """
    od = jnp.dtype(op_dtype) if op_dtype is not None else x.dtype
    w = w.astype(jnp.float32)
    rows = jnp.stack([w[2], w[1] + w[2], w[0] + w[1], w[0]])
    k4 = jnp.stack(
        [rows[:, 2], rows[:, 1] + rows[:, 2], rows[:, 0] + rows[:, 1], rows[:, 0]],
        axis=1,
    )[::-1, ::-1]
    y = jax.lax.conv_general_dilated(
        x.astype(od),
        k4.astype(od),
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=_precision(od),
    )
    return _lrelu(y + b.astype(jnp.float32))


def _upconv_x2_phase(x, w, b, op_dtype=None):
    """``nearest-x2 upsample -> conv3x3 -> lrelu`` via PHASE decomposition:
    one VALID 2x2 conv at INPUT resolution with the four 2x-output phases
    as output-channel groups, then a shifted-slice interleave.

    Each upsampled-conv output phase (a, b) reads only a 2x2 input
    neighborhood through tap-sum kernels (row taps: a=0 -> (w0, w1+w2) on
    x[i-1], x[i]; a=1 -> (w0+w1, w2) on x[i], x[i+1]; columns mirror).
    vs the stride-2 transposed-conv form (_upconv_x2): 2.25x fewer MACs
    (16 vs 36 tap-MACs per input px) and no lhs-dilation zero-insertion —
    the MXU contracts a dense 2*2*cin axis. Exact to the last ulp incl.
    the zero-pad borders (the conv's pad at 4x resolution maps to the
    input pad here); verified in test_model_parity.
    """
    od = jnp.dtype(op_dtype) if op_dtype is not None else x.dtype
    cout = w.shape[3]
    kk = _phase_split(w)  # shared tap-sum construction (packed tail uses it)
    k = jnp.concatenate(
        [kk[0][0], kk[0][1], kk[1][0], kk[1][1]], axis=-1
    )  # [2, 2, cin, 4cout]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp.astype(od),
        k.astype(od),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=_precision(od),
    )  # [B, H+1, W+1, 4cout]; y[i, j] reads x[i-1..i, j-1..j]
    B, Hp1, Wp1, _ = y.shape
    H, W = Hp1 - 1, Wp1 - 1
    p00 = y[:, :H, :W, 0 * cout : 1 * cout]
    p01 = y[:, :H, 1:, 1 * cout : 2 * cout]
    p10 = y[:, 1:, :W, 2 * cout : 3 * cout]
    p11 = y[:, 1:, 1:, 3 * cout : 4 * cout]
    z = jnp.stack(
        [jnp.stack([p00, p01], axis=3), jnp.stack([p10, p11], axis=3)], axis=2
    )  # [B, H, 2, W, 2, cout]; out[2i+a, 2j+b] = p_ab[i, j]
    out = z.reshape(B, 2 * H, 2 * W, cout)
    return _lrelu(out + b.astype(jnp.float32))


# Upsampler formulation A/B (module-level like RDB_INNER_SCAN): phase
# decomposition vs stride-2 transposed conv. Both exact vs the reference's
# nearest+conv two-op form.
UPCONV_PHASE = False

# Run the WHOLE tail (up1/up2/HRconv/conv_last) at BASE resolution with
# the 16 output phases as channel groups, interleaving ONCE at the very
# end on the 3-channel f32 result. Round 1's flat tail lost on the
# 64-channel pixel-replication shuffle and round 3's phase upsampler lost
# on the 64-channel interleave at 2x/4x (BASELINE.md); this formulation
# has NO intermediate interleave — every stage is a phase-gathered
# einsum over base-resolution shifted slices, and the one interleave
# moves 3-channel data (21x less than 64-channel). Exact same taps as
# the interleaved tail (zero-pad borders included; proven in
# tests/test_packed_tail.py). Module-level A/B flag; measured on v5e
# before any default change.
PACKED_TAIL = False

# With PACKED_TAIL: run the deep tail stages as the fused Pallas kernel
# (ops.tail_kernel) instead of phase-gathered XLA einsums. Same tap
# values; accumulation order differs like any conv-vs-matmul regrouping.
#   0/False — all-einsum packed tail
#   1       — HRconv+conv_last fused (z never leaves VMEM; W9-packed
#             conv_last; one shared [64, 576] weight for all 16 phases)
#   2       — up2+HRconv+conv_last fused (P2 also stays in VMEM — the
#             einsum form materializes ~2.5 GB of P2 per production chunk)
PACKED_TAIL_KERNEL = 0

# Minimum tile side for the packed-tail KERNEL modes: the win is measured
# at production tile sizes (BASELINE.md round-4: 1.169x at 276²), while
# the kernel's Mosaic compile is minutes-scale — and the engine's fast
# start serves its FIRST images on a small tile precisely because that
# program compiles in seconds. Below this side the tail stays interleaved
# so the fast-start program keeps its seconds-scale compile. (Trace-time
# gate on the static tile height, so each shape's program is
# deterministic — no global-flag flipping between traces.)
PACKED_TAIL_MIN_SIDE = 128


def _upconv(x, w, b, op_dtype=None):
    fn = _upconv_x2_phase if UPCONV_PHASE else _upconv_x2
    return fn(x, w, b, op_dtype)


def _forward_pallas(params, x, spec, storage_dtype, op_dtype=None):
    """Forward with the 23-block trunk on the fused Pallas RDB kernel
    (ops.rdb_kernel) and the tail (trunk conv + upsampler + HR + last) as
    XLA convs.

    The trunk is ~83% of wall time and the kernel runs it 2.7x faster than
    XLA; a fully-flat tail (generic conv3x3 kernel + flat nearest-x2) was
    ALSO built and measured — numerically exact but 30% SLOWER end-to-end
    (450 vs 345 ms at t256 b8): the tail's Cout=64 convs give the
    transposed-matmul formulation an M of only 64 (MXU pipeline-fill
    bound), and the flat-layout pixel replication is a large lane shuffle,
    while XLA fuses upsample+conv+lrelu at 4x resolution reasonably well.
    So the kernel boundary is exactly the RDB trunk.
    """
    from realsr_tpu.ops import rdb_kernel as RK

    od = jnp.dtype(op_dtype) if op_dtype is not None else jnp.dtype(storage_dtype)
    kernel_od = od if od != jnp.dtype(storage_dtype) else None

    x = x.astype(storage_dtype)
    fea = _conv3x3(x, params["conv_first"]["w"], params["conv_first"]["b"], None, od)
    fea = fea.astype(storage_dtype)

    B, H, W, nf = fea.shape
    gc = spec.gc
    WB = RK.round_wb(W)
    BLK, nblk = RK.plan_rows(H, wb=WB)
    Hp = BLK * nblk
    paired = (
        PAIRED_CARRY
        and not CHAINED_TRUNK
        and kernel_od == jnp.bfloat16
        and jnp.dtype(storage_dtype) == jnp.float32
    )
    if paired:
        fea32 = fea.astype(jnp.float32)
        hi0 = fea32.astype(jnp.bfloat16)
        lo0 = (fea32 - hi0.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = RK.to_flat(hi0, WB, Hp, top=5)
        t_lo = RK.to_flat(lo0, WB, Hp, top=5)[:, :, 5 * WB : 5 * WB + Hp * WB]

        def one_rdb_paired(cur, pj):
            hi_f, lo_c = cur
            hi_c, lo2 = RK.rdb_apply_paired(
                hi_f, lo_c, pj, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk,
                nf=nf, gc=gc, db=RK.COLS_DB,
            )
            return (RK.re_apron(hi_c, WB), lo2)

        def center32(hi_f, lo_c):
            return (
                hi_f[:, :, 5 * WB : 5 * WB + Hp * WB].astype(jnp.float32)
                + lo_c.astype(jnp.float32)
            )

        def rrdb_body_paired(t, block_p):
            u32 = center32(*t)
            if RDB_INNER_SCAN:
                cur, _ = jax.lax.scan(
                    lambda c, pj: (one_rdb_paired(c, pj), None), t, block_p
                )
            else:
                cur = t
                for j in range(spec.num_rdb_per_rrdb):
                    cur = one_rdb_paired(
                        cur, jax.tree.map(lambda a: a[j], block_p)
                    )
            out32 = RESIDUAL_SCALE * center32(*cur) + u32
            hi = out32.astype(jnp.bfloat16)
            lo = (out32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (RK.re_apron(hi, WB), lo), None

        tp, _ = jax.lax.scan(rrdb_body_paired, (t_hi, t_lo), params["rdb"])
        body = RK.from_flat(center32(*tp), H, W, WB).astype(storage_dtype)
        return _pallas_tail(params, fea, body, spec, storage_dtype, od, kernel_od)

    if RESIDENT_TRUNK and not CHAINED_TRUNK and spec.num_rdb_per_rrdb == 3:
        sb = jnp.dtype(storage_dtype).itemsize
        ob = od.itemsize
        blk_r, nblk_r = RK.plan_rows_resident(
            H, WB, nf=nf, gc=gc, state_bytes=sb, op_bytes=ob
        )
        # on-hardware BLK sweep hook (trace-time env knob, parsed
        # defensively like REALSR_TPU_TAIL_BLK): overrides the analytic
        # VMEM plan — an over-budget target fails loudly at Mosaic
        # compile, which is exactly what a sweep wants to map the edge.
        _raw = os.environ.get("REALSR_TPU_RESIDENT_BLK", "")
        if _raw.isdigit() and int(_raw) > 0:
            if blk_r and not _WARNED_RESIDENT_BLK:
                # production risk (ADVICE r4): this trace-time override
                # bypasses plan_rows_resident's VMEM budget — a value left
                # exported from a sweep can force an over-budget plan whose
                # failure mode is a Mosaic compile abort of the DEFAULT
                # path, and already-traced shapes ignore later env changes
                _WARNED_RESIDENT_BLK.append(True)
                print(
                    f"realsr-tpu: REALSR_TPU_RESIDENT_BLK={_raw} overrides "
                    f"the VMEM-budgeted analytic plan (BLK {blk_r}); an "
                    "over-budget value aborts the default path at Mosaic "
                    "compile — unset it outside sweeps "
                    "(tools/resident_sweep.py)",
                    file=sys.stderr,
                )
            blk_r, nblk_r = RK.plan_rows(H, target_blk=int(_raw), wb=WB)
        if blk_r:
            n_rdb = spec.num_rrdb * spec.num_rdb_per_rrdb
            rdbs = jax.tree.map(
                lambda a: a.reshape((n_rdb,) + a.shape[2:]), params["rdb"]
            )
            t0 = RK.to_flat(fea, WB, blk_r * nblk_r, top=8)
            yc = RK.rdb_apply_resident(
                t0, rdbs, H=H, W=W, WB=WB, BLK=blk_r, nblk=nblk_r, nf=nf,
                gc=gc, n_rdb=n_rdb, db=RK.COLS_DB, op_dtype=kernel_od,
            )
            body = RK.from_flat(yc, H, W, WB)
            return _pallas_tail(
                params, fea, body, spec, storage_dtype, od, kernel_od
            )
        # no fitting VMEM plan for this shape: unchained fallback below

    # chained mode runs on the TOP=8 layout (DMA offset alignment, see
    # rdb_apply_chained); the unchained composition keeps the minimal
    # TOP=5 apron.
    top = 8 if CHAINED_TRUNK else 5
    t0 = RK.to_flat(fea, WB, Hp, top=top)

    if CHAINED_TRUNK:
        # flags: fold the RRDB outer residual into the last RDB of each
        # block (x4.param Eltwise coeffs [0.2, 1.0]).
        flags = jnp.zeros((spec.num_rdb_per_rrdb, 1), jnp.int32)
        flags = flags.at[-1, 0].set(1)

        def rrdb_body(t, block_p):
            u = t  # RRDB entry state, closed over by the inner steps

            def inner(c, xs):
                pj, fl = xs
                y = RK.rdb_apply_chained(
                    c, pj, u, fl, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk,
                    nf=nf, gc=gc, db=RK.COLS_DB, op_dtype=kernel_od,
                )
                return y, None

            if RDB_INNER_SCAN:
                cur, _ = jax.lax.scan(inner, t, (block_p, flags))
            else:
                cur = t
                for j in range(spec.num_rdb_per_rrdb):
                    cur, _ = inner(
                        cur,
                        (jax.tree.map(lambda a: a[j], block_p), flags[j]),
                    )
            return cur, None

    else:

        def one_rdb(cur, pj):
            y = RK.rdb_apply(
                cur, pj, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
                db=RK.COLS_DB, op_dtype=kernel_od,
            )
            return RK.re_apron(y, WB)

        def rrdb_body(t, block_p):
            u_center = t[:, :, 5 * WB : 5 * WB + Hp * WB]
            if RDB_INNER_SCAN:
                cur, _ = jax.lax.scan(
                    lambda c, pj: (one_rdb(c, pj), None), t, block_p
                )
            else:
                cur = t
                for j in range(spec.num_rdb_per_rrdb):
                    cur = one_rdb(cur, jax.tree.map(lambda a: a[j], block_p))
            y3 = cur[:, :, 5 * WB : 5 * WB + Hp * WB]
            out = (
                RESIDUAL_SCALE * y3.astype(jnp.float32)
                + u_center.astype(jnp.float32)
            ).astype(storage_dtype)
            return RK.re_apron(out, WB), None

    tf, _ = jax.lax.scan(rrdb_body, t0, params["rdb"])
    body = RK.from_flat(tf[:, :, top * WB : (top + Hp) * WB], H, W, WB)
    return _pallas_tail(params, fea, body, spec, storage_dtype, od, kernel_od)


def _shift0(x, sy, sx):
    """[B, H, W, C] shifted by (sy, sx) ∈ {-1, 0, 1} with zero fill:
    result[i, j] = x[i + sy, j + sx] (zero outside). The packed-tail
    analog of the interleaved convs' SAME zero padding."""
    if sy == 0 and sx == 0:
        return x
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp[:, 1 + sy : 1 + sy + H, 1 + sx : 1 + sx + W, :]


def _phase_split(w):
    """Tap-sum kernels of ``nearest-x2 + conv3x3``: k[a][b][s, t] is the
    [cin, cout] weight the 2x-output phase (a, b) applies to the input at
    [i + a - 1 + s, j + b - 1 + t] (s, t ∈ {0, 1}). Same construction as
    _upconv_x2_phase (which proves it exact vs the two-op form)."""
    w = w.astype(jnp.float32)
    r0 = jnp.stack([w[0], w[1] + w[2]])  # a=0: taps rows (i-1, i)
    r1 = jnp.stack([w[0] + w[1], w[2]])  # a=1: taps rows (i, i+1)

    def cols(rw):
        c0 = jnp.stack([rw[:, 0], rw[:, 1] + rw[:, 2]], axis=1)
        c1 = jnp.stack([rw[:, 0] + rw[:, 1], rw[:, 2]], axis=1)
        return c0, c1

    k00, k01 = cols(r0)
    k10, k11 = cols(r1)
    return [[k00, k01], [k10, k11]]


def _packed_tail(params, fea, spec, od, tail_dt):
    """The tail in packed-phase form: every stage computes at BASE
    resolution with output phases as channel groups; one 3-channel f32
    interleave at the end (see the PACKED_TAIL flag comment). ``fea`` is
    the post-trunk-conv, post-long-skip feature map (computed by
    _pallas_tail so the dtype policy lives in exactly one place).

    Derivation: a 4x-res pixel (4i+P, 4j+Q) has base position (i, j) and
    phase (P, Q). up1's 2x phases (a, b) come from _phase_split taps on
    fea. up2's 4x phase (2a+c, 2b+d) at base i taps the 2x image at rows
    2i + (a+c-1+s), i.e. packed phase (m%2) at base shift (m - m%2)/2 —
    a shifted slice. HRconv/conv_last at 4x: tap dy maps output phase P
    to source phase (P+dy)%4 at base shift (P+dy)//4. All taps therefore
    become concat(shifted 64-ch slices) @ [K, cout] einsums with K = 256
    (upsample stages) or 576 (3x3 stages) — MXU-shaped matmuls instead
    of XLA's 6-12%-MFU 4x-resolution convs (BASELINE.md round-3 tail
    decomposition). Zero-fill shifts reproduce the interleaved convs'
    zero-pad borders exactly; the reference computes this tail at full
    resolution per tile (/root/reference/src/realsr.cpp:420-428 via the
    x4.param upsampler layers)."""

    def mm(sources, rows, b, slope, store=True):
        x = jnp.concatenate(sources, axis=-1).astype(od)
        w = jnp.concatenate([r.astype(jnp.float32) for r in rows], axis=0)
        y = jnp.einsum(
            "bhwk,ko->bhwo",
            x,
            w.astype(od),
            preferred_element_type=jnp.float32,
            precision=_precision(od),
        )
        y = y + b.astype(jnp.float32)
        if slope is not None:
            y = jnp.where(y >= 0, y, y * slope)
        return y.astype(tail_dt) if store else y

    # up1: fea -> 4 packed 2x phases; P1[a][b][i, j] = 2x pixel (2i+a, 2j+b).
    # ONE VALID 2x2 conv with the 4 phases as output-channel groups (the
    # _upconv_x2_phase formulation minus its interleave); the phase
    # arrays are then plain slices — cheaper than 4 gather-concat einsums.
    k1 = _phase_split(params["up"]["w"][0])
    b1 = params["up"]["b"][0]
    nf_t = fea.shape[-1]
    k1c = jnp.concatenate(
        [k1[0][0], k1[0][1], k1[1][0], k1[1][1]], axis=-1
    )  # [2, 2, cin, 4cout]
    xp1 = jnp.pad(fea, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y1 = jax.lax.conv_general_dilated(
        xp1.astype(od),
        k1c.astype(od),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=_precision(od),
    )  # y1[i, j] reads fea[i-1..i, j-1..j]; p_ab[i, j] = y1[i+a, j+b]
    y1 = y1 + jnp.tile(b1.astype(jnp.float32), 4)
    y1 = jnp.where(y1 >= 0, y1, y1 * LRELU_SLOPE).astype(tail_dt)
    Hf, Wf = fea.shape[1], fea.shape[2]
    P1 = [
        [
            y1[:, a : a + Hf, b : b + Wf, (2 * a + b) * nf_t : (2 * a + b + 1) * nf_t]
            for b in (0, 1)
        ]
        for a in (0, 1)
    ]

    # kernel modes (ops.tail_kernel is fixed at the production nf=64,
    # out_ch=3 shape; other specs fall back to the einsum form)
    kern = PACKED_TAIL_KERNEL
    if kern and not (P1[0][0].shape[-1] == 64 and spec.out_ch == 3):
        kern = 0

    def _kernel_unpack(out, RK, TK, B, H, W, WB):
        img = RK.from_flat(out, H, W, WB)  # [B, H, W, 16*TC] phase-major
        grid = img.reshape(B, H, W, 4, 4, TK.TC)[..., : spec.out_ch]
        grid = jnp.transpose(grid, (0, 1, 3, 2, 4, 5))
        return grid.reshape(B, 4 * H, 4 * W, spec.out_ch)

    def _tail_ch():
        # tail-kernel lane-chunk override (trace-time env knob, parsed
        # defensively like every env int here). Default 0 = stage-sized
        # chunks: ~4x fewer trace-time ops -> ~4x cheaper Mosaic compile
        # (the mode-2 kernel's 573 s was the blocker, VERDICT r3 next #2)
        # and larger matmul N per stationary-weight load.
        import os

        raw = os.environ.get("REALSR_TPU_TAIL_CH", "")
        return int(raw) if raw.isdigit() else 0

    def _kernel_rows(RK, H, WB):
        # VMEM-bounded row blocks: the dominant scratch is the f32 T
        # buffer [16*9*8, (BLK+2)*WB + guards], so cap the z-frame flat
        # size the way rdb_kernel.plan_rows caps its window (at WB 288
        # the cap reproduces the default BLK 24 ~ 38 MB of T). The env
        # override serves on-hardware sweeps (trace-time knob); parsed
        # defensively like every env int in this repo.
        import os

        raw = os.environ.get("REALSR_TPU_TAIL_BLK", "")
        tgt = int(raw) if raw.isdigit() else 0
        if not tgt:
            flat_cap = max(4, (26 * 288 // WB - 2) // 4 * 4)
            tgt = min(24, max(4, H), flat_cap)
        return RK.plan_rows(H, target_blk=tgt)

    if kern == 2:
        # fused up2+HRconv+conv_last: P2 never leaves VMEM
        from realsr_tpu.ops import rdb_kernel as RK
        from realsr_tpu.ops import tail_kernel as TK

        B, H, W = P1[0][0].shape[:3]
        WB = RK.round_wb(W)
        BLK, nblk = _kernel_rows(RK, H, WB)
        packed1 = jnp.concatenate(
            [P1[a][b] for a in (0, 1) for b in (0, 1)], axis=-1
        ).astype(od)
        flat1 = RK.to_flat(packed1, WB, BLK * nblk, top=3)
        k2k = _phase_split(params["up"]["w"][1])
        w2 = jnp.stack(
            [
                jnp.transpose(
                    jnp.stack(
                        [k2k[c][d][s, t] for s in (0, 1) for t in (0, 1)]
                    ),  # [4, cin, cout]
                    (2, 0, 1),
                ).reshape(TK.NF, 4 * TK.NF)
                for c in (0, 1)
                for d in (0, 1)
            ]
        ).astype(od)
        b2k = params["up"]["b"][1].astype(jnp.float32).reshape(TK.NF, 1)
        w1, b1p, w9, b3p = TK.pack_tail_weights(
            params["hr"]["w"], params["hr"]["b"],
            params["last"]["w"], params["last"]["b"], dtype=od,
        )
        out = TK.up2_hr_last_packed(
            flat1, w2, b2k, w1, b1p, w9, b3p,
            H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, ch=_tail_ch(),
        )
        return _kernel_unpack(out, RK, TK, B, H, W, WB)

    # up2: 4 packed phases -> 16; output phase (2a+c, 2b+d)
    k2 = _phase_split(params["up"]["w"][1])
    b2 = params["up"]["b"][1]
    P2 = [[None] * 4 for _ in range(4)]
    for a in (0, 1):
        for c in (0, 1):
            for bb in (0, 1):
                for d in (0, 1):
                    srcs, rows = [], []
                    for s in (0, 1):
                        m = a + c - 1 + s
                        qr, sr = m % 2, (m - m % 2) // 2
                        for t in (0, 1):
                            n = bb + d - 1 + t
                            qc, sc = n % 2, (n - n % 2) // 2
                            srcs.append(_shift0(P1[qr][qc], sr, sc))
                            rows.append(k2[c][d][s, t])
                    P2[2 * a + c][2 * bb + d] = mm(
                        srcs, rows, b2, LRELU_SLOPE
                    )

    if kern:
        from realsr_tpu.ops import rdb_kernel as RK
        from realsr_tpu.ops import tail_kernel as TK

        B, H, W = P2[0][0].shape[:3]
        WB = RK.round_wb(W)
        BLK, nblk = _kernel_rows(RK, H, WB)
        Hp = BLK * nblk
        packed = jnp.concatenate(
            [P2[P][Q] for P in range(4) for Q in range(4)], axis=-1
        ).astype(od)  # operand dtype: bf16 window = the einsum's own cast
        flat = RK.to_flat(packed, WB, Hp, top=2)
        w1, b1p, w9, b3p = TK.pack_tail_weights(
            params["hr"]["w"], params["hr"]["b"],
            params["last"]["w"], params["last"]["b"], dtype=od,
        )
        out = TK.hr_last_packed(
            flat, w1, b1p, w9, b3p, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk,
            ch=_tail_ch(),
        )
        return _kernel_unpack(out, RK, TK, B, H, W, WB)

    # HRconv + conv_last: 3x3 convs at 4x resolution in phase space
    def conv_phase(P, w, b, slope, store):
        out = [[None] * 4 for _ in range(4)]
        for Pr in range(4):
            for Qc in range(4):
                srcs, rows = [], []
                for dy in (-1, 0, 1):
                    py, sy = (Pr + dy) % 4, (Pr + dy) // 4
                    for dx in (-1, 0, 1):
                        px, sx = (Qc + dx) % 4, (Qc + dx) // 4
                        srcs.append(_shift0(P[py][px], sy, sx))
                        rows.append(w[dy + 1, dx + 1])
                out[Pr][Qc] = mm(srcs, rows, b, slope, store=store)
        return out

    P3 = conv_phase(
        P2, params["hr"]["w"], params["hr"]["b"], LRELU_SLOPE, store=True
    )
    P4 = conv_phase(
        P3, params["last"]["w"], params["last"]["b"], None, store=False
    )

    # single interleave, 3-channel f32: out[4i+P, 4j+Q] = P4[P][Q][i, j]
    grid = jnp.stack(
        [jnp.stack([P4[P][Q] for Q in range(4)], axis=3) for P in range(4)],
        axis=2,
    )  # [B, H, 4, W, 4, out_ch]
    B, H = grid.shape[0], grid.shape[1]
    W = grid.shape[3]
    return grid.reshape(B, 4 * H, 4 * W, grid.shape[-1])


def _pallas_tail(params, fea, body, spec, storage_dtype, od, kernel_od):
    """Shared tail after the trunk (trunk conv + long skip + upsampler +
    HR + last); XLA convs — see _forward_pallas docstring for why."""
    tail_dt = (
        od if (kernel_od is not None and MIXED_TAIL_OP_STORAGE) else storage_dtype
    )
    trunk = _conv3x3(body, params["trunk"]["w"], params["trunk"]["b"], None, od)
    fea = (fea.astype(jnp.float32) + trunk).astype(tail_dt)
    if PACKED_TAIL and spec.num_upsample == 2:
        H, W = fea.shape[1], fea.shape[2]
        if not PACKED_TAIL_KERNEL or min(H, W) >= PACKED_TAIL_MIN_SIDE:
            return _packed_tail(params, fea, spec, od, tail_dt)
    for s in range(spec.num_upsample):
        up = jax.tree.map(lambda a: a[s], params["up"])
        fea = _upconv(fea, up["w"], up["b"], od).astype(tail_dt)
    fea = _conv3x3(
        fea, params["hr"]["w"], params["hr"]["b"], LRELU_SLOPE, od
    ).astype(tail_dt)
    return _conv3x3(fea, params["last"]["w"], params["last"]["b"], None, od)


def rrdbnet_forward(
    params: Dict[str, Any],
    x: jnp.ndarray,
    spec: RRDBNetSpec,
    storage_dtype=jnp.float32,
    variant: str = "dense",
    op_dtype=None,
) -> jnp.ndarray:
    """Forward pass: normalized NHWC f32 in [0,1] -> NHWC f32 (pre-denorm).

    ``params`` layout (all HWIO convs):
      conv_first: {w,b}
      rdb:        {w1..w5, b1..b5} stacked [num_rrdb, num_rdb, ...]
                  (or {sw0..sw4, b1..b5} when variant='scatter';
                   see repack_scatter)
      trunk:      {w,b}
      up:         {w,b} stacked [num_upsample, ...]
      hr:         {w,b}
      last:       {w,b}

    ``variant``: 'dense' = concat-input convs (the literal graph shape);
    'scatter' = source-regrouped convs (identical math, see _rdb_scatter);
    'pallas' = fused whole-block TPU kernel (ops.rdb_kernel; same math,
    ~2.2x the XLA conv throughput on v5e; rdb params must be kernel-packed).

    ``op_dtype``: matmul/conv operand dtype, default = storage_dtype.
    Setting storage f32 + op bf16 is the MIXED mode: the carried state
    never rounds (no accumulated error across 69 RDBs), only conv operands
    quantize — one config with parity-grade numerics at MXU speed.
    """
    if variant == "pallas":
        return _forward_pallas(params, x, spec, storage_dtype, op_dtype)

    od = op_dtype
    x = x.astype(storage_dtype)
    fea = _conv3x3(x, params["conv_first"]["w"], params["conv_first"]["b"], None, od)
    fea = fea.astype(storage_dtype)

    num_rdb = spec.num_rdb_per_rrdb
    rdb_fn = _rdb_scatter if variant == "scatter" else _rdb

    def rrdb_body(t, block_p):
        u = t
        for j in range(num_rdb):
            pj = jax.tree.map(lambda a: a[j], block_p)
            t = rdb_fn(t, pj, storage_dtype, od)
        t = (
            RESIDUAL_SCALE * t.astype(jnp.float32) + u.astype(jnp.float32)
        ).astype(storage_dtype)
        return t, None

    body, _ = jax.lax.scan(rrdb_body, fea, params["rdb"])

    trunk = _conv3x3(body, params["trunk"]["w"], params["trunk"]["b"], None, od)
    fea = (fea.astype(jnp.float32) + trunk).astype(storage_dtype)

    # NOTE: an exact low-res reformulation of nearest-x2+conv (4 phase convs
    # with 2x2 tap-sum kernels + depth-to-space, 2.25x fewer FLOPs) was
    # measured 2x SLOWER on v5e — the depth-to-space interleave transposes
    # cost more than the saved conv time — so the straightforward
    # upsample-then-conv form stays (it is ~8% of the forward's wall time).
    for s in range(spec.num_upsample):
        up = jax.tree.map(lambda a: a[s], params["up"])
        fea = nearest_x2(fea)
        fea = _conv3x3(fea, up["w"], up["b"], LRELU_SLOPE, od).astype(storage_dtype)

    fea = _conv3x3(
        fea, params["hr"]["w"], params["hr"]["b"], LRELU_SLOPE, od
    ).astype(storage_dtype)
    out = _conv3x3(fea, params["last"]["w"], params["last"]["b"], None, od)
    return out  # f32


def init_rrdbnet_params(
    spec: RRDBNetSpec, seed: int = 0, dtype=np.float32
) -> Dict[str, Any]:
    """Random (deterministic) parameters in the stacked layout.

    Used for benchmarking and tests — the reference snapshot ships no
    ``x4.bin`` weights (/root/reference/.MISSING_LARGE_BLOBS).
    """
    rng = np.random.default_rng(seed)
    nf, gc = spec.nf, spec.gc

    def conv(cin, cout, *lead):
        shape_w = (*lead, 3, 3, cin, cout)
        shape_b = (*lead, cout)
        # Small scale keeps activations in a sane range through 23 blocks.
        w = rng.normal(0, 0.05, size=shape_w).astype(dtype)
        b = rng.normal(0, 0.01, size=shape_b).astype(dtype)
        return w, b

    nb = (spec.num_rrdb, spec.num_rdb_per_rrdb)
    rdb_cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    rdb_couts = [gc, gc, gc, gc, nf]
    rdb = {}
    for i, (cin, cout) in enumerate(zip(rdb_cins, rdb_couts), start=1):
        w, b = conv(cin, cout, *nb)
        rdb[f"w{i}"] = w
        rdb[f"b{i}"] = b

    upw, upb = conv(nf, nf, spec.num_upsample)
    fw, fb = conv(spec.in_ch, nf)
    tw, tb = conv(nf, nf)
    hw, hb = conv(nf, nf)
    lw, lb = conv(nf, spec.out_ch)
    return {
        "conv_first": {"w": fw, "b": fb},
        "rdb": rdb,
        "trunk": {"w": tw, "b": tb},
        "up": {"w": upw, "b": upb},
        "hr": {"w": hw, "b": hb},
        "last": {"w": lw, "b": lb},
    }
