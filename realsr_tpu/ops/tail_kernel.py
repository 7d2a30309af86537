"""Pallas TPU kernel: fused packed-phase HRconv + conv_last.

The tail's two 4x-resolution 3x3 convs are the framework's last XLA convs
on the hot path, and XLA emits them at 6-12% MFU regardless of layout or
channel count (BASELINE.md round-3 tail decomposition + tools/tail_probe).
In PACKED-PHASE form (models.rrdbnet._packed_tail) they are, per output
phase (P, Q) of the 4x grid, matmuls over 9 (source-phase, base-shift)
taps — and the phase-dependence lives ENTIRELY in the tap gather: all 16
phases share ONE [64, 9*64] HRconv weight and ONE conv_last weight,
because tap (dy, dx) of output phase P always multiplies w[dy+1, dx+1]
with source phase (P+dy)%4 at base row shift (P+dy)//4.

This kernel runs both convs for all 16 phases in one VMEM pass over the
base-resolution flat layout (ops.rdb_kernel conventions: channels on
sublanes — here 16 phases x 64 = 1024 rows — flat W-blocked spatial on
lanes, zero guard cols, 2-row zero apron):

  stage 1 (HRconv): per phase, im2col taps are lane slices of the guarded
    window STORED into a cols scratch (arbitrary lane offsets must be
    normalized through memory, per the RDB kernel), one [64, 576] @
    [576, lanes] MXU matmul per lane chunk, + bias + lrelu, masked to the
    tile. The z activations stay VALUES — they feed stage 2 directly and
    never touch HBM (the interleaved form round-trips the 1.25 GB z
    tensor at the production chunk).
  stage 2 (conv_last, scatter/W9-packed): T_p = w9 [9*TC, 64] @ z_p —
    each source phase's contribution through all 9 taps in one K=64
    matmul (one MXU M-tile; the naive per-output-phase K=576, M=3 matmul
    would cost 9x the MXU passes for 3 rows of output). T is stored to a
    lane-guarded scratch; each output phase then sums its 9
    statically-shifted [TC, lanes] T slices on the VPU.

z is computed with a 1-row halo (recompute, like the RDB kernel's 5-row
halo) so conv_last's cross-block taps need no inter-block communication;
z outside the tile is masked to zero = the 4x image's zero padding.

Reference semantics: HRconv + lrelu + conv_last of the x4.param tail
(SURVEY.md §2.8; /root/reference/src/realsr.cpp:420-428 runs them through
ncnn's Vulkan convs at 4x resolution per tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realsr_tpu.ops.rdb_kernel import _CH, LRELU_SLOPE

NPH = 16  # 4x4 output phases
NF = 64  # tail channel count (x4.param HRconv is 64->64, conv_last 64->3)
OUTC = 3
# conv_last's 3 output channels padded to one 8-sublane tile: every T/out
# slice offset stays a multiple of 8 (the RDB kernel never sublane-slices
# off-tile either; interpret mode would not catch a Mosaic alignment
# failure). w9/b3 carry 5 zero rows per tap; the XLA side slices [:3].
TC = 8


def _g_in(wb: int) -> int:
    """Left/right guard lanes of the input window: stage-1 tap offsets
    reach (1+sr)*WB + sc ∈ [-1, 2*WB+1], and chunked slices may start up
    to one chunk past FLAT1; 2*WB+2 rounded to the 128-lane tile covers
    the right overhang, 128-aligned for the DMA destination offset."""
    return -(-(2 * wb + 2) // 128) * 128


def _g_t(wb: int) -> int:
    """Guard lanes of the T scratch: stage-2 reads at WB + o with
    o ∈ [-WB-1, WB+1]."""
    return -(-(wb + 2) // 128) * 128


def _mm(w, buf, k, n=None):
    return jax.lax.dot_general(
        w,
        buf[:k, :] if n is None else buf[:k, :n],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if buf.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )


def _stage_ch(flat: int, ch: int) -> int:
    """Lane-chunk for one stage: ``ch == 0`` selects ONE stage-sized chunk
    (flat rounded to the 128-lane tile). Stage-sized chunks collapse the
    kernel's trace-time (phase x chunk x tap) unroll ~4x — the mode-2
    Mosaic compile was 573 s at ch 1920 (BASELINE.md round-3 tail notes)
    because every one of its ~1000 distinct tap-store/matmul ops is
    compiled separately — and enlarge every matmul's N (fewer stationary-
    weight reloads for these M=64 matmuls)."""
    return -(-flat // 128) * 128 if ch == 0 else ch


def _tail_kernel(
    x_hbm,
    w2,
    b2,
    w1,
    b1,
    w9,
    b3,
    out_ref,
    xg,
    cols_ref,
    cols2_ref,
    t_ref,
    p2_ref,
    sem,
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    ch: int = _CH,
    db: bool = True,
    with_up2: bool = False,
):
    """with_up2=False: x_hbm is packed P2 (16 phases, 2-row apron), p2_ref
    is a dummy, w2/b2 unused. with_up2=True: x_hbm is packed P1 (4 phases,
    3-row apron); up2 computes P2 into the guarded p2_ref scratch first,
    then HRconv reads p2_ref instead of the window."""
    # frames, innermost out: z rows = BLK + 1-row halo each side (conv_last
    # taps); P2 rows = BLK + 2 each side (z taps); window adds tap reach.
    FLAT1 = (BLK + 2) * WB
    FLAT2 = (BLK + 4) * WB
    FLAT = (BLK + 6) * WB if with_up2 else FLAT2
    cin = 4 * NF if with_up2 else NPH * NF
    GI = _g_in(WB)
    GT = _g_t(WB)
    ch1 = _stage_ch(FLAT1, ch)
    ch2 = _stage_ch(FLAT2, ch)
    padf1 = -(-FLAT1 // ch1) * ch1
    padf2 = -(-FLAT2 // ch2) * ch2
    flatd = -(-FLAT // 128) * 128
    b = pl.program_id(0)
    r = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(r * BLK * WB, flatd)],
        xg.at[:, pl.ds(GI, flatd)],
        sem,
    )
    cp.start()
    xg[:, :GI] = jnp.zeros((cin, GI), xg.dtype)
    xg[:, GI + flatd :] = jnp.zeros((cin, xg.shape[1] - GI - flatd), xg.dtype)
    t_ref[:, :GT] = jnp.zeros((NPH * 9 * TC, GT), t_ref.dtype)
    t_ref[:, GT + FLAT1 :] = jnp.zeros(
        (NPH * 9 * TC, t_ref.shape[1] - GT - FLAT1), t_ref.dtype
    )
    if with_up2:
        p2_ref[:, :GI] = jnp.zeros((NPH * NF, GI), p2_ref.dtype)
        p2_ref[:, GI + FLAT2 :] = jnp.zeros(
            (NPH * NF, p2_ref.shape[1] - GI - FLAT2), p2_ref.dtype
        )
    cp.wait()

    def frame_mask(flat, top):
        # frame lane f = (row, col); tile row = r*BLK + row - top
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, flat), 1)
        trow = r * BLK + ids // WB - top
        col = ids % WB
        return (trow >= 0) & (trow < H) & (col >= 1) & (col <= W)

    chunk_no = [0]

    def next_buf():
        buf = cols2_ref if (db and chunk_no[0] % 2) else cols_ref
        chunk_no[0] += 1
        return buf

    if with_up2:
        # up2: P2 phase (2a+c, 2b+d) taps the 2x grid at row 2i+(a+c-1+s),
        # i.e. P1 phase m%2 at base shift (m - m%2)/2; weight k2[c][d]
        # shared across (a, b) (models.rrdbnet._packed_tail derivation).
        valid2 = frame_mask(FLAT2, 2)
        for A in range(4):
            a, c = A // 2, A % 2
            for B_ in range(4):
                bb, d = B_ // 2, B_ % 2
                p = 4 * A + B_
                outs = []
                for f0 in range(0, padf2, ch2):
                    buf = next_buf()
                    t = 0
                    for s in (0, 1):
                        m = a + c - 1 + s
                        qr, sr = m % 2, (m - m % 2) // 2
                        for tt in (0, 1):
                            n = bb + d - 1 + tt
                            qc, sc = n % 2, (n - n % 2) // 2
                            ps = 2 * qr + qc
                            o = (1 + sr) * WB + sc  # P2-frame -> window
                            buf[t * NF : (t + 1) * NF, 0:ch2] = xg[
                                ps * NF : (ps + 1) * NF,
                                GI + f0 + o : GI + f0 + o + ch2,
                            ]
                            t += 1
                    outs.append(_mm(w2[2 * c + d], buf, 4 * NF, ch2))
                pp = (
                    outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
                )[:, :FLAT2]
                pp = pp + b2[:]
                pp = jnp.where(
                    valid2, jnp.where(pp >= 0, pp, pp * LRELU_SLOPE), 0.0
                )
                p2_ref[p * NF : (p + 1) * NF, GI : GI + FLAT2] = pp.astype(
                    p2_ref.dtype
                )

    src = p2_ref if with_up2 else xg
    valid = frame_mask(FLAT1, 1)
    for P in range(4):
        for Q in range(4):
            p = 4 * P + Q
            outs = []
            for f0 in range(0, padf1, ch1):
                buf = next_buf()
                t = 0
                for dy in (-1, 0, 1):
                    sr, psr = (P + dy) // 4, (P + dy) % 4
                    for dx in (-1, 0, 1):
                        sc, psc = (Q + dx) // 4, (Q + dx) % 4
                        ps = 4 * psr + psc
                        o = (1 + sr) * WB + sc  # z-frame -> src-frame
                        buf[t * NF : (t + 1) * NF, 0:ch1] = src[
                            ps * NF : (ps + 1) * NF,
                            GI + f0 + o : GI + f0 + o + ch1,
                        ]
                        t += 1
                outs.append(_mm(w1[:], buf, 9 * NF, ch1))
            zp = (outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1))[
                :, :FLAT1
            ]
            zp = zp + b1[:]
            zp = jnp.where(valid, jnp.where(zp >= 0, zp, zp * LRELU_SLOPE), 0.0)
            t_ref[p * 9 * TC : (p + 1) * 9 * TC, GT : GT + FLAT1] = _mm(
                w9[:], zp.astype(w9.dtype), zp.shape[0]
            )

    # stage 2b: out phase (P, Q) row block = b3 + sum of 9 shifted T slices
    NO = BLK * WB  # center lanes; center z-row zr = 1 => T offset WB
    for P in range(4):
        for Q in range(4):
            p = 4 * P + Q
            acc = jnp.broadcast_to(b3[:], (TC, NO)).astype(jnp.float32)
            t = 0
            for dy in (-1, 0, 1):
                sr, psr = (P + dy) // 4, (P + dy) % 4
                for dx in (-1, 0, 1):
                    sc, psc = (Q + dx) // 4, (Q + dx) % 4
                    ps = 4 * psr + psc
                    o = GT + WB + sr * WB + sc
                    acc = acc + t_ref[
                        ps * 9 * TC + t * TC : ps * 9 * TC
                        + (t + 1) * TC,
                        o : o + NO,
                    ]
                    t += 1
            out_ref[0, p * TC : (p + 1) * TC, :] = acc


def _call_tail_kernel(
    x_flat, w2, b2, w1, b1, w9, b3, *, H, W, WB, BLK, nblk, ch, db,
    with_up2, interpret,
):
    B = x_flat.shape[0]
    FLAT1 = (BLK + 2) * WB
    FLAT2 = (BLK + 4) * WB
    FLAT = (BLK + 6) * WB if with_up2 else FLAT2
    cin = 4 * NF if with_up2 else NPH * NF
    GI = _g_in(WB)
    GT = _g_t(WB)
    ch1 = _stage_ch(FLAT1, ch)
    ch2 = _stage_ch(FLAT2, ch)
    chmax = max(ch1, ch2) if with_up2 else ch1
    padf1 = -(-FLAT1 // ch1) * ch1
    padf2 = -(-FLAT2 // ch2) * ch2
    flatd = -(-FLAT // 128) * 128
    padx = max(flatd, padf2 if with_up2 else padf1)
    kernel = functools.partial(
        _tail_kernel, H=H, W=W, WB=WB, BLK=BLK, ch=ch, db=db,
        with_up2=with_up2,
    )
    rep = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec(
        (1, NPH * TC, BLK * WB), lambda b, r: (b, 0, r),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[rep] + [vmem] * 6,
        out_specs=blocked,
        out_shape=jax.ShapeDtypeStruct(
            (B, NPH * TC, nblk * BLK * WB), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((cin, padx + 2 * GI), x_flat.dtype),
            pltpu.VMEM((9 * NF, chmax), x_flat.dtype),
            pltpu.VMEM((9 * NF, chmax) if db else (8, 128), x_flat.dtype),
            pltpu.VMEM((NPH * 9 * TC, FLAT1 + 2 * GT), jnp.float32),
            pltpu.VMEM(
                (NPH * NF, padf2 + 2 * GI) if with_up2 else (8, 128),
                x_flat.dtype,
            ),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_flat, w2, b2, w1, b1, w9, b3)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "WB", "BLK", "nblk", "ch", "db", "interpret"),
)
def hr_last_packed(
    p2_flat: jnp.ndarray,  # [B, 1024, (2 + Hp + >=2)*WB + pad] operand dtype
    w1: jnp.ndarray,  # [64, 576] HRconv, rows cout, cols tap-major x cin
    b1: jnp.ndarray,  # [64, 1] f32
    w9: jnp.ndarray,  # [9*TC, 64] conv_last, rows tap-major x padded cout
    b3: jnp.ndarray,  # [TC, 1] f32 (rows >= OUTC are zero)
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    ch: int = _CH,
    db: bool = True,
    interpret: bool = False,
):
    """Fused packed-phase HRconv+lrelu+conv_last -> [B, NPH*TC, Hp*WB] f32
    (rows = phase-major x TC-padded out-channel; see module docstring)."""
    dummy = jnp.zeros((8, 128), p2_flat.dtype)
    return _call_tail_kernel(
        p2_flat, dummy, dummy, w1, b1, w9, b3, H=H, W=W, WB=WB, BLK=BLK,
        nblk=nblk, ch=ch, db=db, with_up2=False, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "WB", "BLK", "nblk", "ch", "db", "interpret"),
)
def up2_hr_last_packed(
    p1_flat: jnp.ndarray,  # [B, 256, (3 + Hp + >=3)*WB + pad] operand dtype
    w2: jnp.ndarray,  # [4, 64, 256] up2 tap-sum kernels, index 2c+d
    b2: jnp.ndarray,  # [64, 1] f32
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w9: jnp.ndarray,
    b3: jnp.ndarray,
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    ch: int = _CH,
    db: bool = True,
    interpret: bool = False,
):
    """Fused packed-phase up2+HRconv+conv_last from the 4-phase P1 layout:
    P2 is computed in VMEM (never materialized to HBM — 2.5 GB at the
    production chunk in the einsum form) and consumed in place."""
    return _call_tail_kernel(
        p1_flat, w2, b2, w1, b1, w9, b3, H=H, W=W, WB=WB, BLK=BLK,
        nblk=nblk, ch=ch, db=db, with_up2=True, interpret=interpret,
    )


def pack_tail_weights(w_hr, b_hr, w_last, b_last, dtype=jnp.bfloat16):
    """HWIO tail weights -> kernel format (tap-major contraction order
    matching the kernel's cols/T construction). numpy in, numpy out."""
    xp = np if isinstance(w_hr, np.ndarray) else jnp
    w1 = xp.moveaxis(w_hr, -1, 0).reshape(NF, 9 * NF).astype(dtype)
    w9t = xp.moveaxis(w_last, -2, -1)  # [3, 3, cout, cin]
    w9 = (
        xp.pad(w9t, ((0, 0), (0, 0), (0, TC - OUTC), (0, 0)))
        .reshape(9 * TC, NF)
        .astype(dtype)
    )
    b3 = xp.pad(
        xp.asarray(b_last).astype(jnp.float32), ((0, TC - OUTC),)
    ).reshape(TC, 1)
    return (
        w1,
        xp.asarray(b_hr).astype(jnp.float32).reshape(NF, 1),
        w9,
        b3,
    )
