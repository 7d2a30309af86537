"""Pallas TPU kernel: fused residual dense block (RDB) in transposed layout.

Why this exists (measured on v5e, tools/tpu_sweep.py + same-process A/B):
XLA's conv lowering keeps output channels on the MXU's 128-lane axis, so the
RDB's gc=32-channel convs cap at ~25% lane utilization — the full forward
plateaus at ~35 TF/s no matter the NHWC/NCHW dimension numbers. This kernel
computes the whole 5-conv dense block (scatter-weight formulation, see
models.rrdbnet._rdb_scatter) as matmuls in a TRANSPOSED layout:

    W_j [C_out, C_in*9]  @  cols_j [C_in*9, spatial]

with the (large) flattened spatial axis on the lanes and channels x taps on
the contraction axis — lane utilization no longer depends on the model's
channel counts. The im2col ``cols`` never touches HBM: each tap is a lane
slice of the guarded VMEM copy of the input (out-of-tile taps read
guaranteed zeros, matching ncnn's per-conv zero padding of the tile —
reference numerics per src/realsr_preproc.comp + SURVEY.md §2.7), and all
five stages run back to back in VMEM. The only HBM traffic per block is the
input window DMA (with a 5-row halo for the 5-conv receptive field) and the
output write — intermediate activations c1..c4 / partial sums never leave
the chip.

Data layout across the RDB chain: ``[B, nf, (Hp+10)*WB]`` bf16 — channels on
sublanes, flat (row-major, WB lanes per row) spatial on lanes, with data at
rows 5..5+H (zero aprons feed the first/last blocks' halos) and cols 1..W+1
(zero guard columns realize the conv zero padding). The kernel masks every
activation outside the data region back to zero, so the layout is
self-sustaining across the 69 chained RDB calls of the 23-block trunk.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.2
RESIDUAL_SCALE = 0.2

_CH = 1920  # lane-chunk for stage matmuls (15 lane tiles)

# double-buffer the cols scratch (overlaps tap stores with the previous
# chunk's matmul); module-level so experiments can A/B at trace time
COLS_DB = True

# Matmul schedule (trace-time module flag, like COLS_DB):
#   "scatter" — one matmul per INPUT (x, c1..c4), each producing all its
#     later contributions: M = (4gc+nf, 3gc+nf, 2gc+nf, gc+nf, nf),
#     K = (9nf, 9gc x4). With nf=64/gc=32 the M/K padding to the MXU's
#     128-tiles caps FLOP-weighted utilization at ~59-61% (BASELINE.md
#     round-3 profile): 25 padded 128x128 tile-passes for 14.6 useful.
#   "packed" — cross-stage K-packing (VERDICT r3 next #1): defer x's and
#     c1's contributions to c3/c4/c5 and compute them TOGETHER with c2's
#     as ONE rectangle {x,c1,c2} x {c3,c4,c5}: M = 2gc+nf = 128 exactly,
#     K = 9*(nf+2gc) = 1152 = 9x128 exactly — a zero-padding matmul
#     holding 9 of the 23 padded units. Padded passes drop 25 -> 23
#     (+8.7% MXU) at the cost of re-storing x's and c1's taps for the
#     packed rectangle (1.5x tap-store VPU work, which probes show
#     largely hides under the MXU). Accumulation order changes (the
#     packed rectangle sums x/c1/c2 contributions inside one MXU K-axis
#     instead of separate f32 VPU adds) — same-magnitude f32 reassociation
#     as XLA applies freely; exactness tests bound it.
SCHED = "scatter"

# Double-buffer the window DMA across grid steps (trace-time module flag):
# the unchained kernel's input fetch was SYNCHRONOUS per grid step
# (start -> zero guards -> wait), idling the MXU for the full window
# transfer (~7.5 MB f32 per step in mixed mode) at every one of the
# 24 steps x 69 RDB calls of a production chunk. With prefetch, step s
# starts step s+1's copy into the alternate plane of a [2, nf, ...]
# scratch before computing, and waits only on its own plane — the fetch
# rides under the previous step's matmuls. Costs one extra window plane
# of VMEM (~8 MB f32 at the production config).
DMA_PREFETCH = True


def _guard_lanes(wb: int) -> int:
    """Guard lanes each side of the VMEM window: must cover the largest tap
    offset (WB+1), kept 128-lane aligned."""
    return max(256, -(-(wb + 2) // 128) * 128)


def round_wb(w: int) -> int:
    """Lanes per row: W + 2 guard cols, rounded so BLK*WB can tile by 128
    (Mosaic requires output block lane dims divisible by 128; WB mult of 32
    + BLK mult of 4 guarantees it)."""
    return -(-(w + 2) // 32) * 32


# the v5e sweet spot for the per-grid-step working set: FLAT = (BLK+10)*WB
# lanes — the tuned production config (BLK 92 at WB 288) sits here, and
# VMEM scales with it (xg/px/accumulators are all [*, ~FLAT]), so wider
# tiles must shrink BLK to keep the same footprint.
_FLAT_TARGET = 102 * 288


def plan_rows(h: int, target_blk: int = 0, wb: int = 0):
    """(BLK, nblk): row-block size (multiple of 4) and count;
    Hp = BLK*nblk >= h.

    Targets from v5e interleaved min-of-rounds sweeps (ops are noisy
    between processes; only within-process ratios were used): H=148 best at
    BLK 52 (76 regresses, 148 ties), H=212 best at BLK 108 (vs 72/56:
    71/67/63 TF/s), H=276 best at BLK 92 (vs 96/56/120: 78/76/72/63).
    target 108 maps H>=200 onto those winners (212->108, 276->92); smaller
    tiles keep ~52. When ``wb`` (lanes per row) is given, the target is
    additionally capped so FLAT stays at the tuned working-set size
    (_FLAT_TARGET) — this reproduces every tuned winner (288->92,
    224->108∧121, 160->56∧173) AND keeps VMEM bounded for wider tiles
    (e.g. WB 544 -> BLK 44). Explicit ``target_blk`` overrides (tests)."""
    if not target_blk:
        target_blk = 108 if h >= 200 else 56
        if wb:
            flat_blk = max(8, (_FLAT_TARGET // wb - 10) // 4 * 4)
            target_blk = min(target_blk, flat_blk)
    nblk = max(1, -(-h // target_blk))
    blk = -(-(-(-h // nblk)) // 4) * 4
    return blk, nblk


def _lrelu(v):
    return jnp.where(v >= 0, v, v * LRELU_SLOPE)


def _make_rdb_compute(*, H, W, WB, BLK, TOP, nf, gc, ch, db, sched):
    """Factory for the shared 5-conv dense-block compute.

    Returns ``compute(r, xop, xg, cols_ref, cols2_ref, w, b) -> y32``:
    the masked f32 RDB output ``0.2*c5 + x`` over the window's FLAT lanes,
    given the guarded window ``xg`` (state dtype), the matmul-operand view
    ``xop`` (same ref, or a cast copy in mixed/no-cis mode), the two cols
    scratch buffers, and this RDB's packed weights/biases. Shared verbatim
    between the per-RDB kernels (:func:`_rdb_kernel`) and the resident
    trunk (:func:`_rdb_resident_kernel`) so exactness proofs carry over.
    """
    R0 = BLK + 5 + TOP
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    nch = -(-FLAT // ch)
    padf = nch * ch  # chunk grid, 128-aligned; tail lanes compute garbage
    offs = [(dy - 1) * WB + (dx - 1) for dy in range(3) for dx in range(3)]

    def compute(r, xop, xg, cols_ref, cols2_ref, w, b):
        w0, w1, w2, w3, w4 = w
        b1, b2, b3, b4, b5 = b
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, FLAT), 1)
        trow = r * BLK + ids // WB - TOP  # buffer row -> tile row
        col = ids % WB
        valid = (trow >= 0) & (trow < H) & (col >= 1) & (col <= W)

        chunk_no = [0]  # trace-time counter: alternates the cols buffer

        def stage(parts, wj):
            """parts [(tg [cin, padf+2G] guarded, cin), ...] -> [n_out, FLAT]
            f32 via ``wj @ cols``.

            Chunked lane-wise; each tap is a lane slice of the guarded input,
            STORED into a cols scratch (stores normalize the arbitrary lane
            offsets Mosaic cannot concat directly) at its part's row base,
            then one MXU matmul per chunk with (parts x taps x channels) on
            the contraction axis. Multi-part calls realize the packed
            schedule's cross-stage K-axis. With ``db`` the cols buffer
            ALTERNATES per chunk: a single buffer puts a write-after-read
            hazard between chunk k+1's VPU tap stores and chunk k's MXU
            matmul, serializing them — two buffers let Mosaic overlap the
            stores with the previous matmul.
            """
            k = 9 * sum(cin for _, cin in parts)
            outs = []
            for f0 in range(0, padf, ch):
                buf = cols2_ref if (db and chunk_no[0] % 2) else cols_ref
                chunk_no[0] += 1
                base = 0
                for tg, cin in parts:
                    for t, o in enumerate(offs):
                        buf[base + t * cin : base + (t + 1) * cin, :] = tg[
                            0:cin, _G + f0 + o : _G + f0 + o + ch
                        ].astype(buf.dtype)
                    base += 9 * cin
                outs.append(
                    jax.lax.dot_general(
                        wj,
                        buf[:k, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        # bf16 operands: native MXU mode. f32 operands (CPU
                        # interpret tests): force true f32 like models.rrdbnet.
                        # The cols buffer's dtype IS the operand dtype (the tap
                        # stores cast into it).
                        precision=(
                            jax.lax.Precision.HIGHEST
                            if buf.dtype == jnp.float32
                            else jax.lax.Precision.DEFAULT
                        ),
                    )
                )
            full = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
            return full[:, :FLAT]

        def guard(c):
            return jnp.pad(c, ((0, 0), (_G, _G + padf - FLAT)))

        # Early-accumulation schedule: the partial-conv outputs px/p1..p4
        # would otherwise all stay live until c5 (>20MB at production block
        # sizes); instead each stage's contributions are folded immediately
        # into bias-seeded f32 accumulators a2..a5 so only ONE stage output
        # [n,FLAT] is ever live alongside the (shrinking) accumulator set —
        # peak VMEM stays under the scoped limit.
        dt = cols_ref.dtype  # operand dtype (c1..c4 live at it)
        if sched == "packed":
            # K-packed schedule (see SCHED): the five rectangles are
            #   A {x}x{c1,c2}  B {c1}x{c2}  C {x,c1,c2}x{c3,c4,c5}
            #   D {c3}x{c4,c5} E {c4}x{c5}
            # C is the zero-padding M=2gc+nf / K=9(nf+2gc) matmul; x's and
            # c1's taps are stored a second time for it.
            pa = stage([(xop, nf)], w0[:])  # [2gc, FLAT]
            c1 = jnp.where(valid, _lrelu(pa[0:gc] + b1[:]), 0.0).astype(dt)
            a2 = pa[gc:] + b2[:]
            g1 = guard(c1)
            pb = stage([(g1, gc)], w1[:])  # [gc, FLAT]
            c2 = jnp.where(valid, _lrelu(a2 + pb), 0.0).astype(dt)
            pc = stage([(xop, nf), (g1, gc), (guard(c2), gc)], w2[:])
            c3 = jnp.where(valid, _lrelu(pc[0:gc] + b3[:]), 0.0).astype(dt)
            a4 = pc[gc : 2 * gc] + b4[:]
            a5 = pc[2 * gc :] + b5[:]
            pd = stage([(guard(c3), gc)], w3[:])  # [gc+nf, FLAT]
            c4 = jnp.where(valid, _lrelu(a4 + pd[0:gc]), 0.0).astype(dt)
            a5 = a5 + pd[gc:]
            c5 = a5 + stage([(guard(c4), gc)], w4[:])  # [nf, FLAT]
        else:
            px = stage([(xop, nf)], w0[:])  # [4gc+nf, FLAT] f32
            c1 = jnp.where(valid, _lrelu(px[0:gc] + b1[:]), 0.0).astype(dt)
            a2 = px[gc : 2 * gc] + b2[:]
            a3 = px[2 * gc : 3 * gc] + b3[:]
            a4 = px[3 * gc : 4 * gc] + b4[:]
            a5 = px[4 * gc :] + b5[:]
            p1 = stage([(guard(c1), gc)], w1[:])  # [3gc+nf, FLAT]
            c2 = jnp.where(valid, _lrelu(a2 + p1[0:gc]), 0.0).astype(dt)
            a3 = a3 + p1[gc : 2 * gc]
            a4 = a4 + p1[2 * gc : 3 * gc]
            a5 = a5 + p1[3 * gc :]
            p2 = stage([(guard(c2), gc)], w2[:])  # [2gc+nf, FLAT]
            c3 = jnp.where(valid, _lrelu(a3 + p2[0:gc]), 0.0).astype(dt)
            a4 = a4 + p2[gc : 2 * gc]
            a5 = a5 + p2[2 * gc :]
            p3 = stage([(guard(c3), gc)], w3[:])  # [gc+nf, FLAT]
            c4 = jnp.where(valid, _lrelu(a4 + p3[0:gc]), 0.0).astype(dt)
            a5 = a5 + p3[gc:]
            p4 = stage([(guard(c4), gc)], w4[:])  # [nf, FLAT]
            c5 = a5 + p4
        xc = xg[:, _G : _G + FLAT].astype(jnp.float32)
        return jnp.where(valid, RESIDUAL_SCALE * c5 + xc, 0.0)

    return compute


def _rdb_kernel(
    x_hbm,
    w0,
    w1,
    w2,
    w3,
    w4,
    b1,
    b2,
    b3,
    b4,
    b5,
    *rest,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int = 1,
    nf: int,
    gc: int,
    ch: int = _CH,
    db: bool = True,
    chained: bool = False,
    paired: bool = False,
    sched: str = "scatter",
    prefetch: bool = False,
):
    if chained:
        # chained mode (see rdb_apply_chained): the output is the SAME
        # aproned flat buffer shape as the input, written by a manual DMA
        # at the apron offset — no XLA re_apron pad between chained calls.
        (u_hbm, flag, out_ref, xg, xb, cols_ref, cols2_ref, yc, ug,
         sem, sem_u, sem_o) = rest
    elif paired:
        # paired-carry mode (see rdb_apply_paired): the chain state is
        # hi+lo bf16 planes; taps read the hi window, the residual
        # reconstructs hi+lo in f32, and the f32 result re-splits on the
        # way out — two blocked center outputs, no f32 HBM traffic.
        (lo_in, hi_out, lo_out, xg, xb, cols_ref, cols2_ref, sem) = rest
    else:
        (out_ref, xg, xb, cols_ref, cols2_ref, sem) = rest
    # TOP = layout apron rows above tile row 0. Unchained keeps the minimal
    # 5-row halo apron. Chained uses EIGHT: Mosaic requires dynamic HBM
    # slice offsets divisible by the 128-lane tiling, and the chained
    # write/u-fetch offsets are (TOP + r*BLK)*WB — with WB a multiple of
    # 32 and BLK of 4, r*BLK*WB is always aligned but 5*WB is not;
    # 8*WB ≡ 0 (mod 256) restores alignment at the cost of 3 junk rows
    # per window (the window still READS from the aligned r*BLK*WB, so
    # its top 3 rows sit above the halo and are discarded by the masks).
    TOP = 8 if chained else 5
    R0 = BLK + 5 + TOP
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    nch = -(-FLAT // ch)
    padf = nch * ch  # chunk grid, 128-aligned; tail lanes compute garbage
    # DMA sizes must be 128-lane aligned; the over-read beyond FLAT lands in
    # the bottom halo row, which the output never depends on (the input is
    # tail-padded by to_flat/re_apron so the read stays in bounds).
    flatd = -(-FLAT // 128) * 128
    b = pl.program_id(0)
    r = pl.program_id(1)

    if prefetch:
        # Double-buffered window fetch (see DMA_PREFETCH): xg is the
        # [2, nf, padf+2G] scratch, sem a 2-lane DMA semaphore. Step s
        # computes from plane s%2 and starts step s+1's copy into the
        # other plane first, so the fetch overlaps this step's matmuls.
        step = b * nblk + r
        nsteps = pl.num_programs(0) * nblk
        p = jax.lax.rem(step, 2)
        q = jax.lax.rem(step + 1, 2)

        @pl.when(step == 0)
        def _first_fetch():
            # guards/tails are outside every DMA's write range: zero both
            # planes once per kernel invocation (scratch arrives dirty)
            xg[:, :, : _G] = jnp.zeros((2, nf, _G), xg.dtype)
            xg[:, :, _G + flatd :] = jnp.zeros(
                (2, nf, xg.shape[2] - _G - flatd), xg.dtype
            )
            pltpu.make_async_copy(
                x_hbm.at[0, :, pl.ds(0, flatd)],
                xg.at[0, :, pl.ds(_G, flatd)],
                sem.at[0],
            ).start()

        @pl.when(step + 1 < nsteps)
        def _prefetch_next():
            s1 = step + 1
            b2 = jax.lax.div(s1, nblk)
            r2 = jax.lax.rem(s1, nblk)
            pltpu.make_async_copy(
                x_hbm.at[b2, :, pl.ds(r2 * (BLK * WB), flatd)],
                xg.at[q, :, pl.ds(_G, flatd)],
                sem.at[q],
            ).start()

        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(r * (BLK * WB), flatd)],
            xg.at[p, :, pl.ds(_G, flatd)],
            sem.at[p],
        ).wait()
        xg = xg.at[p]  # downstream code sees one window plane
    else:
        # window DMA: flat lanes [r*BLK*WB, +flatd) of the aproned input
        cp = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(r * BLK * WB, flatd)],
            xg.at[:, pl.ds(_G, flatd)],
            sem,
        )
        cp.start()
        xg[:, : _G] = jnp.zeros((nf, _G), xg.dtype)
        xg[:, _G + flatd :] = jnp.zeros(
            (nf, xg.shape[1] - _G - flatd), xg.dtype
        )
        cp.wait()

    if chained:
        # The chained layout's apron rows hold garbage (the manual output
        # DMA writes center rows only). Every intermediate activation is
        # valid-masked to zero, so garbage can only reach a valid output
        # through the RAW input taps, which span one row: tile rows -1 and
        # H. Zero exactly those window rows in every block whose window
        # contains them (windows overlap by 10 rows, so each can appear in
        # more than one block when BLK < 10); all deeper apron garbage
        # feeds activations the masks discard.
        for trow in (-1, H):
            for rr in range(nblk):
                w_z = trow + TOP - rr * BLK
                if 0 <= w_z < R0:

                    @pl.when(r == rr)
                    def _zero_row(w_z=w_z):
                        xg[:, _G + w_z * WB : _G + (w_z + 1) * WB] = jnp.zeros(
                            (nf, WB), xg.dtype
                        )

    if chained:
        # Start the outer-residual u fetch NOW so it overlaps the stage
        # compute below; the wait sits just before `outer` reads ug.
        # Offset written as const + r*const (NOT (TOP + r*BLK)*WB):
        # Mosaic's divisibility prover folds mul-chains but does not
        # distribute a mul over an add, so the factored form is unprovable
        # even though the value is identical; multiple_of records the
        # alignment explicitly.
        c_off = pl.multiple_of(TOP * WB + r * (BLK * WB), 128)
        cp_u = pltpu.make_async_copy(
            u_hbm.at[b, :, pl.ds(c_off, BLK * WB)], ug, sem_u
        )

        @pl.when(flag[0] == 1)
        def _fetch_u_start():
            cp_u.start()

    # Mixed precision (f32 carry / lower-precision matmul operands): the
    # chain state lives in HBM at xg's dtype (f32) so the 69 chained RDB
    # round-trips never round it. Two operand-cast strategies, A/B'd on
    # hardware: a one-time cast copy into xb (when xb is allocated at
    # xg's shape), or cast-in-store — the stage() tap stores convert while
    # writing into the cols scratch (no extra buffer, no extra VPU pass).
    # When xb is the dummy tile the operands come from xg directly; with
    # equal dtypes everything is bit-identical to the single-dtype kernel.
    mixed_copy = xb.shape == xg.shape
    if mixed_copy:
        xb[...] = xg[...].astype(xb.dtype)
    xop = xb if mixed_copy else xg

    compute = _make_rdb_compute(
        H=H, W=W, WB=WB, BLK=BLK, TOP=TOP, nf=nf, gc=gc, ch=ch, db=db,
        sched=sched,
    )
    y32 = compute(
        r, xop, xg, cols_ref, cols2_ref,
        (w0, w1, w2, w3, w4), (b1, b2, b3, b4, b5),
    )
    if paired:
        # f32 residual over the window's hi plane, then add the center's
        # lo plane and re-split: hi' = round(y), lo' = y - hi'. Invalid
        # positions stay zero by induction (y masked to 0; lo is 0 there).
        center = y32[:, TOP * WB : (TOP + BLK) * WB] + lo_in[0].astype(
            jnp.float32
        )
        hi = center.astype(xg.dtype)
        hi_out[0] = hi
        lo_out[0] = (center - hi.astype(jnp.float32)).astype(xg.dtype)
        return
    y = y32.astype(xg.dtype)
    if not chained:
        out_ref[0] = y[:, TOP * WB : (TOP + BLK) * WB]
        return

    # chained: optionally fold the RRDB outer residual 0.2*y3 + u (the
    # x4.param Eltwise coeffs [0.2, 1.0]; cast ordering matches the XLA
    # form in models.rrdbnet.rrdb_body bit-for-bit: y is already rounded
    # to storage above), then DMA the center rows back at the apron
    # offset so the next chained call reads the same layout.
    center = y[:, TOP * WB : (TOP + BLK) * WB]

    @pl.when(flag[0] == 1)
    def _fetch_u_wait():
        cp_u.wait()

    outer = (
        RESIDUAL_SCALE * center.astype(jnp.float32) + ug[...].astype(jnp.float32)
    ).astype(xg.dtype)
    # PIPELINED output write: wait for the PREVIOUS grid step's DMA out of
    # yc only now (just before this store overwrites yc), so each block's
    # write overlaps the next block's fetch+compute — a synchronous wait
    # after start serialized the grid and made the whole chained mode a
    # net loss (A/B r3: 0.971x vs unchained). The wait descriptor only
    # needs the semaphore + byte count; every step's copy is identically
    # shaped.
    cp_o = pltpu.make_async_copy(
        yc, out_ref.at[b, :, pl.ds(c_off, BLK * WB)], sem_o
    )

    @pl.when((b > 0) | (r > 0))
    def _wait_prev_o():
        cp_o.wait()

    yc[...] = jnp.where(flag[0] == 1, outer, center)
    cp_o.start()

    @pl.when((b == pl.num_programs(0) - 1) & (r == nblk - 1))
    def _final_drain():
        cp_o.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "WB", "BLK", "nblk", "nf", "gc", "ch", "db", "op_dtype",
        "cis", "sched", "prefetch", "interpret",
    ),
)
def rdb_apply(
    x_flat: jnp.ndarray,  # [B, nf, (Hp+10)*WB] bf16|f32, aproned
    kp: Dict[str, jnp.ndarray],  # kernel params (see pack_rdb_params)
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    nf: int,
    gc: int,
    ch: int = _CH,
    db: bool = True,
    op_dtype=None,
    cis: bool = True,
    sched: str = None,
    prefetch: bool = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused RDB on the flat transposed layout -> [B, nf, Hp*WB].

    ``op_dtype``: matmul operand dtype. Default = x's dtype (single-dtype
    mode, bit-identical to the historical kernel). With x f32 and
    ``op_dtype=bfloat16`` the kernel runs MIXED: the chain state stays f32
    in HBM (no accumulated storage rounding across the 69 chained RDBs of
    the 23-block trunk — the fix for the bf16-fast/f16-accurate numerics
    fork), while the MXU matmuls read a one-time bf16 cast (native mode).
    The reference's analog is fp16-storage/fp32-arithmetic at full speed
    (src/realsr.cpp:43-47); this mode rounds strictly less than that.

    ``cis`` (cast-in-store, mixed mode only): True = the stage tap stores
    cast f32->op while writing the cols scratch (no operand-copy buffer);
    False = a one-time cast pass into a dedicated operand copy. A/B knob.
    """
    B = x_flat.shape[0]
    R0 = BLK + 10
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    padf = -(-FLAT // ch) * ch
    op = jnp.dtype(op_dtype) if op_dtype is not None else x_flat.dtype
    mixed = op != x_flat.dtype and not cis  # xb copy only without cast-in-store
    sched = sched if sched is not None else SCHED
    prefetch = prefetch if prefetch is not None else DMA_PREFETCH
    # cols rows = the largest rectangle's K: the packed schedule's
    # {x,c1,c2} rectangle spans 9*(nf+2gc) taps-x-channels
    kcols = 9 * (nf + 2 * gc) if sched == "packed" else 9 * nf
    kernel = functools.partial(
        _rdb_kernel, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
        ch=ch, db=db, sched=sched, prefetch=prefetch,
    )
    rep = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[rep] + [vmem] * 10,
        # each grid step writes its BLK rows straight into the flat layout
        out_specs=pl.BlockSpec(
            (1, nf, BLK * WB), lambda b, r: (b, 0, r), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, nf, nblk * BLK * WB), x_flat.dtype),
        scratch_shapes=[
            # two window planes + a 2-lane semaphore when prefetching
            pltpu.VMEM(
                ((2, nf, padf + 2 * _G) if prefetch else (nf, padf + 2 * _G)),
                x_flat.dtype,
            ),
            # operand copy (mixed mode only; the dummy tile keeps the
            # kernel signature stable — the kernel detects it by shape)
            pltpu.VMEM((nf, padf + 2 * _G) if mixed else (8, 128), op),
            pltpu.VMEM((kcols, ch), op),
            # second cols buffer only when double-buffering; a minimal
            # tile keeps the kernel signature stable for db=False A/Bs
            # without carrying the ~2MB footprint being measured against
            pltpu.VMEM((kcols, ch) if db else (8, 128), op),
            pltpu.SemaphoreType.DMA((2,)) if prefetch else pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # the second window plane (prefetch) sits on top of the ~97M
            # peak; v5e has 128M physical (BASELINE.md chained-mode note)
            vmem_limit_bytes=(112 if prefetch else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x_flat,
        kp["w0"], kp["w1"], kp["w2"], kp["w3"], kp["w4"],
        kp["b1"], kp["b2"], kp["b3"], kp["b4"], kp["b5"],
    )
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "WB", "BLK", "nblk", "nf", "gc", "ch", "db", "interpret",
    ),
)
def rdb_apply_paired(
    hi_flat: jnp.ndarray,  # [B, nf, (Hp+10)*WB + 128] bf16, aproned (hi)
    lo_center: jnp.ndarray,  # [B, nf, Hp*WB] bf16 (lo, center rows only)
    kp: Dict[str, jnp.ndarray],
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    nf: int,
    gc: int,
    ch: int = _CH,
    db: bool = True,
    interpret: bool = False,
):
    """One fused RDB with a PAIRED bf16 carry -> (hi_center, lo_center).

    The chain state is ``x ≈ hi + lo`` with both planes bf16: ``hi`` is the
    bf16 rounding of the f32 state (so the MXU taps read exactly the same
    operand values as the mixed f32-carry mode), and ``lo`` carries the
    rounding remainder, extending the carried mantissa to ~16 bits — less
    rounding per RDB round-trip than the reference's fp16 storage
    (src/realsr.cpp:43-47) at HALF the mixed mode's window-DMA bytes (the
    f32 window read is the dominant term of mixed's measured 16% trunk
    cost, BASELINE.md round-3). The residual reconstructs ``hi + lo`` in
    f32 in-kernel and re-splits the f32 result on the way out; only the
    halo rows' residuals (recomputed by the next block anyway) see the
    hi-only window value. ``lo`` rides the blocked Pallas pipeline (one
    BLK-row block per grid step), so no manual DMA is involved — the
    machinery that made the chained mode a net loss.
    """
    B = hi_flat.shape[0]
    R0 = BLK + 10
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    padf = -(-FLAT // ch) * ch
    kernel = functools.partial(
        _rdb_kernel, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
        ch=ch, db=db, paired=True,
    )
    rep = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec(
        (1, nf, BLK * WB), lambda b, r: (b, 0, r), memory_space=pltpu.VMEM
    )
    out_sh = jax.ShapeDtypeStruct((B, nf, nblk * BLK * WB), hi_flat.dtype)
    hi_c, lo_c = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[rep] + [vmem] * 10 + [blocked],
        out_specs=[blocked, blocked],
        out_shape=[out_sh, out_sh],
        scratch_shapes=[
            pltpu.VMEM((nf, padf + 2 * _G), hi_flat.dtype),
            pltpu.VMEM((8, 128), hi_flat.dtype),  # xb dummy (single dtype)
            pltpu.VMEM((9 * nf, ch), hi_flat.dtype),
            pltpu.VMEM((9 * nf, ch) if db else (8, 128), hi_flat.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        hi_flat,
        kp["w0"], kp["w1"], kp["w2"], kp["w3"], kp["w4"],
        kp["b1"], kp["b2"], kp["b3"], kp["b4"], kp["b5"],
        lo_center,
    )
    return hi_c, lo_c


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "WB", "BLK", "nblk", "nf", "gc", "ch", "db", "op_dtype",
        "cis", "interpret",
    ),
)
def rdb_apply_chained(
    x_flat: jnp.ndarray,  # [B, nf, (Hp+13)*WB + 128], chained flat layout
    kp: Dict[str, jnp.ndarray],
    u_flat: jnp.ndarray,  # same shape: RRDB entry state (outer residual)
    flag: jnp.ndarray,  # i32 [1]: 1 = fold the outer residual this call
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    nf: int,
    gc: int,
    ch: int = _CH,
    db: bool = True,
    op_dtype=None,
    cis: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused RDB, resident-apron chained mode -> SAME aproned shape.

    :func:`rdb_apply` emits center rows only, so chained callers must
    ``re_apron`` between calls — a full-buffer XLA pad copy per RDB that
    costs ~11% of the trunk's HBM traffic in mixed (f32-carry) mode. The
    chained form instead reads AND writes the persistent TOP=8 layout
    ``[B, nf, (Hp+13)*WB + 128]`` (``to_flat(..., top=8)``; 8 apron rows
    above tile row 0 keep every dynamic HBM slice offset 128-lane aligned,
    see the TOP note in ``_rdb_kernel``): the kernel DMAs its center rows
    back at the apron offset and tolerates garbage aprons (only tile rows
    -1 and H can reach a valid output, via the raw-input taps; those are
    zeroed in-kernel). ``flag`` folds the RRDB outer residual ``0.2*y + u``
    (x4.param Eltwise coeffs) into the call, so the whole 69-RDB trunk
    runs with ZERO XLA ops between kernel calls. The center output is
    bit-identical to the rdb_apply + re_apron (+ XLA residual)
    composition; apron contents are unspecified.
    """
    B = x_flat.shape[0]
    R0 = BLK + 13
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    padf = -(-FLAT // ch) * ch
    op = jnp.dtype(op_dtype) if op_dtype is not None else x_flat.dtype
    mixed = op != x_flat.dtype and not cis
    kernel = functools.partial(
        _rdb_kernel, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
        ch=ch, db=db, chained=True,
    )
    rep = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, nblk),
        in_specs=[rep] + [vmem] * 10 + [rep, smem],
        out_specs=rep,
        out_shape=jax.ShapeDtypeStruct(x_flat.shape, x_flat.dtype),
        scratch_shapes=[
            pltpu.VMEM((nf, padf + 2 * _G), x_flat.dtype),
            pltpu.VMEM((nf, padf + 2 * _G) if mixed else (8, 128), op),
            pltpu.VMEM((9 * nf, ch), op),
            pltpu.VMEM((9 * nf, ch) if db else (8, 128), op),
            pltpu.VMEM((nf, BLK * WB), x_flat.dtype),  # yc: center out stage
            pltpu.VMEM((nf, BLK * WB), x_flat.dtype),  # ug: outer-residual u
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # the two chained-only staging buffers (yc + ug, nf*BLK*WB f32
            # each) sit on top of the unchained kernel's ~97M peak; v5e has
            # 128M physical VMEM (measured 104.3M demand at BLK=92/WB=288)
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x_flat,
        kp["w0"], kp["w1"], kp["w2"], kp["w3"], kp["w4"],
        kp["b1"], kp["b2"], kp["b3"], kp["b4"], kp["b5"],
        u_flat, flag,
    )
    return out


def _rdb_resident_kernel(
    x_hbm,
    w0,
    w1,
    w2,
    w3,
    w4,
    b1,
    b2,
    b3,
    b4,
    b5,
    out_ref,
    planes,
    xg,
    xb,
    cols_ref,
    cols2_ref,
    yc,
    ug,
    sem,
    sem_c,
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    nf: int,
    gc: int,
    ch: int,
    db: bool,
    n_rdb: int,
):
    """Whole-trunk resident kernel body: see :func:`rdb_apply_resident`.

    Grid ``(B, n_rdb, nblk)`` (sequential, r fastest). The chain state
    lives in the 3-plane VMEM rotation ``planes``: step k reads plane
    ``k%3`` (k=0 reads ``x_hbm``) and writes plane ``(k+1)%3``. Plane 0 is
    the **u plane**: it always holds the current RRDB's entry state (x's
    center is copied there at k==0; each RRDB-closing step k≡2 (mod 3)
    writes the outer residual ``0.2*y + u`` back to it, which is exactly
    what RDB 1 of the next RRDB reads at k≡0). Plane aprons are zeroed
    once and never written (center-row DMAs only), so — unlike the
    chained-mode HBM layout — no garbage-row zeroing is needed. All
    intra-step copies are synchronous VMEM↔VMEM (microseconds against a
    ~ms compute step); the weight/bias fetches are pipelined by Pallas
    via their blocked specs.
    """
    TOP = 8  # write offsets (TOP + r*BLK)*WB must be 128-lane aligned
    R0 = BLK + 5 + TOP
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    flatd = -(-FLAT // 128) * 128
    b = pl.program_id(0)
    k = pl.program_id(1)
    r = pl.program_id(2)
    ph = jax.lax.rem(k, 3)
    p_out = jax.lax.rem(k + 1, 3)

    @pl.when((b == 0) & (k == 0) & (r == 0))
    def _zero_planes():
        # aprons/guards must read zero; centers are overwritten per step
        for j in range(3):
            planes[j, :, :] = jnp.zeros(planes.shape[1:], planes.dtype)

    # window fetch: lanes [r*BLK*WB, +flatd) of the TOP=8 aproned layout,
    # from HBM at k==0 and from the input plane afterwards. The over-read
    # beyond FLAT stays inside the plane's +128 tail pad.
    src_off = pl.multiple_of(r * (BLK * WB), 128)
    cp_x = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(src_off, flatd)],
        xg.at[:, pl.ds(_G, flatd)],
        sem,
    )
    cp_p = pltpu.make_async_copy(
        planes.at[ph, :, pl.ds(src_off, flatd)],
        xg.at[:, pl.ds(_G, flatd)],
        sem,
    )

    @pl.when(k == 0)
    def _fetch_hbm():
        cp_x.start()

    @pl.when(k > 0)
    def _fetch_plane():
        cp_p.start()

    xg[:, :_G] = jnp.zeros((nf, _G), xg.dtype)
    xg[:, _G + flatd :] = jnp.zeros((nf, xg.shape[1] - _G - flatd), xg.dtype)
    cp_x.wait()  # wait needs only sem + bytes; cp_p copies the same count

    c_off = pl.multiple_of(TOP * WB + r * (BLK * WB), 128)

    @pl.when(k == 0)
    def _u_fill():
        # plane 0 ← x's center rows (the first RRDB's entry state). The
        # window source offset _G + TOP*WB is 128-aligned (_G mult of 128,
        # 8*WB mult of 256 for WB mult of 32).
        cp = pltpu.make_async_copy(
            xg.at[:, pl.ds(_G + TOP * WB, BLK * WB)],
            planes.at[0, :, pl.ds(c_off, BLK * WB)],
            sem_c,
        )
        cp.start()
        cp.wait()

    # mixed precision: same two operand-cast strategies as _rdb_kernel
    mixed_copy = xb.shape == xg.shape
    if mixed_copy:
        xb[...] = xg[...].astype(xb.dtype)
    xop = xb if mixed_copy else xg

    compute = _make_rdb_compute(
        H=H, W=W, WB=WB, BLK=BLK, TOP=TOP, nf=nf, gc=gc, ch=ch, db=db,
        sched="scatter",
    )
    y32 = compute(
        r, xop, xg, cols_ref, cols2_ref,
        (w0, w1, w2, w3, w4),
        (b1, b2, b3, b4, b5),
    )
    # round to the state dtype BEFORE the outer residual — bit-identical
    # to the unchained composition (rdb_apply emits y32.astype(state);
    # the XLA residual then re-reads it as f32).
    center = y32[:, TOP * WB : (TOP + BLK) * WB].astype(xg.dtype)

    @pl.when(ph == 2)
    def _outer():
        # u ← plane 0's center block r, then fold the RRDB Eltwise
        # 0.2*y + u (x4.param coeffs [0.2, 1.0], realsr.cpp's graph).
        cp_u = pltpu.make_async_copy(
            planes.at[0, :, pl.ds(c_off, BLK * WB)], ug, sem_c
        )
        cp_u.start()
        cp_u.wait()
        yc[...] = (
            RESIDUAL_SCALE * center.astype(jnp.float32)
            + ug[...].astype(jnp.float32)
        ).astype(xg.dtype)

    @pl.when(ph != 2)
    def _plain():
        yc[...] = center

    # write the step's center rows to the rotation plane (p_out is plane 0
    # exactly at RRDB-closing steps, updating the u plane in place)
    cp_o = pltpu.make_async_copy(
        yc, planes.at[p_out, :, pl.ds(c_off, BLK * WB)], sem_c
    )
    cp_o.start()
    cp_o.wait()

    @pl.when(k == n_rdb - 1)
    def _emit():
        cp = pltpu.make_async_copy(
            yc, out_ref.at[b, :, pl.ds(src_off, BLK * WB)], sem_c
        )
        cp.start()
        cp.wait()


def _resident_vmem_bytes(blk, nblk, wb, nf, gc, ch, sb, ob):
    """Trace-free estimate of the resident kernel's VMEM demand (bytes).

    planes (3 state planes) + window + stage peak (px live with the
    bias-seeded accumulators) + guarded c's + cols double buffer +
    yc/ug staging + double-buffered weight blocks. Mirrors the measured
    composition of the unchained kernel's ~97MB peak at BLK=92."""
    hp = blk * nblk
    plane = (hp + 13) * wb + 128
    flat = (blk + 13) * wb
    padf = -(-flat // ch) * ch
    g = _guard_lanes(wb)
    planes = 3 * nf * plane * sb
    window = nf * (padf + 2 * g) * sb
    stage = (7 * gc + 2 * nf) * flat * 4
    guards = 2 * gc * (padf + 2 * g) * ob
    cols = 2 * 9 * nf * ch * ob
    ycug = 2 * nf * blk * wb * sb
    wsum = 9 * gc * (4 * nf + 6 * gc) + 9 * nf * (nf + 4 * gc)
    return planes + window + stage + guards + cols + ycug + 2 * wsum * ob


# VMEM budget for the resident plan: under v5e's 128MiB physical with
# headroom for Mosaic's own staging (the chained kernel measured ~7MB
# above the analytic sum at BLK=92).
_RESIDENT_BUDGET = 118 * 1024 * 1024


def plan_rows_resident(h, wb, nf=64, gc=32, ch=_CH, state_bytes=4, op_bytes=2):
    """(BLK, nblk) for :func:`rdb_apply_resident`, or (0, 0) if no block
    size fits the VMEM budget.

    The resident kernel adds the 3 state planes (~65MB f32 at the
    production tile) on top of the per-window working set, so its BLK must
    be smaller than :func:`plan_rows`' sweet spot; pick the LARGEST
    multiple of 4 that fits (larger BLK = less per-window halo recompute,
    the resident mode's main cost: (BLK+13)/BLK of the MXU work)."""
    base, _ = plan_rows(h, wb=wb)
    for target in range(base, 7, -4):
        blk, nblk = plan_rows(h, target_blk=target, wb=wb)
        if blk > target:  # ceil rounding grew it back; skip duplicates
            continue
        if (
            _resident_vmem_bytes(blk, nblk, wb, nf, gc, ch, state_bytes, op_bytes)
            <= _RESIDENT_BUDGET
        ):
            return blk, nblk
    return 0, 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "WB", "BLK", "nblk", "nf", "gc", "n_rdb", "ch", "db",
        "op_dtype", "interpret",
    ),
)
def rdb_apply_resident(
    x_flat: jnp.ndarray,  # [B, nf, (Hp+13)*WB + 128] (top=8 layout)
    kp: Dict[str, jnp.ndarray],  # pack_rdb_params, stacked leading [n_rdb]
    *,
    H: int,
    W: int,
    WB: int,
    BLK: int,
    nblk: int,
    nf: int,
    gc: int,
    n_rdb: int,
    ch: int = _CH,
    db: bool = True,
    op_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """The ENTIRE n_rdb-RDB trunk (outer residuals included) in ONE pallas
    call, with the chain state resident in VMEM -> center [B, nf, Hp*WB].

    The per-RDB modes (:func:`rdb_apply` et al.) round-trip the chain
    state through HBM 2x per RDB — in the mixed f32-carry default that
    traffic (plus the per-RDB ``re_apron`` pad copy) is the measured ~16%
    trunk cost vs all-bf16 (BASELINE.md round-3/4 decomposition). Here the
    state never leaves the chip: three [nf, plane] VMEM planes rotate
    through the chain (plane 0 pinned to the RRDB entry state for the
    outer residual — reference graph: the Eltwise [0.2, 1.0] after each
    3-RDB block, SURVEY.md §2.8), HBM sees only the input read (k==0),
    the per-RDB weight blocks (~0.5MB each, pipelined by Pallas), and the
    final output write. The cost: the planes' VMEM footprint forces a
    smaller BLK than the per-RDB kernels' sweet spot, i.e. more halo
    recompute ((BLK+13)/BLK of MXU work) — :func:`plan_rows_resident`
    picks the largest fitting BLK, and the hardware A/B
    (tools/resident_ab.py) decides the default.

    Numerics: bit-identical to the unchained ``rdb_apply`` + ``re_apron``
    + XLA-residual composition at equal (BLK, nblk) — same shared compute
    (:func:`_make_rdb_compute`), same rounding points. Requires
    ``num_rdb_per_rrdb == 3`` (the plane rotation's period).

    ``n_rdb`` must be a multiple of 3; ``kp`` leaves pack_rdb_params with
    its per-RRDB/per-RDB lead dims reshaped to one [n_rdb] axis.
    """
    B = x_flat.shape[0]
    # the outer residual folds at every k ≡ 2 (mod 3); callers wanting
    # RRDB semantics must pass n_rdb % 3 == 0 (the model wrapper gates on
    # num_rdb_per_rrdb == 3). Other n_rdb values run a plain RDB chain
    # with outers at each third step — used by single-RDB exactness tests.
    R0 = BLK + 13
    FLAT = R0 * WB
    _G = _guard_lanes(WB)
    padf = -(-FLAT // ch) * ch
    op = jnp.dtype(op_dtype) if op_dtype is not None else x_flat.dtype
    kernel = functools.partial(
        _rdb_resident_kernel, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf,
        gc=gc, ch=ch, db=db, n_rdb=n_rdb,
    )
    rep = pl.BlockSpec(memory_space=pl.ANY)

    def blocked(a):
        # None squeezes the stacked axis: the kernel sees a plain [M, K]
        # (or [n, 1]) VMEM ref, exactly like the per-RDB kernels' weight
        # refs (Mosaic rejects memref_slice on lane dims that aren't
        # 128-aligned, so an .at[0] view of a (1, M, K) block would not
        # compile for K = 9*nf = 576).
        m, kk = a.shape[1:]
        return pl.BlockSpec((None, m, kk), lambda b, k, r: (k, 0, 0))

    plane = x_flat.shape[2]
    out = pl.pallas_call(
        kernel,
        grid=(B, n_rdb, nblk),
        in_specs=[rep] + [blocked(kp[n]) for n in
                          ("w0", "w1", "w2", "w3", "w4",
                           "b1", "b2", "b3", "b4", "b5")],
        out_specs=rep,
        out_shape=jax.ShapeDtypeStruct(
            (B, nf, nblk * BLK * WB), x_flat.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((3, nf, plane), x_flat.dtype),  # state planes
            pltpu.VMEM((nf, padf + 2 * _G), x_flat.dtype),  # window
            pltpu.VMEM((8, 128), op),  # xb dummy (cast-in-store only)
            pltpu.VMEM((9 * nf, ch), op),
            pltpu.VMEM((9 * nf, ch) if db else (8, 128), op),
            pltpu.VMEM((nf, BLK * WB), x_flat.dtype),  # yc: center staging
            pltpu.VMEM((nf, BLK * WB), x_flat.dtype),  # ug: u staging
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # planes (~65MB f32 at the production tile) + the per-window
            # working set; plan_rows_resident budgets 118M analytic, the
            # limit leaves Mosaic a margin under v5e's 128M physical
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x_flat,
        kp["w0"], kp["w1"], kp["w2"], kp["w3"], kp["w4"],
        kp["b1"], kp["b2"], kp["b3"], kp["b4"], kp["b5"],
    )
    return out


def pack_rdb_params(scatter_rdb: Dict[str, Any], dtype=jnp.bfloat16, sched=None):
    """Scatter-layout stacked RDB params -> kernel format.

    sw_s [..., 3, 3, cin, n_out] (HWIO) -> w_s [..., n_out, 9*cin] with the
    contraction index ordered (tap row-major) x cin, matching the kernel's
    ``cols`` construction. Biases -> [..., n, 1] f32.

    ``sched="packed"`` re-cuts the five scatter matrices into the K-packed
    schedule's rectangles (see SCHED): w0 [2gc, 9nf] = {x}x{c1,c2},
    w1 [gc, 9gc] = {c1}x{c2}, w2 [2gc+nf, 9(nf+2gc)] = {x,c1,c2}x{c3,c4,c5}
    (K order x-taps ++ c1-taps ++ c2-taps, matching stage()'s multi-part
    cols), w3/w4 unchanged. Pure slicing/concat — the weight VALUES are
    identical.

    Stays in numpy for numpy inputs (load-time packing must not round-trip
    the weights through a device); bf16 casts use ml_dtypes via jnp dtypes,
    which numpy handles natively.
    """
    xp = np if isinstance(scatter_rdb["sw0"], np.ndarray) else jnp
    out = {}
    for s in range(5):
        w = scatter_rdb[f"sw{s}"]
        *lead, kh, kw, cin, n = w.shape
        w = xp.moveaxis(w, -1, len(lead))  # [..., n, 3, 3, cin]
        out[f"w{s}"] = w.reshape(*lead, n, kh * kw * cin).astype(dtype)
    for i in range(1, 6):
        b = scatter_rdb[f"b{i}"].astype(jnp.float32)
        out[f"b{i}"] = b[..., None]
    sched = sched if sched is not None else SCHED
    if sched == "packed":
        nf = out["w4"].shape[-2]  # c5 width
        gc = out["w3"].shape[-2] - nf  # [gc+nf, ...]
        w0, w1, w2 = out["w0"], out["w1"], out["w2"]
        out["w0"] = w0[..., : 2 * gc, :]
        out["w1"] = w1[..., :gc, :]
        out["w2"] = xp.concatenate(
            [w0[..., 2 * gc :, :], w1[..., gc:, :], w2], axis=-1
        )
    return out


# ---- layout transforms (XLA side) -----------------------------------------


def to_flat(x_nhwc: jnp.ndarray, WB: int, Hp: int, top: int = 5) -> jnp.ndarray:
    """[B, H, W, C] -> aproned flat [B, C, (Hp+top+5)*WB + 128] (data rows
    top..top+H, cols 1..W+1; zeros elsewhere). ``top=5`` is rdb_apply's
    minimal-halo layout; ``top=8`` is the chained layout (alignment, see
    rdb_apply_chained)."""
    B, H, W, C = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))  # [B, C, H, W]
    x = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (1, WB - W - 1)))
    x = x.reshape(B, C, Hp * WB)
    return jnp.pad(x, ((0, 0), (0, 0), (top * WB, 5 * WB + 128)))


def re_apron(x_flat: jnp.ndarray, WB: int) -> jnp.ndarray:
    """[B, C, Hp*WB] -> aproned + tail-padded input for rdb_apply."""
    return jnp.pad(x_flat, ((0, 0), (0, 0), (5 * WB, 5 * WB + 128)))


def from_flat(x_flat: jnp.ndarray, H: int, W: int, WB: int) -> jnp.ndarray:
    """[B, C, Hp*WB] (no apron) -> [B, H, W, C]."""
    B, C, _ = x_flat.shape
    Hp = x_flat.shape[2] // WB
    x = x_flat.reshape(B, C, Hp, WB)[:, :, :H, 1 : W + 1]
    return jnp.transpose(x, (0, 2, 3, 1))

