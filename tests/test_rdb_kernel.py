"""Fused Pallas RDB kernel: exactness vs the XLA scatter oracle.

Runs in Pallas interpret mode on the CPU backend (tiny shapes — interpret
mode simulates every VMEM op). On-TPU the same kernel measured exact vs the
f32 dense path and 2.7x the XLA conv throughput (ops/rdb_kernel.py header).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from realsr_tpu.models import rrdbnet as R
from realsr_tpu.ops import rdb_kernel as K


def _mk_params(nf, gc, seed=0, wstd=0.15):
    rng = np.random.default_rng(seed)
    cins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    couts = [gc] * 4 + [nf]
    p = {}
    for i, (ci, co) in enumerate(zip(cins, couts), 1):
        p[f"w{i}"] = rng.normal(0, wstd, (3, 3, ci, co)).astype(np.float32)
        p[f"b{i}"] = rng.normal(0, 0.05, (co,)).astype(np.float32)
    return p


@pytest.mark.parametrize("hw", [(10, 13), (8, 8), (12, 5)])
def test_kernel_matches_scatter_oracle(hw):
    H, W = hw
    nf, gc = 16, 8
    p = _mk_params(nf, gc)
    sp = R.repack_scatter({"rdb": p})["rdb"]
    x = np.random.default_rng(1).random((2, H, W, nf)).astype(np.float32)
    ref = R._rdb_scatter(jnp.asarray(x), sp, jnp.float32)

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=4)
    kp = K.pack_rdb_params(sp, dtype=jnp.float32)
    xf = K.to_flat(jnp.asarray(x), WB, BLK * nblk)
    yf = K.rdb_apply(
        xf, kp, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc, interpret=True
    )
    y = K.from_flat(yf, H, W, WB)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y), atol=2e-5)


@pytest.mark.parametrize("hw", [(10, 13), (8, 8)])
def test_packed_schedule_matches_scatter(hw):
    """sched='packed' (cross-stage K-packing, VERDICT r3 next #1) vs the
    scatter oracle: same products, reassociated f32 sums — the {x,c1,c2}
    rectangle accumulates three inputs' contributions inside one MXU
    K-axis instead of separate VPU adds, so equality is to a few f32 ulps,
    not bitwise."""
    H, W = hw
    nf, gc = 16, 8
    p = _mk_params(nf, gc)
    sp = R.repack_scatter({"rdb": p})["rdb"]
    x = np.random.default_rng(1).random((2, H, W, nf)).astype(np.float32)
    ref = R._rdb_scatter(jnp.asarray(x), sp, jnp.float32)

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=4)
    kp = K.pack_rdb_params(sp, dtype=jnp.float32, sched="packed")
    # packed rectangles: A [2gc,9nf] B [gc,9gc] C [2gc+nf,9(nf+2gc)]
    assert kp["w0"].shape == (2 * gc, 9 * nf)
    assert kp["w1"].shape == (gc, 9 * gc)
    assert kp["w2"].shape == (2 * gc + nf, 9 * (nf + 2 * gc))
    xf = K.to_flat(jnp.asarray(x), WB, BLK * nblk)
    yf = K.rdb_apply(
        xf, kp, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
        sched="packed", interpret=True,
    )
    y = K.from_flat(yf, H, W, WB)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y), atol=2e-5)


def test_packed_schedule_chain_and_mixed():
    """Two chained packed RDBs in MIXED mode (f32 carry / bf16 operands)
    track the mixed scatter kernel closely (operand rounding identical —
    the packed weights are the same values re-cut — so only sum
    reassociation differs)."""
    H, W = 9, 11
    nf, gc = 16, 8
    p = _mk_params(nf, gc, seed=3)
    sp = R.repack_scatter({"rdb": p})["rdb"]
    x = np.random.default_rng(4).random((1, H, W, nf)).astype(np.float32)

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=5)
    kw = dict(
        H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
        op_dtype=jnp.bfloat16, interpret=True,
    )
    outs = {}
    for sched in ("scatter", "packed"):
        kp = K.pack_rdb_params(sp, dtype=jnp.bfloat16, sched=sched)
        yf = K.rdb_apply(K.to_flat(jnp.asarray(x), WB, BLK * nblk), kp,
                         sched=sched, **kw)
        yf = K.rdb_apply(K.re_apron(yf, WB), kp, sched=sched, **kw)
        outs[sched] = np.asarray(K.from_flat(yf, H, W, WB))
    np.testing.assert_allclose(outs["scatter"], outs["packed"], atol=1e-4)


def test_kernel_chain_via_re_apron():
    """Two chained fused RDBs == two chained oracle RDBs (layout is
    self-sustaining: masks re-zero the pad regions every call)."""
    H, W = 9, 11
    nf, gc = 16, 8
    p = _mk_params(nf, gc, seed=3)
    sp = R.repack_scatter({"rdb": p})["rdb"]
    x = np.random.default_rng(4).random((1, H, W, nf)).astype(np.float32)
    ref = R._rdb_scatter(
        R._rdb_scatter(jnp.asarray(x), sp, jnp.float32), sp, jnp.float32
    )

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=5)
    kp = K.pack_rdb_params(sp, dtype=jnp.float32)
    kw = dict(H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc, interpret=True)
    yf = K.rdb_apply(K.to_flat(jnp.asarray(x), WB, BLK * nblk), kp, **kw)
    yf = K.rdb_apply(K.re_apron(yf, WB), kp, **kw)
    y = K.from_flat(yf, H, W, WB)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(y), atol=2e-5)


@pytest.mark.parametrize("hw_tb", [(10, 13, 4), (8, 8, 8), (9, 11, 3)])
def test_chained_mode_matches_rrdb_oracle(hw_tb):
    """Resident-apron chained mode (rdb_apply_chained): two full RRDBs —
    six chained calls with the outer residual folded into each third call
    — must match the XLA scatter oracle. Exercises the garbage-apron
    zeroing (tile rows -1 / H appear in multiple overlapping windows when
    BLK < 10) and the fused ``0.2*y + u`` Eltwise (x4.param coeffs)."""
    H, W, tb = hw_tb
    nf, gc = 16, 8
    p = _mk_params(nf, gc)
    sp = R.repack_scatter({"rdb": p})["rdb"]
    x = np.random.default_rng(1).random((2, H, W, nf)).astype(np.float32)

    t = jnp.asarray(x)
    for _ in range(2):
        u = t
        for _ in range(3):
            t = R._rdb_scatter(t, sp, jnp.float32)
        t = (0.2 * t.astype(jnp.float32) + u.astype(jnp.float32)).astype(
            jnp.float32
        )
    ref = np.asarray(t)

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=tb)
    kp = K.pack_rdb_params(sp, dtype=jnp.float32)
    tf = K.to_flat(jnp.asarray(x), WB, BLK * nblk, top=8)
    kw = dict(
        H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc, interpret=True
    )
    f0 = jnp.zeros((1,), jnp.int32)
    f1 = jnp.ones((1,), jnp.int32)
    for _ in range(2):
        u = tf
        tf = K.rdb_apply_chained(tf, kp, u, f0, **kw)
        tf = K.rdb_apply_chained(tf, kp, u, f0, **kw)
        tf = K.rdb_apply_chained(tf, kp, u, f1, **kw)
    y = np.asarray(
        K.from_flat(tf[:, :, 8 * WB : (8 + BLK * nblk) * WB], H, W, WB)
    )
    np.testing.assert_allclose(ref, y, atol=5e-5)


@pytest.mark.parametrize("hw_tb", [(10, 13, 4), (9, 11, 3), (8, 8, 12)])
def test_resident_trunk_matches_rrdb_oracle(hw_tb):
    """Whole-trunk resident kernel (rdb_apply_resident): two full RRDBs
    with DISTINCT per-RDB weights (exercises the blocked weight streaming)
    in ONE pallas call must match the XLA scatter oracle. Covers the
    3-plane rotation, the k==0 u-plane fill, and the in-kernel outer
    residual (x4.param Eltwise [0.2, 1.0])."""
    H, W, tb = hw_tb
    nf, gc = 16, 8
    sps = [
        R.repack_scatter({"rdb": _mk_params(nf, gc, seed=s)})["rdb"]
        for s in range(6)
    ]
    x = np.random.default_rng(1).random((2, H, W, nf)).astype(np.float32)

    t = jnp.asarray(x)
    for g in range(2):
        u = t
        for j in range(3):
            t = R._rdb_scatter(t, sps[3 * g + j], jnp.float32)
        t = (0.2 * t.astype(jnp.float32) + u.astype(jnp.float32)).astype(
            jnp.float32
        )
    ref = np.asarray(t)

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=tb)
    kps = [K.pack_rdb_params(sp, dtype=jnp.float32) for sp in sps]
    kp = {k: jnp.stack([d[k] for d in kps]) for k in kps[0]}
    tf = K.to_flat(jnp.asarray(x), WB, BLK * nblk, top=8)
    yc = K.rdb_apply_resident(
        tf, kp, H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc,
        n_rdb=6, interpret=True,
    )
    y = np.asarray(K.from_flat(yc, H, W, WB))
    np.testing.assert_allclose(ref, y, atol=5e-5)


def test_resident_trunk_bit_identical_to_unchained():
    """Resident trunk == the unchained rdb_apply + re_apron + XLA-residual
    composition BIT-FOR-BIT at equal (BLK, nblk), in mixed mode (f32
    carry / bf16 operands) — the shared _make_rdb_compute guarantees the
    same rounding points, and the plane rotation reproduces the exact HBM
    round-trip values. Both sides run inside one jitted program (XLA's
    mul+add contraction makes a jitted-vs-eager comparison 1-ulp noisy on
    CPU; the engine always runs fully jitted)."""
    H, W = 9, 11
    nf, gc = 16, 8
    od = jnp.bfloat16
    sps = [
        R.repack_scatter({"rdb": _mk_params(nf, gc, seed=s)})["rdb"]
        for s in range(6)
    ]
    x = np.random.default_rng(7).random((2, H, W, nf)).astype(np.float32)
    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=3)
    Hp = BLK * nblk
    kw = dict(
        H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc, interpret=True
    )
    kps = [K.pack_rdb_params(sp, dtype=jnp.bfloat16) for sp in sps]
    kp = {k: jnp.stack([d[k] for d in kps]) for k in kps[0]}

    @jax.jit
    def unchained(t):
        for g in range(2):
            u = t[:, :, 5 * WB : 5 * WB + Hp * WB]
            for j in range(3):
                t = K.re_apron(
                    K.rdb_apply(t, kps[3 * g + j], op_dtype=od, **kw), WB
                )
            out = (
                0.2 * t[:, :, 5 * WB : 5 * WB + Hp * WB].astype(jnp.float32)
                + u.astype(jnp.float32)
            ).astype(jnp.float32)
            t = K.re_apron(out, WB)
        return t[:, :, 5 * WB : 5 * WB + Hp * WB]

    yun = np.asarray(unchained(K.to_flat(jnp.asarray(x), WB, Hp, top=5)))
    yres = np.asarray(
        K.rdb_apply_resident(
            K.to_flat(jnp.asarray(x), WB, Hp, top=8), kp, n_rdb=6,
            op_dtype=od, **kw,
        )
    )
    np.testing.assert_array_equal(yun, yres)


def test_plan_rows_resident_fits_budget():
    """plan_rows_resident returns a (BLK, nblk) whose analytic VMEM demand
    fits the budget at every production bucket (mixed f32-state default),
    and a smaller-or-equal BLK than the per-RDB plan (the planes tax)."""
    for side in (148, 212, 276):
        wb = K.round_wb(side)
        blk, nblk = K.plan_rows_resident(side, wb)
        base_blk, _ = K.plan_rows(side, wb=wb)
        assert blk > 0 and nblk > 0 and blk * nblk >= side
        assert blk % 4 == 0
        assert blk <= base_blk
        assert (
            K._resident_vmem_bytes(blk, nblk, wb, 64, 32, K._CH, 4, 2)
            <= K._RESIDENT_BUDGET
        )


def test_flat_layout_roundtrip():
    x = np.random.default_rng(0).random((2, 7, 9, 4)).astype(np.float32)
    WB = K.round_wb(9)
    xf = K.to_flat(jnp.asarray(x), WB, Hp=8)
    strip = xf[:, :, 5 * WB : 5 * WB + 8 * WB]
    back = K.from_flat(strip, 7, 9, WB)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_forward_pallas_variant_matches_dense():
    """Full tiny RRDBNet forward: variant='pallas' (interpret) == dense."""
    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        repack_scatter,
        rrdbnet_forward,
    )

    spec = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = init_rrdbnet_params(spec, seed=7)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(repack_scatter(p)["rdb"], dtype=jnp.float32),
    )
    x = np.random.default_rng(8).random((1, 12, 10, 3)).astype(np.float32)
    ref = rrdbnet_forward(p, x, spec, storage_dtype=jnp.float32)
    # route the variant's kernel calls through interpret mode
    import functools

    orig_rdb = K.rdb_apply
    orig_chained = K.rdb_apply_chained
    K.rdb_apply = functools.partial(orig_rdb, interpret=True)
    K.rdb_apply_chained = functools.partial(orig_chained, interpret=True)
    try:
        got = rrdbnet_forward(
            pp, x, spec, storage_dtype=jnp.float32, variant="pallas"
        )
    finally:
        K.rdb_apply = orig_rdb
        K.rdb_apply_chained = orig_chained
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-5
    )


def test_forward_pallas_resident_trunk_matches_dense():
    """Full tiny RRDBNet forward with RESIDENT_TRUNK on == dense."""
    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        repack_scatter,
        rrdbnet_forward,
    )
    import functools

    spec = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = init_rrdbnet_params(spec, seed=7)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(repack_scatter(p)["rdb"], dtype=jnp.float32),
    )
    x = np.random.default_rng(8).random((1, 12, 10, 3)).astype(np.float32)
    ref = rrdbnet_forward(p, x, spec, storage_dtype=jnp.float32)

    orig_res = K.rdb_apply_resident
    orig_flag = R.RESIDENT_TRUNK
    K.rdb_apply_resident = functools.partial(orig_res, interpret=True)
    R.RESIDENT_TRUNK = True
    try:
        got = rrdbnet_forward(
            pp, x, spec, storage_dtype=jnp.float32, variant="pallas"
        )
    finally:
        K.rdb_apply_resident = orig_res
        R.RESIDENT_TRUNK = orig_flag
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-5
    )


def test_resident_blk_env_override(monkeypatch):
    """REALSR_TPU_RESIDENT_BLK forces the resident plan's row block (the
    on-hardware sweep hook) and the forward stays exact; non-digit values
    are ignored (defensive parse like every env int)."""
    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        repack_scatter,
        rrdbnet_forward,
    )
    import functools

    spec = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = init_rrdbnet_params(spec, seed=7)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(repack_scatter(p)["rdb"], dtype=jnp.float32),
    )
    x = np.random.default_rng(8).random((1, 12, 10, 3)).astype(np.float32)
    ref = rrdbnet_forward(p, x, spec, storage_dtype=jnp.float32)

    seen = []
    orig_res = K.rdb_apply_resident

    def spy(t0, kp, **kw):
        seen.append((kw["BLK"], kw["nblk"]))
        return orig_res(t0, kp, interpret=True, **kw)

    K.rdb_apply_resident = spy
    R.RESIDENT_TRUNK = True
    try:
        for raw, want_blk in (("4", 4), ("junk", None)):
            monkeypatch.setenv("REALSR_TPU_RESIDENT_BLK", raw)
            got = rrdbnet_forward(
                pp, x, spec, storage_dtype=jnp.float32, variant="pallas"
            )
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-5
            )
            if want_blk is not None:
                assert seen[-1][0] == want_blk, seen[-1]
    finally:
        K.rdb_apply_resident = orig_res
        R.RESIDENT_TRUNK = False
    # the junk value fell back to the analytic plan
    H, W = x.shape[1:3]
    wb = K.round_wb(W)
    assert seen[1] == K.plan_rows_resident(
        H, wb, nf=spec.nf, gc=spec.gc, state_bytes=4, op_bytes=4
    ), seen


def test_upconv_x2_equals_nearest_plus_conv():
    """The stride-2 transposed-conv upsampler (tap-sum 4x4 kernel) is the
    exact algebra of nearest-x2 -> conv3x3 -> lrelu."""
    from realsr_tpu.models.rrdbnet import _conv3x3, _lrelu, _upconv_x2
    from realsr_tpu.ops.resize import nearest_x2

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((2, 7, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (4,)).astype(np.float32))
    ref = _lrelu(_conv3x3(nearest_x2(x), w, b, None))
    got = _upconv_x2(x, w, b)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_upconv_phase_equals_nearest_plus_conv():
    """The phase-decomposed upsampler (VALID 2x2 conv, four phase groups,
    shifted-slice interleave) is ALSO the exact algebra of
    nearest-x2 -> conv3x3 -> lrelu, including the zero-pad borders."""
    from realsr_tpu.models.rrdbnet import _conv3x3, _lrelu, _upconv_x2_phase
    from realsr_tpu.ops.resize import nearest_x2

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, 7, 9, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (4,)).astype(np.float32))
    ref = _lrelu(_conv3x3(nearest_x2(x), w, b, None))
    got = _upconv_x2_phase(x, w, b)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_forward_pallas_mixed_mode_close_to_f32():
    """Mixed mode (f32 carried state, bf16 operands — VERDICT r2 #1's one
    config): the pallas-variant forward in interpret mode must track the
    all-f32 reference to bf16 OPERAND noise only (no state accumulation),
    and strictly better than the all-bf16 legacy mode on the same input."""
    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        repack_scatter,
        rrdbnet_forward,
    )

    spec = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = init_rrdbnet_params(spec, seed=7)

    def packed(dtype):
        pp = dict(p)
        pp["rdb"] = jax.tree.map(
            np.asarray, K.pack_rdb_params(repack_scatter(p)["rdb"], dtype=dtype)
        )
        return pp

    x = np.random.default_rng(8).random((1, 12, 10, 3)).astype(np.float32)
    ref = np.asarray(rrdbnet_forward(p, x, spec, storage_dtype=jnp.float32))
    import functools

    orig_rdb = K.rdb_apply
    orig_chained = K.rdb_apply_chained
    K.rdb_apply = functools.partial(orig_rdb, interpret=True)
    K.rdb_apply_chained = functools.partial(orig_chained, interpret=True)
    try:
        mixed = np.asarray(rrdbnet_forward(
            packed(jnp.bfloat16), x, spec, storage_dtype=jnp.float32,
            variant="pallas", op_dtype=jnp.bfloat16,
        ))
        legacy = np.asarray(rrdbnet_forward(
            packed(jnp.bfloat16), x, spec, storage_dtype=jnp.bfloat16,
            variant="pallas",
        ))
    finally:
        K.rdb_apply = orig_rdb
        K.rdb_apply_chained = orig_chained
    err_mixed = np.abs(mixed - ref).max()
    err_legacy = np.abs(legacy - ref).max()
    assert err_mixed < 0.02, err_mixed
    assert err_mixed < err_legacy, (err_mixed, err_legacy)


def test_paired_kernel_carry_error_class():
    """rdb_apply_paired (hi+lo bf16 carry): a chain of paired calls must
    sit in the MIXED error class vs the true all-f32 chain (per-call bf16
    operand noise, no accumulating storage rounding — hi is the bf16
    rounding of the carried state, exactly mixed mode's operand), and
    clearly beat the all-bf16 carry. Paired-vs-mixed differences are
    dominated by operand rounding FLIPS (the ~2^-16 carried-state drift
    occasionally flips bf16(state) by one ulp), so the comparison anchor
    is the exact f32 chain, not the mixed chain itself. Non-amplifying
    weights (gain < 1, like trained ESRGAN statistics) over 12 round
    trips: that is where storage-rounding ACCUMULATION separates the
    carries (measured here: bf16 4.3x mixed; paired == mixed to 3
    digits), while iid 0.15 weights blow the state up 2.4x per call and
    drown everything in operand noise."""
    H, W = 10, 13
    nf, gc = 16, 8
    p = _mk_params(nf, gc, wstd=0.03)
    sp = R.repack_scatter({"rdb": p})["rdb"]
    x = np.random.default_rng(1).random((2, H, W, nf)).astype(np.float32)

    WB = K.round_wb(W)
    BLK, nblk = K.plan_rows(H, target_blk=4)
    Hp = BLK * nblk
    kp32 = K.pack_rdb_params(sp, dtype=jnp.float32)
    kp16 = K.pack_rdb_params(sp, dtype=jnp.bfloat16)
    kw = dict(H=H, W=W, WB=WB, BLK=BLK, nblk=nblk, nf=nf, gc=gc, interpret=True)
    N = 12

    def chain_apply(t0, kp, op_dtype=None):
        t = t0
        for _ in range(N):
            t = K.re_apron(K.rdb_apply(t, kp, op_dtype=op_dtype, **kw), WB)
        return np.asarray(
            K.from_flat(
                t[:, :, 5 * WB : (5 + Hp) * WB].astype(jnp.float32), H, W, WB
            )
        )

    x32 = jnp.asarray(x)
    exact = chain_apply(K.to_flat(x32, WB, Hp), kp32)  # f32 carry + ops
    mixed = chain_apply(K.to_flat(x32, WB, Hp), kp16, op_dtype=jnp.bfloat16)
    bf16 = chain_apply(K.to_flat(x32.astype(jnp.bfloat16), WB, Hp), kp16)

    hi0 = x32.astype(jnp.bfloat16)
    lo0 = (x32 - hi0.astype(jnp.float32)).astype(jnp.bfloat16)
    hi = K.to_flat(hi0, WB, Hp)
    lo = K.to_flat(lo0, WB, Hp)[:, :, 5 * WB : (5 + Hp) * WB]
    for _ in range(N):
        hic, lo = K.rdb_apply_paired(hi, lo, kp16, **kw)
        hi = K.re_apron(hic, WB)
    got32 = hi[:, :, 5 * WB : (5 + Hp) * WB].astype(jnp.float32) + lo.astype(
        jnp.float32
    )
    paired = np.asarray(K.from_flat(got32, H, W, WB))

    e_mixed = np.abs(mixed - exact).mean()
    e_paired = np.abs(paired - exact).mean()
    e_bf16 = np.abs(bf16 - exact).mean()
    assert e_paired < e_bf16 / 2, (e_paired, e_bf16)
    assert e_paired < 1.2 * e_mixed, (e_paired, e_mixed)


def test_forward_pallas_paired_carry_close_to_f32():
    """Full tiny forward with PAIRED_CARRY: tracks the all-f32 reference
    like mixed mode does (operand noise, ~16-bit carried state) and beats
    the all-bf16 legacy carry."""
    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        repack_scatter,
        rrdbnet_forward,
    )

    spec = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = init_rrdbnet_params(spec, seed=7)

    def packed(dtype):
        pp = dict(p)
        pp["rdb"] = jax.tree.map(
            np.asarray, K.pack_rdb_params(repack_scatter(p)["rdb"], dtype=dtype)
        )
        return pp

    x = np.random.default_rng(8).random((1, 12, 10, 3)).astype(np.float32)
    ref = np.asarray(rrdbnet_forward(p, x, spec, storage_dtype=jnp.float32))
    import functools

    orig_rdb = K.rdb_apply
    orig_paired = K.rdb_apply_paired
    K.rdb_apply = functools.partial(orig_rdb, interpret=True)
    K.rdb_apply_paired = functools.partial(orig_paired, interpret=True)
    R.PAIRED_CARRY = True
    try:
        paired = np.asarray(rrdbnet_forward(
            packed(jnp.bfloat16), x, spec, storage_dtype=jnp.float32,
            variant="pallas", op_dtype=jnp.bfloat16,
        ))
        R.PAIRED_CARRY = False
        mixed = np.asarray(rrdbnet_forward(
            packed(jnp.bfloat16), x, spec, storage_dtype=jnp.float32,
            variant="pallas", op_dtype=jnp.bfloat16,
        ))
        legacy = np.asarray(rrdbnet_forward(
            packed(jnp.bfloat16), x, spec, storage_dtype=jnp.bfloat16,
            variant="pallas",
        ))
    finally:
        R.PAIRED_CARRY = False
        K.rdb_apply = orig_rdb
        K.rdb_apply_paired = orig_paired
    err_paired = np.abs(paired - ref).max()
    err_mixed = np.abs(mixed - ref).max()
    err_legacy = np.abs(legacy - ref).max()
    assert err_paired < 0.02, err_paired
    assert err_paired < err_legacy, (err_paired, err_legacy)
    # the paired carry may round slightly more than the f32 carry but must
    # stay in its class, not the legacy one
    assert err_paired < max(err_mixed * 8, 5e-3), (err_paired, err_mixed)


def test_dense_mixed_mode_close_to_f32():
    """Mixed mode on the XLA conv path (dense variant)."""
    from realsr_tpu.models.rrdbnet import (
        RRDBNetSpec,
        init_rrdbnet_params,
        rrdbnet_forward,
    )

    spec = RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = init_rrdbnet_params(spec, seed=7)
    x = np.random.default_rng(8).random((1, 12, 10, 3)).astype(np.float32)
    ref = np.asarray(rrdbnet_forward(p, x, spec, storage_dtype=jnp.float32))
    mixed = np.asarray(rrdbnet_forward(
        p, x, spec, storage_dtype=jnp.float32, op_dtype=jnp.bfloat16
    ))
    legacy = np.asarray(rrdbnet_forward(p, x, spec, storage_dtype=jnp.bfloat16))
    assert np.abs(mixed - ref).max() < 0.02
    assert np.abs(mixed - ref).max() < np.abs(legacy - ref).max()
