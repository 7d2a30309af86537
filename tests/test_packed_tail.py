"""Packed-phase tail (models.rrdbnet._packed_tail) exactness.

The packed tail must reproduce the interleaved tail's values — same taps,
same f32 accumulation dtype, zero-pad borders included — for any H/W
(odd, non-square) and both operand dtypes. Reference semantics: the tail
of the x4.param graph run at full resolution per tile
(/root/reference/src/realsr.cpp:420-428)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realsr_tpu.models import rrdbnet as R


def _tail_params(nf, out_ch, seed=0):
    rng = np.random.default_rng(seed)

    def conv(ci, co):
        return {
            "w": rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32),
            "b": rng.normal(0, 0.05, (co,)).astype(np.float32),
        }

    up = [conv(nf, nf) for _ in range(2)]
    return {
        "trunk": conv(nf, nf),
        "up": {
            "w": np.stack([u["w"] for u in up]),
            "b": np.stack([u["b"] for u in up]),
        },
        "hr": conv(nf, nf),
        "last": conv(nf, out_ch),
    }


@pytest.fixture(autouse=True)
def _no_min_side_gate(monkeypatch):
    """Tests exercise the kernel at tiny tile sides; disable the
    production PACKED_TAIL_MIN_SIDE gate so the kernel paths are actually
    taken (not silently replaced by the interleaved tail)."""
    monkeypatch.setattr(R, "PACKED_TAIL_MIN_SIDE", 0)


def _run(params, fea, body, spec, packed, storage_dtype, od):
    kernel_od = None if jnp.dtype(od) == jnp.dtype(storage_dtype) else od
    old = R.PACKED_TAIL
    R.PACKED_TAIL = packed
    try:
        return np.asarray(
            R._pallas_tail(
                params, jnp.asarray(fea), jnp.asarray(body), spec,
                storage_dtype, jnp.dtype(od), kernel_od,
            )
        )
    finally:
        R.PACKED_TAIL = old


@pytest.mark.parametrize("H,W", [(7, 9), (8, 8), (5, 12)])
def test_packed_tail_exact_f32(H, W):
    nf = 16
    spec = R.RRDBNetSpec(num_rrdb=1, nf=nf, gc=8)
    params = _tail_params(nf, spec.out_ch, seed=1)
    rng = np.random.default_rng(2)
    fea = rng.normal(0, 1, (2, H, W, nf)).astype(np.float32)
    body = rng.normal(0, 1, (2, H, W, nf)).astype(np.float32)

    ref = _run(params, fea, body, spec, False, jnp.float32, jnp.float32)
    got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    assert ref.shape == (2, 4 * H, 4 * W, 3)
    # identical taps and f32 accumulation; only summation ORDER differs
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_packed_tail_bf16_operands_same_class():
    """Mixed-mode dtypes (f32 storage, bf16 operands): packed must stay in
    the interleaved form's bf16-rounding class."""
    nf = 16
    spec = R.RRDBNetSpec(num_rrdb=1, nf=nf, gc=8)
    params = _tail_params(nf, spec.out_ch, seed=3)
    rng = np.random.default_rng(4)
    fea = rng.normal(0, 1, (1, 6, 11, nf)).astype(np.float32)
    body = rng.normal(0, 1, (1, 6, 11, nf)).astype(np.float32)

    exact = _run(params, fea, body, spec, False, jnp.float32, jnp.float32)
    ref16 = _run(params, fea, body, spec, False, jnp.float32, jnp.bfloat16)
    got16 = _run(params, fea, body, spec, True, jnp.float32, jnp.bfloat16)
    e_ref = np.abs(ref16 - exact).max()
    e_got = np.abs(got16 - exact).max()
    assert e_got < max(2.0 * e_ref, 1e-3), (e_got, e_ref)


def test_packed_tail_border_zero_pad_semantics():
    """The zero-fill shifts must reproduce conv zero padding exactly: probe
    with an input whose only energy sits on the border ring."""
    nf = 16
    spec = R.RRDBNetSpec(num_rrdb=1, nf=nf, gc=8)
    params = _tail_params(nf, spec.out_ch, seed=5)
    fea = np.zeros((1, 6, 7, nf), np.float32)
    body = np.zeros((1, 6, 7, nf), np.float32)
    fea[:, [0, -1], :, :] = 1.0
    fea[:, :, [0, -1], :] = 1.0
    body[:, [0, -1], :, :] = 0.5
    body[:, :, [0, -1], :] = 0.5

    ref = _run(params, fea, body, spec, False, jnp.float32, jnp.float32)
    got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_packed_tail_full_forward_pallas_interpret():
    """End-to-end through rrdbnet_forward (pallas variant, interpret) with
    PACKED_TAIL on: matches the same forward with the flag off."""
    import functools

    from realsr_tpu.ops import rdb_kernel as K

    spec = R.RRDBNetSpec(num_rrdb=2, nf=16, gc=8)
    p = R.init_rrdbnet_params(spec, seed=7)
    pp = dict(p)
    pp["rdb"] = jax.tree.map(
        np.asarray,
        K.pack_rdb_params(R.repack_scatter(p)["rdb"], dtype=jnp.float32),
    )
    x = np.random.default_rng(8).random((1, 10, 9, 3)).astype(np.float32)

    orig = K.rdb_apply
    K.rdb_apply = functools.partial(orig, interpret=True)
    try:
        ref = np.asarray(
            R.rrdbnet_forward(
                pp, x, spec, storage_dtype=jnp.float32, variant="pallas"
            )
        )
        R.PACKED_TAIL = True
        got = np.asarray(
            R.rrdbnet_forward(
                pp, x, spec, storage_dtype=jnp.float32, variant="pallas"
            )
        )
    finally:
        R.PACKED_TAIL = False
        K.rdb_apply = orig
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


@pytest.mark.parametrize("H,W", [(7, 9), (12, 12), (5, 16)])
def test_packed_tail_kernel_matches_einsum_form(H, W):
    """ops.tail_kernel.hr_last_packed (interpret): the fused Pallas
    HRconv+conv_last must match the 32-einsum packed form — same taps,
    f32 accumulation, zero-pad borders, odd/non-square sizes."""
    import functools

    from realsr_tpu.ops import tail_kernel as TK


    spec = R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    params = _tail_params(64, spec.out_ch, seed=11)
    rng = np.random.default_rng(12)
    fea = rng.normal(0, 1, (2, H, W, 64)).astype(np.float32)
    body = rng.normal(0, 1, (2, H, W, 64)).astype(np.float32)

    orig = TK.hr_last_packed
    TK.hr_last_packed = functools.partial(orig, interpret=True)
    try:
        ref = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
        R.PACKED_TAIL_KERNEL = True
        got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    finally:
        R.PACKED_TAIL_KERNEL = False
        TK.hr_last_packed = orig
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_packed_tail_kernel_bf16_class():
    """Mixed dtypes through the kernel: stays in the einsum form's
    bf16-operand class."""
    import functools

    from realsr_tpu.ops import tail_kernel as TK

    spec = R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    params = _tail_params(64, spec.out_ch, seed=13)
    rng = np.random.default_rng(14)
    fea = rng.normal(0, 1, (1, 8, 10, 64)).astype(np.float32)
    body = rng.normal(0, 1, (1, 8, 10, 64)).astype(np.float32)

    exact = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    ein16 = _run(params, fea, body, spec, True, jnp.float32, jnp.bfloat16)
    orig = TK.hr_last_packed
    TK.hr_last_packed = functools.partial(orig, interpret=True)
    try:
        R.PACKED_TAIL_KERNEL = True
        ker16 = _run(params, fea, body, spec, True, jnp.float32, jnp.bfloat16)
    finally:
        R.PACKED_TAIL_KERNEL = False
        TK.hr_last_packed = orig
    e_ein = np.abs(ein16 - exact).max()
    e_ker = np.abs(ker16 - exact).max()
    assert e_ker < max(2.0 * e_ein, 1e-3), (e_ker, e_ein)


@pytest.mark.parametrize("H,W", [(7, 9), (12, 12)])
def test_packed_tail_kernel_up2_matches_einsum_form(H, W):
    """Mode 2 (up2+HRconv+conv_last fused, interpret) must match the
    all-einsum packed form."""
    import functools

    from realsr_tpu.ops import tail_kernel as TK

    spec = R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    params = _tail_params(64, spec.out_ch, seed=15)
    rng = np.random.default_rng(16)
    fea = rng.normal(0, 1, (2, H, W, 64)).astype(np.float32)
    body = rng.normal(0, 1, (2, H, W, 64)).astype(np.float32)

    orig = TK.up2_hr_last_packed
    TK.up2_hr_last_packed = functools.partial(orig, interpret=True)
    try:
        ref = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
        R.PACKED_TAIL_KERNEL = 2
        got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    finally:
        R.PACKED_TAIL_KERNEL = 0
        TK.up2_hr_last_packed = orig
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_packed_tail_kernel_falls_back_off_production_shape():
    """Non-production nf: the kernel flag must fall back to the einsum
    form (the kernel is fixed at nf=64/out_ch=3), not crash."""
    spec = R.RRDBNetSpec(num_rrdb=1, nf=16, gc=8)
    params = _tail_params(16, spec.out_ch, seed=17)
    rng = np.random.default_rng(18)
    fea = rng.normal(0, 1, (1, 6, 6, 16)).astype(np.float32)
    body = rng.normal(0, 1, (1, 6, 6, 16)).astype(np.float32)
    ref = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    try:
        R.PACKED_TAIL_KERNEL = 2
        got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    finally:
        R.PACKED_TAIL_KERNEL = 0
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("mode", [1, 2])
def test_packed_tail_kernel_multiblock_multichunk(mode, monkeypatch):
    """Stress the kernel's riskiest paths: nblk>1 (cross-block z/P2 halo
    recompute, forced via REALSR_TPU_TAIL_BLK) and FLAT > one 1920-lane
    chunk (wide W -> chunked cols gather/concat)."""
    import functools

    from realsr_tpu.ops import tail_kernel as TK

    monkeypatch.setenv("REALSR_TPU_TAIL_BLK", "4")
    spec = R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    params = _tail_params(64, spec.out_ch, seed=19)
    rng = np.random.default_rng(20)
    # H=13 -> nblk=4 at BLK 4; W=94 -> WB=96, FLAT1=(4+2)*96=576 lanes x
    # ... widened by H: (BLK+2)*WB per block; with ch=1920 the per-block
    # flat exceeds one chunk only via W, so use W=94 (WB 96): padf1 covers
    # 2 chunks at BLK 38 -- instead force chunking via ch override below.
    fea = rng.normal(0, 1, (1, 13, 94, 64)).astype(np.float32)
    body = rng.normal(0, 1, (1, 13, 94, 64)).astype(np.float32)

    origs = (TK.hr_last_packed, TK.up2_hr_last_packed)
    # ch=256 forces several lane chunks per block at these sizes
    TK.hr_last_packed = functools.partial(origs[0], interpret=True, ch=256)
    TK.up2_hr_last_packed = functools.partial(
        origs[1], interpret=True, ch=256
    )
    try:
        ref = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
        R.PACKED_TAIL_KERNEL = mode
        got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    finally:
        R.PACKED_TAIL_KERNEL = 0
        TK.hr_last_packed, TK.up2_hr_last_packed = origs
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


@pytest.mark.parametrize("mode", [1, 2])
def test_packed_tail_kernel_stage_sized_chunks(mode):
    """ch=0 (stage-sized lane chunks — the compile-time fix for the 573s
    mode-2 Mosaic compile, VERDICT r3 next #2) must match the einsum
    form exactly like the default-ch kernel does."""
    import functools

    from realsr_tpu.ops import tail_kernel as TK

    spec = R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    params = _tail_params(64, spec.out_ch, seed=21)
    rng = np.random.default_rng(22)
    fea = rng.normal(0, 1, (2, 9, 11, 64)).astype(np.float32)
    body = rng.normal(0, 1, (2, 9, 11, 64)).astype(np.float32)

    origs = (TK.hr_last_packed, TK.up2_hr_last_packed)
    TK.hr_last_packed = functools.partial(origs[0], interpret=True, ch=0)
    TK.up2_hr_last_packed = functools.partial(origs[1], interpret=True, ch=0)
    try:
        ref = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
        R.PACKED_TAIL_KERNEL = mode
        got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    finally:
        R.PACKED_TAIL_KERNEL = 0
        TK.hr_last_packed, TK.up2_hr_last_packed = origs
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)


def test_min_side_gate_uses_interleaved_below_threshold(monkeypatch):
    """KERNEL mode at a tile below PACKED_TAIL_MIN_SIDE must run the
    interleaved tail (identical output, no kernel invocation) — the
    fast-start small-tile program must never pay the kernel compile."""
    from realsr_tpu.ops import tail_kernel as TK

    monkeypatch.setattr(R, "PACKED_TAIL_MIN_SIDE", 128)
    spec = R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    params = _tail_params(64, spec.out_ch, seed=30)
    rng = np.random.default_rng(31)
    fea = rng.normal(0, 1, (1, 8, 10, 64)).astype(np.float32)
    body = rng.normal(0, 1, (1, 8, 10, 64)).astype(np.float32)

    calls = []
    monkeypatch.setattr(
        TK, "up2_hr_last_packed",
        lambda *a, **k: calls.append(1) or (_ for _ in ()).throw(AssertionError),
    )
    ref = _run(params, fea, body, spec, False, jnp.float32, jnp.float32)
    try:
        R.PACKED_TAIL_KERNEL = 2
        got = _run(params, fea, body, spec, True, jnp.float32, jnp.float32)
    finally:
        R.PACKED_TAIL_KERNEL = 0
    assert not calls
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_engine_default_enables_packed_tail_for_production_shape(
    tmp_path, monkeypatch
):
    """load() on the pallas path marks nf=64/out=3 models for the packed
    BACKGROUND UPGRADE (round 5: foreground traces stay interleaved-tail —
    ambient module flags OFF), leaves other shapes unmarked, respects an
    explicit env 0, and env 3 pins the old foreground-packed behavior."""
    from realsr_tpu.engine import EngineConfig, RealSR
    from realsr_tpu.ncnn.synth import make_model_dir

    monkeypatch.delenv("REALSR_TPU_PACKED_TAIL", raising=False)
    prod = tmp_path / "prod"
    make_model_dir(str(prod), R.RRDBNetSpec(num_rrdb=1, nf=64, gc=32), seed=0)
    small = tmp_path / "small"
    make_model_dir(str(small), R.RRDBNetSpec(num_rrdb=1, nf=16, gc=8), seed=0)

    try:
        # variant forced to pallas: load() must mark the upgrade while
        # leaving the ambient trace flags OFF (jits are built lazily, so
        # no Mosaic execution happens on CPU here)
        e = RealSR(gpuid=-1, config=EngineConfig(variant="pallas"))
        e.load(str(prod) + "/x4.param", str(prod) + "/x4.bin")
        assert e._packed_upgrade
        assert not R.PACKED_TAIL and R.PACKED_TAIL_KERNEL == 0

        e2 = RealSR(gpuid=-1, config=EngineConfig(variant="pallas"))
        e2.load(str(small) + "/x4.param", str(small) + "/x4.bin")
        assert not e2._packed_upgrade
        assert not R.PACKED_TAIL and R.PACKED_TAIL_KERNEL == 0

        monkeypatch.setenv("REALSR_TPU_PACKED_TAIL", "0")
        e3 = RealSR(gpuid=-1, config=EngineConfig(variant="pallas"))
        e3.load(str(prod) + "/x4.param", str(prod) + "/x4.bin")
        assert not e3._packed_upgrade
        assert not R.PACKED_TAIL

        # env 3 = the pinned foreground-packed escape hatch (bench
        # protocol / serving processes): module flags ON, no upgrade stage
        monkeypatch.setenv("REALSR_TPU_PACKED_TAIL", "3")
        e4 = RealSR(gpuid=-1, config=EngineConfig(variant="pallas"))
        e4.load(str(prod) + "/x4.param", str(prod) + "/x4.bin")
        assert not e4._packed_upgrade
        assert R.PACKED_TAIL and R.PACKED_TAIL_KERNEL == 2
    finally:
        R.PACKED_TAIL, R.PACKED_TAIL_KERNEL = False, 0
