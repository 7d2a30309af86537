"""Engine tests against a reference-semantics oracle.

The oracle reimplements the reference's per-tile flow directly from the
shader/CPU-loop spec (SURVEY.md §2.7, src/realsr.cpp:145-523) in plain
numpy + one unbatched model call per tile, and must agree with the engine's
batched/bucketed/scattered implementation up to ±1 uint8 quantization step
on a small fraction of pixels (see assert_u8_close).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realsr_tpu.engine import EngineConfig, RealSR
from realsr_tpu.loader import load_model
from realsr_tpu.ops.resize import bicubic_x4
from realsr_tpu.ops.tta import d4_inverse, d4_transform
from tests.conftest import TINY_SPEC


def assert_u8_close(a: np.ndarray, b: np.ndarray, max_frac: float = 0.01):
    """uint8 equality up to quantization jitter.

    XLA fuses the engine's pre/post ops into the conv graph differently from
    the oracle's bare forward; ±1ulp f32 drift can cross the floor(v+0.5)
    threshold. Allow off-by-one on a small fraction of pixels, never more.
    """
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()} > 1"
    frac = (diff != 0).mean()
    assert frac <= max_frac, f"{frac:.2%} pixels off by one (> {max_frac:.0%})"


@pytest.fixture(scope="module")
def engine(tiny_model_dir):
    e = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    return e


def oracle_process(bundle, img, tilesize, pad, tta=False):
    """Reference-semantics tiled SR in numpy (the spec, executed naively)."""
    h, w, c = img.shape
    s = bundle.scale
    out = np.zeros((h * s, w * s, c), np.uint8)
    fwd = jax.jit(bundle.forward)
    params = bundle.params

    def mirror(i, n):
        i = abs(i)
        return (n - 1) - abs(i - (n - 1))

    ytiles = -(-h // tilesize)
    xtiles = -(-w // tilesize)
    for yi in range(ytiles):
        for xi in range(xtiles):
            hn = min((yi + 1) * tilesize, h) - yi * tilesize
            wn = min((xi + 1) * tilesize, w) - xi * tilesize
            ph, pw = hn + 2 * pad, wn + 2 * pad
            tile = np.zeros((ph, pw, 3), np.float32)
            for ty in range(ph):
                sy = mirror(yi * tilesize - pad + ty, h)
                for tx in range(pw):
                    sx = mirror(xi * tilesize - pad + tx, w)
                    tile[ty, tx] = img[sy, sx, :3]
            tile *= 1.0 / 255.0
            if not tta:
                y = np.asarray(fwd(params, jnp.asarray(tile[None])))[0]
            else:
                acc = np.zeros((ph * s, pw * s, 3), np.float32)
                for k in range(8):
                    v = d4_transform(jnp.asarray(tile[None]), k)
                    yk = fwd(params, v)
                    acc += np.asarray(d4_inverse(yk, k))[0]
                y = acc / 8.0
            interior = y[pad * s : (pad + hn) * s, pad * s : (pad + wn) * s]
            u8 = np.clip(np.floor(interior * 255.0 + 0.5), 0, 255).astype(np.uint8)
            oy, ox = yi * tilesize * s, xi * tilesize * s
            out[oy : oy + hn * s, ox : ox + wn * s, :3] = u8
            if c == 4:
                a = img[
                    yi * tilesize : yi * tilesize + hn,
                    xi * tilesize : xi * tilesize + wn,
                    3:,
                ].astype(np.float32)
                ua = np.asarray(bicubic_x4(jnp.asarray(a[None])))[0]
                out[oy : oy + hn * s, ox : ox + wn * s, 3] = np.clip(
                    np.floor(ua + 0.5), 0, 255
                ).astype(np.uint8)[..., 0]
    return out


def test_single_tile_image(engine, tiny_model_dir, rng):
    img = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    out = engine.process(img)
    assert out.shape == (48, 56, 3)
    oracle = oracle_process(engine.bundle, img, engine.tilesize, engine.prepadding)
    assert_u8_close(out, oracle)


def test_multi_tile_matches_oracle(engine, rng):
    """Ragged grid: 30x26 with T=16 -> interior/right/bottom/corner buckets."""
    img = rng.integers(0, 256, (26, 30, 3), dtype=np.uint8)
    out = engine.process(img)
    oracle = oracle_process(engine.bundle, img, engine.tilesize, engine.prepadding)
    assert_u8_close(out, oracle)


def test_alpha_channel(engine, rng):
    img = rng.integers(0, 256, (20, 18, 4), dtype=np.uint8)
    out = engine.process(img)
    assert out.shape == (80, 72, 4)
    oracle = oracle_process(engine.bundle, img, engine.tilesize, engine.prepadding)
    assert_u8_close(out, oracle)


def test_tta_matches_oracle(tiny_model_dir, rng):
    e = RealSR(
        gpuid=-1,
        tta_mode=True,
        config=EngineConfig(tilesize=16, storage="float32"),
    )
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    out = e.process(img)
    oracle = oracle_process(e.bundle, img, e.tilesize, e.prepadding, tta=True)
    assert_u8_close(out, oracle)


def test_tile_size_stability(engine, tiny_model_dir, rng):
    """Different tile sizes change tile extents (and thus edge context) but
    the overlap-cropped merge must stay visually identical — high PSNR."""
    img = rng.integers(0, 256, (33, 31, 3), dtype=np.uint8)
    e2 = RealSR(gpuid=-1, config=EngineConfig(tilesize=32, storage="float32"))
    e2.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    a = engine.process(img).astype(np.float64)
    b = e2.process(img).astype(np.float64)
    mse = ((a - b) ** 2).mean()
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
    assert psnr > 35.0, f"tiling seams too strong: PSNR={psnr:.1f}dB"


def test_progress_callback(engine, rng):
    img = rng.integers(0, 256, (26, 30, 3), dtype=np.uint8)
    fracs = []
    engine.process(img, progress_cb=fracs.append)
    assert fracs and fracs[-1] == pytest.approx(1.0)
    assert all(b >= a for a, b in zip(fracs, fracs[1:]))


def test_banded_matches_full_exactly(engine, rng):
    """Band-streamed processing must be BIT-IDENTICAL to the full-image
    path (bands carry real vertical context rows) — including ragged
    bottom tile rows and alpha."""
    for shape in ((70, 34, 3), (52, 20, 4)):  # ragged grids at T=16
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        full = engine.process(img)
        for btr in (1, 2, 3):
            banded = engine.process_banded(img, band_tile_rows=btr)
            np.testing.assert_array_equal(full, banded)


def test_banded_tta_matches_full(tiny_model_dir, rng):
    cfg = EngineConfig(tilesize=16, storage="float32")
    e = RealSR(gpuid=-1, tta_mode=True, config=cfg)
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    img = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        e.process(img), e.process_banded(img, band_tile_rows=1)
    )


def test_needs_banding_trigger(engine, monkeypatch):
    assert not engine.needs_banding((100, 100, 3))
    # 20000^2 output u8 = 19 GB >> any budget
    assert engine.needs_banding((20000, 20000, 3))
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    assert engine.needs_banding((100, 100, 3))  # zero budget forces banding


def test_process_routes_to_banded(engine, rng, monkeypatch):
    """process() transparently bands when over budget; output identical."""
    img = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
    full = engine.process(img)
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    assert engine.needs_banding(img.shape)
    np.testing.assert_array_equal(full, engine.process(img))


def test_process_batch_splits_over_budget_stack(engine, rng, monkeypatch):
    """A stack that would exceed the device budget is split into fitting
    sub-stacks (and ultimately banded per image), outputs unchanged."""
    imgs = [rng.integers(0, 256, (26, 30, 3), dtype=np.uint8) for _ in range(5)]
    ref = [engine.process(i) for i in imgs]
    per = engine._footprint_bytes(26, 30, 3)
    monkeypatch.setattr(engine, "_band_budget_bytes", lambda: int(per * 2.5))
    assert engine.max_batch_images((26, 30, 3)) == 2
    out = engine.process_batch(imgs)  # sub-stacks of 2, 2, 1
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a, b)


def test_process_batch_bands_each_when_single_over_budget(
    engine, rng, monkeypatch
):
    imgs = [rng.integers(0, 256, (40, 24, 3), dtype=np.uint8) for _ in range(2)]
    ref = [engine.process(i) for i in imgs]
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    out = engine.process_batch(imgs)  # cap=1, each image band-streams
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a, b)


def test_precompile_banded_shapes(engine, rng, monkeypatch):
    """precompile() on a shape process() will band-stream must compile the
    BAND program set (prep_band + band-shaped chunks), not dead full-image
    programs."""
    img = rng.integers(0, 256, (70, 30, 3), dtype=np.uint8)
    full = engine.process(img)
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    assert engine.needs_banding(img.shape)
    n = engine.precompile(30, 70, channels=3)
    assert n >= 2  # band prep + at least one band chunk program
    np.testing.assert_array_equal(full, engine.process(img))


def test_fp16_forces_dense_variant(tiny_model_dir):
    """Mosaic has no f16 type; float16 storage must fall back to the XLA
    conv path even when the pallas variant is requested."""
    e = RealSR(
        gpuid=-1,
        config=EngineConfig(tilesize=16, storage="float16", variant="pallas"),
    )
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    assert e.variant == "dense"


def test_precompile_then_process(engine, rng):
    """precompile() AOT-builds the exact programs a shape needs; a
    subsequent process() of that shape runs correctly (serving warm-up)."""
    n = engine.precompile(30, 26, channels=3)
    assert n >= 2  # prep + at least one chunk program
    img = rng.integers(0, 256, (26, 30, 3), dtype=np.uint8)
    out = engine.process(img)
    assert out.shape == (104, 120, 3)
    with pytest.raises(RuntimeError):
        RealSR(gpuid=-1).precompile(8, 8)
    with pytest.raises(ValueError):
        engine.precompile(8, 8, channels=2)


def test_compute_program_reused_across_image_sizes(tiny_model_dir, rng):
    """The expensive per-chunk program (the forward) must be keyed by
    (bucket shape, batch) ONLY — two different image sizes with the same
    tile grid class share one compute executable (r2 finding: a fused
    chunk program recompiled the ~2-min Mosaic kernel per image size)."""
    e = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    for side in (48, 64):  # different sizes; same bucket (36,36), batch 8
        e.process(rng.integers(0, 256, (side, side, 3), dtype=np.uint8))
    # the interior bucket's compute program is shared (round 5: the warm
    # path AOT-compiles it into the dispatch table, so it lives there
    # with ONE key rather than in the jit cache); extract/scatter are
    # per-image-size
    with e._bg_lock:
        compute_keys = set(e._aot_compute)
    assert len(compute_keys) == 1, compute_keys
    assert e._compute_chunk._cache_size() == 0  # dispatch never jits it
    assert e._extract_chunk._cache_size() == 2
    assert e._scatter_chunk._cache_size() == 2


def test_degenerate_image_shapes(engine, rng):
    """1-pixel-thin and single-pixel images survive the full tiling/halo
    machinery (reflect-101 on a size-1 axis degenerates to index 0)."""
    for shape in ((1, 1, 3), (1, 7, 3), (5, 1, 4), (2, 2, 3)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = engine.process(img)
        assert out.shape == (shape[0] * 4, shape[1] * 4, shape[2])
        assert out.dtype == np.uint8


def test_rejects_bad_input(engine):
    with pytest.raises(ValueError):
        engine.process(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        engine.process(np.zeros((4, 4, 3), dtype=np.float32))
    with pytest.raises(RuntimeError):
        RealSR(gpuid=-1).process(np.zeros((4, 4, 3), dtype=np.uint8))


def test_engine_generic_graph_fallback(tmp_path, rng):
    """A valid ncnn graph that is NOT an RRDBNet runs through the generic
    executor behind the same engine facade (SURVEY.md §2: arbitrary param
    files must still load — ncnn's Net does)."""
    from realsr_tpu.engine import EngineConfig, RealSR
    from realsr_tpu.ncnn.bin import write_weights
    from realsr_tpu.ncnn.param import NCNN_MAGIC, parse_param
    from realsr_tpu.ncnn.synth import synth_weights

    # Input -> conv(3->8, lrelu) -> nearest x4 -> conv(8->3)
    text = "\n".join(
        [
            str(NCNN_MAGIC),
            "4 4",
            "Input            data  0 1 data",
            "Convolution      c1    1 1 data b1 0=8 1=3 4=1 5=1 6=216"
            " 9=2 -23310=1,2.000000e-01",
            "Interp           up    1 1 b1 b2 0=1 1=4.000000e+00 2=4.000000e+00",
            "Convolution      c2    1 1 b2 b3 0=3 1=3 4=1 5=1 6=216",
            "",
        ]
    )
    graph = parse_param(text)
    ppath = tmp_path / "x4.param"
    bpath = tmp_path / "x4.bin"
    ppath.write_text(text)
    write_weights(graph, synth_weights(graph, seed=3), str(bpath))

    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=32, storage="float32"))
    eng.load(str(ppath), str(bpath))
    assert eng.bundle.spec is None  # generic executor path
    assert eng.scale == 4
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    out = eng.process(img)
    assert out.shape == (80, 96, 3) and out.dtype == np.uint8


def test_images_smaller_than_halo(engine, rng):
    """Images smaller than prepadding=10 must still process (reflect-101
    halo wraps by iterated reflection, like the reference's mirror
    indexing handles any coordinate)."""
    for hw in [(6, 5), (1, 1), (10, 3)]:
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        out = engine.process(img)
        assert out.shape == (hw[0] * 4, hw[1] * 4, 3)


def test_engine_pixelshuffle_model_family(tmp_path, rng):
    """A pixel-shuffle (sub-pixel conv) x4 upscaler — the upsampler family
    the reference's layer zoo enables but its models never use (SURVEY.md
    §2.8) — loads and runs through the engine via the generic executor."""
    from realsr_tpu.engine import EngineConfig, RealSR
    from realsr_tpu.ncnn.bin import write_weights
    from realsr_tpu.ncnn.param import NCNN_MAGIC, parse_param
    from realsr_tpu.ncnn.synth import synth_weights

    # Input -> conv(3->16,lrelu) -> conv(16->48) -> shuffle x2 (48->12)
    #       -> conv(12->48) -> shuffle x2 (48->12) -> conv(12->3)
    text = "\n".join(
        [
            str(NCNN_MAGIC),
            "6 6",
            "Input        data 0 1 data",
            "Convolution  c1 1 1 data b1 0=16 1=3 4=1 5=1 6=432"
            " 9=2 -23310=1,2.000000e-01",
            "Convolution  c2 1 1 b1 b2 0=48 1=3 4=1 5=1 6=6912",
            "PixelShuffle s1 1 1 b2 b3 0=2",
            "Convolution  c3 1 1 b3 b4 0=48 1=3 4=1 5=1 6=5184",
            "PixelShuffle s2 1 1 b4 b5 0=2",
            "",
        ]
    )
    # final shuffle leaves 12 channels; add a last conv to 3
    text = text.rstrip("\n") + "\n"
    text = text.replace("6 6", "7 7")
    text += "Convolution  c4 1 1 b5 b6 0=3 1=3 4=1 5=1 6=324\n"
    graph = parse_param(text)
    ppath, bpath = tmp_path / "x4.param", tmp_path / "x4.bin"
    ppath.write_text(text)
    write_weights(graph, synth_weights(graph, seed=9), str(bpath))

    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=32, storage="float32"))
    eng.load(str(ppath), str(bpath))
    assert eng.bundle.spec is None and eng.scale == 4
    img = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    out = eng.process(img)
    assert out.shape == (72, 88, 3)


def test_process_cpu_on_device_engine(tiny_model_dir, rng):
    """Reference API parity (src/realsr.h:31-33): process_cpu on a
    device-bound engine runs on the CPU backend via a lazily-built sibling
    sharing the model files — not on the engine's own device."""
    import types

    e = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    img = rng.integers(0, 256, (20, 18, 3), np.uint8)
    expected = e.process(img)
    # make the engine look device-bound; process_cpu must not touch
    # self.device after this (it builds a CPU sibling instead)
    e.device = types.SimpleNamespace(platform="faketpu")
    got = e.process_cpu(img)
    assert e._cpu_sibling is not None
    assert e._cpu_sibling.device.platform == "cpu"
    np.testing.assert_array_equal(got, expected)
    # second call reuses the sibling
    sib = e._cpu_sibling
    e.process_cpu(img)
    assert e._cpu_sibling is sib


def test_auto_batch_budget_derivation():
    """VERDICT r2 #10: the batch cap derives from the device budget (tail
    activation bytes), not a magic constant — production tiles keep the
    measured granule-8 ceiling; huge tiles shrink; tiny budgets bind."""
    from realsr_tpu.engine import _auto_batch

    for t in (128, 192, 256):
        assert _auto_batch(t, False) == 8
    assert _auto_batch(1024, False) < 8  # memory cap binds for huge tiles
    # halving the budget halves the allowed chunk bytes
    small = _auto_batch(1024, False, budget_bytes=512 * 1024 * 1024)
    assert small <= _auto_batch(1024, False) and small >= 1
    assert _auto_batch(256, True) == 1  # TTA divides the granule by 8


def test_mixed_storage_mode(tiny_model_dir, rng):
    """storage='mixed' (f32 carry / bf16 operands — the accelerator
    default): runs end-to-end and stays close to the all-f32 engine."""
    import jax.numpy as jnp

    e32 = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    e32.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    em = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="mixed"))
    em.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    assert em.storage_dtype == jnp.float32 and em.op_dtype == jnp.bfloat16
    img = rng.integers(0, 256, (24, 20, 3), np.uint8)
    a = e32.process(img)
    b = em.process(img)
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 3, diff.max()  # bf16 operand noise only
    assert (diff > 1).mean() < 0.01


def test_packed_tail_env_hook(tiny_model_dir, rng, monkeypatch):
    """REALSR_TPU_PACKED_TAIL env sets the trace-time module flag at
    load() (the bench/CLI A/B hook); '0' leaves it off; the flag-on CPU
    engine (dense variant ignores the flag) still matches flag-off."""
    from realsr_tpu.models import rrdbnet as R

    assert not R.PACKED_TAIL
    try:
        monkeypatch.setenv("REALSR_TPU_PACKED_TAIL", "1")
        e = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
        e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
        assert R.PACKED_TAIL
        img = rng.integers(0, 256, (24, 20, 3), np.uint8)
        out_on = e.process(img)
        R.PACKED_TAIL = False
        monkeypatch.setenv("REALSR_TPU_PACKED_TAIL", "0")
        e2 = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
        e2.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
        assert not R.PACKED_TAIL
        assert_u8_close(out_on, e2.process(img))
    finally:
        R.PACKED_TAIL = False


def test_cache_fingerprint_tracks_target_features(monkeypatch, tmp_path):
    """The persistent-cache dir changes whenever the XLA target-feature
    string does (VERDICT r3 weak #2: a /proc/cpuinfo-only fingerprint let
    a mismatched AOT artifact load and warn about SIGILL)."""
    import realsr_tpu.engine as E

    import jax.extend.backend

    feats = E._host_features()
    # the fingerprint's inputs include the jax build and the live backend,
    # not just cpuinfo
    assert jax.__version__ in feats
    assert jax.extend.backend.get_backend().platform in feats

    monkeypatch.setenv("REALSR_TPU_CACHE", str(tmp_path))
    old_dir = jax.config.jax_compilation_cache_dir
    try:
        dirs = []
        for fake in ("hostgen-A avx2", "hostgen-B avx512"):
            monkeypatch.setattr(E, "_host_features", lambda f=fake: f)
            E._enable_compilation_cache.cache_clear()
            E._enable_compilation_cache()
            dirs.append(jax.config.jax_compilation_cache_dir)
        assert dirs[0] != dirs[1]
        assert all(str(tmp_path) in d for d in dirs)
    finally:
        E._enable_compilation_cache.cache_clear()
        jax.config.update("jax_compilation_cache_dir", old_dir)


@pytest.mark.parametrize("val", ["off", "false", "no", "0", ""])
def test_packed_tail_env_opt_outs_mean_off(tiny_model_dir, monkeypatch, val):
    """Every plausible opt-out spelling leaves the experimental tail OFF
    (VERDICT r3 weak #3: 'off' used to parse as level 1 and silently
    enable a measured 2.6x slowdown)."""
    from realsr_tpu.models import rrdbnet as R

    assert not R.PACKED_TAIL
    try:
        monkeypatch.setenv("REALSR_TPU_PACKED_TAIL", val)
        e = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
        e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
        assert not R.PACKED_TAIL
        assert not R.PACKED_TAIL_KERNEL
    finally:
        R.PACKED_TAIL = False
        R.PACKED_TAIL_KERNEL = 0


@pytest.mark.parametrize(
    "env,expect",
    [(None, True), ("1", True), ("0", False), ("off", False), ("", True)],
)
def test_resident_trunk_engine_default(tiny_model_dir, monkeypatch, env, expect):
    """load() on the pallas path turns the VMEM-resident whole-trunk
    kernel ON by default (round-4 default: 1.098x trunk, 3.4x faster
    compile); REALSR_TPU_RESIDENT_TRUNK=0 (or any non-digit) opts out; the
    dense/CPU variant never touches the flag."""
    from realsr_tpu.models import rrdbnet as R

    assert not R.RESIDENT_TRUNK  # module default stays off
    monkeypatch.delenv("REALSR_TPU_RESIDENT_TRUNK", raising=False)
    if env is not None:
        monkeypatch.setenv("REALSR_TPU_RESIDENT_TRUNK", env)
    try:
        # variant forced to pallas: load() sets flags; jits trace lazily,
        # so no Mosaic execution happens on CPU here
        e = RealSR(gpuid=-1, config=EngineConfig(variant="pallas"))
        e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
        assert R.RESIDENT_TRUNK is expect
        # auto on CPU resolves to dense: the flag must be left alone
        R.RESIDENT_TRUNK = False
        e2 = RealSR(gpuid=-1, config=EngineConfig(tilesize=16))
        e2.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
        assert e2.variant == "dense"
        assert not R.RESIDENT_TRUNK
    finally:
        R.RESIDENT_TRUNK = False


def test_fast_start_decision_logic(tiny_model_dir, monkeypatch):
    """Fast start (VERDICT r3 next #6): with production programs missing,
    the first image drops to FAST_START_TILE and background compiles are
    kicked off exactly once per bucket key; once every key is ready the
    production tile is used. Explicit tilesize / non-pallas variants opt
    out entirely."""
    import realsr_tpu.engine as E

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    # CPU resolves to the dense variant -> fast start must be off
    assert not eng._fast_start_enabled()

    # simulate the accelerator path
    eng.variant = "pallas"
    eng.tilesize = 0
    assert eng._fast_start_enabled()
    monkeypatch.setenv("REALSR_TPU_FAST_START", "0")
    assert not eng._fast_start_enabled()
    monkeypatch.delenv("REALSR_TPU_FAST_START")

    spawned = []
    monkeypatch.setattr(
        eng, "_spawn_bg_compile", lambda key, dims, ch: spawned.append(key)
    )
    t = eng._maybe_fast_start(256, 600, 600, 1, 3)
    assert t == E.FAST_START_TILE
    assert spawned, "no background compiles started"
    n_first = len(spawned)
    # second image: same keys -> no duplicate spawns, still fast tile
    t = eng._maybe_fast_start(256, 600, 600, 1, 3)
    assert t == E.FAST_START_TILE and len(spawned) == n_first

    # mark every needed program ready -> production tile
    for key, _ in eng._compute_keys(600, 600, 1, 3, 256):
        eng._aot_compute[key] = object()
    assert eng._maybe_fast_start(256, 600, 600, 1, 3) == 256

    # explicit tilesize opts out
    eng.config = dataclasses.replace(eng.config, tilesize=128)
    assert not eng._fast_start_enabled()


def test_fast_start_staged_tail_compile(tiny_model_dir, capsys):
    """Staged fast start (round 4): when the production program would
    embed the packed-tail kernel, an interleaved-tail stage compiles
    first and serves; the packed-tail executable hot-swaps in when it
    lands, and a packed-stage failure KEEPS the interleaved program.
    Trace-time flags are restored either way."""
    import time

    from realsr_tpu.models import rrdbnet as R

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    # simulate the round-5 DEFAULT upgrade path: ambient module flags OFF
    # (foreground traces interleaved), packed exists only as the staged
    # background upgrade
    eng._packed_upgrade = True

    events = []

    class FakeJit:
        def __init__(self, fail_packed):
            self.fail_packed = fail_packed

        def lower(self, *a, **k):
            packed = R.PACKED_TAIL  # flag state AT TRACE TIME
            events.append(("lower", packed))
            fail = self.fail_packed

            class L:
                def compile(_):
                    if packed and fail:
                        raise RuntimeError("mosaic boom")
                    return ("packed" if packed else "interleaved",)

            return L()

    def wait_for(key, want):
        for _ in range(200):
            with eng._bg_lock:
                if eng._aot_compute.get(key) == want:
                    return True
            time.sleep(0.02)
        return False

    eng._first_dispatch_done.set()  # tests spawn without dispatching
    eng._packed_go.set()  # and past the packed-tail deferral threshold
    dims = (148, 148, 128, 128, 2)  # min side >= PACKED_TAIL_MIN_SIDE
    # packed stage fails -> interleaved program stays
    eng._compute_chunk = FakeJit(fail_packed=True)
    eng._spawn_bg_compile(("k1",), dims, 3)
    assert wait_for(("k1",), ("interleaved",))
    assert "keeping the interleaved-tail program" in capsys.readouterr().err
    # packed stage succeeds -> it replaces the interleaved program
    eng._compute_chunk = FakeJit(fail_packed=False)
    eng._spawn_bg_compile(("k2",), dims, 3)
    assert wait_for(("k2",), ("packed",))
    # both stages traced, interleaved first, and the ambient flags stayed
    # OFF (the upgrade flips them only inside its own trace)
    assert events[:2] == [("lower", False), ("lower", True)]
    assert not R.PACKED_TAIL and not R.PACKED_TAIL_KERNEL
    # below the packed kernel's minimum side: single unstaged compile of
    # the foreground (interleaved) formulation
    events.clear()
    eng._compute_chunk = FakeJit(fail_packed=False)
    eng._spawn_bg_compile(("k3",), (84, 84, 64, 64, 2), 3)
    assert wait_for(("k3",), ("interleaved",))
    assert events == [("lower", False)]


def test_env_pinned_packed_mode_is_single_stage(tiny_model_dir):
    """REALSR_TPU_PACKED_TAIL=3 (env-pinned packed foreground) must compile
    exactly the pinned formulation in ONE stage: no interleaved stage, and
    no 16-image packed deferral — the pin is operator intent for a serving
    process (code review round 5: the old staged condition keyed on the
    ambient module flags, so a pinned run first served interleaved and
    then silently ignored the pin for jobs shorter than the deferral)."""
    import time

    from realsr_tpu.models import rrdbnet as R

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    # env-pinned mode: ambient flags ON, no background-upgrade staging
    R.PACKED_TAIL, R.PACKED_TAIL_KERNEL = True, 2  # autouse fixture restores
    eng._packed_upgrade = False

    events = []

    class FakeJit:
        def lower(self, *a, **k):
            events.append(R.PACKED_TAIL)

            class L:
                def compile(_):
                    return ("packed" if events[-1] else "interleaved",)

            return L()

    eng._first_dispatch_done.set()
    # deferral NOT released: a pinned compile must not wait for it
    assert not eng._packed_go.is_set()
    eng._compute_chunk = FakeJit()
    eng._spawn_bg_compile(("k1",), (148, 148, 128, 128, 2), 3)
    for _ in range(200):
        with eng._bg_lock:
            if eng._aot_compute.get(("k1",)) == ("packed",):
                break
        time.sleep(0.02)
    assert eng._aot_compute.get(("k1",)) == ("packed",)
    assert events == [True], "expected ONE packed-formulation trace"


def test_precompile_fast_start_ramp_wiring(tiny_model_dir, monkeypatch):
    """precompile(fast_start_ramp=True) additionally lowers the
    FAST_START_TILE foreground (serving=False) program set — the programs
    a seeded default-path process serves its first images on
    (tools/seed_cache.py). Without the flag, and whenever the engine
    would not ramp, only the production set is lowered."""
    import realsr_tpu.engine as E

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    eng.variant = "pallas"  # simulate the accelerator path
    eng.tilesize = 0

    calls = []

    def fake_lower(w, h, c, n_img, tilesize, serving):
        calls.append((tilesize, serving))
        return []

    monkeypatch.setattr(eng, "_lower_image_programs", fake_lower)
    monkeypatch.setattr(eng, "_pick_tilesize", lambda *a, **k: 256)

    eng.precompile(600, 600, fast_start_ramp=True)
    assert (256, True) in calls
    assert (E.FAST_START_TILE, False) in calls
    # the post-switch foreground generation (production tile, interleaved)
    # must be seeded too, or a seeded process pays a compile at the switch
    assert (256, False) in calls

    calls.clear()
    eng.precompile(600, 600)  # default: production set only
    assert calls == [(256, True)]

    # a non-ramping engine (dense variant) never lowers the ramp set
    calls.clear()
    eng.variant = "dense"
    eng.precompile(600, 600, fast_start_ramp=True)
    assert calls == [(256, True)]


def test_fast_start_aot_dispatch_path(tiny_model_dir, rng):
    """A pre-populated AOT executable is used by the dispatch loop and
    produces the same pixels as the jit path (CPU dense variant — the
    lookup/calling machinery is variant-independent)."""
    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    img = rng.integers(0, 256, (20, 24, 3), np.uint8)
    ref = eng.process(img)

    # AOT-compile the bucket program exactly as _spawn_bg_compile does
    pad = eng.prepadding
    keys = eng._compute_keys(24, 20, 1, 3, 16)
    import functools as ft

    for key, (ph, pw, hn, wn, bsz) in keys:
        S = ft.partial(
            jax.ShapeDtypeStruct,
            sharding=jax.sharding.SingleDeviceSharding(eng.device),
        )
        tiles = S((bsz, ph, pw, 3), eng.storage_dtype)
        atiles = S((bsz, 0, 0, 0), jnp.float32)
        eng._aot_compute[key] = eng._compute_chunk.lower(
            eng._params, tiles, atiles, ph, pw, hn, wn, False, False
        ).compile()
    out = eng.process(img)
    np.testing.assert_array_equal(ref, out)


def test_hot_swap_never_lands_mid_image(tiny_model_dir, rng):
    """A staged background compile that lands BETWEEN CHUNKS of one image
    must not change the executor used within that output (VERDICT r4 weak
    #1): tiles of a single image computed by two tail formulations can
    differ within the cross-program noise class, i.e. a visible seam along
    an interior chunk boundary. The dispatch loop must read a per-image
    SNAPSHOT of the AOT table; the swap takes effect on the next image."""
    eng = RealSR(
        gpuid=-1,
        config=EngineConfig(tilesize=16, storage="float32", max_batch=1),
    )
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)  # 2x2 grid, 1 bucket
    ref = eng.process(img)

    key = (36, 36, 1, False, False)  # (ph, pw, bsz=max_batch, tta, alpha)
    calls = []

    def fake_prog(params, tiles, atiles):
        calls.append(1)
        return jnp.full((1, 64, 64, 3), 7, jnp.uint8)

    swapped = []

    def cb(frac):
        # simulate the staged hot-swap landing after the first chunk
        if not swapped:
            swapped.append(True)
            with eng._bg_lock:
                eng._aot_compute[key] = fake_prog

    out = eng.process(img, progress_cb=cb)
    assert not calls, "hot-swapped program was used mid-image"
    np.testing.assert_array_equal(ref, out)
    # the NEXT image picks up the swapped program
    eng.process(img)
    assert calls, "swapped program not used for the following image"


def test_banded_run_sets_first_dispatch_event(tiny_model_dir, rng):
    """process_banded must unblock background compiles like the stack path
    does (ADVICE r4: only _process_stack_device set the event, so a
    banded-first process stalled bg compiles for the full wait timeout)."""
    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    assert not eng._first_dispatch_done.is_set()
    img = rng.integers(0, 256, (40, 24, 3), np.uint8)
    full = eng.process(img)
    banded_eng = RealSR(
        gpuid=-1, config=EngineConfig(tilesize=16, storage="float32")
    )
    banded_eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    out = banded_eng.process_banded(img, band_tile_rows=1)
    assert banded_eng._first_dispatch_done.is_set()
    np.testing.assert_array_equal(full, out)


def test_failed_first_dispatch_still_sets_event(tiny_model_dir, rng):
    """A raising first dispatch must not stall background compiles for the
    full wait timeout (ADVICE r4): the event is set in a finally."""
    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")

    def boom(*a, **k):
        raise RuntimeError("injected dispatch failure")

    eng._extract_chunk = boom
    img = rng.integers(0, 256, (20, 20, 3), np.uint8)
    with pytest.raises(RuntimeError, match="injected"):
        eng.process(img)
    assert eng._first_dispatch_done.is_set()


def test_packed_tail_compile_deferred_until_long_lived(tiny_model_dir):
    """The staged packed-tail compile must NOT start until the engine has
    served PACKED_DEFER_IMAGES images (round 5: on a 10-image directory
    job the ~8-minute server-side Mosaic compile ran the entire job and
    starved chunk execution ~13x — batch jobs exit before it could pay;
    BASELINE.md round-5 e2e section)."""
    import time

    import realsr_tpu.engine as E
    from realsr_tpu.models import rrdbnet as R

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    # the deferral applies to the DEFAULT background-upgrade path only
    # (env-pinned modes are single-stage and never wait, see
    # test_env_pinned_packed_mode_is_single_stage)
    eng._packed_upgrade = True

    events = []

    class FakeJit:
        def lower(self, *a, **k):
            packed = R.PACKED_TAIL
            events.append(("lower", packed))

            class L:
                def compile(_):
                    return ("packed" if packed else "interleaved",)

            return L()

    def wait_for(key, want, tries=200):
        for _ in range(tries):
            with eng._bg_lock:
                if eng._aot_compute.get(key) == want:
                    return True
            time.sleep(0.02)
        return False

    eng._first_dispatch_done.set()
    eng._compute_chunk = FakeJit()
    eng._spawn_bg_compile(("k1",), (148, 148, 128, 128, 2), 3)
    # interleaved stage lands; packed stage must be HELD
    assert wait_for(("k1",), ("interleaved",))
    time.sleep(0.2)
    with eng._bg_lock:
        assert eng._aot_compute[("k1",)] == ("interleaved",)
    # serving fewer images than the threshold keeps it held
    eng._count_served(E.PACKED_DEFER_IMAGES - 1)
    time.sleep(0.2)
    with eng._bg_lock:
        assert eng._aot_compute[("k1",)] == ("interleaved",)
    # crossing the threshold releases the packed stage
    eng._count_served(1)
    assert wait_for(("k1",), ("packed",))
    # env override 0 = immediate
    eng2 = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng2.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    import os as _os

    _os.environ["REALSR_TPU_PACKED_DEFER"] = "0"
    try:
        eng2._count_served(0)
        assert eng2._packed_go.is_set()
    finally:
        del _os.environ["REALSR_TPU_PACKED_DEFER"]


def test_packed_upgrade_mode_traces(tiny_model_dir):
    """Round 5: with the shipped default (env unset), the packed tail is
    a background UPGRADE — ambient module flags stay OFF (foreground
    traces are interleaved) and the staged thread's packed stage flips
    them on only for its own lower."""
    import time

    from realsr_tpu.models import rrdbnet as R

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    # tiny model (nf=16) is not packed-shaped; simulate a production
    # model's load() outcome
    eng._packed_upgrade = True
    assert not R.PACKED_TAIL and not R.PACKED_TAIL_KERNEL

    events = []

    class FakeJit:
        def lower(self, *a, **k):
            events.append(("lower", R.PACKED_TAIL, R.PACKED_TAIL_KERNEL))

            class L:
                def compile(_):
                    return ("packed",) if events[-1][1] else ("interleaved",)

            return L()

    eng._first_dispatch_done.set()
    eng._packed_go.set()
    eng._compute_chunk = FakeJit()
    eng._spawn_bg_compile(("k1",), (148, 148, 128, 128, 2), 3)
    for _ in range(200):
        with eng._bg_lock:
            if eng._aot_compute.get(("k1",)) == ("packed",):
                break
        time.sleep(0.02)
    # interleaved stage traced with flags off, packed stage with (True, 2)
    assert events == [("lower", False, 0), ("lower", True, 2)]
    # ambient flags restored OFF — later foreground traces stay interleaved
    assert not R.PACKED_TAIL and not R.PACKED_TAIL_KERNEL
    # below the min-side gate nothing flips: single interleaved compile
    events.clear()
    eng._compute_chunk = FakeJit()
    eng._spawn_bg_compile(("k2",), (84, 84, 64, 64, 2), 3)
    for _ in range(200):
        with eng._bg_lock:
            if ("k2",) in eng._aot_compute:
                break
        time.sleep(0.02)
    assert events == [("lower", False, 0)]


def test_precompile_lowers_packed_directly(tiny_model_dir):
    """precompile() is the explicit serving warm-up: it compiles the
    packed formulation directly (no deferral) where the upgrade applies,
    interleaved below the min-side gate."""
    import jax as _jax

    from realsr_tpu.models import rrdbnet as R

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    eng._packed_upgrade = True

    events = []

    class FakeJit:
        def lower(self, *a, **k):
            events.append((R.PACKED_TAIL, R.PACKED_TAIL_KERNEL))

            class L:
                def compile(_):
                    return ("prog",)

            return L()

    eng._compute_chunk = FakeJit()
    S = _jax.ShapeDtypeStruct
    import numpy as _np

    padded = S((1, 200, 200, 3), eng.storage_dtype)
    alpha = S((1, 180, 180, 0), _np.float32)
    out = S((1, 720, 720, 3), _np.uint8)
    eng._lower_chunk_programs(padded, alpha, out, 2, 148, 148, 3)
    eng._lower_chunk_programs(padded, alpha, out, 2, 84, 84, 3)
    assert events == [(True, 2), (False, 0)]
    assert not R.PACKED_TAIL and not R.PACKED_TAIL_KERNEL


def test_compile_all_packed_formulation_wins(tiny_model_dir):
    """precompile(fast_start_ramp=True) lowers BOTH tail formulations of
    the production-tile compute key (the packed serving set AND the
    interleaved post-switch foreground set, for the seed cache).
    _compile_all runs them concurrently; whichever finishes last, the
    packed program must own the AOT slot (code review round 5:
    last-writer-wins could leave a serving process permanently on the
    interleaved program, with no upgrade thread to rescue it)."""
    import jax as _jax
    import numpy as _np

    eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")

    class Low:
        def __init__(self, tag):
            self.tag = tag

        def compile(self):
            return (self.tag,)

    key = ("k",)
    # interleaved lands AFTER packed: must not downgrade
    eng._compile_all([(key, Low("packed"), True)])
    eng._compile_all([(key, Low("interleaved"), False)])
    assert eng._aot_compute[key] == ("packed",)
    # packed lands after interleaved: must overwrite
    eng._aot_compute.clear()
    eng._compile_all([(key, Low("interleaved"), False)])
    eng._compile_all([(key, Low("packed"), True)])
    assert eng._aot_compute[key] == ("packed",)

    # and the wiring: serving=True marks the packed-shaped bucket's
    # compute program overwrite=True, serving=False marks it False
    eng._packed_upgrade = True

    class FakeJit:
        def lower(self, *a, **k):
            class L:
                def compile(_):
                    return ("prog",)

            return L()

    eng._compute_chunk = FakeJit()
    S = _jax.ShapeDtypeStruct
    padded = S((1, 200, 200, 3), eng.storage_dtype)
    alpha = S((1, 180, 180, 0), _np.float32)
    out = S((1, 720, 720, 3), _np.uint8)
    for serving, want in ((True, True), (False, False)):
        lows = eng._lower_chunk_programs(
            padded, alpha, out, 2, 148, 148, 3, serving=serving
        )
        keyed = [l for l in lows if isinstance(l, tuple)]
        assert len(keyed) == 1 and keyed[0][2] is want


def test_compute_program_is_weight_independent(tiny_model_dir, tmp_path):
    """The compute program takes params as a runtime ARGUMENT, so its
    lowered module — and therefore its persistent-cache key and any seed
    tarball (tools/seed_cache.py) — must not depend on weight VALUES:
    two engines with different weights lower byte-identical modules
    (round 5: a closed-over params tree baked the weights in as MLIR
    constants, so a seed built for one x4.bin missed for every other)."""
    import jax as _jax
    import numpy as _np

    from conftest import TINY_SPEC
    from realsr_tpu.ncnn.synth import make_model_dir

    other = tmp_path / "models-TINY2"
    make_model_dir(str(other), TINY_SPEC, seed=99)

    texts = []
    for mdir in (tiny_model_dir, str(other)):
        eng = RealSR(gpuid=-1, config=EngineConfig(storage="float32"))
        eng.load(mdir + "/x4.param", mdir + "/x4.bin")
        ph = 64 + 2 * eng.prepadding
        tiles = _jax.ShapeDtypeStruct((2, ph, ph, 3), eng.storage_dtype)
        atiles = _jax.ShapeDtypeStruct((2, 0, 0, 0), _np.float32)
        low = eng._compute_chunk.lower(
            eng._params, tiles, atiles, ph, ph, 64, 64, False, False
        )
        texts.append(low.as_text())
    assert texts[0] == texts[1]
    # and the weights really are absent from the module body
    assert len(texts[0]) < 4_000_000
