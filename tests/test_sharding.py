"""Multi-device tests on the virtual 8-CPU mesh (conftest XLA flags).

This is the framework's multi-chip story (SURVEY.md §2.2/§5): tile-batch
data parallelism over an ICI mesh, params replicated, no collectives except
the output gather. The same code must produce the same image as the
single-device engine.
"""

import jax
import numpy as np
import pytest

from realsr_tpu.engine import EngineConfig, RealSR
from realsr_tpu.parallel.mesh import make_mesh
from tests.test_engine import assert_u8_close


@pytest.fixture(scope="module")
def pair(tiny_model_dir):
    assert len(jax.devices()) == 8, "conftest must fake 8 devices"
    cfg = EngineConfig(tilesize=16, storage="float32")
    single = RealSR(gpuid=-1, config=cfg, device=jax.devices()[0])
    single.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    mesh = make_mesh(jax.devices())
    sharded = RealSR(config=cfg, mesh=mesh)
    sharded.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    return single, sharded


def test_mesh_matches_single_device(pair, rng):
    single, sharded = pair
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)  # 15 tiles @ T=16
    a = single.process(img)
    b = sharded.process(img)
    assert_u8_close(a, b)


def test_mesh_ragged_and_alpha(pair, rng):
    single, sharded = pair
    img = rng.integers(0, 256, (33, 21, 4), dtype=np.uint8)
    a = single.process(img)
    b = sharded.process(img)
    assert_u8_close(a, b)


def test_mesh_float16_parity_mode(tiny_model_dir, rng):
    """The reference-parity f16 storage mode also works under a mesh (the
    GSPMD-partitioned XLA conv path; Mosaic is bypassed for f16)."""
    cfg = EngineConfig(tilesize=16, storage="float16")
    single = RealSR(gpuid=-1, config=cfg, device=jax.devices()[0])
    single.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    sharded = RealSR(config=cfg, mesh=make_mesh(jax.devices()))
    sharded.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    assert sharded.storage_dtype == np.float16 and sharded.variant == "dense"
    img = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
    assert_u8_close(single.process(img), sharded.process(img))


def test_mesh_tile_batch_is_sharded(tiny_model_dir, rng):
    """The in-flight tile batch axis must ACTUALLY shard over the mesh —
    fail if it silently replicates (pixel-equality tests would still pass).

    Uses the engine's sharding probe (jax.debug.inspect_array_sharding on
    the batch of extracted tiles inside the bucket program). A fresh engine
    is required: the probe is baked in at first trace.
    """
    from realsr_tpu.parallel.mesh import TILE_AXIS

    mesh = make_mesh(jax.devices())
    e = RealSR(config=EngineConfig(tilesize=16, storage="float32"), mesh=mesh)
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    recorded = []
    e.sharding_probe = recorded.append
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # 16 interior tiles
    out = e.process(img)
    assert out.shape == (256, 256, 3)
    assert recorded, "sharding probe never fired"
    for shape, shd in recorded:
        assert shd.spec and shd.spec[0] == TILE_AXIS, (
            f"tile batch replicated instead of sharded: spec={shd.spec}"
        )
        per_dev = shd.shard_shape(shape)[0]
        assert per_dev * mesh.size == shape[0], (shape, shd.spec)


def test_submesh(tiny_model_dir, rng):
    """A 2-device submesh (like -g 0,1) also works."""
    mesh = make_mesh(jax.devices()[:2])
    e = RealSR(config=EngineConfig(tilesize=16, storage="float32"), mesh=mesh)
    e.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    img = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    assert e.process(img).shape == (80, 80, 3)


def test_mesh_pallas_shard_map(tiny_model_dir, rng):
    """variant='pallas' under a mesh runs the fused kernel per device inside
    shard_map (interpret mode on the CPU mesh) and matches the dense mesh
    engine."""
    import functools

    from realsr_tpu.ops import rdb_kernel as K

    mesh = make_mesh(jax.devices()[:4])
    img = rng.integers(0, 256, (40, 36, 3), dtype=np.uint8)

    dense = RealSR(
        config=EngineConfig(tilesize=16, storage="float32", variant="dense"),
        mesh=mesh,
    )
    dense.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    want = dense.process(img)

    # the engine default enables the resident whole-trunk kernel on the
    # pallas path (round 4) — route BOTH kernels through interpret mode
    origs = (K.rdb_apply, K.rdb_apply_resident)
    K.rdb_apply = functools.partial(origs[0], interpret=True)
    K.rdb_apply_resident = functools.partial(origs[1], interpret=True)
    try:
        pal = RealSR(
            config=EngineConfig(tilesize=16, storage="float32", variant="pallas"),
            mesh=mesh,
        )
        pal.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
        got = pal.process(img)
    finally:
        K.rdb_apply, K.rdb_apply_resident = origs
    assert_u8_close(want, got)


def test_mesh_tta_matches_single(tiny_model_dir, rng):
    """TTA ensembling under a mesh == TTA on one device (the 8 dihedral
    variants batch through the sharded forward)."""
    cfg = EngineConfig(tilesize=16, storage="float32")
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    single = RealSR(gpuid=-1, tta_mode=True, config=cfg, device=jax.devices()[0])
    single.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    sharded = RealSR(tta_mode=True, config=cfg, mesh=make_mesh(jax.devices()[:4]))
    sharded.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    assert_u8_close(single.process(img), sharded.process(img))


def test_mesh_from_env_rejects_duplicates():
    """REALSR_TPU_MESH=0,0 must fail with the documented clean diagnostic,
    not a deep jax error about repeated devices (advisor r2)."""
    from realsr_tpu.parallel.mesh import mesh_from_env

    with pytest.raises(ValueError, match="invalid REALSR_TPU_MESH"):
        mesh_from_env("0,0")


def test_mesh_oversized_image_bands_per_device(pair, rng, monkeypatch):
    """VERDICT r2 #9: mesh mode replicates the image buffers per device,
    so the band budget caps PER-DEVICE memory — an over-budget image must
    route through band streaming under a mesh and still match the
    single-device output exactly."""
    single, sharded = pair
    img = rng.integers(0, 256, (64, 40, 3), dtype=np.uint8)
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    assert sharded.needs_banding(img.shape)
    got = sharded.process(img)  # routes to process_banded under the mesh
    monkeypatch.delenv("REALSR_TPU_BAND_BUDGET_MB")
    expected = single.process(img)
    np.testing.assert_array_equal(got, expected)


def test_mesh_pallas_packed_tail_kernel(tmp_path, rng):
    """The packed-tail Pallas kernel (mode 2: up2+HR+last fused) inside the
    shard_map island matches the same mesh engine with the flag off. Needs
    the production nf=64 shape (the kernel falls back otherwise)."""
    import functools

    from realsr_tpu.models import rrdbnet as R
    from realsr_tpu.models.rrdbnet import RRDBNetSpec
    from realsr_tpu.ncnn.synth import make_model_dir
    from realsr_tpu.ops import rdb_kernel as K
    from realsr_tpu.ops import tail_kernel as TK

    spec = RRDBNetSpec(num_rrdb=1, nf=64, gc=32)
    d = tmp_path / "models-NF64"
    make_model_dir(str(d), spec, seed=3)
    mesh = make_mesh(jax.devices()[:2])
    img = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)

    origs = (K.rdb_apply, TK.up2_hr_last_packed, K.rdb_apply_resident)
    K.rdb_apply = functools.partial(origs[0], interpret=True)
    TK.up2_hr_last_packed = functools.partial(origs[1], interpret=True)
    K.rdb_apply_resident = functools.partial(origs[2], interpret=True)
    try:
        base = RealSR(
            config=EngineConfig(tilesize=16, storage="float32", variant="pallas"),
            mesh=mesh,
        )
        base.load(str(d) + "/x4.param", str(d) + "/x4.bin")
        want = base.process(img)

        R.PACKED_TAIL, R.PACKED_TAIL_KERNEL = True, 2
        R.PACKED_TAIL_MIN_SIDE, old_min = 0, R.PACKED_TAIL_MIN_SIDE
        kern = RealSR(
            config=EngineConfig(tilesize=16, storage="float32", variant="pallas"),
            mesh=mesh,
        )
        kern.load(str(d) + "/x4.param", str(d) + "/x4.bin")
        got = kern.process(img)
    finally:
        R.PACKED_TAIL, R.PACKED_TAIL_KERNEL = False, 0
        R.PACKED_TAIL_MIN_SIDE = old_min
        K.rdb_apply, TK.up2_hr_last_packed, K.rdb_apply_resident = origs
    assert_u8_close(want, got)
