"""Unit tests of the embedded-interpreter bridge (realsr_tpu.native_bridge)
at the Python level — the same entry points the C++ CLI calls
(native/cli/main.cpp), without needing the binary.
"""

import json

import numpy as np
import pytest

from realsr_tpu import native_bridge as nb


@pytest.fixture(scope="module")
def bridge(tiny_model_dir):
    scale = nb.init(json.dumps({
        "gpuid": [-1],
        "tilesize": [16],
        "jobs_proc": [1],
        "prepadding": 10,
        "tta_mode": False,
        "parampath": tiny_model_dir + "/x4.param",
        "modelpath": tiny_model_dir + "/x4.bin",
    }))
    assert scale == 4
    assert nb.num_engines() == 1
    return nb


def test_device_count_positive(bridge):
    assert bridge.device_count() >= 1


def test_process_roundtrip(bridge, rng):
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    out = bridge.process(0, img.tobytes(), 12, 10, 3)
    assert len(out) == 40 * 48 * 3


def test_async_matches_sync(bridge, rng):
    """process_async + fetch == process, and handles are consumed."""
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    sync = bridge.process(0, img.tobytes(), 12, 10, 3)
    h = bridge.process_async(0, img.tobytes(), 12, 10, 3)
    assert isinstance(h, int) and h > 0
    assert bridge.fetch(h) == sync
    with pytest.raises(KeyError):
        bridge.fetch(h)  # consumed


def test_bridge_mesh_mode(tiny_model_dir, rng, monkeypatch):
    """REALSR_TPU_MESH=all through the bridge: one mesh engine aliased to
    every gpuid slot; output matches the non-mesh engine."""
    monkeypatch.setenv("REALSR_TPU_MESH", "all")
    saved = nb._engines  # module-scoped bridge fixture must survive this test
    scale = nb.init(json.dumps({
        "gpuid": [0, 1],
        "tilesize": [16, 16],
        "jobs_proc": [1, 1],
        "prepadding": 10,
        "tta_mode": False,
        "parampath": tiny_model_dir + "/x4.param",
        "modelpath": tiny_model_dir + "/x4.bin",
    }))
    assert scale == 4
    assert nb.num_engines() == 2  # both slots alias the mesh engine
    assert nb._engines[0] is nb._engines[1]
    assert nb._engines[0].mesh is not None and nb._engines[0].mesh.size == 8
    img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    out = nb.process(1, img.tobytes(), 24, 20, 3)
    from realsr_tpu.engine import EngineConfig, RealSR

    ref = RealSR(gpuid=-1, config=EngineConfig(tilesize=16))
    ref.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    assert out == ref.process(img).tobytes()
    nb._engines = saved  # restore the fixture's engines


def test_process_bands_over_budget_image(bridge, rng, monkeypatch):
    """The native surface must route over-budget images through band
    streaming exactly like the Python CLI (r2 review finding) — output
    identical, no full-image device buffer."""
    img = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
    ref = bridge.process(0, img.tobytes(), 24, 40, 3)
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    assert bridge.process(0, img.tobytes(), 24, 40, 3) == ref
    h = bridge.process_async(0, img.tobytes(), 24, 40, 3)
    assert bridge.fetch(h) == ref


def test_batch_async_over_budget_splits(bridge, rng, monkeypatch):
    imgs = [rng.integers(0, 256, (10, 12, 3), dtype=np.uint8) for _ in range(3)]
    refs = [bridge.process(0, im.tobytes(), 12, 10, 3) for im in imgs]
    monkeypatch.setenv("REALSR_TPU_BAND_BUDGET_MB", "0")
    handles = bridge.process_batch_async(
        0, [im.tobytes() for im in imgs], 12, 10, 3
    )
    assert [bridge.fetch(h) for h in handles] == refs


def test_async_handles_interleave(bridge, rng):
    """Multiple in-flight device results fetch correctly out of order —
    the C++ save threads fetch in whatever order the queue yields."""
    imgs = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)]
    handles = [bridge.process_async(0, im.tobytes(), 8, 8, 3) for im in imgs]
    outs = {h: bridge.fetch(h) for h in reversed(handles)}
    for h, im in zip(handles, imgs):
        assert outs[h] == bridge.process(0, im.tobytes(), 8, 8, 3)
