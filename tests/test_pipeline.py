"""Pipeline tests: queue backpressure, poison pill, failure continue."""

import threading
import time

import numpy as np
import pytest

from realsr_tpu.pipeline import (
    POISON_ID,
    QUEUE_CAPACITY,
    Task,
    TaskQueue,
    run_pipeline,
)


class FakeEngine:
    scale = 4

    class device:
        platform = "cpu"

    def process_device(self, img, progress_cb=None):
        if progress_cb:
            progress_cb(1.0)
        h, w, c = img.shape
        return np.zeros((h * 4, w * 4, c), np.uint8)

    def _process_stack_device(self, stack, progress_cb=None):
        if progress_cb:
            progress_cb(1.0)
        n, h, w, c = stack.shape
        return np.zeros((n, h * 4, w * 4, c), np.uint8)

    def fetch(self, buf):
        return buf


def test_queue_backpressure():
    q = TaskQueue()
    for i in range(QUEUE_CAPACITY):
        q.put(Task(id=i))
    blocked = threading.Event()
    passed = threading.Event()

    def producer():
        blocked.set()
        q.put(Task(id=99))  # must block until a get()
        passed.set()

    th = threading.Thread(target=producer, daemon=True)
    th.start()
    blocked.wait()
    time.sleep(0.05)
    assert not passed.is_set(), "put() did not block at capacity 8"
    q.get()
    th.join(timeout=2)
    assert passed.is_set()


def test_poison_pill_id():
    assert POISON_ID == -233  # main.cpp:322


def test_pipeline_e2e_with_decode_failures(tmp_path, capsys):
    from PIL import Image

    good = tmp_path / "ok.png"
    Image.fromarray(np.zeros((5, 6, 3), np.uint8)).save(good)
    bad = tmp_path / "broken.png"
    bad.write_bytes(b"not an image")

    outs = [str(tmp_path / "ok_out.png"), str(tmp_path / "broken_out.png")]
    run_pipeline(
        [str(good), str(bad)],
        outs,
        engines=[FakeEngine()],
        jobs_proc=[2],
        jobs_load=2,
        jobs_save=2,
        verbose=True,
        progress=False,
    )
    import os

    assert os.path.exists(outs[0])
    assert not os.path.exists(outs[1])  # decode failed -> skipped, no crash
    err = capsys.readouterr().err
    assert "decode image" in err and "failed" in err
    assert "done" in err


def test_batch_drain_mismatch_no_deadlock():
    """A drained non-batchable task must be HELD, not re-queued: with the
    bounded queue a producer's pending put() can fill the slot freed by
    get_nowait() first, deadlocking both sides on put() (advisor r1 high).
    """
    from realsr_tpu.pipeline import proc_worker

    toproc = TaskQueue()  # capacity 8
    tosave = TaskQueue(capacity=100)
    img_a = np.zeros((4, 4, 3), np.uint8)
    img_b = np.zeros((6, 6, 3), np.uint8)
    # alternate shapes so every drain attempt hits a mismatch
    for i in range(QUEUE_CAPACITY):
        toproc.put(Task(id=i, inimage=img_a if i % 2 == 0 else img_b))

    def producer():  # >=2 puts pending beyond capacity, then poison
        for i in range(8, 12):
            toproc.put(Task(id=i, inimage=img_a))
        toproc.put(Task(id=POISON_ID))

    prod = threading.Thread(target=producer, daemon=True)
    prod.start()
    worker = threading.Thread(
        target=proc_worker,
        args=(FakeEngine(), toproc, tosave, False, 4),
        daemon=True,
    )
    worker.start()
    worker.join(timeout=20)
    assert not worker.is_alive(), "proc_worker deadlocked on batch drain"
    prod.join(timeout=5)
    done = set()
    while (t := tosave.get_nowait()) is not None:
        done.add(t.id)
    assert done == set(range(12))


def test_batch_drain_respects_device_budget():
    """image_batch must be capped by engine.max_batch_images so a drained
    stack never exceeds the device budget (r2 review finding)."""
    from realsr_tpu.pipeline import proc_worker

    class BudgetEngine(FakeEngine):
        stacks: list = []

        def max_batch_images(self, shape):
            return 2

        def _process_stack_device(self, stack, progress_cb=None):
            BudgetEngine.stacks.append(stack.shape[0])
            return super()._process_stack_device(stack, progress_cb)

    toproc = TaskQueue()
    tosave = TaskQueue(capacity=100)
    img = np.zeros((4, 4, 3), np.uint8)
    for i in range(6):
        toproc.put(Task(id=i, inimage=img))
    toproc.put(Task(id=POISON_ID))
    proc_worker(BudgetEngine(), toproc, tosave, False, image_batch=8)
    assert BudgetEngine.stacks and max(BudgetEngine.stacks) <= 2


def test_image_batching_proc(tmp_path, rng, tiny_model_dir):
    """image_batch > 1 drains same-shape queued images into one device
    batch; outputs identical to singles."""
    import numpy as np

    from realsr_tpu.engine import EngineConfig, RealSR
    from realsr_tpu.io.codecs import decode_image, encode_image
    from realsr_tpu.pipeline import run_pipeline

    ind, outd, outd2 = tmp_path / "i", tmp_path / "o1", tmp_path / "o2"
    for d in (ind, outd, outd2):
        d.mkdir()
    for i in range(5):
        encode_image(str(ind / f"{i}.png"),
                     rng.integers(0, 256, (20, 18, 3), dtype=np.uint8))
    eng = RealSR(gpuid=-1, config=EngineConfig(tilesize=16, storage="float32"))
    eng.load(tiny_model_dir + "/x4.param", tiny_model_dir + "/x4.bin")
    files = sorted(str(p) for p in ind.iterdir())
    run_pipeline(files, [str(outd / f"{i}.png") for i in range(5)],
                 [eng], [1], image_batch=1, progress=False)
    run_pipeline(files, [str(outd2 / f"{i}.png") for i in range(5)],
                 [eng], [1], image_batch=4, progress=False)
    for i in range(5):
        a = decode_image(str(outd / f"{i}.png"))
        b = decode_image(str(outd2 / f"{i}.png"))
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 0.01


class PoisonedEngine(FakeEngine):
    """Raises on a designated input path (proc) or on fetch of a marked
    buffer (save) — models a device OOM / corrupt state mid-run."""

    def __init__(self, fail_proc_on=None, fail_fetch_on=None):
        self.fail_proc_on = fail_proc_on
        self.fail_fetch_on = fail_fetch_on

    def process_device(self, img, progress_cb=None):
        if self.fail_proc_on is not None and img.shape == self.fail_proc_on:
            raise RuntimeError("injected dispatch failure")
        return super().process_device(img, progress_cb)

    def fetch(self, buf):
        if self.fail_fetch_on is not None and buf.shape == self.fail_fetch_on:
            raise RuntimeError("injected fetch failure")
        return buf


def _pipeline_with_failures(tmp_path, capsys, **engine_kw):
    """3 images, one of which the engine is poisoned against; the other two
    must still be written (reference print-and-continue, main.cpp:405-412)."""
    from PIL import Image

    shapes = {"a": (5, 6, 3), "b": (7, 6, 3), "c": (9, 6, 3)}
    ins, outs = [], []
    for name, shape in shapes.items():
        p = tmp_path / f"{name}.png"
        Image.fromarray(np.zeros(shape, np.uint8)).save(p)
        ins.append(str(p))
        outs.append(str(tmp_path / f"{name}_out.png"))
    run_pipeline(
        ins, outs,
        engines=[PoisonedEngine(**engine_kw)],
        jobs_proc=[2], jobs_load=1, jobs_save=1,
        verbose=True, progress=False,
    )
    import os

    return [os.path.exists(o) for o in outs], capsys.readouterr().err


def test_proc_failure_prints_and_continues(tmp_path, capsys):
    done, err = _pipeline_with_failures(
        tmp_path, capsys, fail_proc_on=(7, 6, 3)
    )
    assert done == [True, False, True]
    assert "process image" in err and "failed" in err
    assert err.count("done") == 2


def test_save_failure_prints_and_continues(tmp_path, capsys):
    # fetch of b's 4x buffer raises inside the save worker
    done, err = _pipeline_with_failures(
        tmp_path, capsys, fail_fetch_on=(28, 24, 3)
    )
    assert done == [True, False, True]
    assert "encode image" in err and "failed" in err
    assert err.count("done") == 2
