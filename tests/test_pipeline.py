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
