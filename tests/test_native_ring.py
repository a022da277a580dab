"""Native SPSC frame ring: build, correctness, wraparound, threading."""

import threading

import numpy as np
import pytest

from animal_vision_tpu.native import FrameRing, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ build unavailable")


def test_ring_fifo_and_wraparound():
    ring = FrameRing(slot_bytes=4 * 16, n_slots=4)
    for wave in range(5):  # wraps several times
        for i in range(3):
            ring.put(np.full((4,), wave * 10 + i, dtype=np.int32))
        for i in range(3):
            out = ring.get()
            np.testing.assert_array_equal(out, np.full((4,), wave * 10 + i, np.int32))
    ring.close()
    assert ring.get() is None


def test_ring_variable_shapes():
    ring = FrameRing(slot_bytes=1024, n_slots=4)
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = np.arange(6, dtype=np.float32).reshape(2, 3)
    ring.put(a)
    ring.put(b)
    np.testing.assert_array_equal(ring.get(), a)
    np.testing.assert_array_equal(ring.get(), b)


def test_ring_threaded_stream():
    ring = FrameRing(slot_bytes=64 * 96 * 3, n_slots=4)
    frames = [np.random.default_rng(i).integers(0, 255, (64, 96, 3), dtype=np.uint8).astype(np.uint8) for i in range(50)]

    def producer():
        for f in frames:
            ring.put(f)
        ring.close()

    t = threading.Thread(target=producer)
    t.start()
    got = []
    while True:
        f = ring.get()
        if f is None:
            break
        got.append(f)
    t.join()
    assert len(got) == 50
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_executor_uses_ring(img_u8):
    from animal_vision_tpu.pipeline import StreamingExecutor
    from animal_vision_tpu.species import get_animal

    frames = [np.roll(img_u8, i, axis=1) for i in range(7)]
    outs = []
    ex = StreamingExecutor(get_animal("pig"), batch=3, split=False)
    n = ex.run(iter(frames), outs.append)
    assert n == 7 and len(outs) == 7
