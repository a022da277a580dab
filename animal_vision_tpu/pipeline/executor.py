"""Batched double-buffered streaming executor.

The reference's renderers run decode -> transform -> encode strictly
sequentially on one thread (renderers/video.py:118-142). Here:

- frames are decoded on a producer thread into a ring of reusable buffers
  (the native C++ ring in animal_vision_tpu/native is used when built,
  otherwise a queue.Queue fallback);
- batches are dispatched asynchronously to the device (JAX dispatch is
  async; the device works on batch i while the host decodes batch i+1 and
  encodes batch i-1);
- split-composition and video encode happen on the consumer side with
  host OpenCV.

The device program is the species' batched fused pipeline (one compiled
program per shape), so multi-chip scaling is a sharding of the batch axis
(parallel.mesh.shard_batch).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

from animal_vision_tpu.io.renderer import compose_split


def _batched(it: Iterator[np.ndarray], size: int):
    buf = []
    for frame in it:
        buf.append(frame)
        if len(buf) == size:
            yield np.stack(buf)
            buf = []
    if buf:
        yield np.stack(buf)


class StreamingExecutor:
    def __init__(
        self,
        animal,
        batch: int = 8,
        split: bool = True,
        right_label: str = "Transformed",
        prefetch: int = 2,
    ):
        self.animal = animal
        self.batch = max(1, batch)
        self.split = split
        self.right_label = right_label
        self.prefetch = prefetch

    def _make_channel(self, probe: np.ndarray):
        """Native SPSC ring when built (GIL-free slot passing), else a
        bounded queue.Queue."""
        try:
            from animal_vision_tpu.native import FrameRing, native_available

            if native_available():
                slot = int(np.prod(probe.shape)) * self.batch * probe.dtype.itemsize
                ring = FrameRing(slot, n_slots=self.prefetch + 2)
                return ring.put, ring.get, ring.close
        except Exception:
            pass
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        return q.put, (lambda: (lambda v: None if v is stop else v)(q.get())), (
            lambda: q.put(stop)
        )

    def run(self, frames: Iterable[np.ndarray], sink: Callable[[np.ndarray], None]) -> int:
        """Pump frames through the device; returns the number processed."""
        src = iter(frames)
        try:
            first = next(src)
        except StopIteration:
            return 0
        put, get, close = self._make_channel(first)

        def chained():
            yield first
            yield from src

        def producer():
            try:
                for b in _batched(chained(), self.batch):
                    put(b)
            finally:
                close()

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        n = 0
        pending = None  # (baselines, outs) device arrays in flight
        while True:
            item = get()
            if item is None:
                break
            # dispatch current batch (async), then drain the previous one —
            # device compute overlaps host decode/encode. (A short partial
            # final batch compiles its own program once.)
            dispatched = self.animal.visualize_batch_device(item)
            if pending is not None:
                n += self._emit(pending, sink)
            pending = dispatched
        if pending is not None:
            n += self._emit(pending, sink)
        t.join()
        return n

    def _emit(self, result, sink) -> int:
        baselines, outs = result
        baselines = np.asarray(baselines)
        outs = np.asarray(outs)
        for base, out in zip(baselines, outs):
            if self.split:
                sink(compose_split(base, out, right_label=self.right_label))
            else:
                sink(out)
        return outs.shape[0]
