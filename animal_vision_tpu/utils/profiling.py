"""Tracing and per-stage timing (SURVEY.md §5.1: the reference has none).

- ``trace(dir)``: context manager around jax.profiler for XLA/TPU traces
  viewable in TensorBoard/Perfetto.
- ``stage_timer``: lightweight per-stage wall-clock accounting for the
  frame pipeline, with correct device synchronization (on the axon tunnel
  ``block_until_ready`` is unreliable; we sync via a tiny scalar fetch).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger("animal_vision_tpu")


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(value) -> None:
    """Force device completion of ``value`` (jax array or pytree)."""
    import jax
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(value) if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(jnp.ravel(leaves[0])[:1].astype(jnp.float32)))


class stage_timer:
    """Accumulates per-stage seconds; ``report()`` logs a summary.

    with timers.stage("hsi"):
        maps = ...
        sync(maps)
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                sync(sync_value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [
            f"{name}: {tot*1e3:.2f} ms total / {self.counts[name]}x "
            f"({tot/max(self.counts[name],1)*1e3:.2f} ms avg)"
            for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        text = "\n".join(lines)
        logger.info("stage timings:\n%s", text)
        return text
