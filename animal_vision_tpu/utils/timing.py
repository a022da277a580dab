"""Chained-dispatch device timing — the one canonical implementation.

``jax.block_until_ready`` does not block on the axon tunnel platform and
bulk device->host fetches are slow, so the only reliable steady-state clock
is to CHAIN dispatches (each output feeds the next call) and sync with a
4-byte scalar fetch (see .claude/skills/verify/SKILL.md). bench.py's phase
snippets and the tools/exp_* probes both import this helper so the official
bench and the experiment probes cannot silently diverge in methodology
(round-4 advisor finding: the loop was hand-copied into exp_uv5.py).

Note: callers that time ``prog = lambda img: animal_program(img)[1]`` are
measuring TRANSFORMED-OUTPUT-ONLY throughput — XLA dead-code-eliminates the
baseline branch that ``visualize``'s (baseline, out) tuple also pays. All
``*_fps`` BENCH keys follow this convention; end-to-end tuple throughput is
lower by the baseline branch's (small) cost.
"""

from __future__ import annotations

import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def time_chained(prog, frames, iters: int, tag: str = "", reps: int = 2) -> float:
    """Best per-frame seconds for a batched (B, ...) -> (B, ...) program.

    Heartbeats bracket the compile so a silence watchdog can tell a hung
    tunnel from a slow remote compile. Returns min over ``reps`` timed
    passes of ``iters`` chained dispatches, divided by the batch size."""
    import jax.numpy as jnp

    log(f"  [hb] {tag} compiling")
    t0 = time.perf_counter()
    out = prog(frames)
    _ = float(jnp.sum(out.astype(jnp.float32)[:1, :2, :2]))  # compile+sync
    log(f"  [hb] {tag} compiled in {time.perf_counter() - t0:.0f}s")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = frames
        for _ in range(iters):
            y = prog(y)
        _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
        best = min(best, (time.perf_counter() - t0) / (iters * frames.shape[0]))
    return best
