"""Benchmark: 1080p frames/sec/chip on the non-UV species path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The driver target (BASELINE.json / BASELINE.md) is >= 1000 1080p fps/chip on
the non-UV path; vs_baseline is the ratio against that target since the
reference publishes no app-level throughput numbers (SURVEY.md §6).

Methodology: a batch of uint8 1080p frames resident on device, the full
fused species program (normalize -> linear -> 3x3 -> blur -> encode ->
uint8) jitted once, steady-state timed with block_until_ready. This measures
on-device transform throughput — the quantity the reference bottlenecks on
CPU (its per-row streak loop runs 2*H OpenCV calls per frame).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench_fn(fn, args, iters: int, warmup: int = 3) -> float:
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main() -> None:
    from animal_vision_tpu.species import get_animal

    h, w, batch = 1080, 1920, 8
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(batch, h, w, 3), dtype=np.uint8)

    # Representative non-UV mix: plain-blur (dog) and streak (horse) species.
    results = {}
    for name, iters in (("dog", 30), ("horse", 15)):
        animal = get_animal(name)
        prog = animal._program((h, w, 3), np.uint8, batched=True)
        dev_frames = jax.device_put(jnp.asarray(frames))
        dt = _bench_fn(prog, (dev_frames,), iters)
        results[name] = batch * iters / dt

    value = min(results.values())  # conservative: the slowest species class
    print(
        json.dumps(
            {
                "metric": "nonuv_1080p_frames_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "frames/s",
                "vs_baseline": round(value / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
