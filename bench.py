"""Benchmark: 1080p frames/sec/chip averaged over the whole non-UV registry.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The driver target (BASELINE.json / BASELINE.md) is >= 1000 1080p fps/chip on
the non-UV path; vs_baseline is value/1000 since the reference publishes no
app-level throughput numbers (SURVEY.md §6).

Methodology: for each species class the full fused program (normalize ->
linear -> 3x3 -> effects -> encode, uint8 in/out) runs vmapped over the
streaming executor's production batch (4 frames — pipeline/executor.py's
default), timed steady-state with chained dispatches (each output feeds the
next call) plus a 4-byte scalar sync — `block_until_ready` does not block on
the axon tunnel and bulk fetches are slow, so scalar-sync chaining is the
only reliable clock (see .claude/skills/verify/SKILL.md).
The reported value is the registry-weighted harmonic mean (= fleet
throughput of an all-species pipeline giving each of the 20 species an equal
frame share, BASELINE.json config #5).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4


def _time_chained(prog, frames, iters: int) -> float:
    """Per-frame seconds for a batched (B,H,W,3)->(B,H,W,3) program."""
    out = prog(frames)
    _ = float(jnp.sum(out.astype(jnp.float32)[:1, :2, :2]))  # compile+sync
    t0 = time.perf_counter()
    y = frames
    for _ in range(iters):
        y = prog(y)
    _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
    return (time.perf_counter() - t0) / (iters * frames.shape[0])


def main() -> None:
    from animal_vision_tpu.species import NON_UV_NAMES, get_animal

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(BATCH, h, w, 3), dtype=np.uint8))
    )

    # Representatives per kernel class, weighted by how many of the 20
    # registry species each class covers (compile time over the remote
    # helper makes timing all 20 impractical; classmates differ only in
    # kernel taps):
    #   dog (iso, worst-case sigma 3.5) + lion (iso, typical) -> 9 species
    #   horse (streak) + rabbit (streak+chroma)               -> 8 species
    #   rat (pointwise + S-cone)                              -> 1
    #   pig (pointwise matrix-only)                           -> 1
    #   cat (zoom + binocular warp + LMS merge + blur)        -> 1
    classes = [
        (("dog", "lion"), 9),
        (("horse", "rabbit"), 8),
        (("rat",), 1),
        (("pig",), 1),
        (("cat",), 1),
    ]
    assert sum(wt for _, wt in classes) == len(NON_UV_NAMES) == 20
    total_time = 0.0
    for reps, weight in classes:
        times = []
        for name in reps:
            animal = get_animal(name)
            prog = animal._program((h, w, 3), np.uint8, batched=True)
            wrapped = jax.jit(lambda img, p=prog: p(img)[1])
            times.append(_time_chained(wrapped, frame, 40))
        total_time += weight * (sum(times) / len(times))

    # registry-weighted harmonic mean == fleet throughput with every one of
    # the 20 species getting an equal frame share (BASELINE config #5)
    fps = len(NON_UV_NAMES) / total_time
    print(
        json.dumps(
            {
                "metric": "nonuv_1080p_frames_per_sec_per_chip_species_avg",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
