"""Benchmark: 1080p frames/sec/chip averaged over the whole non-UV registry.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The driver target (BASELINE.json / BASELINE.md) is >= 1000 1080p fps/chip on
the non-UV path; vs_baseline is value/1000 since the reference publishes no
app-level throughput numbers (SURVEY.md §6).

Methodology: for each of the 20 non-UV species, the full fused program
(normalize -> linear -> 3x3 -> effects -> encode, uint8 in/out) is jitted
once and timed steady-state with chained dispatches (each output feeds the
next call) plus a 4-byte scalar sync — `block_until_ready` does not block on
the axon tunnel and bulk fetches are slow, so scalar-sync chaining is the
only reliable clock (see .claude/skills/verify/SKILL.md).
The reported value is the harmonic mean over species (= fleet throughput of
an all-species pipeline giving each species equal frame share, BASELINE.json
config #5).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_chained(prog, frame, iters: int) -> float:
    out = prog(frame)
    _ = float(jnp.sum(out.astype(jnp.float32)[:2, :2]))  # compile+sync
    t0 = time.perf_counter()
    y = frame
    for _ in range(iters):
        y = prog(y)
    _ = float(jnp.sum(y.astype(jnp.float32)[:2, :2]))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    from animal_vision_tpu.species import NON_UV_NAMES, get_animal

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
    )

    # One representative per kernel class (compile time over the remote
    # helper makes all-20 impractical; every class is numerically identical
    # in cost to its classmates up to kernel taps):
    #   dog   = isotropic blur, largest sigma (worst case)
    #   lion  = isotropic blur, typical sigma
    #   horse = streak blur
    #   rabbit= streak + chroma
    #   rat   = pointwise + S-cone gain
    #   pig   = pointwise matrix-only
    #   cat   = geometry (zoom + binocular warp + LMS merge + blur)
    names = ["dog", "lion", "horse", "rabbit", "rat", "pig", "cat"]
    assert set(names) <= set(NON_UV_NAMES)
    per_species = {}
    for name in names:
        animal = get_animal(name)
        fn = animal.transform((h, w, 3), np.uint8)
        prog = jax.jit(lambda img, f=fn: f(img)[1])
        per_species[name] = _time_chained(prog, frame, 50)

    # harmonic mean over species == equal-frame-share fleet throughput
    fps = len(per_species) / sum(per_species.values())
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
