"""Scratch: time the streak-class kernel on the real chip (ms/frame)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4


def time_chained(prog, frames, iters=40):
    out = prog(frames)
    _ = float(jnp.sum(out.astype(jnp.float32)[:1, :2, :2]))
    t0 = time.perf_counter()
    y = frames
    for _ in range(iters):
        y = prog(y)
    _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
    return (time.perf_counter() - t0) / (iters * frames.shape[0])


def main():
    from animal_vision_tpu.species import get_animal

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    frame = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(BATCH, h, w, 3), dtype=np.uint8))
    )
    for name in sys.argv[1:] or ["horse", "rabbit", "dog", "lion"]:
        animal = get_animal(name)
        prog = animal._program((h, w, 3), np.uint8, batched=True)
        wrapped = jax.jit(lambda img, p=prog: p(img)[1])
        t0 = time.perf_counter()
        dt = time_chained(wrapped, frame)
        print(f"{name}: {dt*1e3:.3f} ms/frame ({1/dt:.0f} fps)  [total incl compile {time.perf_counter()-t0:.1f}s]")


if __name__ == "__main__":
    main()
