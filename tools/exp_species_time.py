"""Time individual species (batch-8 1080p, bench.py methodology): chained
dispatches + 4-byte scalar sync. Args: species slugs (default: the round-3
floor targets cat / mantis_shrimp plus goldfish / kestrel context)."""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def time_chained(prog, frames, iters=30):
    out = prog(frames)
    _ = float(jnp.sum(out.astype(jnp.float32)[:1, :2, :2]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        y = frames
        for _ in range(iters):
            y = prog(y)
        _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
        best = min(best, (time.perf_counter() - t0) / (iters * frames.shape[0]))
    return best


def main():
    from animal_vision_tpu.species import get_animal

    names = sys.argv[1:] or ["cat", "mantis_shrimp", "goldfish", "kestrel"]
    rng = np.random.default_rng(0)
    frames = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(8, 1080, 1920, 3), dtype=np.uint8))
    )
    for name in names:
        animal = get_animal(name)
        prog = animal._program((1080, 1920, 3), np.uint8, batched=True)
        wrapped = jax.jit(lambda img, p=prog: p(img)[1])
        iters = 30 if name == "cat" else 10
        dt = time_chained(wrapped, frames, iters)
        print(f"{name}: {1.0 / dt:.1f} fps ({dt * 1e3:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
