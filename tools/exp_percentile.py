"""Time the exact percentile reduction alone on a mantis-sized band stack
(21M f32 elements), chained-dispatch methodology. Prints ms per call.

The output feeds the next call's input scaling so dispatches chain without
a sync; the percentile scalar itself is the 4-byte fetch.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from animal_vision_tpu.core import stats


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.random((1080, 1920, 10), np.float32)))

    @jax.jit
    def prog(arr, bias):
        # bias keeps each link of the chain data-dependent on the last
        return stats.percentile(arr + bias, 95.0)

    p = prog(x, jnp.float32(0.0))
    ref = float(np.percentile(np.asarray(x), 95.0))
    got = float(p)
    print(f"value check: got {got!r} ref {ref!r} (diff {abs(got - ref):.3g})")

    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        b = jnp.float32(0.0)
        for _ in range(iters):
            b = prog(x, b * 1e-9)
        _ = float(b)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"percentile(21M): {best * 1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
