"""Batched percentile strategies on the mantis-sized (8, 1080, 1920, 10)
stack: the current 4-packed-uint32 batched path vs lax.map of the fused
unbatched selection (XLA fuses the 8 sibling f32 counting reductions into
one sweep inside a scan body iff the fusion survives the scan)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from animal_vision_tpu.core import stats


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(y))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(y))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 1080, 1920, 10)).astype(np.float32))
    x = jax.device_put(x)

    f_cur = jax.jit(lambda t: stats._tpu_percentile_batched(t, 95.0))
    f_map = jax.jit(
        lambda t: jax.lax.map(lambda ti: stats._tpu_percentile_unbatched(ti, 95.0), t)
    )

    y0 = f_cur(x)
    for name, fn in [("batched-packed", f_cur), ("laxmap-fused", f_map)]:
        ms = timeit(fn, x)
        err = float(jnp.max(jnp.abs(fn(x) - y0)))
        print(f"{name}: {ms:.3f} ms  maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
