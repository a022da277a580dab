"""The ravel of a minor-dim-10 (lane-padded) array is a catastrophic
relayout. Find the cheap path to a compact 1-D view."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from animal_vision_tpu.core import stats


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(jnp.ravel(jax.tree.leaves(y)[0]).astype(jnp.float32)[:1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(jnp.ravel(jax.tree.leaves(y)[0]).astype(jnp.float32)[:1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.random((1080, 1920, 10), dtype=np.float32)))
_ = float(jnp.sum(x[:1, :1]))
k0 = int((x.size - 1) * 0.95)

print(f"ravel:               {timeit(jax.jit(lambda v: v.ravel() * 1.0), x):.3f} ms", flush=True)
print(f"transpose(2,0,1):    {timeit(jax.jit(lambda v: v.transpose(2, 0, 1) * 1.0), x):.3f} ms", flush=True)
print(f"T+ravel:             {timeit(jax.jit(lambda v: v.transpose(2, 0, 1).ravel() * 1.0), x):.3f} ms", flush=True)
print(f"reshape (HW,10):     {timeit(jax.jit(lambda v: v.reshape(-1, 10) * 1.0), x):.3f} ms", flush=True)
print(f"(HW,10) T:           {timeit(jax.jit(lambda v: v.reshape(-1, 10).T * 1.0), x):.3f} ms", flush=True)

# native-layout histogram: no relayout, reductions over all 3 axes
def native_hist(v):
    u = stats._f32_to_order(v)
    idx = u >> jnp.uint32(28)
    return jnp.stack(
        [jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0)) for j in range(16)]
    )


print(f"native-layout hist:  {timeit(jax.jit(native_hist), x):.3f} ms", flush=True)

# kth on transposed-compact input
def kth_T(v):
    u = stats._f32_to_order(v.transpose(2, 0, 1).reshape(10 * 1080, 1920))
    return stats._kth_order_stat(u, k0)


print(f"kth via T:           {timeit(jax.jit(kth_T), x):.3f} ms", flush=True)
