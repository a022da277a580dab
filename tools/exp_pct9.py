"""Why is the f32-counting radix slow in situ but fast in isolation?
Candidates: dynamic lo chain, the stack, the barrier, cumsum/scalar glue."""
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
N = 1080 * 1920 * 10
gen = (rng.random(N, dtype=np.float32) * 4e9).astype(np.uint32)
gu = jax.device_put(jnp.asarray(gen.reshape(128, -1)))
_ = float(jnp.sum(gu[:1, :1].astype(jnp.float32)))
k0 = int((N - 1) * 0.95)


def pass1_list(g):
    idx = g >> jnp.uint32(28)
    return [jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0), axis=0) for j in range(16)]


print(f"A list of 16 (static sh):      {timeit(jax.jit(pass1_list), gu):.3f} ms", flush=True)


def pass1_stack(g):
    idx = g >> jnp.uint32(28)
    return jnp.stack(
        [jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0), axis=0) for j in range(16)]
    )


print(f"B stacked 16:                  {timeit(jax.jit(pass1_stack), gu):.3f} ms", flush=True)


def pass1_full(g):
    idx = g >> jnp.uint32(28)
    wide = jnp.stack(
        [jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0), axis=0) for j in range(16)]
    )
    wide = jax.lax.optimization_barrier(wide)
    return jnp.sum(wide.astype(jnp.int32), axis=1)


print(f"C stack+barrier+int finish:    {timeit(jax.jit(pass1_full), gu):.3f} ms", flush=True)


def pass1_dynlo(g):
    lo = (jnp.sum(g[:1, :1]) * jnp.uint32(0))  # dynamic zero scalar
    idx = (g - lo) >> jnp.uint32(28)
    wide = jnp.stack(
        [jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0), axis=0) for j in range(16)]
    )
    wide = jax.lax.optimization_barrier(wide)
    return jnp.sum(wide.astype(jnp.int32), axis=1)


print(f"D + dynamic lo:                {timeit(jax.jit(pass1_dynlo), gu):.3f} ms", flush=True)


def two_pass(g):
    h1 = pass1_dynlo(g)
    cum = jnp.cumsum(h1)
    j = jnp.sum((cum <= k0).astype(jnp.int32)).astype(jnp.uint32)
    lo = j << 28
    idx = (g - lo) >> jnp.uint32(24)
    idx = idx & jnp.uint32(15)
    wide = jnp.stack(
        [jnp.sum(jnp.where(idx == jnp.uint32(j2), 1.0, 0.0), axis=0) for j2 in range(16)]
    )
    wide = jax.lax.optimization_barrier(wide)
    return jnp.sum(wide.astype(jnp.int32), axis=1)


print(f"E two chained passes:          {timeit(jax.jit(two_pass), gu):.3f} ms", flush=True)

full = jax.jit(lambda g: stats._kth_order_stat(g, k0))
print(f"F current _kth_order_stat:     {timeit(full, gu):.3f} ms", flush=True)
