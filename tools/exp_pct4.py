"""Bisect WITHIN one radix pass: where do 14 ms/pass go?"""
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


def pass_packed(v, dyn_lo):
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    lo = jnp.uint32(dyn_lo)
    idx = (g - lo) >> jnp.uint32(28)
    lo2 = idx & 3
    base = jnp.where(
        lo2 < 2,
        jnp.where(lo2 == 0, jnp.uint32(1), jnp.uint32(256)),
        jnp.where(lo2 == 2, jnp.uint32(65536), jnp.uint32(1 << 24)),
    )
    hi = idx >> 2
    return [
        jnp.sum(jnp.where(hi == jnp.uint32(w), base, jnp.uint32(0)), axis=0,
                dtype=jnp.uint32)
        for w in range(4)
    ]


print(f"A packed only (static lo): {timeit(jax.jit(lambda v: pass_packed(v, 0)), x):.3f} ms", flush=True)


def with_hist(v):
    packed = jax.lax.optimization_barrier(tuple(pass_packed(v, 0)))
    return jnp.stack([
        jnp.sum(((packed[j >> 2] >> (8 * (j & 3))) & 0xFF).astype(jnp.int32))
        for j in range(16)
    ])


print(f"B packed+hist:             {timeit(jax.jit(with_hist), x):.3f} ms", flush=True)


def with_scalar_chain(v):
    hist = with_hist(v)
    cum = jnp.cumsum(hist)
    j = jnp.sum((cum <= k0).astype(jnp.int32))
    return j


print(f"C packed+hist+scalars:     {timeit(jax.jit(with_scalar_chain), x):.3f} ms", flush=True)


def dyn_lo_pass(v):
    # lo depends on a (tiny) data-dependent value -> dynamic scalar
    dyn = jnp.uint32(jnp.sum(v[:1, :1, :1]).astype(jnp.uint32) * 0)
    packed = pass_packed(v, 0)
    # recompute with dynamic lo
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    idx = (g - dyn) >> jnp.uint32(24)
    return jnp.sum(jnp.where(idx & 15 == 0, jnp.uint32(1), jnp.uint32(0)))


print(f"D one dyn-lo pass:         {timeit(jax.jit(dyn_lo_pass), x):.3f} ms", flush=True)


def two_passes_chained(v):
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    h1 = with_hist(v)
    cum = jnp.cumsum(h1)
    j = jnp.sum((cum <= k0).astype(jnp.int32)).astype(jnp.uint32)
    lo = j << 28  # dynamic scalar now
    idx = (g - lo) >> jnp.uint32(24)
    lo2 = idx & 3
    base = jnp.where(
        lo2 < 2,
        jnp.where(lo2 == 0, jnp.uint32(1), jnp.uint32(256)),
        jnp.where(lo2 == 2, jnp.uint32(65536), jnp.uint32(1 << 24)),
    )
    hi = (idx >> 2) & 3
    packed = jax.lax.optimization_barrier(tuple(
        jnp.sum(jnp.where(hi == jnp.uint32(w), base, jnp.uint32(0)), axis=0,
                dtype=jnp.uint32)
        for w in range(4)
    ))
    return jnp.stack([
        jnp.sum(((packed[j2 >> 2] >> (8 * (j2 & 3))) & 0xFF).astype(jnp.int32))
        for j2 in range(16)
    ])


print(f"E two chained passes:      {timeit(jax.jit(two_passes_chained), x):.3f} ms", flush=True)

full = jax.jit(lambda v: stats.percentile(v, 95.0))
print(f"F full percentile:         {timeit(full, x):.3f} ms", flush=True)
