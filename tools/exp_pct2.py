"""Micro-bench the exact TPU percentile and restructuring candidates at the
mantis operating point: (1080, 1920, 10) f32 in [0, 1]."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from animal_vision_tpu.core import stats


def timeit(fn, *args, iters=30):
    y = fn(*args)
    _ = float(jnp.sum(jnp.ravel(jax.tree.leaves(y)[0])[:1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(jnp.ravel(jax.tree.leaves(y)[0])[:1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


rng = np.random.default_rng(0)
x = jax.device_put(jnp.asarray(rng.random((1080, 1920, 10), dtype=np.float32)))
xs = jax.device_put(jnp.asarray(rng.random((270, 480, 10), dtype=np.float32)))
_ = float(jnp.sum(x[:1, :1]))

full = jax.jit(lambda v: stats.percentile(v, 95.0))
print(f"percentile full-res: {timeit(full, x):.3f} ms", flush=True)
print(f"percentile low-res:  {timeit(full, xs):.3f} ms", flush=True)

# order-map + k-th order stat only (skip val1 sweeps)
def p_noval1(v):
    u = stats._f32_to_order(v.ravel())
    n = int(v.size)
    k0 = int((n - 1) * 0.95)
    return stats._order_to_f32(stats._kth_order_stat(u, k0))

print(f"kth-only (no val1):  {timeit(jax.jit(p_noval1), x):.3f} ms", flush=True)

# single radix pass cost
def one_pass(v):
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    idx = g >> jnp.uint32(28)
    base = jnp.uint32(1) << ((idx & 3) << 3)
    hi = idx >> 2
    packed = [
        jnp.sum(jnp.where(hi == jnp.uint32(w), base, jnp.uint32(0)), axis=0,
                dtype=jnp.uint32)
        for w in range(4)
    ]
    return sum(jnp.sum(p) for p in packed)

print(f"one radix pass:      {timeit(jax.jit(one_pass), x):.3f} ms", flush=True)

# plain compare+count sweep (the val1 style)
def cnt(v):
    u = stats._f32_to_order(v.ravel())
    return jnp.sum((u <= jnp.uint32(0x9000000)).astype(jnp.int32))

print(f"one compare sweep:   {timeit(jax.jit(cnt), x):.3f} ms", flush=True)

# f32 threshold-count sweep (no order map)
def cntf(v):
    return jnp.sum((v <= 0.5).astype(jnp.float32))

print(f"one f32 cmp sweep:   {timeit(jax.jit(cntf), x):.3f} ms", flush=True)

# 15-threshold packed count in f32 (value-space 16-ary bisection pass)
def pass_f32(v):
    f = v.ravel().reshape(128, -1)
    acc = jnp.zeros((15, f.shape[1]), jnp.float32)
    ths = jnp.linspace(0.0625, 0.9375, 15, dtype=jnp.float32)
    acc = jnp.sum(
        (f[None, :, :] <= ths[:, None, None]).astype(jnp.float32), axis=1
    )
    return jnp.sum(acc, axis=1)

print(f"15-threshold pass:   {timeit(jax.jit(pass_f32), x):.3f} ms", flush=True)
