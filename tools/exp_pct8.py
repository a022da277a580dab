"""Do f32 where-sums with a shared nontrivial producer fuse? Find the
fusion-breaking ingredient of the radix pass."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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
gen = rng.random(N, dtype=np.float32)
g = jax.device_put(jnp.asarray(gen.reshape(128, -1)))
gu = jax.device_put(jnp.asarray((gen * 4e9).astype(np.uint32).reshape(128, -1)))
_ = float(jnp.sum(g[:1, :1]))


def f32_4sums(v):
    idx = jnp.floor(v * 16.0)  # 0..15 as f32
    hi = jnp.floor(idx * 0.25)
    lo2 = idx - 4.0 * hi
    base = jnp.where(
        lo2 < 2.0,
        jnp.where(lo2 == 0.0, 1.0, 256.0),
        jnp.where(lo2 == 2.0, 65536.0, 16777216.0),
    )
    return [
        jnp.sum(jnp.where(hi == float(w), base, 0.0), axis=0) for w in range(4)
    ]


print(f"f32 idx, 4 packed where-sums: {timeit(jax.jit(f32_4sums), g):.3f} ms", flush=True)


def f32_16sums(v):
    idx = jnp.floor(v * 16.0)
    return [jnp.sum(jnp.where(idx == float(w), 1.0, 0.0), axis=0) for w in range(16)]


print(f"f32 idx, 16 plain where-sums: {timeit(jax.jit(f32_16sums), g):.3f} ms", flush=True)


def f32_16scalars(v):
    idx = jnp.floor(v * 16.0)
    return [jnp.sum(jnp.where(idx == float(w), 1.0, 0.0)) for w in range(16)]


print(f"f32 idx, 16 SCALAR sums:      {timeit(jax.jit(f32_16scalars), g):.3f} ms", flush=True)


def u32_4sums_scalarout(v):
    idx = v >> jnp.uint32(28)
    lo2 = idx & 3
    base = jnp.where(
        lo2 < 2,
        jnp.where(lo2 == 0, 1.0, 256.0),
        jnp.where(lo2 == 2, 65536.0, 16777216.0),
    )
    hi = idx >> 2
    return [jnp.sum(jnp.where(hi == jnp.uint32(w), base, 0.0)) for w in range(4)]


print(f"u32 idx, 4 f32 SCALAR sums:   {timeit(jax.jit(u32_4sums_scalarout), gu):.3f} ms", flush=True)


def u32_16scalars(v):
    idx = (v >> jnp.uint32(28)).astype(jnp.int32)
    return [jnp.sum(jnp.where(idx == w, 1.0, 0.0)) for w in range(16)]


print(f"u32 idx, 16 f32 SCALAR sums:  {timeit(jax.jit(u32_16scalars), gu):.3f} ms", flush=True)


def u32_hist_dot(v):
    # all 16 counts via one-hot f32 + single sum over rows AND gather axis
    idx = (v >> jnp.uint32(28)).astype(jnp.int32)
    oh = (idx[:, :, None] == jnp.arange(16)).astype(jnp.float32)
    return jnp.sum(oh, axis=(0, 1))


print(f"u32 one-hot (128,X,16) sum:   {timeit(jax.jit(u32_hist_dot), gu):.3f} ms", flush=True)
