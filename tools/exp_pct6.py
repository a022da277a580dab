"""More candidates: single-kernel multi-counter reductions + batch-8 vmap
costs (the mantis operating point is vmapped batch 8)."""
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
xb = jax.device_put(jnp.asarray(rng.random((8, 1080, 1920, 10), dtype=np.float32)))
_ = float(jnp.sum(x[:1, :1]))


def stacked4(v):
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    idx = g >> jnp.uint32(28)
    lo2 = idx & 3
    base = jnp.where(
        lo2 < 2,
        jnp.where(lo2 == 0, 1.0, 256.0),
        jnp.where(lo2 == 2, 65536.0, 16777216.0),
    )
    hi = idx >> 2
    arr = jnp.stack([
        jnp.where(hi == jnp.uint32(w), base, 0.0) for w in range(4)
    ])  # (4, 128, X) -- fused into the reduce?
    return jnp.sum(arr, axis=1)


print(f"stacked (4,128,X)->ax1:   {timeit(jax.jit(stacked4), x):.3f} ms", flush=True)


def variadic(v):
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    idx = g >> jnp.uint32(28)
    lo2 = idx & 3
    base = jnp.where(
        lo2 < 2,
        jnp.where(lo2 == 0, 1.0, 256.0),
        jnp.where(lo2 == 2, 65536.0, 16777216.0),
    )
    hi = idx >> 2
    ops = tuple(jnp.where(hi == jnp.uint32(w), base, 0.0) for w in range(4))

    def red(accs, vals):
        return tuple(a + b for a, b in zip(accs, vals))

    return jax.lax.reduce(ops, tuple(jnp.float32(0.0) for _ in range(4)), red, (0,))


print(f"variadic lax.reduce:      {timeit(jax.jit(variadic), x):.3f} ms", flush=True)

# matmul counting: ones (1,128) @ where(...) per word, MXU contraction
def mmcount(v):
    u = stats._f32_to_order(v.ravel())
    g = u.reshape(128, -1)
    idx = g >> jnp.uint32(28)
    lo2 = idx & 3
    base = jnp.where(
        lo2 < 2,
        jnp.where(lo2 == 0, 1.0, 256.0),
        jnp.where(lo2 == 2, 65536.0, 16777216.0),
    )
    hi = idx >> 2
    ones = jnp.ones((1, 128), jnp.float32)
    outs = [
        jnp.dot(ones, jnp.where(hi == jnp.uint32(w), base, 0.0),
                preferred_element_type=jnp.float32)
        for w in range(4)
    ]
    return outs


print(f"matmul-count x4:          {timeit(jax.jit(mmcount), x):.3f} ms", flush=True)

# batch-8 vmapped current percentile (the species operating point)
pb = jax.jit(jax.vmap(lambda v: stats.percentile(v, 95.0)))
print(f"vmap8 current percentile: {timeit(pb, xb):.3f} ms  (/8 = per frame)", flush=True)
