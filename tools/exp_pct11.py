"""Batched (B,128,X) axis-1 sibling reductions: do they fuse? Prototype the
batched kth-order-stat for a custom_vmap rule."""
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
B = 8
xb = jax.device_put(jnp.asarray(rng.random((B, 1080, 1920, 10), dtype=np.float32)))
_ = float(jnp.sum(xb[:1, :1, :1]))
N = 1080 * 1920 * 10
k0 = int((N - 1) * 0.95)


def batched_kth(vb):
    # compact per-frame keys: (B, H, W, C) -> (B, C, H, W) -> (B, N)
    u = stats._f32_to_order(jnp.moveaxis(vb, -1, 1).reshape(B, -1))
    g = jax.lax.optimization_barrier(u.reshape(B, 128, -1))
    lo = jnp.zeros((B,), jnp.uint32)
    nb = jnp.zeros((B,), jnp.int32)
    for i in range(8):
        sh = jnp.uint32(28 - 4 * i)
        idx = (g - lo[:, None, None]) >> sh
        wide = jnp.stack(
            [
                jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0), axis=1)
                for j in range(16)
            ]
        )  # (16, B, X)
        wide = jax.lax.optimization_barrier(wide)
        hist = jnp.sum(wide.astype(jnp.int32), axis=2)  # (16, B)
        cum = jnp.cumsum(hist, axis=0)  # (16, B)
        j = jnp.sum((cum <= (k0 - nb)[None, :]).astype(jnp.int32), axis=0)  # (B,)
        prev = jnp.where(
            j > 0,
            jnp.take_along_axis(cum, jnp.maximum(j - 1, 0)[None, :], axis=0)[0],
            0,
        )
        nb = nb + prev
        lo = lo + (j.astype(jnp.uint32) << sh)
    return lo


print(f"batched kth (B=8): {timeit(jax.jit(batched_kth), xb):.3f} ms", flush=True)


# same but reductions along the LAST axis: g (B, X, 128)? counts per frame
def batched_kth_lastax(vb):
    u = stats._f32_to_order(jnp.moveaxis(vb, -1, 1).reshape(B, -1))
    g = jax.lax.optimization_barrier(u.reshape(B, -1, 128))
    lo = jnp.zeros((B,), jnp.uint32)
    for i in range(2):
        sh = jnp.uint32(28 - 4 * i)
        idx = (g - lo[:, None, None]) >> sh
        wide = jnp.stack(
            [
                jnp.sum(jnp.where(idx == jnp.uint32(j), 1.0, 0.0), axis=2)
                for j in range(16)
            ]
        )
        wide = jax.lax.optimization_barrier(wide)
        hist = jnp.sum(wide.astype(jnp.int32), axis=2)
    return hist


print(f"2-pass lastax variant: {timeit(jax.jit(batched_kth_lastax), xb):.3f} ms", flush=True)
