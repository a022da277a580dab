"""Raw building blocks: what does a (128, X) -> (X,) reduction cost?"""
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
g128 = jax.device_put(jnp.asarray(gen.reshape(128, -1)))
gw = jax.device_put(jnp.asarray(gen.reshape(-1, 128)))
g1 = jax.device_put(jnp.asarray(gen))
gu = jax.device_put(jnp.asarray((gen * 4e9).astype(np.uint32).reshape(128, -1)))
_ = float(jnp.sum(g128[:1, :1]))

print(f"sum (128,X) f32 ax0 -> (X,):  {timeit(jax.jit(lambda v: jnp.sum(v, axis=0)), g128):.3f} ms", flush=True)
print(f"sum (128,X) u32 ax0 -> (X,):  {timeit(jax.jit(lambda v: jnp.sum(v, axis=0)), gu):.3f} ms", flush=True)
print(f"sum (X,128) f32 ax1 -> (X,):  {timeit(jax.jit(lambda v: jnp.sum(v, axis=1)), gw):.3f} ms", flush=True)
print(f"sum all f32 -> scalar:        {timeit(jax.jit(lambda v: jnp.sum(v)), g128):.3f} ms", flush=True)
print(f"elementwise y=2x+1 (128,X):   {timeit(jax.jit(lambda v: v * 2 + 1), g128):.3f} ms", flush=True)
print(f"four sums of same (128,X):    {timeit(jax.jit(lambda v: [jnp.sum(v*c, axis=0) for c in (1.,2.,3.,4.)]), g128):.3f} ms", flush=True)

# reshape (128, X) -> (128, X//128, 128) then two-step reduce
def twostep(v):
    x3 = v.reshape(128, -1, 128)
    return jnp.sum(x3, axis=0)

print(f"sum (128,X/128,128) ax0:      {timeit(jax.jit(twostep), g128):.3f} ms", flush=True)

def twostep2(v):
    x3 = v.reshape(-1, 128, 1296)   # (125, 128, 1296)? N=20736000 = 128*162000
    return jnp.sum(x3, axis=1)

N2 = N // 128
print(f"X={N2}", flush=True)

# (8, 128, X/8...) style: reduce over a middle axis
def mid(v):
    x3 = v.reshape(128, 1250, -1)
    return jnp.sum(x3, axis=(0, 1))

print(f"sum (128,1250,Xs) ax01:       {timeit(jax.jit(mid), g128):.3f} ms", flush=True)
