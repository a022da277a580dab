"""Non-negative-input percentile: raw bitcast keys read directly from x
(no moveaxis/keymap/materialization) with 16 separate f32 where-sums per
pass reduced over the natural axes. Compare vs the current unbatched path
on the mantis (1080, 1920, 10) stack."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from animal_vision_tpu.core import stats


def timeit(fn, *a, iters=20):
    y = fn(*a)
    _ = float(jnp.sum(y))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*a)
        _ = float(jnp.sum(y))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def _pct_nonneg(x, q: float, barrier: bool):
    """x >= 0 (all call sites: band maps / safe_norm outputs / clipped s).
    Keys are the raw f32 bits (order-preserving for non-negative floats;
    abs() normalizes -0.0). Reduction axes: all but the longest one, so
    per-partial counts stay far below 2^24 (exact in f32)."""
    n = int(x.size)
    v = (n - 1) * q / 100.0
    k0 = int(v)
    frac = v - k0
    xx = jnp.abs(x)
    if barrier:
        xx = jax.lax.optimization_barrier(xx)
    u = jax.lax.bitcast_convert_type(xx, jnp.uint32)
    # reduce over all axes except the largest (here axis 1, W=1920):
    # partials <= H*C = 10800 — exact integers in f32.
    axes = (0, 2)
    lo = jnp.uint32(0)
    nb = jnp.int32(0)
    for i in range(8):
        sh = jnp.uint32(28 - 4 * i)
        idx = (u - lo) >> sh
        sums = [
            jnp.sum(jnp.where(idx == jnp.uint32(b), 1.0, 0.0), axis=axes)
            for b in range(16)
        ]
        sums = list(jax.lax.optimization_barrier(tuple(sums)))
        hist = jnp.stack([jnp.sum(s.astype(jnp.int32)) for s in sums])
        cum = jnp.cumsum(hist)
        j = jnp.sum((cum <= k0 - nb).astype(jnp.int32))
        nb = nb + jnp.where(j > 0, cum[jnp.maximum(j - 1, 0)], 0)
        lo = lo + (j.astype(jnp.uint32) << sh)
    val0 = jax.lax.bitcast_convert_type(lo, jnp.float32)
    cnt0 = jnp.sum((u <= lo).astype(jnp.int32))
    bigger = jnp.where(u > lo, u, jnp.uint32(0xFFFFFFFF))
    mn = jnp.min(bigger)
    val1 = jax.lax.bitcast_convert_type(
        jnp.where(mn == jnp.uint32(0xFFFFFFFF), lo, mn), jnp.float32
    )
    val1 = jnp.where(cnt0 >= k0 + 2, val0, val1)
    if frac == 0.0 or k0 + 1 >= n:
        return val0
    return val0 + jnp.float32(frac) * (val1 - val0)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (1080, 1920, 10)).astype(np.float32))
    )
    f_cur = jax.jit(lambda t: stats._tpu_percentile_unbatched(t, 95.0))
    f_nb = jax.jit(lambda t: _pct_nonneg(t, 95.0, barrier=False))
    f_b = jax.jit(lambda t: _pct_nonneg(t, 95.0, barrier=True))
    y0 = f_cur(x)
    for name, fn in [("current", f_cur), ("nonneg", f_nb), ("nonneg+barrier", f_b)]:
        ms = timeit(fn, x)
        err = float(jnp.abs(fn(x) - y0))
        print(f"{name}: {ms:.3f} ms  err={err:.2e}", flush=True)




def _pct_general_inline(x, q: float):
    """Full signed order keymap computed inline (no moveaxis, no
    materialization) — keys fuse into each pass's reads."""
    n = int(x.size)
    v = (n - 1) * q / 100.0
    k0 = int(v)
    frac = v - k0
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    u = jnp.where(bits >> 31 == 0, bits | jnp.uint32(0x80000000), ~bits)
    axes = (0, 2) if x.ndim == 3 else tuple(range(x.ndim - 1))
    lo = jnp.uint32(0)
    nb = jnp.int32(0)
    for i in range(8):
        sh = jnp.uint32(28 - 4 * i)
        idx = (u - lo) >> sh
        sums = [
            jnp.sum(jnp.where(idx == jnp.uint32(b), 1.0, 0.0), axis=axes)
            for b in range(16)
        ]
        sums = list(jax.lax.optimization_barrier(tuple(sums)))
        hist = jnp.stack([jnp.sum(s.astype(jnp.int32)) for s in sums])
        cum = jnp.cumsum(hist)
        j = jnp.sum((cum <= k0 - nb).astype(jnp.int32))
        nb = nb + jnp.where(j > 0, cum[jnp.maximum(j - 1, 0)], 0)
        lo = lo + (j.astype(jnp.uint32) << sh)
    val0 = jnp.where(
        lo >> 31 != 0, lo & jnp.uint32(0x7FFFFFFF), ~lo
    )
    val0 = jax.lax.bitcast_convert_type(val0, jnp.float32)
    cnt0 = jnp.sum((u <= lo).astype(jnp.int32))
    bigger = jnp.where(u > lo, u, jnp.uint32(0xFFFFFFFF))
    mn = jnp.min(bigger)
    v1bits = jnp.where(mn >> 31 != 0, mn & jnp.uint32(0x7FFFFFFF), ~mn)
    val1 = jax.lax.bitcast_convert_type(v1bits, jnp.float32)
    val1 = jnp.where(cnt0 >= k0 + 2, val0, val1)
    if frac == 0.0 or k0 + 1 >= n:
        return val0
    return val0 + jnp.float32(frac) * (val1 - val0)


def main2():
    rng = np.random.default_rng(0)
    for tag, arr in {
        "uniform01 (1080,1920,10)": rng.uniform(0, 1, (1080, 1920, 10)),
        "signed (1080,1920,10)": rng.standard_normal((1080, 1920, 10)),
        "signed (1080,1920)": rng.standard_normal((1080, 1920)),
    }.items():
        x = jax.device_put(jnp.asarray(arr.astype(np.float32)))
        f_cur = jax.jit(lambda t: stats._tpu_percentile_unbatched(t, 95.0))
        f_gen = jax.jit(lambda t: _pct_general_inline(t, 95.0))
        y0 = f_cur(x)
        for name, fn in [("current", f_cur), ("general-inline", f_gen)]:
            ms = timeit(fn, x)
            err = float(jnp.abs(fn(x) - y0))
            print(f"{tag} {name}: {ms:.3f} ms  err={err:.2e}", flush=True)


if __name__ == "__main__":
    main2()
