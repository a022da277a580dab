"""Scratch: decompose the per-element cost of the fused nonuv kernels."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, B = 1080, 1920, 4
T = 40
N = H // T


def timeit(fn, x, iters=40):
    y = fn(x)
    _ = float(jnp.sum(y.astype(jnp.float32)[:1, :2, :2]))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jnp.sum(x.astype(jnp.float32)[:1, :2, :2]))
    return (time.perf_counter() - t0) / (iters * B) * 1e3


def make(kernel, n_extra_rows=0, **kw):
    def call(flat):
        return pl.pallas_call(
            functools.partial(kernel, **kw) if kw else kernel,
            grid=(N,),
            in_specs=[pl.BlockSpec((T, W * 3), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, W * 3), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W * 3), jnp.uint8),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(flat)

    return jax.jit(jax.vmap(call))


def k_pass(x_ref, o_ref):
    f = x_ref[...].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0)
    o_ref[...] = jnp.floor(f * 255.0 + 0.5).astype(jnp.int32).astype(jnp.uint8)


def _lin(f):
    return jnp.where(f <= 0.04045, f / 12.92, ((f + 0.055) / 1.055) ** 2.4)


def _enc(x):
    x = jnp.clip(x, 0.0, 1.0)
    s = jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)
    return jnp.floor(jnp.clip(s, 0, 1) * 255.0 + 0.5).astype(jnp.int32).astype(jnp.uint8)


def k_gamma(x_ref, o_ref):
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0), 0, 1)
    o_ref[...] = _enc(_lin(f))


def k_gamma_poly(x_ref, o_ref):
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0), 0, 1)
    # stand-in polynomial costs (deg-7 Horner each way)
    y = f
    acc = jnp.full_like(f, 0.01)
    for c in (0.1, -0.2, 0.3, -0.1, 0.2, 0.15, 0.4):
        acc = acc * y + c
    lin = jnp.where(f <= 0.04045, f / 12.92, acc)
    acc2 = jnp.full_like(lin, 0.02)
    for c in (0.2, -0.1, 0.25, -0.15, 0.3, 0.1, 0.5):
        acc2 = acc2 * lin + c
    s = jnp.where(lin <= 0.0031308, 12.92 * lin, acc2)
    o_ref[...] = jnp.floor(jnp.clip(s, 0, 1) * 255.0 + 0.5).astype(jnp.int32).astype(jnp.uint8)


def k_mix(x_ref, o_ref):
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0), 0, 1)
    lin = _lin(f)
    mod3 = jax.lax.broadcasted_iota(jnp.int32, lin.shape, 1) % 3
    out = jnp.zeros_like(lin)
    for c in range(3):
        row = jnp.zeros_like(lin)
        for c2 in range(3):
            shifted = lin if c2 == c else pltpu.roll(lin, (c - c2) % lin.shape[1], 1)
            row = row + (0.1 * c + 0.2 * c2) * shifted
        out = jnp.where(mod3 == c, row, out)
    o_ref[...] = _enc(out)


def k_taps(x_ref, o_ref, *, k):
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0), 0, 1)
    lin = _lin(f)
    acc = lin * 0.5
    for t in range(1, k):
        acc = acc + pltpu.roll(lin, 3 * t, 1) * (0.5 / k)
    o_ref[...] = _enc(acc)


def k_taps_slice(x_ref, o_ref, *, k):
    # taps as unaligned slices of a wider window (current streak style)
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * (1 / 255.0), 0, 1)
    lin = _lin(f)
    wlanes = lin.shape[1] - 3 * k
    acc = lin[:, 0:wlanes] * 0.5
    for t in range(1, k):
        acc = acc + lin[:, 3 * t : 3 * t + wlanes] * (0.5 / k)
    o_ref[:, 0:wlanes] = _enc(acc)
    o_ref[:, wlanes:] = jnp.zeros((o_ref.shape[0], 3 * k), jnp.uint8)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 256, size=(B, H, W * 3), dtype=np.uint8))
    )
    for name, fn in [
        ("passthrough(cast+scale)", make(k_pass)),
        ("+ gamma pows", make(k_gamma)),
        ("+ gamma poly7 (no pow)", make(k_gamma_poly)),
        ("+ mix 9 rolls", make(k_mix)),
        ("taps k=28 roll", make(k_taps, k=28)),
        ("taps k=12 roll", make(k_taps, k=12)),
        ("taps k=28 slice", make(k_taps_slice, k=28)),
    ]:
        print(f"{name}: {timeit(fn, x):.3f} ms/frame")


if __name__ == "__main__":
    main()

def dispatch_overhead():
    tiny = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1)
    y = f(tiny); _ = float(y[0, 0])
    t0 = time.perf_counter()
    for _ in range(100):
        y = f(y)
    _ = float(y[0, 0])
    print(f"dispatch overhead: {(time.perf_counter()-t0)/100*1e3:.3f} ms/call")
