"""Does the v5e VPU run bf16 elementwise at 2x f32 rate? (VERDICT round-4
next #2 candidate: 'bf16 VPU elementwise with f32 accumulation'.)

Times a pure-VPU Pallas kernel (the fused-MSAB gelu polynomial + a dw3-like
madd chain) on the same element count in f32 vs bf16, chained dispatches.
Also times a reduced-degree gelu (deg-7, clip |x|<=4) as the cheaper-poly
candidate.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animal_vision_tpu.ops.fused_msab import _gelu, _GELU_COEF
from animal_vision_tpu.utils.timing import log

H, W = 4096, 512  # 2M elements x 128 lanes would be huge; use (4096, 512)


def _gelu7(x):
    # deg-7 placeholder with the same structure (even/odd over w=v*v),
    # coefficient values don't matter for timing
    C = _GELU_COEF
    xc = jnp.clip(x, -4.0, 4.0)
    v = xc * xc * np.float32(1.0 / 8.0) - 1.0
    w = v * v
    ge = (C[4] * w + C[2]) * w + C[0]
    go = (C[5] * w + C[3]) * w + C[1]
    return x * (0.5 + xc * (ge + v * go))


def make_kernel(fn, reps):
    def kernel(x_ref, o_ref):
        y = x_ref[...]
        for _ in range(reps):
            y = fn(y).astype(y.dtype)
        o_ref[...] = y

    return kernel


def bench(fn, dtype, reps=64, iters=30, tag=""):
    x = jnp.asarray(np.random.default_rng(0).random((H, W), np.float32) * 4 - 2, dtype)
    prog = jax.jit(
        lambda t: pl.pallas_call(
            make_kernel(fn, reps),
            out_shape=jax.ShapeDtypeStruct((H, W), dtype),
            in_specs=[pl.BlockSpec((512, W), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((512, W), lambda i: (i, 0)),
            grid=(H // 512,),
        )(t)
    )
    y = prog(x)
    _ = float(jnp.sum(y[:2, :2].astype(jnp.float32)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        z = x
        for _ in range(iters):
            z = prog(z)
        _ = float(jnp.sum(z[:2, :2].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    per_elem_ns = best / (H * W * reps) * 1e9
    print(f"{tag} [{dtype.__name__}]: {best*1e3:.3f} ms/call, {per_elem_ns:.3f} ns/elem-app", flush=True)
    return best


def madd3(y):
    # dw3-like: 9 madds + 2 sublane shifts
    a = jnp.concatenate([y[1:], y[:1]], axis=0)
    b = jnp.concatenate([y[-1:], y[:-1]], axis=0)
    return (
        y * 1.1 + a * 0.9 + b * 0.8
        + y * 0.7 + a * 0.6 + b * 0.5
        + y * 0.4 + a * 0.3 + b * 0.2
    )


if __name__ == "__main__":
    for dt in (jnp.float32, jnp.bfloat16):
        bench(_gelu, dt, tag="gelu_deg11")
        bench(_gelu7, dt, tag="gelu_deg7")
        bench(madd3, dt, reps=32, tag="madd3x3")
        bench(lambda v: v * 1.0001 + 0.0001, dt, reps=256, tag="single_madd")
