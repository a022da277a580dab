"""Scratch: pass-B optimization variants at L0 (1088x1920x31).

Knobs: matmul precision (highest / dot3 / default), combined
V|attnproj matmul, tile height T, dw3 via roll vs concat.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

H, W, C = 1088, 1920, 31


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(y[:1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    _ = float(jnp.sum(y[:1, :1]))
    return (time.perf_counter() - t0) / iters * 1e3


def _erf(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))


def make_dot(mode):
    if mode == "highest":
        return lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
    if mode == "default":
        return lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    def dot3(a, b):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
        out = out + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
        return out + jnp.dot(al, bh, preferred_element_type=jnp.float32)

    return dot3


def _dw3(src, k9):
    rr = src.shape[0] - 2
    w = src.shape[1]
    ch = src.shape[2]
    zeros = jnp.zeros((rr, 1, ch), src.dtype)
    out = None
    for dy in range(3):
        band = src[dy : dy + rr]
        acc = band * k9[dy * 3 + 1]
        left = jnp.concatenate([zeros, band[:, : w - 1]], axis=1)
        right = jnp.concatenate([band[:, 1:], zeros], axis=1)
        acc = acc + k9[dy * 3 + 0] * left + k9[dy * 3 + 2] * right
        out = acc if out is None else out + acc
    return out


def kernel(x_ref, wva_ref, bp_ref, pk0_ref, pk2_ref, lns_ref, lnb_ref,
           w0_ref, dwk_ref, w4_ref, o_ref, a_scr, b_scr, *, t, dot, combined):
    i = pl.program_id(0)
    cur = x_ref[...]
    ti = i - 1
    win = jnp.concatenate([b_scr[...], a_scr[...], cur[:3]], axis=0)
    gi = ti * t - 3 + jax.lax.broadcasted_iota(jnp.int32, (t + 6, 1, 1), 0)
    win = jnp.where((gi >= 0) & (gi < H), win, 0.0)
    b_scr[...] = a_scr[t - 3 :]
    a_scr[...] = cur

    if combined:
        both = dot(win.reshape((t + 6) * W, C), wva_ref[...])  # (.., 2C)
        b3 = both.reshape(t + 6, W, 2 * C)
        v3 = b3[:, :, :C]
        ap3 = b3[2 : t + 4, :, C:]
    else:
        v3 = dot(win.reshape((t + 6) * W, C), wva_ref[:, :C]).reshape(t + 6, W, C)
        oa = dot(v3[2 : t + 4].reshape((t + 2) * W, C), wva_ref[:C, C:])
        ap3 = oa.reshape(t + 2, W, C)
    g1 = _gelu(_dw3(v3, pk0_ref[...]))
    gig = ti * t - 2 + jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0)
    g1 = jnp.where((gig >= 0) & (gig < H), g1, 0.0)
    p = _dw3(g1, pk2_ref[...])
    res1 = ap3 + bp_ref[0] + p + win[2 : t + 4]
    mu = jnp.mean(res1, axis=-1, keepdims=True)
    var = jnp.mean((res1 - mu) ** 2, axis=-1, keepdims=True)
    y = (res1 - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]
    hidden = _gelu(dot(y.reshape((t + 2) * W, C), w0_ref[...])).reshape(t + 2, W, 4 * C)
    gih = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    hidden = jnp.where((gih >= 0) & (gih < H), hidden, 0.0)
    hd = _gelu(_dw3(hidden, dwk_ref[...]))
    out = dot(hd.reshape(t * W, 4 * C), w4_ref[...]).reshape(t, W, C)
    o_ref[...] = out + res1[1 : t + 1]


def build(t, mode, combined):
    dot = make_dot(mode)
    n = -(-H // t)

    def call(x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4):
        return pl.pallas_call(
            functools.partial(kernel, t=t, dot=dot, combined=combined),
            grid=(n + 1,),
            in_specs=[
                pl.BlockSpec((t, W, C), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
                pl.BlockSpec(tuple(wva.shape), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((9, C), lambda i: (0, 0)),
                pl.BlockSpec((9, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((C, 4 * C), lambda i: (0, 0)),
                pl.BlockSpec((9, 4 * C), lambda i: (0, 0)),
                pl.BlockSpec((4 * C, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((t, W, C), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((t, W, C), jnp.float32),
                pltpu.VMEM((3, W, C), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=115 * 1024 * 1024),
        )(x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4).reshape(H, W * C)

    return jax.jit(call)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32) * 0.3)
    def mk(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)
    wva_comb = mk(C, 2 * C)   # [wv | wv@abd@wp]
    wva_sep = mk(2 * C, 2 * C)  # [:, :C]=wv ; [:C, C:]=abd@wp stand-in
    bp, pk0, pk2 = mk(1, C), mk(9, C), mk(9, C)
    lns, lnb = jnp.ones((1, C)), jnp.zeros((1, C))
    w0, dwk, w4 = mk(C, 4 * C), mk(9, 4 * C), mk(4 * C, C)

    for t, mode, combined in [
        (8, "highest", False),
        (8, "highest", True),
        (8, "dot3", True),
        (8, "default", True),
        (16, "dot3", True),
        (16, "default", True),
        (24, "default", True),
    ]:
        wva = wva_comb if combined else wva_sep
        try:
            fn = build(t, mode, combined)
            ms = timeit(fn, x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4)
            print(f"t={t:2d} {mode:8s} combined={combined}: {ms:6.2f} ms")
        except Exception as e:
            print(f"t={t:2d} {mode:8s} combined={combined}: FAILED {type(e).__name__}: {str(e)[:200]}")
        sys.stdout.flush()


if __name__ == "__main__" and False:
    main()


def kernel_abl(x_ref, wva_ref, bp_ref, pk0_ref, pk2_ref, lns_ref, lnb_ref,
               w0_ref, dwk_ref, w4_ref, o_ref, a_scr, b_scr, *, t, dot, gelu_mode, dw_mode):
    from jax.experimental.pallas import tpu as pltpu2
    i = pl.program_id(0)
    cur = x_ref[...]
    ti = i - 1
    win = jnp.concatenate([b_scr[...], a_scr[...], cur[:3]], axis=0)
    gi = ti * t - 3 + jax.lax.broadcasted_iota(jnp.int32, (t + 6, 1, 1), 0)
    win = jnp.where((gi >= 0) & (gi < H), win, 0.0)
    b_scr[...] = a_scr[t - 3 :]
    a_scr[...] = cur

    if gelu_mode == "exact":
        g = _gelu
    elif gelu_mode == "cheap":
        # one-exp logistic: gelu(x) ~= x * sigmoid(1.702x) -- NOT parity, cost probe
        g = lambda v: v / (1.0 + jnp.exp(-1.702 * v))
    else:
        g = lambda v: v

    if dw_mode == "nodw":
        dw3 = lambda src, k9: src[1 : src.shape[0] - 1] * k9[4]
    elif dw_mode == "roll":
        def dw3(src, k9):
            rr = src.shape[0] - 2
            w = src.shape[1]
            col = jax.lax.broadcasted_iota(jnp.int32, (rr, w, src.shape[2]), 1)
            out = None
            for dy in range(3):
                band = src[dy : dy + rr]
                acc = band * k9[dy * 3 + 1]
                left = pltpu2.roll(band, 1 % w, 1)   # src[x-1] circular
                right = pltpu2.roll(band, (w - 1) % w, 1)
                left = jnp.where(col == 0, 0.0, left)
                right = jnp.where(col == w - 1, 0.0, right)
                acc = acc + k9[dy * 3 + 0] * left + k9[dy * 3 + 2] * right
                out = acc if out is None else out + acc
            return out
    else:
        dw3 = _dw3

    both = dot(win.reshape((t + 6) * W, C), wva_ref[...])
    b3 = both.reshape(t + 6, W, 2 * C)
    v3 = b3[:, :, :C]
    ap3 = b3[2 : t + 4, :, C:]
    g1 = g(dw3(v3, pk0_ref[...]))
    gig = ti * t - 2 + jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0)
    g1 = jnp.where((gig >= 0) & (gig < H), g1, 0.0)
    p = dw3(g1, pk2_ref[...])
    res1 = ap3 + bp_ref[0] + p + win[2 : t + 4]
    mu = jnp.mean(res1, axis=-1, keepdims=True)
    var = jnp.mean((res1 - mu) ** 2, axis=-1, keepdims=True)
    y = (res1 - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]
    hidden = g(dot(y.reshape((t + 2) * W, C), w0_ref[...])).reshape(t + 2, W, 4 * C)
    gih = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    hidden = jnp.where((gih >= 0) & (gih < H), hidden, 0.0)
    hd = g(dw3(hidden, dwk_ref[...]))
    out = dot(hd.reshape(t * W, 4 * C), w4_ref[...]).reshape(t, W, C)
    o_ref[...] = out + res1[1 : t + 1]


def build_abl(t, gelu_mode, dw_mode):
    dot = make_dot("default")
    n = -(-H // t)

    def call(x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4):
        return pl.pallas_call(
            functools.partial(kernel_abl, t=t, dot=dot, gelu_mode=gelu_mode, dw_mode=dw_mode),
            grid=(n + 1,),
            in_specs=[
                pl.BlockSpec((t, W, C), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
                pl.BlockSpec((C, 2 * C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((9, C), lambda i: (0, 0)),
                pl.BlockSpec((9, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((C, 4 * C), lambda i: (0, 0)),
                pl.BlockSpec((9, 4 * C), lambda i: (0, 0)),
                pl.BlockSpec((4 * C, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((t, W, C), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, W, C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((t, W, C), jnp.float32),
                pltpu.VMEM((3, W, C), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=115 * 1024 * 1024),
        )(x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4).reshape(H, W * C)

    return jax.jit(call)


def main_abl():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32) * 0.3)
    def mk(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)
    wva = mk(C, 2 * C)
    bp, pk0, pk2 = mk(1, C), mk(9, C), mk(9, C)
    lns, lnb = jnp.ones((1, C)), jnp.zeros((1, C))
    w0, dwk, w4 = mk(C, 4 * C), mk(9, 4 * C), mk(4 * C, C)
    for tt, gm, dm in [(16, "exact", "concat"), (24, "exact", "concat"), (32, "exact", "concat"), (16, "cheap", "concat")]:
        try:
            fn = build_abl(tt, gm, dm)
            ms = timeit(fn, x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4)
            print(f"t={tt} gelu={gm:6s} dw={dm:6s}: {ms:6.2f} ms")
        except Exception as e:
            print(f"t={tt} gelu={gm:6s} dw={dm:6s}: FAILED {str(e)[:150]}")
        sys.stdout.flush()

if __name__ == "__main__":
    main_abl()
