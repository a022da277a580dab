"""Pass-B carry ablation: replace the rolling VMEM carry (one (T,Wq,PC)
copy + one 3-row copy per grid step — the ~2.6 ms/level 'copy floor' in
the README breakdown) with THREE lagged input refs (blocks i, i-1, i-2)
and slice the halo in-kernel. Pass B is VPU-bound, so the 2 extra block
fetches hide under compute while the VMEM copies disappear."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from animal_vision_tpu.ops import fused_msab as F


def timeit(fn, *args, iters=20):
    y = fn(*args)
    _ = float(jnp.sum(y[:1, :1]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(y[:1, :1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def _nocarry_kernel(
    x2_ref, x1_ref, x0_ref, m0_ref, wa_ref, bp_ref, m2_ref, mavg_ref,
    lns_ref, lnb_ref, w0_ref, dwk_ref, w4_ref, b_ref, o_ref,
    *, t, wq_n, c, p, h,
):
    pc = p * c
    c4 = 4 * c
    i = pl.program_id(0)
    lo, hi = b_ref[0, 0], b_ref[0, 1]
    ti = i - 1
    win = jnp.concatenate(
        [x2_ref[t - 3 :], x1_ref[...], x0_ref[:3]], axis=0
    )  # (T+6, Wq, PC): block i-2 tail / block i-1 / block i head
    gi = ti * t - 3 + jax.lax.broadcasted_iota(jnp.int32, (t + 6, 1, 1), 0)
    win = jnp.where((gi >= lo) & (gi < hi), win, 0.0)

    nbrw = F._nbr(win)
    g1in = None
    for dy in range(3):
        band = nbrw[dy : dy + t + 4]
        piece = F._dot(band.reshape((t + 4) * wq_n, 3 * pc), m0_ref[dy])
        g1in = piece if g1in is None else g1in + piece
    g1 = F._gelu(g1in.reshape(t + 4, wq_n, pc))
    gig = ti * t - 2 + jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0)
    g1 = jnp.where((gig >= lo) & (gig < hi), g1, 0.0)
    nbrg = F._nbr(g1)
    pos = None
    for dy in range(3):
        band = nbrg[dy : dy + t + 2]
        piece = F._dot(band.reshape((t + 2) * wq_n, 3 * pc), m2_ref[dy])
        pos = piece if pos is None else pos + piece
    pos = pos.reshape(t + 2, wq_n, pc)

    flat_c = win[2 : t + 4].reshape((t + 2) * wq_n, pc)
    attnout = F._dot(flat_c, wa_ref[...]).reshape(t + 2, wq_n, pc)
    res1 = attnout + bp_ref[0] + pos + win[2 : t + 4]

    r2 = res1.reshape((t + 2) * wq_n, pc)
    mu = F._dot(r2, mavg_ref[...])
    xc = r2 - mu
    var = F._dot(xc * xc, mavg_ref[...])
    y = xc * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]

    gih = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    hmask = (gih >= lo) & (gih < hi)
    hs = []
    for po in range(p):
        hp = F._gelu(F._dot(y, w0_ref[po])).reshape(t + 2, wq_n, c4)
        hs.append(jnp.where(hmask, hp, 0.0))

    def shl(a):
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

    def shr(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)

    k9 = dwk_ref[...]
    out = None
    for po in range(p):
        left = hs[po - 1] if po > 0 else (shl(hs[p - 1]) if p > 1 else shl(hs[0]))
        right = hs[po + 1] if po < p - 1 else (shr(hs[0]) if p > 1 else shr(hs[0]))
        acc = None
        for dy in range(3):
            piece = (
                hs[po][dy : dy + t] * k9[dy * 3 + 1]
                + left[dy : dy + t] * k9[dy * 3 + 0]
                + right[dy : dy + t] * k9[dy * 3 + 2]
            )
            acc = piece if acc is None else acc + piece
        h2 = F._gelu(acc)
        piece = F._dot(h2.reshape(t * wq_n, c4), w4_ref[po])
        out = piece if out is None else out + piece
    o_ref[...] = out.reshape(t, wq_n, pc) + res1[1 : t + 1]


def _apply_nocarry(xp, m0, wa_p, bp, m2, mavg, lns, lnb, w0, dwk, w4, t, c, p):
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    n = -(-h // t)
    xspec = lambda lag: pl.BlockSpec(  # noqa: E731
        (t, wq_n, pc), lambda i, lag=lag: (jnp.clip(i - lag, 0, n - 1), 0, 0)
    )
    return pl.pallas_call(
        functools.partial(_nocarry_kernel, t=t, wq_n=wq_n, c=c, p=p, h=h),
        grid=(n + 1,),
        in_specs=[
            xspec(2), xspec(1), xspec(0),
            pl.BlockSpec((3, 3 * pc, pc), lambda i: (0, 0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((1, pc), lambda i: (0, 0)),
            pl.BlockSpec((3, 3 * pc, pc), lambda i: (0, 0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((1, pc), lambda i: (0, 0)),
            pl.BlockSpec((1, pc), lambda i: (0, 0)),
            pl.BlockSpec((p, pc, 4 * c), lambda i: (0, 0, 0)),
            pl.BlockSpec((9, 4 * c), lambda i: (0, 0)),
            pl.BlockSpec((p, 4 * c, pc), lambda i: (0, 0, 0)),
            F._bounds_spec(),
        ],
        out_specs=pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, wq_n, pc), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=F._interpret(),
    )(xp, xp, xp, m0, wa_p, bp, m2, mavg, lns, lnb, w0, dwk, w4,
      F._bounds_arr(None, h))


def main():
    rng = np.random.default_rng(0)

    def mk(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    H, W, c, p = 1088, 1920, 31, 4
    pc, c4 = p * c, 4 * c
    xp = mk(H, W // p, pc, scale=0.3)
    ops = (
        mk(3, 3 * pc, pc), mk(pc, pc), mk(1, pc), mk(3, 3 * pc, pc), mk(pc, pc),
        jnp.ones((1, pc)), jnp.zeros((1, pc)),
        mk(p, pc, c4), mk(9, c4), mk(p, c4, pc),
    )
    t = F._pick_t(H, c)

    cur = jax.jit(lambda a: F._apply(a, *ops, t, c, p))
    new = jax.jit(lambda a: _apply_nocarry(a, *ops, t, c, p))
    err = jax.jit(lambda a: jnp.max(jnp.abs(cur(a) - new(a))))
    print("maxerr", float(err(xp)), flush=True)
    print(f"carry   : {timeit(cur, xp):.2f} ms", flush=True)
    print(f"nocarry : {timeit(new, xp):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
