"""Ablate the CURRENT pass-B kernel (poly gelu + MXU pos path + planar
FFN) at L0 full-res: drop each component to see its marginal cost. The
variants are private copies of _apply_kernel with pieces disabled."""
import functools
import sys, time
sys.path.insert(0, "/root/repo")

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
    _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(y)[0][:1, :1]))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def make_kernel(*, gelu_mode, pos_on, dw3_on, ln_on, ffn_mm_on, attn_on,
                masks_on=True):
    _C8 = (
        1.179308194e-01, -5.784324824e-02, 4.063263055e-02, -5.015029752e-02,
        5.391227883e-02, 1.937696962e-02, -2.941430293e-02, -6.909487252e-02,
        5.798335612e-02,
    )

    def _gelu_d8(x):
        xc = jnp.clip(x, -6.0, 6.0)
        v = xc * xc * np.float32(1.0 / 18.0) - 1.0
        g = jnp.full_like(v, _C8[-1])
        for coef in _C8[-2::-1]:
            g = g * v + coef
        return x * (0.5 + xc * g)

    # Round-5 candidate: constrained deg-7 fit on |x| <= 4, exact tails
    # (max |err| 1.87e-4 in f32 over [-10, 10] — see tools notes); chains
    # of 3+3 madds vs the shipped deg-11's 5+5.
    _C7 = (
        1.759428961e-01, -8.434102309e-02, 5.619304976e-02, -3.672315230e-02,
        2.106373072e-02, -1.255914838e-02, 8.723456229e-03, -3.299809029e-03,
    )

    def _gelu_d7(x):
        xc = jnp.clip(x, -4.0, 4.0)
        v = xc * xc * np.float32(1.0 / 8.0) - 1.0
        w = v * v
        ge = ((_C7[6] * w + _C7[4]) * w + _C7[2]) * w + _C7[0]
        go = ((_C7[7] * w + _C7[5]) * w + _C7[3]) * w + _C7[1]
        return x * (0.5 + xc * (ge + v * go))

    gelu = {"poly": F._gelu, "erf": F._gelu_erf, "off": lambda v: v,
            "d8": _gelu_d8, "d7": _gelu_d7}[gelu_mode]

    def kern(
        x_ref, m0_ref, wa_ref, bp_ref, m2_ref, mavg_ref,
        lns_ref, lnb_ref, w0_ref, dwk_ref, w4_ref, o_ref, a_scr, b_scr,
        *, t, wq_n, c, p, h,
    ):
        pc = p * c
        c4 = 4 * c
        i = pl.program_id(0)
        cur = x_ref[...]
        ti = i - 1
        win = jnp.concatenate([b_scr[...], a_scr[...], cur[:3]], axis=0)
        if masks_on:
            gi = ti * t - 3 + jax.lax.broadcasted_iota(jnp.int32, (t + 6, 1, 1), 0)
            win = jnp.where((gi >= 0) & (gi < h), win, 0.0)
        b_scr[...] = a_scr[t - 3 :]
        a_scr[...] = cur

        if pos_on:
            nbrw = F._nbr(win)
            g1in = None
            for dy in range(3):
                band = nbrw[dy : dy + t + 4]
                piece = F._dot(band.reshape((t + 4) * wq_n, 3 * pc), m0_ref[dy])
                g1in = piece if g1in is None else g1in + piece
            g1 = gelu(g1in.reshape(t + 4, wq_n, pc))
            if masks_on:
                gig = ti * t - 2 + jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0)
                g1 = jnp.where((gig >= 0) & (gig < h), g1, 0.0)
            nbrg = F._nbr(g1)
            pos = None
            for dy in range(3):
                band = nbrg[dy : dy + t + 2]
                piece = F._dot(band.reshape((t + 2) * wq_n, 3 * pc), m2_ref[dy])
                pos = piece if pos is None else pos + piece
            pos = pos.reshape(t + 2, wq_n, pc)
        else:
            pos = 0.0

        flat_c = win[2 : t + 4].reshape((t + 2) * wq_n, pc)
        if attn_on:
            attnout = F._dot(flat_c, wa_ref[...]).reshape(t + 2, wq_n, pc)
            res1 = attnout + bp_ref[0] + pos + win[2 : t + 4]
        else:
            res1 = win[2 : t + 4] + pos

        r2 = res1.reshape((t + 2) * wq_n, pc)
        if ln_on:
            mu = F._dot(r2, mavg_ref[...])
            xc = r2 - mu
            var = F._dot(xc * xc, mavg_ref[...])
            y = xc * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]
        else:
            y = r2

        gih = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
        hmask = (gih >= 0) & (gih < h)
        hs = []
        for po in range(p):
            if ffn_mm_on:
                hp = gelu(F._dot(y, w0_ref[po])).reshape(t + 2, wq_n, c4)
            else:
                hp = gelu(y[:, :c4].reshape(-1, wq_n, c4)[: t + 2])
            hs.append(jnp.where(hmask, hp, 0.0) if masks_on else hp)

        def shl(a):
            return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

        def shr(a):
            return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)

        k9 = dwk_ref[...]
        out = None
        for po in range(p):
            if dw3_on:
                left = hs[po - 1] if po > 0 else shl(hs[p - 1])
                right = hs[po + 1] if po < p - 1 else shr(hs[0])
                acc = None
                for dy in range(3):
                    piece = (
                        hs[po][dy : dy + t] * k9[dy * 3 + 1]
                        + left[dy : dy + t] * k9[dy * 3 + 0]
                        + right[dy : dy + t] * k9[dy * 3 + 2]
                    )
                    acc = piece if acc is None else acc + piece
            else:
                acc = hs[po][1 : t + 1]
            h2 = gelu(acc)
            piece = F._dot(h2.reshape(t * wq_n, c4), w4_ref[po])
            out = piece if out is None else out + piece
        o_ref[...] = out.reshape(t, wq_n, pc) + res1[1 : t + 1]

    return kern


def run_variant(name, xp, ops, t, c, p, **flags):
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    n = -(-h // t)
    kern = make_kernel(**flags)
    f = pl.pallas_call(
        functools.partial(kern, t=t, wq_n=wq_n, c=c, p=p, h=h),
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
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
        ],
        out_specs=pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, wq_n, pc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, wq_n, pc), jnp.float32),
            pltpu.VMEM((3, wq_n, pc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )
    g = jax.jit(lambda a: f(a, *ops))
    print(f"  {name}: {timeit(g, xp):.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)

    def mk(*s, scale=0.2):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * scale)

    H, W, c, p = 1088, 1920, 31, 4
    pc, c4 = p * c, 4 * c
    # Build the 258 MB frame ON DEVICE: a host device_put of this size
    # takes minutes over the axon tunnel (bulk transfers are the slow path).
    xp = jax.jit(
        lambda k: jax.random.normal(k, (H, W // p, pc), jnp.float32) * 0.3
    )(jax.random.PRNGKey(0))
    _ = float(jnp.sum(xp[:1, :1]))
    ops = (
        mk(3, 3 * pc, pc), mk(pc, pc), mk(1, pc), mk(3, 3 * pc, pc), mk(pc, pc),
        jnp.ones((1, pc)), jnp.zeros((1, pc)),
        mk(p, pc, c4), mk(9, c4), mk(p, c4, pc),
    )
    t = F._pick_t(H, c)
    base = dict(gelu_mode="poly", pos_on=True, dw3_on=True, ln_on=True,
                ffn_mm_on=True, attn_on=True)
    run_variant("full(poly)", xp, ops, t, c, p, **base)
    run_variant("d8_gelu", xp, ops, t, c, p, **{**base, "gelu_mode": "d8"})
    run_variant("erf_gelu", xp, ops, t, c, p, **{**base, "gelu_mode": "erf"})
    run_variant("no_gelu", xp, ops, t, c, p, **{**base, "gelu_mode": "off"})
    run_variant("no_pos", xp, ops, t, c, p, **{**base, "pos_on": False})
    run_variant("no_dw3", xp, ops, t, c, p, **{**base, "dw3_on": False})
    run_variant("no_ln", xp, ops, t, c, p, **{**base, "ln_on": False})
    run_variant("no_ffn_mm", xp, ops, t, c, p, **{**base, "ffn_mm_on": False})
    run_variant("no_attn_mm", xp, ops, t, c, p, **{**base, "attn_on": False})
    run_variant("d7_gelu", xp, ops, t, c, p, **{**base, "gelu_mode": "d7"})
    run_variant("no_masks", xp, ops, t, c, p, **{**base, "masks_on": False})
    run_variant("d7+no_masks", xp, ops, t, c, p,
                **{**base, "gelu_mode": "d7", "masks_on": False})
    run_variant("t32", xp, ops, 32, c, p, **base)
    run_variant("t32+d7+no_masks", xp, ops, 32, c, p,
                **{**base, "gelu_mode": "d7", "masks_on": False})
    run_variant(
        "copy_only", xp, ops, t, c, p,
        gelu_mode="off", pos_on=False, dw3_on=False, ln_on=False,
        ffn_mm_on=False, attn_on=False,
    )


if __name__ == "__main__":
    main()
