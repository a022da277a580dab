"""Fused Pallas MSAB megakernel for MST++ inference on TPU.

One MSAB block (MST_Plus_Plus.py:160-186: spectral MS_MSA + residual, then
prenorm FFN + residual) is the traffic unit of MST++: at 1080p the XLA
composition materializes the (H, W, 4C) FFN hidden and several head-layout
transposes in HBM — ~5 GB of traffic per L0 block, which is why full-res
inference ran at ~800 ms/frame. This module restructures the block around
the one *global* dependency, the spectral C x C Gram matrix:

- **Pass A (stats)**: the attention matrix needs K^T Q and the per-channel
  spatial L2 norms, all reductions over EVERY pixel. A grid-accumulating
  kernel computes q = x Wq, k = x Wk per row-band tile and accumulates the
  full (C, C) Gram + norms across grid steps (sequential on TPU). Head
  splitting happens afterwards in XLA on the tiny C x C result — slicing
  heads inside the kernel would need non-tile-aligned lane slices.
- **Tiny XLA glue**: normalize the Gram by the norms (reference clamps at
  1e-12), apply the learned per-head rescale, softmax over the q-channel
  axis, and lay the per-head attention matrices into one block-diagonal
  (C, C) "apply" matrix — so pass B applies attention as a single matmul.
- **Pass B (apply)**: everything per-pixel/local. For each T-row band:
  V = x Wv (with a 3-row halo), pos_emb = dw3(gelu(dw3(V))) (zero-pad
  parity with torch Conv2d), attention-apply = V @ blockdiag(attn),
  proj + bias + pos_emb + residual, LayerNorm, FFN (1x1 -> gelu -> 3x3
  depthwise -> gelu -> 1x1) + residual — all resident in VMEM; the
  (.., 4C) hidden never touches HBM. The halo comes from a rolling
  carry: scratch A holds the previous input block, scratch B the 3 rows
  before it, and the output is emitted with a one-step lag — so HBM
  traffic is exactly one read + one write of x per block (the naive
  prev/cur/next-block halo would read 3x).

GELU uses the Abramowitz-Stegun 7.1.26 erf approximation (|err| <= 1.5e-7;
Mosaic has no erf lowering) — far inside the 1e-3 torch-parity budget.

Numerics: all matmuls run f32 (preferred_element_type) — measured
parity vs the XLA path ~1e-6; the XLA path itself drifts ~1e-2 from
float64 under default matmul precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _erf(x):
    # Abramowitz-Stegun 7.1.26 (|abs err| <= 1.5e-7); Mosaic has no erf.
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


def _precision():
    """Default (bf16-input, f32-accumulate) matches the XLA path's einsum
    behavior and is ~35% faster end to end; ANIMAL_VISION_MSAB_PRECISION=
    highest forces the f32 algorithm (for accuracy studies — on CPU the
    interpreter is exact f32 either way)."""
    import os

    if os.environ.get("ANIMAL_VISION_MSAB_PRECISION") == "highest":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_precision())


def _dw3(src, k9):
    """Depthwise 3x3, zero pad along W, valid along rows:
    src (R, W, Ch), k9 (9, Ch) with rows laid out dy*3+dx -> (R-2, W, Ch).
    out[j] = sum_{dy,dx} k9[dy*3+dx] * src[j+dy, x+dx-1] (zero beyond W)."""
    rr = src.shape[0] - 2
    w = src.shape[1]
    ch = src.shape[2]
    zeros = jnp.zeros((rr, 1, ch), src.dtype)
    out = None
    for dy in range(3):
        band = src[dy : dy + rr]
        acc = band * k9[dy * 3 + 1]
        left = jnp.concatenate([zeros, band[:, : w - 1]], axis=1)  # src[x-1]
        right = jnp.concatenate([band[:, 1:], zeros], axis=1)  # src[x+1]
        acc = acc + k9[dy * 3 + 0] * left + k9[dy * 3 + 2] * right
        out = acc if out is None else out + acc
    return out


# ---------------------------------------------------------------------------
# Pass A: global attention statistics
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, wq_ref, wk_ref, g_ref, sq_ref, sk_ref, *, t, w, c, h):
    i = pl.program_id(0)
    gi = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
    x = jnp.where(gi < h, x_ref[...], 0.0)  # mask the partial tail
    flat = x.reshape(t * w, c)
    q = _dot(flat, wq_ref[...])
    k = _dot(flat, wk_ref[...])
    g = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(),
    )  # (C, C): G[d, e] = sum_n k[n, d] q[n, e]
    sq = jnp.sum(q * q, axis=0).reshape(1, c)
    sk = jnp.sum(k * k, axis=0).reshape(1, c)

    @pl.when(i == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)
        sk_ref[...] = jnp.zeros_like(sk_ref)

    g_ref[...] += g
    sq_ref[...] += sq
    sk_ref[...] += sk


def _attn_stats(x, wq, wk, t):
    """x (H, W, C) -> (G (C, C), Sq (1, C), Sk (1, C)) over all valid pixels."""
    h, w, c = int(x.shape[0]), int(x.shape[1]), int(x.shape[2])
    n = -(-h // t)
    return pl.pallas_call(
        functools.partial(_stats_kernel, t=t, w=w, c=c, h=h),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((t, w, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, wq, wk)


def _attn_blockdiag(g, sq, sk, rescale, heads):
    """Tiny XLA glue: per-head normalized/softmaxed attention, laid out as a
    block-diagonal (C, C) apply matrix A with A[h*d+e, h*d+dout] =
    attn[h, dout, e], so out = v @ A applies attention per head."""
    c = g.shape[0]
    d = c // heads
    qn = jnp.maximum(jnp.sqrt(sq.reshape(c)), 1e-12)
    kn = jnp.maximum(jnp.sqrt(sk.reshape(c)), 1e-12)
    blocks = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        gh = g[sl, sl] / (kn[sl][:, None] * qn[sl][None, :])
        attn = jax.nn.softmax(gh * rescale[hh].reshape(()), axis=-1)  # (dout=dk, e)
        blocks.append(attn.T)  # (e, dout)
    bd = jax.scipy.linalg.block_diag(*blocks) if heads > 1 else blocks[0]
    return bd.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pass B: apply attention + pos_emb + proj + residual + LN + FFN
# ---------------------------------------------------------------------------


def _apply_kernel(
    x_ref, wva_ref, bp_ref, pk0_ref, pk2_ref,
    lns_ref, lnb_ref, w0_ref, dwk_ref, w4_ref, o_ref, a_scr, b_scr,
    *, t, w, c, h,
):
    i = pl.program_id(0)
    cur = x_ref[...]  # input block min(i, n-1)
    ti = i - 1  # output tile index (lag-1 emission)

    win = jnp.concatenate([b_scr[...], a_scr[...], cur[:3]], axis=0)  # (T+6, W, C)
    gi = ti * t - 3 + jax.lax.broadcasted_iota(jnp.int32, (t + 6, 1, 1), 0)
    win = jnp.where((gi >= 0) & (gi < h), win, 0.0)

    # carry update (read-before-write order matters: win is materialized)
    b_scr[...] = a_scr[t - 3 :]
    a_scr[...] = cur

    # one matmul yields BOTH V and the attention-applied+projected output:
    # wva = [Wv | Wv @ blockdiag(attn) @ Wproj] (attention apply and proj
    # fold into the projection because they are per-pixel linear maps).
    both = _dot(win.reshape((t + 6) * w, c), wva_ref[...]).reshape(t + 6, w, 2 * c)
    v3 = both[:, :, :c]
    g1 = _gelu(_dw3(v3, pk0_ref[...]))  # rows win[1:T+5]
    # zero-pad parity: the inner pos_emb conv has no output beyond the
    # image; the outer conv zero-pads there — mask rows outside [0, H).
    gig = ti * t - 2 + jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0)
    g1 = jnp.where((gig >= 0) & (gig < h), g1, 0.0)
    p = _dw3(g1, pk2_ref[...])  # rows win[2:T+4]

    attnout = both[2 : t + 4, :, c:] + bp_ref[0] + p
    res1 = attnout + win[2 : t + 4]

    mu = jnp.mean(res1, axis=-1, keepdims=True)
    var = jnp.mean((res1 - mu) ** 2, axis=-1, keepdims=True)
    y = (res1 - mu) * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]

    hidden = _gelu(_dot(y.reshape((t + 2) * w, c), w0_ref[...])).reshape(
        t + 2, w, 4 * c
    )
    # zero-pad parity: torch computes the FFN on real rows only, then the
    # depthwise conv zero-pads — rows beyond the image must contribute 0.
    gih = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    hidden = jnp.where((gih >= 0) & (gih < h), hidden, 0.0)
    hd = _gelu(_dw3(hidden, dwk_ref[...]))  # (T, W, 4C)
    out = _dot(hd.reshape(t * w, 4 * c), w4_ref[...]).reshape(t, w, c)
    o_ref[...] = out + res1[1 : t + 1]


def _apply(x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4, t):
    h, w, c = int(x.shape[0]), int(x.shape[1]), int(x.shape[2])
    n = -(-h // t)
    return pl.pallas_call(
        functools.partial(_apply_kernel, t=t, w=w, c=c, h=h),
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((t, w, c), lambda i: (jnp.minimum(i, n - 1), 0, 0)),  # noqa: B023
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
            pl.BlockSpec((9, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 4 * c), lambda i: (0, 0)),
            pl.BlockSpec((9, 4 * c), lambda i: (0, 0)),
            pl.BlockSpec((4 * c, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((t, w, c), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, w, c), jnp.float32),
            pltpu.VMEM((3, w, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(x, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4)


def _pick_t(h: int, c: int) -> int:
    """Row-band height: VMEM peak scales with T*W*(C padded to 128 lanes);
    T=8 fits every level under the 110 MB scoped-vmem budget (L2's halved W
    affords T=16). T must be >= 3 (carry halo)."""
    t = 16 if c >= 96 else 8
    return max(3, min(t, h))


def fused_msab_block(x, attn_w, ln_w, ffn_w, *, heads):
    """One MSAB block (attention + residual, prenorm FFN + residual) on TPU.

    x: (B, H, W, C) float32. attn_w: dict with to_q/to_k/to_v (C, C) kernels,
    rescale (heads, 1, 1), proj kernel (C, C) + bias (C,), pos_emb_0/2
    depthwise (3, 3, 1, C) kernels. ln_w: (scale, bias). ffn_w: (w0
    (1,1,C,4C), dwk (3,3,1,4C), w4 (1,1,4C,C)).
    """
    b, h, w, c = x.shape
    wq = attn_w["to_q"].astype(jnp.float32)
    wk = attn_w["to_k"].astype(jnp.float32)
    wv = attn_w["to_v"].astype(jnp.float32)
    wp = attn_w["proj_kernel"].astype(jnp.float32)
    bp = attn_w["proj_bias"].reshape(1, c).astype(jnp.float32)
    pk0 = attn_w["pos_emb_0"].reshape(9, c).astype(jnp.float32)
    pk2 = attn_w["pos_emb_2"].reshape(9, c).astype(jnp.float32)
    rescale = attn_w["rescale"]
    lns = ln_w[0].reshape(1, c).astype(jnp.float32)
    lnb = ln_w[1].reshape(1, c).astype(jnp.float32)
    w0 = ffn_w[0].reshape(c, 4 * c).astype(jnp.float32)
    dwk = ffn_w[1].reshape(9, 4 * c).astype(jnp.float32)
    w4 = ffn_w[2].reshape(4 * c, c).astype(jnp.float32)

    t = _pick_t(int(h), int(c))
    outs = []
    for bi in range(b):  # vmapping an accumulating grid is unsafe; B is tiny
        img = x[bi].astype(jnp.float32)
        g, sq, sk = _attn_stats(img, wq, wk, t)
        abd = _attn_blockdiag(g, sq, sk, rescale, heads)
        # fold attention-apply + proj into the V projection (all per-pixel
        # linear): one (C, 2C) matmul in the kernel yields V and attnout.
        wva = jnp.concatenate([wv, wv @ abd @ wp], axis=1)
        outs.append(_apply(img, wva, bp, pk0, pk2, lns, lnb, w0, dwk, w4, t))
    return jnp.stack(outs, axis=0)
