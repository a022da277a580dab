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
  Gram + norms across grid steps (sequential on TPU).
- **Tiny XLA glue**: normalize the Gram by the norms (reference clamps at
  1e-12), apply the learned per-head rescale, softmax over the q-channel
  axis, and lay the per-head attention matrices into one block-diagonal
  (C, C) "apply" matrix folded into the projection, so pass B applies
  attention as part of one matmul.
- **Pass B (apply)**: everything per-pixel/local. For each T-row band:
  V = x Wv (with a 3-row halo), pos_emb = dw3(gelu(dw3(V))) (zero-pad
  parity with torch Conv2d), attention+proj (folded matmul), residual,
  LayerNorm, FFN (1x1 -> gelu -> 3x3 depthwise -> gelu -> 1x1) + residual
  — all resident in VMEM; the (.., 4C) hidden never touches HBM. The
  3-row halo comes from two extra LAGGED REFS of the same input (blocks
  ti-1 and ti+1 alongside ti), so tile ti is emitted directly at grid
  step ti with no carry scratch, no copies, and no warmup step; the
  pipeline refetches neighbor blocks from HBM (up to 3 reads + 1 write
  of x), which hides completely under this VPU-bound kernel.

**Pixel packing** (the key lane-utilization move): C=31 uses 31 of each
128-lane vreg (24%) and drives matmuls at K=31 (6% MXU utilization). The
kernels therefore view the row-major (H, W, C) array as (H, W/P, P*C) with
P = 124//C — a FREE reshape in HBM — so 4 pixels share one 124-lane vreg at
L0. Per-pixel linear maps become kron(I_P, W) block-diagonal matmuls
(K=124, near-full MXU), elementwise VPU work shrinks 4x, LayerNorm's
per-pixel mean becomes a kron(I_P, 1/C) matmul, and depthwise-conv pixel
shifts become lane rotations with a cross-pack fix from the
sublane-shifted neighbor.

GELU uses a degree-11 even/odd polynomial (|err| <= 1.7e-5, exact tails;
Mosaic has no erf lowering) — far inside the 1e-3 torch-parity budget; the
A&S 7.1.26 erf form is kept as _gelu_erf for reference.
Matmuls run the backend's default precision (bf16 inputs, f32 accumulate),
matching the XLA path's own einsum behavior; ANIMAL_VISION_MSAB_PRECISION=
highest forces the f32 algorithm.
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


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf(x * (1.0 / np.sqrt(2.0))))


# Degree-11 Chebyshev fit (power basis in v = x^2/12.5 - 1) of
# (Phi(x) - 0.5)/x on |x| <= 5; gelu(x) = x * (0.5 + clip(x) * g(v)).
# Clamping x to [-5, 5] before the poly makes the tails exact by
# construction (0.5 + 5 g(1) = 1); the true |gelu(x) - x| beyond the clip
# is x*(1 - Phi(x)) <= 1.4e-6. Max |gelu err| measured 1.66e-5 in float32
# over [-8, 8] — the narrower clip range buys ~2 polynomial
# degrees over the previous |x| <= 6 basis (deg-14 at 2.9e-6 -> deg-11 at
# 1.66e-5, still far inside the <5e-4 fused-parity budget). Evaluated
# even/odd: two parallel Horner chains of depth 6 over w = v*v instead of
# one serial chain of 11 — the VPU is partly latency-bound on the chain
# (measured 10.8 -> 10.2 ms/L0-MSAB for the split alone, -> 8.9 with the
# lower degree; gelu was the largest pass-B term, tools/exp_passb_ablate.py).
_GELU_COEF = (
    1.413638139e-01, -7.029590887e-02, 5.154378282e-02, -4.045128240e-02,
    3.117513943e-02, -2.321312828e-02, 1.752299849e-02, -1.130712491e-02,
    4.284632193e-03, -2.526916729e-03, 3.580725317e-03, -1.676730979e-03,
)


def _gelu(x):
    C = _GELU_COEF
    xc = jnp.clip(x, -5.0, 5.0)
    v = xc * xc * np.float32(1.0 / 12.5) - 1.0
    w = v * v
    ge = jnp.full_like(w, C[10])
    for coef in (C[8], C[6], C[4], C[2], C[0]):
        ge = ge * w + coef
    go = jnp.full_like(w, C[11])
    for coef in (C[9], C[7], C[5], C[3], C[1]):
        go = go * w + coef
    return x * (0.5 + xc * (ge + v * go))


def _precision():
    import os

    if os.environ.get("ANIMAL_VISION_MSAB_PRECISION") == "highest":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_precision())


def _pack_of(c: int) -> int:
    """Pixels per 124-lane pack: 4 at C=31, 2 at C=62, 1 otherwise."""
    return {31: 4, 62: 2}.get(c, 1)


def _bounds_arr(bounds, h: int):
    """(1, 2) int32 [lo, hi) valid-row bounds operand for the SMEM slot.

    ``bounds=None`` means the whole array is the image ([0, h), the
    single-device case). Under spatial sharding (parallel/fused_shard.py)
    each device runs these kernels on a halo-extended local band whose
    valid-image rows are a traced sub-range: rows outside [lo, hi) are
    beyond the GLOBAL image and must behave exactly like the zero padding
    the unsharded kernels apply at rows <0 / >=h."""
    if bounds is None:
        return jnp.asarray([[0, h]], jnp.int32)
    lo, hi = bounds
    return jnp.stack(
        [jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)]
    ).reshape(1, 2)


def _bounds_spec():
    return pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)


def _shift_px(x3, delta: int, c: int, p: int):
    """Shift the pixel axis of a packed (R, Wq, P*C) array by one pixel with
    zero fill at the row ends: delta=+1 -> out[x] = in[x-1]; delta=-1 ->
    out[x] = in[x+1]. For P>1 a pixel shift is a lane rotation by C with the
    C wrapped lanes replaced from the sublane-shifted neighbor pack."""
    rr, wq, pc = x3.shape
    zeros = jnp.zeros((rr, 1, pc), x3.dtype)
    if p == 1:
        if delta == 1:
            return jnp.concatenate([zeros, x3[:, : wq - 1]], axis=1)
        return jnp.concatenate([x3[:, 1:], zeros], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x3.shape, 2)
    if delta == 1:
        prev = jnp.concatenate([zeros, x3[:, : wq - 1]], axis=1)
        return jnp.where(lane < c, pltpu.roll(prev, c, 2), pltpu.roll(x3, c, 2))
    nxt = jnp.concatenate([x3[:, 1:], zeros], axis=1)
    back = (pc - c) % pc
    return jnp.where(
        lane >= pc - c, pltpu.roll(nxt, back, 2), pltpu.roll(x3, back, 2)
    )


def _dw3(src, k9, c: int, p: int):
    """Depthwise 3x3 on a packed (R, Wq, P*Ch) array, zero pad along W,
    valid along rows; k9 (9, P*Ch) rows laid out dy*3+dx -> (R-2, Wq, P*Ch).
    ``c`` is the per-pixel channel count of THIS tensor (Ch)."""
    rr = src.shape[0] - 2
    out = None
    for dy in range(3):
        band = src[dy : dy + rr]
        acc = band * k9[dy * 3 + 1]
        acc = acc + k9[dy * 3 + 0] * _shift_px(band, +1, c, p)
        acc = acc + k9[dy * 3 + 2] * _shift_px(band, -1, c, p)
        out = acc if out is None else out + acc
    return out


# ---------------------------------------------------------------------------
# Pass A: global attention statistics
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, wq_ref, wk_ref, g_ref, sq_ref, sk_ref, *, t, wq_n, pc, h):
    i = pl.program_id(0)
    gi = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
    x = jnp.where(gi < h, x_ref[...], 0.0)  # mask the partial tail
    flat = x.reshape(t * wq_n, pc)
    q = _dot(flat, wq_ref[...])
    k = _dot(flat, wk_ref[...])
    g = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(),
    )  # (PC, PC); the P diagonal (C, C) blocks sum to the true Gram
    sq = jnp.sum(q * q, axis=0).reshape(1, pc)
    sk = jnp.sum(k * k, axis=0).reshape(1, pc)

    @pl.when(i == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)
        sk_ref[...] = jnp.zeros_like(sk_ref)

    g_ref[...] += g
    sq_ref[...] += sq
    sk_ref[...] += sk


def _attn_stats_xla(xp, wq_p, wk_p):
    """Stats pass as three XLA matmuls (no pallas): q/k projections, the
    packed Gram, and the squared norms. The accumulating pallas kernel
    reads x exactly once, but at the smaller pyramid levels its measured
    cost (~3 ms at L1) is far above the HBM bound (~0.6 ms) — XLA's plain
    reduction pipeline beats it there; fused_msab_block picks per level."""
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    flat = xp.reshape(h * wq_n, pc)
    q = _dot(flat, wq_p)
    k = _dot(flat, wk_p)
    g = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(),
    )
    sq = jnp.sum(q * q, axis=0).reshape(1, pc)
    sk = jnp.sum(k * k, axis=0).reshape(1, pc)
    return g, sq, sk


def _attn_stats(xp, wq_p, wk_p, t):
    """xp (H, Wq, PC) packed -> packed (G (PC, PC), Sq (1, PC), Sk (1, PC))."""
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    n = -(-h // t)
    return pl.pallas_call(
        functools.partial(_stats_kernel, t=t, wq_n=wq_n, pc=pc, h=h),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((t, wq_n, pc), lambda i: (i, 0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((1, pc), lambda i: (0, 0)),
            pl.BlockSpec((1, pc), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pc, pc), jnp.float32),
            jax.ShapeDtypeStruct((1, pc), jnp.float32),
            jax.ShapeDtypeStruct((1, pc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, wq_p, wk_p)


def _attn_blockdiag(g_p, sq_p, sk_p, rescale, heads, c):
    """Fold the packed stats (sum the P diagonal C x C blocks / C groups),
    then build the per-head normalized/softmaxed attention as one
    block-diagonal (C, C) apply matrix A with A[h*d+e, h*d+dout] =
    attn[h, dout, e], so out = v @ A applies attention per head."""
    pc = g_p.shape[0]
    p = pc // c
    g = sum(g_p[i * c : (i + 1) * c, i * c : (i + 1) * c] for i in range(p))
    sq = sum(sq_p.reshape(p, c)[i] for i in range(p))
    sk = sum(sk_p.reshape(p, c)[i] for i in range(p))
    d = c // heads
    qn = jnp.maximum(jnp.sqrt(sq), 1e-12)
    kn = jnp.maximum(jnp.sqrt(sk), 1e-12)
    blocks = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        gh = g[sl, sl] / (kn[sl][:, None] * qn[sl][None, :])
        attn = jax.nn.softmax(gh * rescale[hh].reshape(()), axis=-1)  # (dout, e)
        blocks.append(attn.T)  # (e, dout)
    bd = jax.scipy.linalg.block_diag(*blocks) if heads > 1 else blocks[0]
    return bd.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pass B: apply attention + pos_emb + proj + residual + LN + FFN
# ---------------------------------------------------------------------------


def _apply_kernel(
    xm_ref, x0_ref, xp_ref, m0_ref, wa_ref, bp_ref, m2_ref, mavg_ref,
    lns_ref, lnb_ref, w0_ref, dwk_ref, w4_ref, b_ref, o_ref,
    *, t, wq_n, c, p, h,
):
    pc = p * c
    c4 = 4 * c
    ti = pl.program_id(0)  # no lag: tile ti reads blocks ti-1 / ti / ti+1
    lo, hi = b_ref[0, 0], b_ref[0, 1]  # valid-row bounds (==0, h unsharded)

    # The 3-row halo on each side comes from the NEIGHBOR BLOCKS of the same
    # input, passed as two extra lagged refs — the Pallas pipeline fetches
    # each block up to 3x from HBM, which hides under this VPU-bound kernel,
    # instead of the former rolling VMEM carry (a (T,Wq,PC) + (3,Wq,PC)
    # scratch copy per step and a wasted lag-1 warmup grid step).
    win = jnp.concatenate([xm_ref[t - 3 :], x0_ref[...], xp_ref[:3]], axis=0)
    gi = ti * t - 3 + jax.lax.broadcasted_iota(jnp.int32, (t + 6, 1, 1), 0)
    win = jnp.where((gi >= lo) & (gi < hi), win, 0.0)

    # pos_emb on the MXU: both depthwise 3x3s run as neighbor-pack matmuls
    # (the _conv3_mats contract) instead of VPU lane-rotation composites —
    # m0 folds Wv . diag(pos_emb_0[dy,dx]) so the v = x Wv matmul vanishes
    # into the first conv; m2 carries diag(pos_emb_2[dy,dx]). The pos path
    # was 4.8 of 13.0 ms at L0 by ablation, nearly all VPU; the MXU is
    # mostly idle here (dropping the attention matmul measured ~0 ms).
    nbrw = _nbr(win)  # one shared neighbor-pack concat; bands are slices
    g1in = None
    for dy in range(3):
        band = nbrw[dy : dy + t + 4]
        piece = _dot(band.reshape((t + 4) * wq_n, 3 * pc), m0_ref[dy])
        g1in = piece if g1in is None else g1in + piece
    g1 = _gelu(g1in.reshape(t + 4, wq_n, pc))  # rows win[1:T+5]
    # zero-pad parity: the inner pos_emb conv has no output beyond the
    # image; the outer conv zero-pads there — mask rows outside [0, H).
    gig = ti * t - 2 + jax.lax.broadcasted_iota(jnp.int32, (t + 4, 1, 1), 0)
    g1 = jnp.where((gig >= lo) & (gig < hi), g1, 0.0)
    nbrg = _nbr(g1)
    pos = None
    for dy in range(3):
        band = nbrg[dy : dy + t + 2]
        piece = _dot(band.reshape((t + 2) * wq_n, 3 * pc), m2_ref[dy])
        pos = piece if pos is None else pos + piece
    pos = pos.reshape(t + 2, wq_n, pc)  # rows win[2:T+4]

    # attention-apply + proj folded: attnout = x @ (Wv @ blockdiag(attn) @ Wproj)
    flat_c = win[2 : t + 4].reshape((t + 2) * wq_n, pc)
    attnout = _dot(flat_c, wa_ref[...]).reshape(t + 2, wq_n, pc)
    res1 = attnout + bp_ref[0] + pos + win[2 : t + 4]

    # LayerNorm over each pixel's C lanes via the kron(I_P, 1/C) matmul
    r2 = res1.reshape((t + 2) * wq_n, pc)
    mu = _dot(r2, mavg_ref[...])
    xc = r2 - mu
    var = _dot(xc * xc, mavg_ref[...])
    y = xc * jax.lax.rsqrt(var + 1e-5) * lns_ref[0] + lnb_ref[0]

    # FFN with a PLANAR hidden: the 4C-channel hidden fills whole vregs on
    # its own, so it is materialized as P separate (T+2, Wq, 4C) arrays —
    # one per in-pack pixel — instead of one (T+2, Wq, P*4C) packed array.
    # Same MXU FLOPs (w0/w4 carry the kron zeros either way), but the
    # depthwise 3x3's pixel shifts become 2 cheap sublane shifts at the
    # pack seams instead of 6 lane-rotation composites over the whole
    # hidden (the dominant VPU cost of this kernel: measured 13.1 -> the
    # planar form at L0 full-res).
    gih = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    hmask = (gih >= lo) & (gih < hi)
    hs = []
    for po in range(p):
        hp = _gelu(_dot(y, w0_ref[po])).reshape(t + 2, wq_n, c4)
        # zero-pad parity: torch computes the FFN on real rows only, then
        # the depthwise conv zero-pads — rows beyond the image must be 0.
        hs.append(jnp.where(hmask, hp, 0.0))

    def shl(a):  # previous pack (zero at the row start)
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

    def shr(a):  # next pack (zero at the row end)
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
        h2 = _gelu(acc)  # (T, Wq, 4C)
        piece = _dot(h2.reshape(t * wq_n, c4), w4_ref[po])
        out = piece if out is None else out + piece
    o_ref[...] = out.reshape(t, wq_n, pc) + res1[1 : t + 1]


def _apply(xp, m0, wa_p, bp, m2, mavg, lns, lnb, w0, dwk, w4, t, c, p, bounds=None):
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    n = -(-h // t)
    xspec = lambda lag: pl.BlockSpec(  # noqa: E731
        (t, wq_n, pc), lambda i, lag=lag: (jnp.clip(i + lag, 0, n - 1), 0, 0)
    )
    return pl.pallas_call(
        functools.partial(_apply_kernel, t=t, wq_n=wq_n, c=c, p=p, h=h),
        grid=(n,),
        in_specs=[
            xspec(-1), xspec(0), xspec(1),
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
            _bounds_spec(),
        ],
        out_specs=pl.BlockSpec((t, wq_n, pc), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, wq_n, pc), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, xp, xp, m0, wa_p, bp, m2, mavg, lns, lnb, w0, dwk, w4,
      _bounds_arr(bounds, h))


def _pos_mats(wv, pk0, pk2, c: int, p: int):
    """Fold the pos_emb branch (dw3 . gelu . dw3 applied to x Wv,
    MST_Plus_Plus.py:135-141) into two stacks of neighbor-pack conv
    matrices: m0[dy] applies Wv . diag(pos_emb_0[dy,dx]) and m2[dy]
    applies diag(pos_emb_2[dy,dx]) under the _conv3_mats contract."""
    pk0r = pk0.reshape(3, 3, c).astype(jnp.float32)
    pk2r = pk2.reshape(3, 3, c).astype(jnp.float32)
    w0_eff = wv.astype(jnp.float32)[None, None, :, :] * pk0r[:, :, None, :]
    w2_eff = jnp.eye(c, dtype=jnp.float32)[None, None] * pk2r[:, :, None, :]
    return _conv3_mats(w0_eff, c, p), _conv3_mats(w2_eff, c, p)


def _ffn_planar_weights(ffn_w, c: int, p: int):
    """(w0 (1,1,C,4C), dwk (3,3,1,4C), w4 (1,1,4C,C) or (4C,C)) -> the
    planar-hidden operand stack: w0p (P, PC, 4C) / dwk (9, 4C) /
    w4p (P, 4C, PC), where slice ``po`` maps pack-pixel po's channels to and
    from its own (T, Wq, 4C) hidden plane (kron zeros included — the MXU
    cost is identical to the packed block-diagonal form)."""
    w0 = ffn_w[0].reshape(c, 4 * c).astype(jnp.float32)
    dwk = ffn_w[1].reshape(9, 4 * c).astype(jnp.float32)
    w4 = ffn_w[2].reshape(4 * c, c).astype(jnp.float32)
    pc = p * c
    w0p = jnp.zeros((p, pc, 4 * c), jnp.float32)
    w4p = jnp.zeros((p, 4 * c, pc), jnp.float32)
    for po in range(p):
        w0p = w0p.at[po, po * c : (po + 1) * c, :].set(w0)
        w4p = w4p.at[po, :, po * c : (po + 1) * c].set(w4)
    return w0p, dwk, w4p


def _pick_t(h: int, c: int) -> int:
    """Row-band height. Packing keeps per-row VMEM roughly level-independent
    (~Wq * 128 lanes); T=24 fits every level now that the halo comes from
    lagged input refs instead of VMEM carry scratch (T=32 still dies to
    register-allocator spills; the unpacked C=124 bottleneck level exceeds
    scoped VMEM at T=24 by ~2 MB, so it stays at 16), and T must be >= 3
    (the 3-row halo slice)."""
    return max(3, min(24 if _pack_of(c) > 1 else 16, h))


def fused_msab_block(x, attn_w, ln_w, ffn_w, *, heads):
    """One MSAB block (attention + residual, prenorm FFN + residual) on TPU.

    x: (B, H, W, C) float32. attn_w: dict with to_q/to_k/to_v (C, C) kernels,
    rescale (heads, 1, 1), proj kernel (C, C) + bias (C,), pos_emb_0/2
    depthwise (3, 3, 1, C) kernels. ln_w: (scale, bias). ffn_w: (w0
    (1,1,C,4C), dwk (3,3,1,4C), w4 (1,1,4C,C)).
    """
    b, h, w, c = (int(s) for s in x.shape)
    p = _pack_of(c)
    wq = attn_w["to_q"].astype(jnp.float32)
    wk = attn_w["to_k"].astype(jnp.float32)
    wv = attn_w["to_v"].astype(jnp.float32)
    wp = attn_w["proj_kernel"].astype(jnp.float32)
    rescale = attn_w["rescale"]

    eye = jnp.eye(p, dtype=jnp.float32)
    kron = lambda m: jnp.kron(eye, m.astype(jnp.float32))
    tile = lambda v, reps: jnp.tile(v.astype(jnp.float32).reshape(1, -1), (1, reps))

    wq_p, wk_p = kron(wq), kron(wk)
    bp = tile(attn_w["proj_bias"], p)
    m0, m2 = _pos_mats(wv, attn_w["pos_emb_0"], attn_w["pos_emb_2"], c, p)
    mavg = jnp.kron(eye, jnp.full((c, c), 1.0 / c, jnp.float32))
    lns = tile(ln_w[0], p)
    lnb = tile(ln_w[1], p)
    w0, dwk, w4 = _ffn_planar_weights(ffn_w, c, p)

    # pack: (H, W, C) -> (H, Wq, P*C) is a free row-major reshape; pad W to
    # a multiple of P with zeros (exactly torch's zero-pad for the dwconvs;
    # padded pixels contribute nothing to the Gram and are sliced away).
    wp_w = -(-w // p) * p
    t = _pick_t(h, c)
    outs = []
    for bi in range(b):  # vmapping an accumulating grid is unsafe; B is tiny
        img = x[bi].astype(jnp.float32)
        if wp_w != w:
            img = jnp.pad(img, ((0, 0), (0, wp_w - w), (0, 0)))
        xp = img.reshape(h, wp_w // p, p * c)
        g_p, sq_p, sk_p = _attn_stats(xp, wq_p, wk_p, t)
        abd = _attn_blockdiag(g_p, sq_p, sk_p, rescale, heads, c)
        wa_p = kron(wv @ abd @ wp)
        res = _apply(xp, m0, wa_p, bp, m2, mavg, lns, lnb, w0, dwk, w4, t, c, p)
        res = res.reshape(h, wp_w, c)[:, :w]
        outs.append(res)
    return jnp.stack(outs, axis=0)


# ---------------------------------------------------------------------------
# Packed convolutions + the fully-packed MST stage pipeline
# ---------------------------------------------------------------------------
#
# Pallas constrains its operands to the row-major {2,1,0:T(8,128)} layout,
# so a (H, W, 31) operand is PHYSICALLY 128-lane padded in HBM (4x bytes)
# and converting between XLA-conv layouts and the packed view costs a full
# relayout copy per boundary. The cure is to never leave the packed layout:
# the whole MST stage (embedding conv -> MSABs -> strided downsamples ->
# upsample/fuse -> mapping conv -> residual) runs on (H, Wq, 124) arrays,
# with spatial convs as neighbor-pack matmuls (full-K MXU) and the 1x1
# up/fuse convs as plain XLA matmuls on the packed arrays.


def _conv3_mats(w, c: int, p: int):
    """(3, 3, C, C) conv weight -> 3 per-dy (3PC, PC) neighbor-pack matmul
    matrices: out pixel po channel co = sum_dx w[dy,dx,ci,co] * in[po+dx-1, ci]
    with the input drawn from [prev | cur | next] packs."""
    pc = p * c
    mats = []
    for dy in range(3):
        m = jnp.zeros((3 * pc, pc), jnp.float32)
        for po in range(p):
            for dx in range(3):
                ip = p + po + dx - 1
                m = m.at[ip * c : (ip + 1) * c, po * c : (po + 1) * c].add(
                    w[dy, dx].astype(jnp.float32)
                )
        mats.append(m)
    return jnp.stack(mats)  # (3, 3PC, PC)


def _down4_mats(w, c: int, p: int):
    """(4, 4, C, 2C) stride-2 conv weight -> 4 per-dy (3PC, PC) matrices.
    Output pack (P/2 pixels x 2C) j covers out pixels j*P/2+po'; out pixel
    2(jP/2+po')-1+dx maps into input packs j-1..j+1."""
    pc = p * c
    po_n = p // 2
    mats = []
    for dy in range(4):
        m = jnp.zeros((3 * pc, pc), jnp.float32)
        for po in range(po_n):
            for dx in range(4):
                ipix = p + 2 * po + dx - 1  # in nbr coords (prev pack = 0..P-1)
                m = m.at[ipix * c : (ipix + 1) * c, po * 2 * c : (po + 1) * 2 * c].add(
                    w[dy, dx].astype(jnp.float32)
                )
        mats.append(m)
    return jnp.stack(mats)  # (4, 3PC, PC)


def _nbr(band):
    """[prev | cur | next] packs along lanes with zero row-end fill."""
    rr, wq, pc = band.shape
    zeros = jnp.zeros((rr, 1, pc), band.dtype)
    left = jnp.concatenate([zeros, band[:, : wq - 1]], axis=1)
    right = jnp.concatenate([band[:, 1:], zeros], axis=1)
    return jnp.concatenate([left, band, right], axis=2)  # (rr, wq, 3PC)


def _accum_stats(out_valid, wq_ref, wk_ref, g_ref, sq_ref, sk_ref, first):
    """Accumulate the next MSAB's attention stats (Gram + squared norms)
    over a producer kernel's masked output block. ``first`` is the first
    grid step that carries a valid output block (stats refs are zeroed
    there). Riding the stats in the producer removes the standalone pass-A
    read of x per MSAB (~a full-frame HBM pass each)."""
    i = pl.program_id(0)
    pc = out_valid.shape[-1]
    flat = out_valid.reshape(-1, pc)
    q = _dot(flat, wq_ref[...])
    k = _dot(flat, wk_ref[...])
    g = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(),
    )
    sq = jnp.sum(q * q, axis=0).reshape(1, pc)
    sk = jnp.sum(k * k, axis=0).reshape(1, pc)

    @pl.when(i == first)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)
        sk_ref[...] = jnp.zeros_like(sk_ref)

    @pl.when(i >= first)
    def _add():
        g_ref[...] += g
        sq_ref[...] += sq
        sk_ref[...] += sk


def _stats_outs(pc):
    specs = [
        pl.BlockSpec((pc, pc), lambda i: (0, 0)),
        pl.BlockSpec((1, pc), lambda i: (0, 0)),
        pl.BlockSpec((1, pc), lambda i: (0, 0)),
    ]
    shapes = [
        jax.ShapeDtypeStruct((pc, pc), jnp.float32),
        jax.ShapeDtypeStruct((1, pc), jnp.float32),
        jax.ShapeDtypeStruct((1, pc), jnp.float32),
    ]
    return specs, shapes


def _conv3_compute(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, *, t, wq_n, pc, h):
    i = pl.program_id(0)
    lo, hi = b_ref[0, 0], b_ref[0, 1]
    cur = x_ref[...]
    ti = i - 1
    win = jnp.concatenate([b_scr[...], a_scr[...], cur[:1]], axis=0)  # (T+2,)
    gi = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    win = jnp.where((gi >= lo) & (gi < hi), win, 0.0)
    b_scr[...] = a_scr[t - 1 :]
    a_scr[...] = cur
    nbrw = _nbr(win)
    out = None
    for dy in range(3):
        band = nbrw[dy : dy + t]
        piece = _dot(band.reshape(t * wq_n, 3 * pc), m_ref[dy])
        out = piece if out is None else out + piece
    o_ref[...] = out.reshape(t, wq_n, pc)
    return out


def _conv3_kernel(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, *, t, wq_n, pc, h):
    _conv3_compute(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, t=t, wq_n=wq_n, pc=pc, h=h)


def _conv3_res_kernel(x_ref, m_ref, b_ref, r_ref, o_ref, a_scr, b_scr, *, t, wq_n, pc, h):
    """conv3 + residual add fused: out = conv(x) + r. r is tiled like the
    output (lag-1), so the standalone XLA add pass — a full read+read+write
    of the frame per stage residual, ~5 ms at 1080p L0 on the measured
    ~150 GB/s effective HBM path — disappears into this kernel's walk."""
    _conv3_compute(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, t=t, wq_n=wq_n, pc=pc, h=h)
    o_ref[...] += r_ref[...]


def _conv3_stats_kernel(
    x_ref, m_ref, wq_ref, wk_ref, b_ref, o_ref, g_ref, sq_ref, sk_ref, a_scr, b_scr,
    *, t, wq_n, pc, h,
):
    out = _conv3_compute(
        x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, t=t, wq_n=wq_n, pc=pc, h=h
    )
    ti = pl.program_id(0) - 1
    go = ti * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
    valid = jnp.where(go < h, out.reshape(t, wq_n, pc), 0.0)
    _accum_stats(valid, wq_ref, wk_ref, g_ref, sq_ref, sk_ref, first=1)


def packed_conv3x3(xp, w, c: int, p: int, t: int = 16, stats_w=None, bounds=None,
                   residual=None):
    """Same-resolution 3x3 conv (zero pad, no bias) on a packed array.

    ``stats_w=(wq_p, wk_p)`` additionally returns the following MSAB's
    attention stats of the OUTPUT: (out, g, sq, sk). ``residual`` (same
    shape as xp) is added to the output inside the kernel — the MST stage
    / conv_out global residuals without a standalone full-frame add pass."""
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    t = max(2, min(t, h))
    n = -(-h // t)
    mats = _conv3_mats(w, c, p)
    barr = _bounds_arr(bounds, h)
    in_specs = [
        pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.minimum(i, n - 1), 0, 0)),  # noqa: B023
        pl.BlockSpec((3, 3 * pc, pc), lambda i: (0, 0, 0)),
    ]
    out_spec = pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.maximum(i - 1, 0), 0, 0))
    out_shape = jax.ShapeDtypeStruct((h, wq_n, pc), jnp.float32)
    scratch = [
        pltpu.VMEM((t, wq_n, pc), jnp.float32),
        pltpu.VMEM((1, wq_n, pc), jnp.float32),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    if residual is not None:
        assert stats_w is None, "residual+stats not combined anywhere"
        return pl.pallas_call(
            functools.partial(_conv3_res_kernel, t=t, wq_n=wq_n, pc=pc, h=h),
            grid=(n + 1,),
            in_specs=in_specs
            + [
                _bounds_spec(),
                pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_interpret(),
        )(xp, mats, barr, residual)
    if stats_w is None:
        return pl.pallas_call(
            functools.partial(_conv3_kernel, t=t, wq_n=wq_n, pc=pc, h=h),
            grid=(n + 1,),
            in_specs=in_specs + [_bounds_spec()],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_interpret(),
        )(xp, mats, barr)
    sspecs, sshapes = _stats_outs(pc)
    return pl.pallas_call(
        functools.partial(_conv3_stats_kernel, t=t, wq_n=wq_n, pc=pc, h=h),
        grid=(n + 1,),
        in_specs=in_specs
        + [
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            _bounds_spec(),
        ],
        out_specs=[out_spec] + sspecs,
        out_shape=[out_shape] + sshapes,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(xp, mats, stats_w[0], stats_w[1], barr)


def _down4_compute(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, *, t, wq_n, pc, h_in):
    # out block of T rows consumes in rows [2*ti*T - 1, 2*ti*T + 2T + 2)
    i = pl.program_id(0)
    lo, hi = b_ref[0, 0], b_ref[0, 1]  # bounds in INPUT row coords
    cur = x_ref[...]  # (2T, Wq, PC) input block i
    ti = i - 1
    win = jnp.concatenate([b_scr[...], a_scr[...], cur[:2]], axis=0)  # (2T+3,)
    gi = 2 * ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (2 * t + 3, 1, 1), 0)
    win = jnp.where((gi >= lo) & (gi < hi), win, 0.0)
    b_scr[...] = a_scr[2 * t - 1 :]
    a_scr[...] = cur
    # out local row r <- in win rows 2r+dy; win2[r + dy//2, dy%2] == win[2r+dy]
    win2 = win[: 2 * t + 2].reshape(t + 1, 2, wq_n, win.shape[2])
    out = None
    for dy in range(4):
        band = _nbr(win2[dy // 2 : dy // 2 + t, dy % 2])
        piece = _dot(band.reshape(t * wq_n, 3 * pc), m_ref[dy])
        out = piece if out is None else out + piece
    o_ref[...] = out.reshape(t, wq_n, pc)
    return out


def _down4_kernel(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, *, t, wq_n, pc, h_in):
    _down4_compute(
        x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, t=t, wq_n=wq_n, pc=pc, h_in=h_in
    )


def _down4_stats_kernel(
    x_ref, m_ref, wq_ref, wk_ref, b_ref, o_ref, g_ref, sq_ref, sk_ref, a_scr, b_scr,
    *, t, wq_n, pc, h_in,
):
    out = _down4_compute(
        x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, t=t, wq_n=wq_n, pc=pc, h_in=h_in
    )
    ti = pl.program_id(0) - 1
    go = ti * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
    valid = jnp.where(go < h_in // 2, out.reshape(t, wq_n, pc), 0.0)
    _accum_stats(valid, wq_ref, wk_ref, g_ref, sq_ref, sk_ref, first=1)


def packed_down4x4(xp, w, c: int, p: int, t: int = 8, stats_w=None, bounds=None):
    """Stride-2 4x4 conv (zero pad 1, no bias) C -> 2C: packed (H, Wq, PC)
    -> packed (H/2, Wq, PC) with the output pack holding P/2 pixels x 2C.
    ``stats_w=(wq_p, wk_p)`` also returns (out, g, sq, sk) of the output.
    ``bounds`` is in INPUT row coordinates."""
    h, wq_n, pc = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    h_out = h // 2
    t = max(1, min(t, h_out))
    n = -(-h_out // t)
    mats = _down4_mats(w, c, p)
    barr = _bounds_arr(bounds, h)
    in_specs = [
        pl.BlockSpec((2 * t, wq_n, pc), lambda i: (jnp.minimum(i, n - 1), 0, 0)),  # noqa: B023
        pl.BlockSpec((4, 3 * pc, pc), lambda i: (0, 0, 0)),
    ]
    out_spec = pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.maximum(i - 1, 0), 0, 0))
    out_shape = jax.ShapeDtypeStruct((h_out, wq_n, pc), jnp.float32)
    scratch = [
        pltpu.VMEM((2 * t, wq_n, pc), jnp.float32),
        pltpu.VMEM((1, wq_n, pc), jnp.float32),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    if stats_w is None:
        return pl.pallas_call(
            functools.partial(_down4_kernel, t=t, wq_n=wq_n, pc=pc, h_in=h),
            grid=(n + 1,),
            in_specs=in_specs + [_bounds_spec()],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=_interpret(),
        )(xp, mats, barr)
    sspecs, sshapes = _stats_outs(pc)
    return pl.pallas_call(
        functools.partial(_down4_stats_kernel, t=t, wq_n=wq_n, pc=pc, h_in=h),
        grid=(n + 1,),
        in_specs=in_specs
        + [
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            _bounds_spec(),
        ],
        out_specs=[out_spec] + sspecs,
        out_shape=[out_shape] + sshapes,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=_interpret(),
    )(xp, mats, stats_w[0], stats_w[1], barr)


def _up_fuse_compute(
    f_ref, s_ref, mf_ref, bf_ref, ms_ref, b_ref, o_ref, *, t, wq_n, pc, h_in
):
    i = pl.program_id(0)
    lo, hi = b_ref[0, 0], b_ref[0, 1]  # bounds in INPUT (fea) row coords
    fea = f_ref[...]  # (t, wq, pc)
    gi = i * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1, 1), 0)
    fea = jnp.where((gi >= lo) & (gi < hi), fea, 0.0)
    flat = fea.reshape(t * wq_n, pc)
    rows = [
        (_dot(flat, mf_ref[dy]) + bf_ref[dy]).reshape(t, 1, wq_n, pc)
        for dy in range(2)
    ]
    up = jnp.concatenate(rows, axis=1).reshape(2 * t, wq_n, pc)
    skip = s_ref[...]
    gi2 = 2 * i * t + jax.lax.broadcasted_iota(jnp.int32, (2 * t, 1, 1), 0)
    m2 = (gi2 >= 2 * lo) & (gi2 < 2 * hi)
    skip = jnp.where(m2, skip, 0.0)
    out = up + _dot(skip.reshape(2 * t * wq_n, pc), ms_ref[...]).reshape(
        2 * t, wq_n, pc
    )
    o_ref[...] = out
    return jnp.where(m2, out, 0.0)


def _up_fuse_kernel(
    f_ref, s_ref, mf_ref, bf_ref, ms_ref, b_ref, o_ref, *, t, wq_n, pc, h_in
):
    _up_fuse_compute(
        f_ref, s_ref, mf_ref, bf_ref, ms_ref, b_ref, o_ref,
        t=t, wq_n=wq_n, pc=pc, h_in=h_in,
    )


def _up_fuse_stats_kernel(
    f_ref, s_ref, mf_ref, bf_ref, ms_ref, wq_ref, wk_ref, b_ref,
    o_ref, g_ref, sq_ref, sk_ref, *, t, wq_n, pc, h_in,
):
    valid = _up_fuse_compute(
        f_ref, s_ref, mf_ref, bf_ref, ms_ref, b_ref, o_ref,
        t=t, wq_n=wq_n, pc=pc, h_in=h_in,
    )
    _accum_stats(valid, wq_ref, wk_ref, g_ref, sq_ref, sk_ref, first=0)


def packed_up_fuse(fea, skip, up_kernel, up_bias, fuse_kernel, c: int, p: int,
                   t: int = 8, stats_w=None, bounds=None):
    """Decoder level glue as ONE kernel: 1x1 up-conv to 4x channels,
    depth-to-space (folded into the per-row-stream matmuls mf[dy]), and the
    1x1 fuse over [upsampled | skip] (sum of two matmuls by linearity) —
    replacing two XLA matmuls + an interleave relayout + two fuse matmuls
    and their HBM round trips (MST_Plus_Plus.py:243-252). Packed (H, Wq,
    PC) + skip (2H, Wq, PC) -> (2H, Wq, PC) at the next level's packing
    (half channels x doubled pixels). ``stats_w`` rides the following
    MSAB's pass-A stats on the output."""
    h, wq_n, pc = int(fea.shape[0]), int(fea.shape[1]), int(fea.shape[2])
    half = c // 2
    p_out = 2 * p
    wup = up_kernel.reshape(c, 4 * half).astype(jnp.float32)
    bup = up_bias.astype(jnp.float32)  # (4*half,), (dy, dx, co) order
    fk = fuse_kernel.astype(jnp.float32).reshape(2 * half, half)
    eye_o = jnp.eye(p_out, dtype=jnp.float32)
    m_f = jnp.kron(eye_o, fk[:half])
    m_s = jnp.kron(eye_o, fk[half:])
    mf_rows, bf_rows = [], []
    for dy in range(2):
        m = jnp.zeros((pc, p_out * half), jnp.float32)
        b = jnp.zeros((p_out * half,), jnp.float32)
        for pi in range(p):
            for dx in range(2):
                src = slice((dy * 2 + dx) * half, (dy * 2 + dx + 1) * half)
                dst = slice((2 * pi + dx) * half, (2 * pi + dx + 1) * half)
                m = m.at[pi * c : (pi + 1) * c, dst].set(wup[:, src])
                b = b.at[dst].set(bup[src])
        mf_rows.append(m @ m_f)
        bf_rows.append(b @ m_f)
    mf = jnp.stack(mf_rows)  # (2, PC, PC)
    bf = jnp.stack(bf_rows).reshape(2, 1, pc)
    t = max(1, min(t, h))
    n = -(-h // t)
    barr = _bounds_arr(bounds, h)
    in_specs = [
        pl.BlockSpec((t, wq_n, pc), lambda i: (jnp.minimum(i, n - 1), 0, 0)),  # noqa: B023
        pl.BlockSpec((2 * t, wq_n, pc), lambda i: (jnp.minimum(i, n - 1), 0, 0)),  # noqa: B023
        pl.BlockSpec((2, pc, pc), lambda i: (0, 0, 0)),
        pl.BlockSpec((2, 1, pc), lambda i: (0, 0, 0)),
        pl.BlockSpec((pc, pc), lambda i: (0, 0)),
    ]
    out_spec = pl.BlockSpec((2 * t, wq_n, pc), lambda i: (jnp.minimum(i, n - 1), 0, 0))  # noqa: B023
    out_shape = jax.ShapeDtypeStruct((2 * h, wq_n, pc), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    if stats_w is None:
        return pl.pallas_call(
            functools.partial(_up_fuse_kernel, t=t, wq_n=wq_n, pc=pc, h_in=h),
            grid=(n,),
            in_specs=in_specs + [_bounds_spec()],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=params,
            interpret=_interpret(),
        )(fea, skip, mf, bf, m_s, barr)
    sspecs, sshapes = _stats_outs(pc)
    return pl.pallas_call(
        functools.partial(_up_fuse_stats_kernel, t=t, wq_n=wq_n, pc=pc, h_in=h),
        grid=(n,),
        in_specs=in_specs
        + [
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            pl.BlockSpec((pc, pc), lambda i: (0, 0)),
            _bounds_spec(),
        ],
        out_specs=[out_spec] + sspecs,
        out_shape=[out_shape] + sshapes,
        compiler_params=params,
        interpret=_interpret(),
    )(fea, skip, mf, bf, m_s, stats_w[0], stats_w[1], barr)


def attn_stats_weights(attn_w, c: int, p: int):
    """Packed (wq_p, wk_p) for riding a block's pass-A stats in a producer
    kernel (packed_conv3x3 / packed_down4x4 / packed_up_fuse stats_w=...)."""
    eye = jnp.eye(p, dtype=jnp.float32)
    return (
        jnp.kron(eye, attn_w["to_q"].astype(jnp.float32)),
        jnp.kron(eye, attn_w["to_k"].astype(jnp.float32)),
    )


def msab_packed(xp, attn_w, ln_w, ffn_w, *, heads, c, p, stats=None, bounds=None):
    """One MSAB block on an already-packed (H, Wq, P*C) array.

    ``stats=(g, sq, sk)`` skips the pass-A kernel: the producer of ``xp``
    already accumulated the attention stats (attn_stats_weights).
    ``bounds=(lo, hi)`` marks the valid-image rows when xp is a
    halo-extended shard band (parallel/fused_shard.py)."""
    eye = jnp.eye(p, dtype=jnp.float32)
    kron = lambda m: jnp.kron(eye, m.astype(jnp.float32))
    tile = lambda v, reps: jnp.tile(v.astype(jnp.float32).reshape(1, -1), (1, reps))

    bp = tile(attn_w["proj_bias"], p)
    m0, m2 = _pos_mats(
        attn_w["to_v"], attn_w["pos_emb_0"], attn_w["pos_emb_2"], c, p
    )
    mavg = jnp.kron(eye, jnp.full((c, c), 1.0 / c, jnp.float32))
    lns = tile(ln_w[0], p)
    lnb = tile(ln_w[1], p)
    w0, dwk, w4 = _ffn_planar_weights(ffn_w, c, p)

    t = _pick_t(int(xp.shape[0]), c)
    if stats is None:
        wq_p, wk_p = attn_stats_weights(attn_w, c, p)
        g_p, sq_p, sk_p = _attn_stats(xp, wq_p, wk_p, t)
    else:
        g_p, sq_p, sk_p = stats
    abd = _attn_blockdiag(g_p, sq_p, sk_p, attn_w["rescale"], heads, c)
    wa_p = kron(attn_w["to_v"].astype(jnp.float32) @ abd @ attn_w["proj_kernel"].astype(jnp.float32))
    return _apply(xp, m0, wa_p, bp, m2, mavg, lns, lnb, w0, dwk, w4, t, c, p,
                  bounds=bounds)


def mst_stage_packed(xp, sw, dim: int = 31, shard=None):
    """One MST stage (MST_Plus_Plus.py:188-268) entirely on packed arrays:
    embedding conv -> encoder (MSAB + stride-2 down) x2 -> bottleneck MSAB
    -> decoder (fused up+depth-to-space+fuse kernel + MSAB) x2 -> mapping
    conv -> + input. ``sw`` is MST.weights_only()'s dict; xp (H, Wq, P*31).

    Every producer kernel (embedding conv, downsamples, up+fuse) rides the
    FOLLOWING MSAB's pass-A attention stats on its own grid walk, so no
    standalone stats kernel re-reads the frame; only 2nd+ MSABs of a
    multi-block level (MST variants) fall back to the stats kernel.

    ``shard`` (parallel/fused_shard.py) runs the stage on a halo-extended
    local H-band of a spatially sharded frame: a dict with

    - ``bounds``: (lo, hi) valid-image rows of the band in L0 coords
      (traced; rows outside behave as the global zero pad),
    - ``own``: (olo, ohi) STATIC L0 rows this device owns (the
      non-overlapping partition — attention stats are computed on exactly
      these rows and psum'd so every device sees the global Gram),
    - ``axis``: mesh axis name (or tuple) to psum stats over.

    In shard mode producers do not ride stats (their band includes halo
    rows that neighbors also compute — riding would double-count)."""
    c0 = dim
    p0 = _pack_of(c0)
    sharded = shard is not None
    if sharded:
        lo0, hi0 = shard["bounds"]
        olo0, ohi0 = shard["own"]
        axis = shard["axis"]

    def bnd(lvl):
        if not sharded:
            return None
        return (lo0 // (1 << lvl), hi0 // (1 << lvl))

    def _first_stats(blocks, c, p):
        if sharded or not blocks:
            return None
        return attn_stats_weights(blocks[0]["attn"], c, p)

    def _shard_stats(fea, attn_w, c, p, lvl):
        olo, ohi = olo0 >> lvl, ohi0 >> lvl
        wq_p, wk_p = attn_stats_weights(attn_w, c, p)
        own = fea[olo:ohi]
        g, sq, sk = _attn_stats(own, wq_p, wk_p, _pick_t(int(own.shape[0]), c))
        return jax.lax.psum((g, sq, sk), axis)

    def _run_msabs(fea, blocks, c, p, lvl, stats):
        for bi, blk in enumerate(blocks):
            st = stats if bi == 0 else None
            if st is None and sharded:
                st = _shard_stats(fea, blk["attn"], c, p, lvl)
            fea = msab_packed(fea, blk["attn"], blk["ln"], blk["ffn"],
                              heads=c // dim, c=c, p=p, stats=st,
                              bounds=bnd(lvl))
        return fea

    c, p, lvl = c0, p0, 0
    res = packed_conv3x3(
        xp, sw["embedding"], c0, p0,
        stats_w=_first_stats(sw["enc"][0]["msab"], c, p), bounds=bnd(0),
    )
    if isinstance(res, (tuple, list)):
        fea, *st = res
    else:
        fea, st = res, []

    skips = []
    for li, enc in enumerate(sw["enc"]):
        fea = _run_msabs(fea, enc["msab"], c, p, lvl, tuple(st) if st else None)
        skips.append((fea, c, p, lvl))
        nxt_blocks = (
            sw["enc"][li + 1]["msab"] if li + 1 < len(sw["enc"])
            else sw["bottleneck"]["msab"]
        )
        nc, npp = c * 2, p // 2
        res = packed_down4x4(fea, enc["down"], c, p,
                             stats_w=_first_stats(nxt_blocks, nc, npp),
                             bounds=bnd(lvl))
        if isinstance(res, (tuple, list)):
            fea, *st = res
        else:
            fea, st = res, []
        c, p, lvl = nc, npp, lvl + 1

    fea = _run_msabs(
        fea, sw["bottleneck"]["msab"], c, p, lvl, tuple(st) if st else None
    )

    for dec, (skip, cs, ps, ls) in zip(sw["dec"], reversed(skips)):
        half = c // 2
        res = packed_up_fuse(
            fea, skip, dec["up_kernel"], dec["up_bias"], dec["fuse_kernel"],
            c, p, stats_w=_first_stats(dec["msab"], cs, ps), bounds=bnd(lvl),
        )
        if isinstance(res, (tuple, list)):
            fea, *st = res
        else:
            fea, st = res, []
        c, p, lvl = half, 2 * p, ls
        fea = _run_msabs(fea, dec["msab"], c, p, lvl, tuple(st) if st else None)

    return packed_conv3x3(fea, sw["mapping"], c0, p0, bounds=bnd(0), residual=xp)


def _conv3_mats_io(w, cin: int, cout: int, p: int):
    """(3, 3, Cin, Cout) conv weight -> 3 per-dy (3*P*Cin, P*Cout) matrices
    (generalizes _conv3_mats to Cin != Cout; same nbr-pack contract)."""
    pci, pco = p * cin, p * cout
    mats = []
    for dy in range(3):
        m = jnp.zeros((3 * pci, pco), jnp.float32)
        for po in range(p):
            for dx in range(3):
                ip = p + po + dx - 1
                m = m.at[ip * cin : (ip + 1) * cin, po * cout : (po + 1) * cout].add(
                    w[dy, dx].astype(jnp.float32)
                )
        mats.append(m)
    return jnp.stack(mats)


def _conv3_io_kernel(x_ref, m_ref, b_ref, o_ref, a_scr, b_scr, *, t, wq_n, pci, pco, h):
    i = pl.program_id(0)
    lo, hi = b_ref[0, 0], b_ref[0, 1]
    cur = x_ref[...]
    ti = i - 1
    win = jnp.concatenate([b_scr[...], a_scr[...], cur[:1]], axis=0)
    gi = ti * t - 1 + jax.lax.broadcasted_iota(jnp.int32, (t + 2, 1, 1), 0)
    win = jnp.where((gi >= lo) & (gi < hi), win, 0.0)
    b_scr[...] = a_scr[t - 1 :]
    a_scr[...] = cur
    nbrw = _nbr(win)
    out = None
    for dy in range(3):
        band = nbrw[dy : dy + t]
        piece = _dot(band.reshape(t * wq_n, 3 * pci), m_ref[dy])
        out = piece if out is None else out + piece
    o_ref[...] = out.reshape(t, wq_n, pco)


def packed_conv3x3_io(xp, w, cin: int, cout: int, p: int, t: int = 16, bounds=None):
    """Same-resolution 3x3 conv Cin -> Cout on packed arrays: (H, Wq, P*Cin)
    -> (H, Wq, P*Cout). Used for conv_in (3 -> 31): the raw RGB frame views
    packed for free and feat is born packed — no XLA conv, no relayout."""
    h, wq_n, pci = int(xp.shape[0]), int(xp.shape[1]), int(xp.shape[2])
    pco = p * cout
    t = max(2, min(t, h))
    n = -(-h // t)
    mats = _conv3_mats_io(w, cin, cout, p)
    return pl.pallas_call(
        functools.partial(_conv3_io_kernel, t=t, wq_n=wq_n, pci=pci, pco=pco, h=h),
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((t, wq_n, pci), lambda i: (jnp.minimum(i, n - 1), 0, 0)),  # noqa: B023
            pl.BlockSpec((3, 3 * pci, pco), lambda i: (0, 0, 0)),
            _bounds_spec(),
        ],
        out_specs=pl.BlockSpec((t, wq_n, pco), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, wq_n, pco), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t, wq_n, pci), jnp.float32),
            pltpu.VMEM((1, wq_n, pci), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, mats, _bounds_arr(bounds, h))
