"""Global per-frame statistics: percentile normalization, safe min-max norm.

Percentile normalization (p95/p98/p99 via np.percentile) is pervasive in the
reference's UV mappers (uv_mappers.py:33-34,61-62,73,103,141) and several UV
species. These are data-dependent global reductions; on TPU we keep them
inside the jitted program as sort-based reductions over a statically shaped
flattened frame (jnp.percentile == np.percentile 'linear' method).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS_DEFAULT = 1e-8


def _kth_order_stat(u: jnp.ndarray, kidx) -> jnp.ndarray:
    """Exact k-th (0-indexed) order statistic of a total-order uint32 view
    via radix-16 selection (8 passes of 4 value bits) with PACKED per-pass
    counters. A pass bins ``(u - lo) >> shift`` into 16 buckets, but
    instead of 16 full compare-sum reductions (~34 vector ops/element,
    measured 6.1 ms on a 21M-element mantis band stack) it packs each
    group of 4 bucket contributions into 8-bit fields of one uint32
    (``1 << 8*(idx & 3)`` steered into word ``idx >> 2``) and runs FOUR
    fused sums over the 128-row axis (field max 128 < 256, no overflow),
    then unpacks sixteen short per-lane-group sums. ~18 ops/element per
    pass, same pass count / HBM reads as before — strictly less work
    whether the reduction is compute- or bandwidth-bound. Values outside
    the current window wrap to idx >= 16, whose high bits match no word
    index, so they drop out with no explicit mask. The histogram — and
    therefore the selected order statistic — is bit-identical.

    Padding: ``u`` is padded to a multiple of 128 with 0xFFFFFFFF keys
    (the NaN key — above every finite value's key), which sort strictly
    after all real elements, so any rank < n_real is unaffected."""
    uf = u.ravel()
    pad = (-uf.size) % 128
    if pad:
        uf = jnp.concatenate([uf, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    g = uf.reshape(128, -1)  # sum over axis 0 = sublane direction (fast)
    lo = jnp.uint32(0)
    nb = jnp.int32(0)
    # unrolled (a fori_loop measures ~25% slower: the while-loop carries
    # defeat cross-pass pipelining)
    for i in range(8):
        sh = jnp.uint32(28 - 4 * i)
        idx = (g - lo) >> sh
        base = jnp.uint32(1) << ((idx & 3) << 3)
        hi = idx >> 2
        packed = [
            jnp.sum(
                jnp.where(hi == jnp.uint32(w), base, jnp.uint32(0)),
                axis=0,
                dtype=jnp.uint32,
            )
            for w in range(4)
        ]
        hist = jnp.stack(
            [
                jnp.sum(((packed[j >> 2] >> (8 * (j & 3))) & 0xFF).astype(jnp.int32))
                for j in range(16)
            ]
        )
        cum = jnp.cumsum(hist)
        j = jnp.sum((cum <= kidx - nb).astype(jnp.int32))
        nb = nb + jnp.where(j > 0, cum[jnp.maximum(j - 1, 0)], 0)
        lo = lo + (j.astype(jnp.uint32) << sh)
    return lo


def _f32_to_order(u: jnp.ndarray) -> jnp.ndarray:
    bits = jax.lax.bitcast_convert_type(u, jnp.uint32)
    return jnp.where(bits >> 31 == 0, bits | jnp.uint32(0x80000000), ~bits)


def _order_to_f32(r: jnp.ndarray) -> jnp.ndarray:
    bits = jnp.where(r >> 31 != 0, r & jnp.uint32(0x7FFFFFFF), ~r)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def percentile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile parity (linear interpolation between order statistics).

    On TPU the two order stats come from exact bit-bisection (counting
    passes) instead of jnp.percentile's full sort; on CPU (tests, eager)
    jnp.percentile is used directly. Both are exact order statistics.

    Under an active bucket context (core.bucketctx) whose dims match ``x``,
    the statistic is computed over the REAL frame region only — the masked
    value set equals the exact program's, so the result is identical."""
    from animal_vision_tpu.core import bucketctx

    x = x.astype(jnp.float32)
    ctx = bucketctx.current()
    if ctx is not None and x.ndim >= 2:
        valid = ctx.valid_for(x.shape)
        if valid is not None:
            n_valid = ctx.n_valid_for(x.shape)
            if x.ndim == 3:
                valid = jnp.broadcast_to(valid[..., None], x.shape)
                n_valid = n_valid * int(x.shape[2])
            return _percentile_masked(x, valid, n_valid, float(q))
    if jax.default_backend() == "cpu":
        return jnp.percentile(x, q)
    n = int(x.size)
    v = (n - 1) * float(q) / 100.0
    k0 = int(v)
    frac = v - k0
    u = _f32_to_order(x.ravel())
    o0 = _kth_order_stat(u, k0)
    val0 = _order_to_f32(o0)
    if frac == 0.0 or k0 + 1 >= n:
        return val0
    # next order stat: min over values strictly greater, unless duplicates
    # of val0 extend past k0+1.
    cnt0 = jnp.sum((u <= o0).astype(jnp.int32))
    bigger = jnp.where(u > o0, u, jnp.uint32(0xFFFFFFFF))
    val1 = _order_to_f32(jnp.min(bigger))
    val1 = jnp.where(cnt0 >= k0 + 2, val0, val1)
    return val0 + jnp.float32(frac) * (val1 - val0)


def _rank_fixed_point(n_valid, q: float):
    """k0/frac for rank (n_valid-1)*q/100 with a *traced* n_valid.

    Computed in exact int32 fixed-point when q is a multiple of 0.1 (all
    reference percentiles are integers): with m = q*10 and n-1 = a*1000+b,
    (n-1)*m/1000 = a*m + (b*m)/1000 where b*m < 1e6 — no overflow, no
    rounding, so the bucketed result matches the exact path bit-for-bit.
    A float32 computation here has absolute error ~0.1 at ~2M valid pixels,
    enough to shift k0 by ±1. Non-0.1-multiple q falls back to f32 with the
    corresponding (documented) ±1-rank tolerance."""
    n_valid = jnp.asarray(n_valid)
    m = round(q * 10.0)
    if abs(m - q * 10.0) < 1e-9:
        nm1 = jnp.maximum(n_valid.astype(jnp.int32) - 1, 0)
        a, b = nm1 // 1000, nm1 % 1000
        prod = b * jnp.int32(m)
        k0 = a * jnp.int32(m) + prod // 1000
        frac = (prod % 1000).astype(jnp.float32) / 1000.0
        return k0, frac
    v = (n_valid.astype(jnp.float32) - 1.0) * (q / 100.0)
    k0 = jnp.floor(v).astype(jnp.int32)
    return k0, v - k0.astype(jnp.float32)


def _percentile_masked(x: jnp.ndarray, valid: jnp.ndarray, n_valid, q: float):
    """Exact percentile over ``x[valid]`` with a *traced* element count.

    k0/frac are data (the real frame size varies per call of one compiled
    bucket program), so the interpolation branch is a where, not Python."""
    k0, frac = _rank_fixed_point(n_valid, q)
    if jax.default_backend() == "cpu":
        s = jnp.sort(jnp.where(valid, x, jnp.inf).ravel())
        val0 = jnp.take(s, k0)
        val1 = jnp.take(s, jnp.minimum(k0 + 1, s.shape[0] - 1))
    else:
        u = jnp.where(valid.ravel(), _f32_to_order(x.ravel()), jnp.uint32(0xFFFFFFFF))
        o0 = _kth_order_stat(u, k0)
        val0 = _order_to_f32(o0)
        cnt0 = jnp.sum((u <= o0).astype(jnp.int32))
        bigger = jnp.where(u > o0, u, jnp.uint32(0xFFFFFFFF))
        val1 = _order_to_f32(jnp.min(bigger))
        val1 = jnp.where(cnt0 >= k0 + 2, val0, val1)
    interp = val0 + frac * (val1 - val0)
    return jnp.where((frac == 0.0) | (k0 + 1 >= n_valid), val0, interp)


def safe_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize to [0,1]; all-zeros when the range is < 1e-9.
    Parity: uv_helpers.safe_norm (uv_helpers.py:47-53)."""
    x = x.astype(jnp.float32)
    mn = jnp.min(x)
    mx = jnp.max(x)
    rng = mx - mn
    normed = (x - mn) / jnp.where(rng < 1e-9, 1.0, rng)
    return jnp.where(rng < 1e-9, jnp.zeros_like(x), normed)


def norm_by_percentile(x: jnp.ndarray, q: float, eps: float = EPS_DEFAULT) -> jnp.ndarray:
    """x / max(percentile(x, q), eps) — the mappers' norm95/98/99 idiom."""
    return x / jnp.maximum(percentile(x, q), eps)


def luminance709(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma weights used throughout the reference (0.2126/0.7152/0.0722)."""
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
