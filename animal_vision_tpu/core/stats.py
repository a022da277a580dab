"""Global per-frame statistics: percentile normalization, safe min-max norm.

Percentile normalization (p95/p98/p99 via np.percentile) is pervasive in the
reference's UV mappers (uv_mappers.py:33-34,61-62,73,103,141) and several UV
species. These are data-dependent global reductions; on TPU we keep them
inside the jitted program as sort-based reductions over a statically shaped
flattened frame (jnp.percentile == np.percentile 'linear' method).
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp

EPS_DEFAULT = 1e-8


def _kth_order_stat(u: jnp.ndarray, kidx) -> jnp.ndarray:
    """Exact k-th (0-indexed) order statistic of a total-order uint32 view
    via radix-16 selection (8 passes of 4 value bits). A pass bins
    ``(u - lo) >> shift`` into 16 buckets and counts each with a plain
    float32 where-sum over the 128-row axis. The float accumulator is the
    load-bearing choice: XLA multi-output-fuses sibling f32 reductions
    into ONE sweep of the array (measured 1.9 ms for all 16 counts on a
    21M-element mantis band stack), while uint32 reductions refuse the
    fusion and re-sweep per counter (14.6 ms/pass — the earlier
    packed-bitfield counters fought the op count but kept the uint32
    accumulator, which was the actual cost). Exactness holds: each
    axis-0 partial is an integer <= 128 (exact in f32); the per-bucket
    finish sums those partials in int32. Values outside the current
    window wrap to idx >= 16 and match no bucket, so they drop out with
    no explicit mask. The histogram — and therefore the selected order
    statistic — is bit-identical to a serial count.

    Padding: ``u`` is padded to a multiple of 128 with 0xFFFFFFFF keys
    (the NaN key — above every finite value's key), which sort strictly
    after all real elements, so any rank < n_real is unaffected."""
    uf = u.ravel()
    pad = (-uf.size) % 128
    if pad:
        uf = jnp.concatenate([uf, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    # Barrier AFTER the (128, -1) reshape: a reshape producer fuses into
    # every counting reduction and blocks their sibling fusion (same
    # pathology as _order_keys_1d documents), re-sweeping the array per
    # bucket. Materializing g once keeps each pass to a single sweep.
    g = jax.lax.optimization_barrier(uf.reshape(128, -1))
    lo = jnp.uint32(0)
    nb = jnp.int32(0)
    # unrolled (a fori_loop measures ~25% slower: the while-loop carries
    # defeat cross-pass pipelining)
    for i in range(8):
        sh = jnp.uint32(28 - 4 * i)
        idx = (g - lo) >> sh
        # Eight sibling f32 where-sums, each packing TWO bucket counts in
        # one accumulator (even bucket at 1, odd at 4096; per-column sums
        # <= 128*4097 < 2^24, so f32 addition stays exact). f32 is the
        # load-bearing accumulator choice — XLA multi-output-fuses sibling
        # f32 reductions into ONE sweep of the array, while uint32
        # reductions refuse the fusion and re-sweep per counter; the
        # packing then halves the per-element op count vs 16 plain sums.
        base = jnp.where((idx & 1) == jnp.uint32(0), 1.0, 4096.0)
        hw = idx >> 1
        wide = jnp.stack(
            [
                jnp.sum(jnp.where(hw == jnp.uint32(w), base, 0.0), axis=0)
                for w in range(8)
            ]
        )  # (8, N/128)
        # Barrier so the finish below can't pull the big fused sweep into
        # its own (unfused, re-sweeping) reductions.
        wide = jax.lax.optimization_barrier(wide)
        odd = jnp.floor(wide * (1.0 / 4096.0))
        even = wide - 4096.0 * odd
        hist = jnp.stack(
            [
                s
                for w in range(8)
                for s in (
                    jnp.sum(even[w].astype(jnp.int32)),
                    jnp.sum(odd[w].astype(jnp.int32)),
                )
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


def _reduce_axes_for(shape) -> tuple | None:
    """Reduction axes for the inline counting passes: all but the longest
    axis, so each per-position partial count is a small exact integer in
    f32 (<= 2^22 << 2^24). None -> use the ravel-to-(128, X) fallback
    (1-D or degenerate shapes)."""
    if len(shape) < 2:
        return None
    sizes = [int(s) for s in shape]
    longest = max(range(len(sizes)), key=lambda i: sizes[i])
    others = 1
    for i, s in enumerate(sizes):
        if i != longest:
            others *= s
    if others < 2 or others > (1 << 22):
        return None
    return tuple(i for i in range(len(sizes)) if i != longest)


def _inline_keys(x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Total-order keys as a FUSED producer (bitcast + one where): unlike
    the materialized _order_keys_1d path, these 2 cheap VPU ops recompute
    inside every counting pass's read, avoiding the 83 MB r+w key
    materialization AND the moveaxis relayout entirely (measured 4.2 ->
    2.9 ms on the mantis (1080, 1920, 10) stack, tools/exp_pct13.py).
    Sibling reduction fusion survives an elementwise producer — the
    pathology _order_keys_1d documents is specific to transpose/reshape
    producers."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    u = jnp.where(bits >> 31 == 0, bits | jnp.uint32(0x80000000), ~bits)
    if valid is not None:
        u = jnp.where(valid, u, jnp.uint32(0xFFFFFFFF))
    return u


def _kth_from_inline(u: jnp.ndarray, axes: tuple, kidx) -> jnp.ndarray:
    """Radix-16 selection over the inline key array ``u`` in its natural
    layout: 16 sibling f32 where-sums per pass, reduced over ``axes``
    (exact small-integer partials), finished in int32. Histogram — and the
    selected order statistic — is bit-identical to _kth_order_stat."""
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
        j = jnp.sum((cum <= kidx - nb).astype(jnp.int32))
        nb = nb + jnp.where(j > 0, cum[jnp.maximum(j - 1, 0)], 0)
        lo = lo + (j.astype(jnp.uint32) << sh)
    return lo


def _order_keys_1d(x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """Compact 1-D total-order keys of ``x``, materialized behind an
    optimization barrier.

    Two TPU-specific hazards this avoids (each measured ~25-80x on the
    mantis (1080, 1920, 10) band stack):

    - ``x.ravel()`` of an array whose minor dim is far below 128 lanes is
      a catastrophic relayout of the lane-padded physical layout. Moving
      the short axis to the front first (a cheap tiled transpose) lets the
      ravel merge the already-lane-aligned trailing dims. Order statistics
      only see the element multiset, so the permutation is free.
    - Without the barrier, XLA fuses the transpose+key-map producer into
      every counting reduction AND the fused producer blocks the sibling
      multi-output reduction fusion — each of the 8 passes' 16 bucket
      counts then re-sweeps the full array alone (measured 127 ms vs 5.4
      for the barriered form)."""
    if x.ndim >= 2 and int(x.shape[-1]) < 128:
        x = jnp.moveaxis(x, -1, 0)
    u = _f32_to_order(x.ravel())
    if valid is not None:
        if valid.ndim >= 2 and int(valid.shape[-1]) < 128:
            valid = jnp.moveaxis(valid, -1, 0)
        u = jnp.where(valid.ravel(), u, jnp.uint32(0xFFFFFFFF))
    return jax.lax.optimization_barrier(u)


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
    return _pct_tpu(float(q))(x)


def _tpu_percentile_unbatched(x, q: float):
    n = int(x.size)
    v = (n - 1) * float(q) / 100.0
    k0 = int(v)
    frac = v - k0
    axes = _reduce_axes_for(x.shape)
    if axes is not None:
        u = _inline_keys(x)
        o0 = _kth_from_inline(u, axes, k0)
    else:
        u = _order_keys_1d(x)
        o0 = _kth_order_stat(u, k0)
    val0 = _order_to_f32(o0)
    if frac == 0.0 or k0 + 1 >= n:
        return val0
    # next order stat: min over values strictly greater, unless duplicates
    # of val0 extend past k0+1.
    if axes is not None:
        cnt0 = jnp.sum(
            jnp.sum(jnp.where(u <= o0, 1.0, 0.0), axis=axes).astype(jnp.int32)
        )
    else:
        cnt0 = jnp.sum((u <= o0).astype(jnp.int32))
    bigger = jnp.where(u > o0, u, jnp.uint32(0xFFFFFFFF))
    val1 = _order_to_f32(jnp.min(bigger))
    val1 = jnp.where(cnt0 >= k0 + 2, val0, val1)
    return val0 + jnp.float32(frac) * (val1 - val0)


def _tpu_percentile_batched(xb, q: float):
    """Per-frame exact percentile over a leading batch axis — the
    custom_vmap rule for the species pipelines (which vmap whole per-frame
    programs over a frame batch).

    Under vmap-driven batching, XLA does NOT multi-output-fuse the sibling
    counting reductions, so the per-pass cost is (number of reductions) x
    (one array sweep). This form therefore packs four 8-bit bucket fields
    per uint32 accumulator — 4 reductions/pass (the minimum for a 16-way
    histogram at <=128-row partial sums) — where the unbatched form uses
    8 fused f32 sums (1 sweep). Histogram, and thus the selection, is
    bit-identical to the unbatched path."""
    b = int(xb.shape[0])
    n = int(xb.size) // b
    v = (n - 1) * float(q) / 100.0
    k0 = int(v)
    frac = v - k0
    x = xb
    if x.ndim >= 3 and int(x.shape[-1]) < 128:
        x = jnp.moveaxis(x, -1, 1)  # cheap tiled transpose; multiset-free
    u = _f32_to_order(x.reshape(b, -1))
    pad = (-n) % 128
    if pad:
        u = jnp.concatenate(
            [u, jnp.full((b, pad), 0xFFFFFFFF, jnp.uint32)], axis=1
        )
    g = jax.lax.optimization_barrier(u.reshape(b, 128, -1))
    lo = jnp.zeros((b,), jnp.uint32)
    nb = jnp.zeros((b,), jnp.int32)
    for i in range(8):
        sh = jnp.uint32(28 - 4 * i)
        idx = (g - lo[:, None, None]) >> sh
        lo2 = idx & 3
        base = jnp.where(
            lo2 < 2,
            jnp.where(lo2 == 0, jnp.uint32(1), jnp.uint32(1 << 8)),
            jnp.where(lo2 == 2, jnp.uint32(1 << 16), jnp.uint32(1 << 24)),
        )
        hi = idx >> 2
        packed = [
            jnp.sum(
                jnp.where(hi == jnp.uint32(w), base, jnp.uint32(0)),
                axis=1,
                dtype=jnp.uint32,
            )
            for w in range(4)
        ]  # 4 x (B, X); 8-bit fields hold <=128 each
        packed = list(jax.lax.optimization_barrier(tuple(packed)))
        hist = jnp.stack(
            [
                jnp.sum(
                    ((packed[j >> 2] >> (8 * (j & 3))) & 0xFF).astype(jnp.int32),
                    axis=1,
                )
                for j in range(16)
            ],
            axis=1,
        )  # (B, 16)
        cum = jnp.cumsum(hist, axis=1)
        j = jnp.sum((cum <= (k0 - nb)[:, None]).astype(jnp.int32), axis=1)
        prev = jnp.take_along_axis(cum, jnp.maximum(j - 1, 0)[:, None], axis=1)[:, 0]
        nb = nb + jnp.where(j > 0, prev, 0)
        lo = lo + (j.astype(jnp.uint32) << sh)
    val0 = _order_to_f32(lo)
    if frac == 0.0 or k0 + 1 >= n:
        return val0
    lo3 = lo[:, None, None]
    cnt0 = jnp.sum((g <= lo3), axis=(1, 2), dtype=jnp.int32)
    bigger = jnp.where(g > lo3, g, jnp.uint32(0xFFFFFFFF))
    val1 = _order_to_f32(jnp.min(bigger, axis=(1, 2)))
    val1 = jnp.where(cnt0 >= k0 + 2, val0, val1)
    return val0 + jnp.float32(frac) * (val1 - val0)


@_functools.lru_cache(maxsize=None)
def _pct_tpu(q: float):
    """custom_vmap'd TPU percentile: fused-sweep composition unbatched, the
    4-reduction packed-counter composition when a species pipeline vmaps it
    over a frame batch."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def pct(x):
        return _tpu_percentile_unbatched(x, q)

    @pct.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ARG001
        (xb,) = in_batched
        if not xb:
            return pct(x), False
        # lax.map of the fused-sweep unbatched form: inside a scan body the
        # eight sibling f32 counting reductions DO multi-output-fuse (one
        # array sweep per pass), unlike under direct vmap batching — 29.6 ->
        # 25.4 ms for a (8, 1080, 1920, 10) stack (tools/exp_pct12.py). The
        # packed-counter batched form is kept for reference/tests.
        return jax.lax.map(lambda xi: _tpu_percentile_unbatched(xi, q), x), True

    return pct


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
        axes = _reduce_axes_for(x.shape)
        if axes is not None:
            u = _inline_keys(x, valid)
            o0 = _kth_from_inline(u, axes, k0)
            val0 = _order_to_f32(o0)
            cnt0 = jnp.sum(
                jnp.sum(jnp.where(u <= o0, 1.0, 0.0), axis=axes).astype(jnp.int32)
            )
        else:
            u = _order_keys_1d(x, valid)
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
