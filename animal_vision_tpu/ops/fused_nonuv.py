"""Fused Pallas TPU kernels for the non-UV species pipelines.

One kernel = the whole species program: uint8 frame in HBM -> normalize ->
sRGB->linear -> 3x3 dichromat matrix -> blur -> linear->sRGB -> uint8 frame.
The XLA composition of the same chain runs at ~330 fps/chip at 1080p; these
kernels run the dog-class chain at >1500 fps and the streak class >2000.

Design notes (what made it fast):

- **Interleaved layout.** The image stays (H, W*3) — no HWC<->planar
  transposes. A u8 transpose alone costs ~0.8 ms at 1080p in XLA, more than
  the entire kernel.
- **Everything folded into band matrices.** For the isotropic class, the
  horizontal blur, the 3x3 color matrix, and the reflect-101 W-borders are
  all baked into per-segment banded matrices applied on the MXU
  (out[3j+c] = sum_{t,c'} k[t] m[c,c'] lin[3*ref(j+t-R)+c']), in f32 via
  precision=HIGHEST. The vertical blur and the reflect-101 H-borders are
  baked into per-tile (T, T+2R) matrices (boundary tiles get "folded" rows).
- **No padding passes.** Row-halos come from passing the input twice (block
  i and block min(i+1, N-1)); partial last tiles rely on Pallas block
  masking; out-of-range u8 garbage rows are zero-weighted by the folded
  Y-matrices (u8 garbage is finite, so 0*garbage == 0).
- The streak class (reference quirk: horizontal-only blur + per-row kernels
  + per-row channel mixing — see core/blur.py) has row-varying weights, so
  it runs on the VPU as shifted-sum with per-row weight columns; channel
  mixing uses lane-mod-3 masks and pltpu.roll (channel shifts never cross a
  pixel boundary, so circular roll is exact).

Numerics match the golden XLA path (<= 1 uint8 LSB vs the cv2 oracles).
Tests run these kernels in Pallas interpret mode on the CPU backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animal_vision_tpu.core import blur as _blur

_SRGB_A = 0.055


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# sRGB transfer curves as Chebyshev-fit polynomials: Mosaic lowers ** to
# exp/log transcendentals, which measured ~0.06 ms/frame at 1080p across
# every species kernel. Horner in the [-1, 1]-shifted variable:
#   linearize deg-9 on [0.04045, 1]: |err| <= 7.3e-7
#   encode deg-13 in u = sqrt(x) on [sqrt(0.0031308), 1]: |err| <= 6.3e-6
# Both are far below the 0.5/255 = 2e-3 rounding quantum, so uint8 outputs
# stay <= 1 LSB vs the exact-pow oracle (golden-tested).
_LIN_COEF = (
    0.2332408, 0.4668917, 0.27259746, 0.030306619, -0.003833699, 0.001056675,
    -0.00025578044, 6.192202e-05, -0.00018284922, 0.0001174624,
)
_ENC_COEF = (
    0.5645806, 0.46160325, -0.03434599, 0.011822656, -0.0064787567,
    0.0046764403, 0.0018685015, -0.0048810644, -0.010951132, 0.014180024,
    0.011595288, -0.0139776515, -0.00603956, 0.006349149,
)


def _horner(t, coef):
    acc = jnp.full_like(t, coef[-1])
    for c in coef[-2::-1]:
        acc = acc * t + c
    return acc


def _linearize(f):
    t = f * 2.0843103538116825 - 1.0843103538116827
    return jnp.where(f <= 0.04045, f / 12.92, _horner(t, _LIN_COEF))


def _encode_u8(x):
    x = jnp.clip(x, 0.0, 1.0)
    t = jnp.sqrt(x) * 2.1185398288282156 - 1.1185398288282156
    s = jnp.where(x <= 0.0031308, 12.92 * x, _horner(t, _ENC_COEF))
    s = jnp.clip(s, 0.0, 1.0)
    return jnp.floor(s * 255.0 + 0.5).astype(jnp.int32).astype(jnp.uint8)


def _pick_tile(h: int, max_t: int = 64) -> int:
    """Tile rows: Mosaic requires block sublanes divisible by 8 (or equal to
    the array dim). Prefer the largest multiple-of-8 divisor of H in
    [16, max_t]; a small image becomes one full-array block; otherwise 32
    with partial-block masking."""
    for t in range(max_t, 15, -8):
        if t % 8 == 0 and h % t == 0:
            return t
    if h <= max_t:
        return h
    return 32


def _scale_of(img: jnp.ndarray) -> jnp.ndarray:
    """normalize_image's data-dependent 1/255 scale as an SMEM (1,1) scalar."""
    return (
        jnp.where(jnp.max(img) > 1, 1.0 / 255.0, 1.0).reshape(1, 1).astype(jnp.float32)
    )


# ---------------------------------------------------------------------------
# Matrix construction (host-side, static)
# ---------------------------------------------------------------------------


def _x_segments(w: int, kern: np.ndarray, mat: np.ndarray, seg_px: int = 128):
    """Segment plan for the interleaved X-blur+color matmul.

    Returns a list of (in_start_px, out_start_px, out_px, matrix) where matrix
    has shape (3*in_px, 3*out_px) and encodes
    out[3j+c] = sum_{t,c'} k[t]*m[c,c']*x[3*ref101(j+t-R)+c'].
    """
    k = len(kern)
    r = k // 2
    segs = []
    out_start = 0
    while out_start < w:
        out_px = min(seg_px, w - out_start)
        a = max(0, out_start - r)
        b = min(w, out_start + out_px + r)
        m = np.zeros((3 * (b - a), 3 * out_px), dtype=np.float64)
        for j in range(out_start, out_start + out_px):
            for t in range(k):
                src = int(_blur.reflect101_index(j + t - r, w))
                assert a <= src < b, (src, a, b)
                for c in range(3):
                    for c2 in range(3):
                        m[3 * (src - a) + c2, 3 * (j - out_start) + c] += (
                            kern[t] * mat[c, c2]
                        )
        segs.append((a, out_start, out_px, m.astype(np.float32)))
        out_start += out_px
    # Deduplicate identical matrices (all interior segments share one):
    # rewrite each segment's 4th field to an index into the distinct list.
    distinct: list[np.ndarray] = []
    plan = []
    for a, os_, op, m in segs:
        for i, d in enumerate(distinct):
            if d.shape == m.shape and np.array_equal(d, m):
                plan.append((a, os_, op, i))
                break
        else:
            distinct.append(m)
            plan.append((a, os_, op, len(distinct) - 1))
    return plan, distinct


def _y_matrices(h: int, t_rows: int, kern: np.ndarray) -> np.ndarray:
    """(N, T, T+2R) per-tile vertical-blur matrices with reflect-101 folding
    at the top/bottom image boundaries (and zero weight on out-of-image
    rows of partial/garbage windows)."""
    k = len(kern)
    r = k // 2
    n = -(-h // t_rows)
    out = np.zeros((n, t_rows, t_rows + 2 * r), dtype=np.float64)
    for i in range(n):
        for j in range(t_rows):
            gi = i * t_rows + j
            if gi >= h:
                continue  # masked output row
            for t in range(k):
                src = int(_blur.reflect101_index(gi + t - r, h))
                wsrc = src - (i * t_rows - r)
                if 0 <= wsrc < t_rows + 2 * r:
                    out[i, j, wsrc] += kern[t]
                else:
                    # Source row lives outside this tile's window. This can
                    # only happen when H < R at extreme reflections; fall
                    # back is handled by the caller choosing the XLA path.
                    raise ValueError("tile window too small for kernel")
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Isotropic-blur species kernel (dog / wolf / lion / ... classes)
# ---------------------------------------------------------------------------


def _dot3(a: jnp.ndarray, m_hi, m_lo) -> jnp.ndarray:
    """f32-accurate matmul as three bf16 MXU passes (hi/lo split): half the
    cost of precision=HIGHEST (6 passes), residual ~2^-16 relative — far
    below the 1-uint8-LSB budget."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.dot(ah, m_hi, preferred_element_type=jnp.float32)
    out = out + jnp.dot(ah, m_lo, preferred_element_type=jnp.float32)
    return out + jnp.dot(al, m_hi, preferred_element_type=jnp.float32)


def _iso_kernel(
    scale_ref, p_ref, a_ref, b_ref, my_ref, *mx_refs_and_out, segs, radius, t_rows, is_u8
):
    *mx_refs, o_ref = mx_refs_and_out
    scale = scale_ref[0, 0]
    # window = rows [i*T - R, i*T + T + R): tail of block i-1, block i, head
    # of block i+1 (boundary blocks clamp; garbage rows are zero-weighted by
    # the folded Y-matrices).
    win = jnp.concatenate(
        [p_ref[t_rows - radius :, :], a_ref[...], b_ref[:radius, :]], axis=0
    )
    if is_u8:
        win = win.astype(jnp.int32).astype(jnp.float32)
    f = jnp.clip(win * scale, 0.0, 1.0)
    lin = _linearize(f)
    my = my_ref[0]
    for a, out_start, out_px, mid in segs:
        mx_hi, mx_lo = mx_refs[2 * mid], mx_refs[2 * mid + 1]
        seg = lin[:, 3 * a : 3 * a + mx_hi.shape[0]]
        xb = _dot3(seg, mx_hi[...], mx_lo[...])
        yb = jnp.dot(my, xb, precision=jax.lax.Precision.HIGHEST)
        o_ref[:, 3 * out_start : 3 * (out_start + out_px)] = _encode_u8(yb)


@functools.partial(jax.jit, static_argnames=("alpha", "s_scale", "sigma"))
def fused_iso_u8(img: jnp.ndarray, alpha: float, s_scale: float, sigma: float):
    """Whole dog-class pipeline, uint8 (H,W,3) -> uint8 (H,W,3), one HBM pass.

    Equivalent to normalize -> srgb_to_linear -> @collapse_lms_matrix.T ->
    cv2-auto-ksize Gaussian blur -> encode (animals/dog.py:31-61)."""
    from animal_vision_tpu.core import color as _color

    mat = _color.collapse_lms_matrix(alpha, s_scale).astype(np.float64)
    return fused_matrix_blur(img, tuple(map(tuple, mat)), sigma)


@functools.partial(jax.jit, static_argnames=("mat", "sigma", "assume01"))
def fused_matrix_blur(
    img: jnp.ndarray, mat: tuple, sigma: float, assume01: bool = False
):
    """Fused linearize -> 3x3 matrix -> Gaussian blur -> encode-to-uint8 for a
    uint8 frame or an sRGB [0,1] float frame (``assume01=True`` skips the
    data-dependent normalize scale). ``mat`` is a 3x3 tuple-of-tuples.

    Used directly by the cat pipeline (explicit-LMS merge matrix on the
    binocular-warped sRGB frame, animals/cat.py:94-103)."""
    h, w = int(img.shape[0]), int(img.shape[1])
    is_u8 = img.dtype == jnp.uint8
    ksize = _blur.cv2_auto_ksize(sigma)
    kern = _blur.gaussian_kernel_1d(ksize, float(sigma)).astype(np.float64)
    radius = ksize // 2
    mat = np.asarray(mat, dtype=np.float64)

    t_rows = _pick_tile(h)
    n = -(-h // t_rows)
    segs, distinct = _x_segments(w, kern, mat)
    my = _y_matrices(h, t_rows, kern)

    flat = img.reshape(h, w * 3)
    if assume01:
        scale = jnp.ones((1, 1), jnp.float32)
    else:
        scale = _scale_of(img)

    # Pass each distinct matrix as a bf16 hi/lo pair (for _dot3).
    mx_arrays = []
    for m in distinct:
        hi = m.astype(jnp.bfloat16)
        lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        mx_arrays += [jnp.asarray(hi), jnp.asarray(lo)]

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((t_rows, w * 3), lambda i: (jnp.maximum(i - 1, 0), 0)),
        pl.BlockSpec((t_rows, w * 3), lambda i: (i, 0)),
        pl.BlockSpec((t_rows, w * 3), lambda i: (jnp.minimum(i + 1, n - 1), 0)),
        pl.BlockSpec((1, t_rows, t_rows + 2 * radius), lambda i: (i, 0, 0)),
    ] + [
        pl.BlockSpec(tuple(m.shape), lambda i: (0, 0))  # noqa: B023
        for m in mx_arrays
    ]

    out = pl.pallas_call(
        functools.partial(
            _iso_kernel, segs=segs, radius=radius, t_rows=t_rows, is_u8=is_u8
        ),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_rows, w * 3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w * 3), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(scale, flat, flat, flat, jnp.asarray(my), *mx_arrays)
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Streak-blur species kernel (horse / cow / deer / ... classes)
# ---------------------------------------------------------------------------


def _apply_mix_chroma_encode(acc2, mix_ref, chroma):
    """Shared tail: per-row 3x3 channel mix -> optional chroma -> encode.

    The mix implements the reference's (W,3)-as-image quirk:
    out[3j+c] = sum_c2 m[c,c2] * acc[3j+c2]. Channel shifts stay inside one
    pixel, so circular roll is exact under the lane-mod-3 mask."""
    mod3 = jax.lax.broadcasted_iota(jnp.int32, acc2.shape, 1) % 3
    mixed = jnp.zeros_like(acc2)
    for c in range(3):
        row = jnp.zeros_like(acc2)
        for c2 in range(3):
            shifted = acc2 if c2 == c else pltpu.roll(acc2, (c - c2) % acc2.shape[1], 1)
            row = row + mix_ref[:, 3 * c + c2 : 3 * c + c2 + 1] * shifted
        mixed = jnp.where(mod3 == c, row, mixed)
    acc2 = mixed

    if chroma is not None:
        # chroma compression lerps toward the per-pixel channel mean; gather
        # each pixel's three channels onto every one of its lanes with
        # masked intra-pixel rolls (negative shifts expressed mod L).
        lanes = acc2.shape[1]
        mod3w = jax.lax.broadcasted_iota(jnp.int32, acc2.shape, 1) % 3
        c0 = jnp.where(mod3w == 0, acc2, 0.0)
        c1 = jnp.where(mod3w == 1, acc2, 0.0)
        c2_ = jnp.where(mod3w == 2, acc2, 0.0)
        roll = lambda x, s: pltpu.roll(x, s % lanes, 1)
        s0 = c0 + roll(c1, -1) + roll(c2_, -2)
        s1 = roll(c0, 1) + c1 + roll(c2_, -1)
        s2 = roll(c0, 2) + roll(c1, 1) + c2_
        gray = jnp.where(mod3w == 0, s0, jnp.where(mod3w == 1, s1, s2)) * (1.0 / 3.0)
        acc2 = gray + (acc2 - gray) * (1.0 - chroma)

    return _encode_u8(acc2)


def _streak_kernel(scale_ref, x_ref, k_ref, mix_ref, o_ref, *, r, w, kmax, chroma):
    """One-pass streak pipeline per row tile.

    The reference's two per-row horizontal blurs with a per-row channel mix
    between them (animal_utils.py:147-172 via core.blur.streak_blur) collapse
    to ONE per-row convolution: the channel mix M_r acts on the channel index
    and the second blur K2_r on the pixel index, so they commute exactly and
    out_r = K2_r M_r K1_r x_r = M_r (K2_r * K1_r) x_r. The combined kernel
    k12 = k1 (*) k2 is precomputed per row on the host.

    Taps walk the row by static independent circular lane rolls (a lane
    rotate is ~2x cheaper than an unaligned lane slice on the VPU, and
    independent rolls keep instruction-level parallelism; per-tile dynamic
    tap bounds via fori_loop/lax.switch and a VMEM-scratch accumulator both
    measured slower than the straight unrolled loop).
    """
    scale = scale_ref[0, 0]
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * scale, 0.0, 1.0)
    lin = _linearize(f)
    wb = 3 * w  # body lanes

    # Interior: circular rolls directly on the body — no padding pass at all.
    # Wrap-around only corrupts pixels within r of either edge, and those are
    # overwritten by the exact border strips below. k12 is symmetric, so the
    # two taps at distance d share one per-row weight column (k_ref holds the
    # half-table, column d = distance from center).
    acc = lin * k_ref[:, 0:1]
    for d in range(1, r + 1):
        pair = pltpu.roll(lin, (3 * d) % wb, 1) + pltpu.roll(lin, (-3 * d) % wb, 1)
        acc = acc + pair * k_ref[:, d : d + 1]

    # Exact border strips, computed on narrow (T, <=384)-lane windows where
    # reflect-101 assembly and unaligned slices are cheap.
    def _border(strip):
        # strip covers pixels [px0, px0+strip_px) of the row; returns the
        # exact conv for pixels [px0+r, px0+strip_px-r).
        out_px = strip.shape[1] // 3 - 2 * r
        a = strip[:, 3 * r : 3 * r + 3 * out_px] * k_ref[:, 0:1]
        for j in range(kmax):
            d = abs(j - r)
            if d == 0:
                continue
            a = a + strip[:, 3 * j : 3 * j + 3 * out_px] * k_ref[:, d : d + 1]
        return a

    npx = 128 // 3 + 1  # pixels covered by one 128-lane block (rounded up)
    # left: reflect halo + first npx pixels
    refl = [lin[:, 3 * j : 3 * (j + 1)] for j in range(r, 0, -1)]
    strip_l = jnp.concatenate(refl + [lin[:, 0 : 3 * (npx + r)]], axis=1)
    fix_l = _border(strip_l)  # exact pixels [0, npx)
    # right: last npx pixels + reflect halo
    reflr = [lin[:, 3 * (w - 2 - j) : 3 * (w - 1 - j)] for j in range(r)]
    strip_r = jnp.concatenate([lin[:, 3 * (w - npx - r) :]] + reflr, axis=1)
    fix_r = _border(strip_r)  # exact pixels [w-npx, w)

    # Stitch: the wrong border lanes live inside the first/last 128-lane
    # blocks of the body — overwrite whole aligned blocks with the exact
    # strips (widened to 128 lanes from the 3*npx >= 128 computed ones).
    mid = acc[:, 128 : wb - 128]
    acc2 = jnp.concatenate(
        [fix_l[:, 0:128], mid, fix_r[:, 3 * npx - 128 : 3 * npx]], axis=1
    )
    o_ref[...] = _apply_mix_chroma_encode(acc2, mix_ref, chroma)


def streak_fixed_radius(params: tuple) -> int:
    """Species-fixed upper bound on the combined-kernel half width: the
    per-row sigma approaches (never exceeds) ``sigma_far``, and
    cv2_auto_ksize is monotone in sigma, so radii computed at sigma_far
    bound every row. Used by the bucketed path so every real H that maps to
    one bucket shares one compiled program."""
    _, _, s_f, _ = params
    k1 = _blur.cv2_auto_ksize(float(s_f))
    k2 = _blur.cv2_auto_ksize(max(0.4, 0.5 * float(s_f)))
    return (k1 + k2 - 2) // 2


def streak_tables(
    h: int, params: tuple, alpha: float, s_scale: float, r_fixed: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side per-row tables for the streak kernel.

    Returns (tab (h, r+1) f32, mix (h, 9) f32, r). tab is the symmetric
    half-table of the combined kernel k12 = k1 (*) k2 (column d = tap weight
    at distance d from center; symmetry enforced to the ulp so the
    paired-tap kernel is exact); mix is the per-row channel-mix matrix with
    the dichromat color matrix folded in. ``r_fixed`` widens the table to a
    species-fixed radius (zero-filled) so programs can be shared across H."""
    from animal_vision_tpu.core import color as _color

    y_c, s_s, s_f, fo = params
    sx, sy = _blur.streak_sigma_map(h, y_c, s_s, s_f, fo)

    rows = []
    for s1, s2 in zip(sx, sy):
        k1v = _blur.gaussian_kernel_1d(_blur.cv2_auto_ksize(float(s1)), float(s1))
        k2v = _blur.gaussian_kernel_1d(_blur.cv2_auto_ksize(float(s2)), float(s2))
        v = np.convolve(k1v.astype(np.float64), k2v.astype(np.float64))
        rows.append(0.5 * (v + v[::-1]))
    r = max(len(v) for v in rows) // 2 if r_fixed is None else r_fixed
    tab = np.zeros((h, r + 1), dtype=np.float32)
    for y, v in enumerate(rows):
        rv = len(v) // 2
        tab[y, : rv + 1] = v[rv:]

    mat = _color.collapse_lms_matrix(alpha, s_scale).astype(np.float64)
    # Fold the dichromat color matrix into the per-row channel-mix matrices
    # (both are per-pixel linear maps: mix_total = mix_row @ mat).
    mix = np.stack(
        [
            (
                _blur._channel_mix_matrix(_blur.cv2_auto_ksize(float(s)), float(s)).astype(np.float64)
                @ mat
            ).reshape(9)
            for s in sx
        ],
        axis=0,
    ).astype(np.float32)
    return tab, mix, r


def _streak_pallas(img, tab, mix, chroma):
    """Shared pallas_call plumbing: ``tab``/``mix`` are device operands (so a
    program compiled for one (H, W) bucket serves any real frame padded into
    it); their row counts must equal img's H."""
    h, w = int(img.shape[0]), int(img.shape[1])
    r = int(tab.shape[1]) - 1
    kmax = 2 * r + 1

    assert 3 * r <= 128, "kernel too wide for the roll margin"
    # The right border strip starts at pixel w - npx - r; a negative start
    # would silently wrap around in the slice and corrupt border pixels.
    assert 128 // 3 + 1 + r <= w, f"frame too narrow for r={r} border strips (w={w})"
    t_rows = _pick_tile(h, max_t=64)  # rolls measured cheapest at T=64 (vs 24/40/120)
    n = -(-h // t_rows)
    hp = n * t_rows

    flat = img.reshape(h, w * 3)
    scale = _scale_of(img)
    tabp = jnp.pad(tab, ((0, hp - h), (0, 0)))
    mixp = jnp.pad(mix, ((0, hp - h), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_streak_kernel, r=r, w=w, kmax=kmax, chroma=chroma),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((t_rows, w * 3), lambda i: (i, 0)),
            pl.BlockSpec((t_rows, r + 1), lambda i: (i, 0)),
            pl.BlockSpec((t_rows, 9), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((t_rows, w * 3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w * 3), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(scale, flat, tabp, mixp)
    return out.reshape(h, w, 3)


@functools.partial(
    jax.jit, static_argnames=("alpha", "s_scale", "params", "chroma")
)
def fused_streak_u8(
    img: jnp.ndarray,
    alpha: float,
    s_scale: float,
    params: tuple,
    chroma: float | None = None,
):
    """Whole streak-species pipeline, uint8 -> uint8, one HBM pass.

    normalize -> linear -> matrix -> streak blur (horizontal-only per-row
    sigmas + per-row channel mix; core.blur.streak_blur semantics) ->
    optional chroma compression -> encode. The two reference blur passes and
    the channel mix are algebraically reordered into one combined per-row
    convolution followed by one mix (see _streak_kernel)."""
    h = int(img.shape[0])
    tab, mix, _ = streak_tables(h, params, alpha, s_scale)
    return _streak_pallas(img, jnp.asarray(tab), jnp.asarray(mix), chroma)


@functools.partial(jax.jit, static_argnames=("chroma",))
def fused_streak_tab_u8(img, tab, mix, chroma: float | None = None):
    """Bucketed-shape variant: tables precomputed on the host (for the REAL
    frame height, zero-padded to img's bucket height) arrive as runtime
    operands, so nearby frame shapes padded into one bucket share this one
    compiled program (SURVEY.md §7 hard-part 5)."""
    return _streak_pallas(img, tab, mix, chroma)


# ---------------------------------------------------------------------------
# Pointwise species kernel (pig: matrix-only; rat: matrix + row gain)
# ---------------------------------------------------------------------------


def _pointwise_kernel(scale_ref, x_ref, gain_ref, o_ref, *, mat9, use_gain):
    scale = scale_ref[0, 0]
    f = jnp.clip(x_ref[...].astype(jnp.int32).astype(jnp.float32) * scale, 0.0, 1.0)
    lin = _linearize(f)
    mod3 = jax.lax.broadcasted_iota(jnp.int32, lin.shape, 1) % 3
    out = jnp.zeros_like(lin)
    for c in range(3):
        row = jnp.zeros_like(lin)
        for c2 in range(3):
            shifted = lin if c2 == c else pltpu.roll(lin, (c - c2) % lin.shape[1], 1)
            row = row + mat9[3 * c + c2] * shifted
        out = jnp.where(mod3 == c, row, out)
    if use_gain:
        # per-row gain on the blue channel only, clipped (rat's S-cone ramp)
        blue = jnp.clip(out * gain_ref[:, 0:1], 0.0, 1.0)
        out = jnp.where(mod3 == 2, blue, out)
    o_ref[...] = _encode_u8(out)


def scone_gain(h: int, scone: tuple) -> np.ndarray:
    """Host-side (h, 1) blue-channel row-gain vector for the rat's S-cone
    vertical ramp (animal_utils.py:206-259 semantics via core.effects)."""
    s_top, s_bottom, power, extra = scone
    wvec = np.linspace(s_top, s_bottom, h, dtype=np.float32)
    if power != 1.0:
        t = (wvec - s_bottom) / max(1e-8, s_top - s_bottom)
        t = np.clip(t, 0.0, 1.0) ** power
        wvec = s_bottom + (s_top - s_bottom) * t
    if extra != 0.0:
        wvec = 1.0 + extra * (wvec - 1.0)
    return wvec.astype(np.float32).reshape(-1, 1)


def _pointwise_pallas(img, gain, mat9, use_gain):
    h, w = int(img.shape[0]), int(img.shape[1])
    t_rows = _pick_tile(h)
    n = -(-h // t_rows)
    hp = n * t_rows

    flat = img.reshape(h, w * 3)
    gainp = jnp.pad(gain, ((0, hp - int(gain.shape[0])), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_pointwise_kernel, mat9=mat9, use_gain=use_gain),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((t_rows, w * 3), lambda i: (i, 0)),
            pl.BlockSpec((t_rows, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((t_rows, w * 3), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w * 3), jnp.uint8),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(_scale_of(img), flat, gainp)
    return out.reshape(h, w, 3)


@functools.partial(jax.jit, static_argnames=("alpha", "s_scale", "scone"))
def fused_pointwise_u8(
    img: jnp.ndarray, alpha: float, s_scale: float, scone: tuple | None = None
):
    """Matrix-only (pig) or matrix + S-cone row gain (rat) pipeline,
    uint8 -> uint8 in one pass (animals/pig.py, animals/rat.py)."""
    from animal_vision_tpu.core import color as _color

    h = int(img.shape[0])
    mat9 = tuple(
        float(v) for v in _color.collapse_lms_matrix(alpha, s_scale).reshape(9)
    )
    gain = jnp.asarray(
        scone_gain(h, scone) if scone is not None else np.ones((h, 1), np.float32)
    )
    return _pointwise_pallas(img, gain, mat9, scone is not None)


@functools.partial(jax.jit, static_argnames=("alpha", "s_scale"))
def fused_scone_tab_u8(img, gain, alpha: float, s_scale: float):
    """Bucketed-shape variant of the rat pipeline: the row-gain vector is a
    runtime operand (computed for the REAL height, zero-padded to the bucket
    height) so nearby shapes share one compiled program."""
    from animal_vision_tpu.core import color as _color

    mat9 = tuple(
        float(v) for v in _color.collapse_lms_matrix(alpha, s_scale).reshape(9)
    )
    return _pointwise_pallas(img, gain, mat9, True)
