"""Geometry ops: cv2-coefficient-matched resize, bilinear remap, FOV warps.

The reference uses OpenCV resize (INTER_LINEAR / INTER_AREA / INTER_CUBIC /
INTER_NEAREST), ``cv2.remap`` (binocular warp animals/animal_utils2.py:95-98,
anableps refraction), ``center_zoom`` (animals/animal_utils2.py:12-34) and
``panorama_warp`` (uv_helpers.py:84-99). All are reproduced here as JAX ops:

- Interpolation weights/indices are computed host-side with NumPy from the
  *static* shapes and parameters (they become compile-time constants), using
  OpenCV's exact float-path coefficient formulas.
- The device work is a handful of gathers + weighted sums per axis — fully
  fusable by XLA and layout-friendly on TPU.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Resize weight construction (host-side, static)
# ---------------------------------------------------------------------------


def _linear_taps(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """cv2 INTER_LINEAR float path: fx=(x+0.5)*scale-0.5 with edge clamping."""
    scale = src / dst
    dx = np.arange(dst, dtype=np.float64)
    fx = (dx + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    fx = fx - sx
    fx = np.where(sx < 0, 0.0, fx)
    sx = np.maximum(sx, 0)
    fx = np.where(sx >= src - 1, 1.0, fx)
    sx = np.minimum(sx, max(src - 2, 0))
    idx = np.stack([sx, np.minimum(sx + 1, src - 1)], axis=0)
    w = np.stack([1.0 - fx, fx], axis=0)
    return idx.astype(np.int32), w.astype(np.float32)


def _cubic_taps(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """cv2 INTER_CUBIC (Keys, A=-0.75) with replicate-clamped indices."""
    a = -0.75
    scale = src / dst
    dx = np.arange(dst, dtype=np.float64)
    fx = (dx + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    t = fx - sx
    w0 = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w1 = ((a + 2) * t - (a + 3)) * t * t + 1
    w2 = ((a + 2) * (1 - t) - (a + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2
    idx = np.stack([sx - 1, sx, sx + 1, sx + 2], axis=0)
    idx = np.clip(idx, 0, src - 1)
    w = np.stack([w0, w1, w2, w3], axis=0)
    return idx.astype(np.int32), w.astype(np.float32)


def _nearest_taps(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """cv2 INTER_NEAREST: sx = floor(x*scale), clamped (no center offset)."""
    scale = src / dst
    sx = np.clip(np.floor(np.arange(dst) * scale), 0, src - 1)
    return sx[None].astype(np.int32), np.ones((1, dst), dtype=np.float32)


def _area_matrix(src: int, dst: int) -> np.ndarray:
    """cv2 INTER_AREA general downscale: fractional box coverage per axis."""
    scale = src / dst
    m = np.zeros((dst, src), dtype=np.float64)
    for x in range(dst):
        start = x * scale
        end = min((x + 1) * scale, float(src))
        j0 = int(math.floor(start))
        j1 = int(math.ceil(end))
        for j in range(j0, min(j1, src)):
            ov = min(end, j + 1) - max(start, j)
            if ov > 0:
                m[x, j] = ov / scale
    return m.astype(np.float32)


def _area_upscale_taps(src: int, dst: int) -> tuple[np.ndarray, np.ndarray]:
    """cv2 INTER_AREA when upscaling: modified-linear coefficients
    (resize.cpp: sx=floor(dx*scale); fx=(dx+1)-(sx+1)*inv_scale; fx<=0 -> 0)."""
    scale = src / dst
    inv_scale = dst / src
    dx = np.arange(dst, dtype=np.float64)
    sx = np.floor(dx * scale).astype(np.int64)
    fx = (dx + 1) - (sx + 1) * inv_scale
    fx = np.where(fx <= 0, 0.0, fx - np.floor(fx))
    fx = np.where(sx >= src - 1, 0.0, fx)
    sx = np.minimum(sx, src - 1)
    idx = np.stack([sx, np.minimum(sx + 1, src - 1)], axis=0)
    w = np.stack([1.0 - fx, fx], axis=0)
    return idx.astype(np.int32), w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _resize_plan(src_hw: tuple[int, int], dst_hw: tuple[int, int], interp: str):
    """Per-axis (indices, weights) tap plans or dense matrices."""
    plans = []
    sh, sw = src_hw
    dh, dw = dst_hw
    if interp == "area":
        # cv2 uses the true area algorithm only when downscaling both axes.
        if dh <= sh and dw <= sw:
            return ("dense", _area_matrix(sh, dh), _area_matrix(sw, dw))
        return (
            "taps",
            _area_upscale_taps(sh, dh),
            _area_upscale_taps(sw, dw),
        )
    builder = {"linear": _linear_taps, "cubic": _cubic_taps, "nearest": _nearest_taps}[interp]
    for s, d in ((sh, dh), (sw, dw)):
        plans.append(builder(s, d))
    return ("taps", plans[0], plans[1])


def _taps_to_dense(idx: np.ndarray, w: np.ndarray, src: int) -> np.ndarray:
    """Fold per-output tap (indices, weights) into a dense (src, dst) matrix."""
    dst = idx.shape[1]
    m = np.zeros((src, dst), dtype=np.float64)
    for t in range(idx.shape[0]):
        for d in range(dst):
            m[idx[t, d], d] += w[t, d]
    return m.astype(np.float32)


def _apply_taps(img: jnp.ndarray, idx: np.ndarray, w: np.ndarray, axis: int) -> jnp.ndarray:
    """Apply a tap plan along ``axis``.

    On TPU, gathers are pathologically slow (~100 ms for a full-frame 1080p
    gather) so the plan is folded into a dense matrix applied on the MXU at
    full f32 precision. On CPU (tests, eager), gathers are fast and each
    unique einsum shape costs seconds of compile, so use jnp.take."""
    import jax

    if jax.default_backend() != "cpu":
        src = img.shape[axis]
        m = _taps_to_dense(idx, w, int(src))
        return _apply_dense(img, m.T, axis)
    out = None
    for t in range(idx.shape[0]):
        gathered = jnp.take(img, jnp.asarray(idx[t]), axis=axis)
        wt = jnp.asarray(w[t])
        shape = [1] * img.ndim
        shape[axis] = wt.shape[0]
        term = gathered * wt.reshape(shape)
        out = term if out is None else out + term
    return out


def dense_axis_matrix(src: int, dst: int, interp: str) -> np.ndarray:
    """(dst, src) dense resize matrix for ONE axis with cv2-exact
    coefficients — the building block for padded-bucket UV programs, where
    resize tables become *operands* instead of compile-time constants."""
    if interp == "area" and dst <= src:
        return _area_matrix(src, dst)
    builder = {
        "linear": _linear_taps,
        "cubic": _cubic_taps,
        "nearest": _nearest_taps,
        "area": _area_upscale_taps,
    }[interp]
    idx, w = builder(src, dst)
    return _taps_to_dense(idx, w, src).T.copy()


def apply_dense(img: jnp.ndarray, m, axis: int) -> jnp.ndarray:
    """Apply a (dst, src) dense per-axis resize matrix (may be a traced
    operand) along ``axis`` at full f32 precision."""
    return _apply_dense(img, m, axis)


def _banded_blocks(m: np.ndarray, chunk: int = 256):
    """Chunked block-banded decomposition of a static (dst, src) resize
    matrix. Every cv2 resize matrix is banded (<= 4 taps per output row), so
    the dense MXU matmul spends almost all its FLOPs on structural zeros —
    the 1080p panorama warp alone cost ~1.7 ms as dense matmuls. Splitting
    the output axis into chunks and slicing each chunk's nonzero src window
    keeps results bit-identical (dropped columns are exact zeros, and f32
    addition with 0.0 is an identity) while shrinking the contraction ~10x.
    Returns None when the matrix isn't usefully banded (dense fallback)."""
    dst, src = m.shape
    if dst < 2 * chunk:
        return None
    blocks = []
    cost = 0
    for o0 in range(0, dst, chunk):
        o1 = min(o0 + chunk, dst)
        nz = np.nonzero(np.any(m[o0:o1] != 0.0, axis=0))[0]
        s0, s1 = (int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, 1)
        blocks.append((o0, o1, s0, s1))
        cost += (o1 - o0) * (s1 - s0)
    if cost > 0.5 * dst * src:
        return None
    return blocks


def _apply_dense(img: jnp.ndarray, m: np.ndarray, axis: int) -> jnp.ndarray:
    moved = jnp.moveaxis(img, axis, 0)
    flat = moved.reshape(moved.shape[0], -1)
    # precision='highest': default TPU matmul precision (bf16) breaks the
    # interpolation parity budget.
    if isinstance(m, np.ndarray):
        import jax

        if jax.default_backend() != "cpu":
            if m.shape[0] == m.shape[1] and np.array_equal(
                m, np.eye(m.shape[0], dtype=m.dtype)
            ):
                return img  # e.g. cubic 1080 -> 1080 (panorama's H axis)
            blocks = _banded_blocks(m)
            if blocks is not None:
                outs = [
                    jnp.einsum(
                        "oi,if->of",
                        jnp.asarray(m[o0:o1, s0:s1]),
                        flat[s0:s1],
                        precision="highest",
                    )
                    for o0, o1, s0, s1 in blocks
                ]
                res = jnp.concatenate(outs, axis=0)
                return jnp.moveaxis(
                    res.reshape((m.shape[0],) + moved.shape[1:]), 0, axis
                )
    res = jnp.einsum("oi,if->of", jnp.asarray(m), flat, precision="highest")
    return jnp.moveaxis(res.reshape((m.shape[0],) + moved.shape[1:]), 0, axis)


def resize(img: jnp.ndarray, dst_hw: tuple[int, int], interp: str = "linear") -> jnp.ndarray:
    """Resize an (H, W) or (H, W, C) image to ``dst_hw`` with cv2-matched
    ``linear`` / ``cubic`` / ``nearest`` / ``area`` coefficients.

    Parity: uv_helpers.resize_preserve_range (uv_helpers.py:57-64) and every
    cv2.resize call site; float32 arithmetic throughout (the reference casts
    to float32 before resizing).
    """
    src_hw = (int(img.shape[0]), int(img.shape[1]))
    if tuple(src_hw) == tuple(dst_hw) and interp != "area":
        return img
    kind, py, px = _resize_plan(src_hw, tuple(dst_hw), interp)
    if kind == "dense":
        out = _apply_dense(img, py, axis=0)
        return _apply_dense(out, px, axis=1)
    out = _apply_taps(img, py[0], py[1], axis=0)
    return _apply_taps(out, px[0], px[1], axis=1)


# ---------------------------------------------------------------------------
# Remap (bilinear, constant border) and warps
# ---------------------------------------------------------------------------


def remap_bilinear(
    img: jnp.ndarray,
    map_x: np.ndarray | jnp.ndarray,
    map_y: np.ndarray | jnp.ndarray,
    border_value: float = 0.0,
) -> jnp.ndarray:
    """cv2.remap(..., INTER_LINEAR, BORDER_CONSTANT) parity.

    Each of the four bilinear taps that falls outside the source contributes
    the constant ``border_value``. ``img`` is (H, W) or (H, W, C); maps are
    (H_out, W_out) float arrays of source coordinates.
    """
    h, w = int(img.shape[0]), int(img.shape[1])
    mx = jnp.asarray(map_x, jnp.float32)
    my = jnp.asarray(map_y, jnp.float32)
    x0 = jnp.floor(mx)
    y0 = jnp.floor(my)
    fx = mx - x0
    fy = my - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    chans = img if img.ndim == 3 else img[..., None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        vals = chans[yc, xc]  # (H_out, W_out, C) gather
        return jnp.where(valid[..., None], vals, border_value)

    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    out = (
        tap(y0i, x0i) * w00
        + tap(y0i, x0i + 1) * w01
        + tap(y0i + 1, x0i) * w10
        + tap(y0i + 1, x0i + 1) * w11
    )
    return out if img.ndim == 3 else out[..., 0]


def vertical_remap_static(img: jnp.ndarray, map_y: np.ndarray) -> jnp.ndarray:
    """Bilinear vertical-only remap with a *static* (H, W) row map, as
    shifted-row multiply-adds (no gathers). Equivalent to
    cv2.remap(img, x_identity, map_y, INTER_LINEAR) when map_y stays in
    bounds (the anableps refraction clips it; anableps.py:223-236).

    Decomposition: iy = floor(map_y), d = iy - y ranges over a small static
    set; out = sum_d mask_d * ((1-f)*img[y+d] + f*img[y+d+1])."""
    h = int(img.shape[0])
    iy = np.floor(map_y).astype(np.int64)
    frac = (map_y - iy).astype(np.float32)
    yy = np.arange(h)[:, None]
    d = iy - yy
    dmin, dmax = int(d.min()), int(d.max())
    def shift_rows(x, dd):
        """Rows shifted by constant dd with edge clamp — slices, no gather."""
        if dd == 0:
            return x
        if dd > 0:
            tail = jnp.repeat(x[-1:], dd, axis=0)
            return jnp.concatenate([x[dd:], tail], axis=0)
        head = jnp.repeat(x[:1], -dd, axis=0)
        return jnp.concatenate([head, x[:dd]], axis=0)

    out = jnp.zeros_like(img)
    expand = (...,) + (None,) * (img.ndim - 2)
    for dd in range(dmin, dmax + 1):
        mask = d == dd
        if not mask.any():
            continue
        w0 = jnp.asarray((mask * (1.0 - frac)).astype(np.float32))[expand]
        w1 = jnp.asarray((mask * frac).astype(np.float32))[expand]
        out = out + shift_rows(img, dd) * w0 + shift_rows(img, dd + 1) * w1
    return out


def center_zoom(img: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Center crop (W/scale, H/scale) then resize back with INTER_LINEAR.
    No-op for scale <= 1. Parity: animals/animal_utils2.py:12-34."""
    if scale <= 1.0:
        return img
    h, w = int(img.shape[0]), int(img.shape[1])
    cw = max(1, int(np.round(w / scale)))
    ch = max(1, int(np.round(h / scale)))
    x0 = (w - cw) // 2
    y0 = (h - ch) // 2
    crop = img[y0 : y0 + ch, x0 : x0 + cw]
    return resize(crop, (h, w), "linear")


def panorama_warp(img: jnp.ndarray, scale_x: float) -> jnp.ndarray:
    """Widen horizontally by ``scale_x`` with INTER_CUBIC, center-crop back.
    Parity: uv_helpers.panorama_warp (uv_helpers.py:84-99)."""
    if abs(scale_x - 1.0) < 1e-3:
        return img
    h, w = int(img.shape[0]), int(img.shape[1])
    new_w = max(2, int(np.round(w * scale_x)))
    widened = resize(img, (h, new_w), "cubic")
    if new_w == w:
        return widened
    start = (new_w - w) // 2
    return widened[:, start : start + w]


def zoom_scale_from_fov_ratio(
    camera_hfov_deg: float, per_eye_half_fov_deg: float, animal_to_human_ratio: float
) -> float:
    """scale = tan(cam/2) / tan((eff_fov/ratio)/2).
    Parity: zoom_scale_from_cat_ratio (animals/animal_utils2.py:36-50)."""
    phi = float(per_eye_half_fov_deg)
    eff = min(float(camera_hfov_deg), 2.0 * phi)
    ratio = max(1.01, float(animal_to_human_ratio))
    cam = math.tan(math.radians(camera_hfov_deg) * 0.5)
    hum = math.tan(math.radians(eff / ratio) * 0.5)
    return float(cam / max(hum, 1e-6))


@functools.lru_cache(maxsize=None)
def _binocular_maps(
    in_hw: tuple[int, int],
    out_hw: tuple[int, int],
    fov_in_deg: float,
    per_eye_half_fov_deg: float,
    overlap_deg: float,
):
    """Static per-eye remap coordinates, validity masks and cos^2 weights.
    Parity: animal_fov_binocular_warp (animals/animal_utils2.py:52-105)."""
    h_in, w_in = in_hw
    out_h, out_w = out_hw
    phi = np.deg2rad(per_eye_half_fov_deg)
    psi = np.deg2rad(fov_in_deg * 0.5)
    ov = np.deg2rad(overlap_deg)
    alpha = max(0.0, phi - 0.5 * ov)

    u = np.linspace(-1.0, 1.0, out_w, dtype=np.float32)
    uu = np.broadcast_to(u[None, :], (out_h, out_w))
    theta = uu * phi
    gamma_l = theta - alpha
    gamma_r = theta + alpha

    def to_xsrc(g):
        return ((g / psi) * (w_in * 0.5) + (w_in * 0.5)).astype(np.float32)

    ymap = np.repeat(
        np.linspace(0, h_in - 1, out_h, dtype=np.float32)[:, None], out_w, axis=1
    )
    valid_l = (np.abs(gamma_l) <= psi).astype(np.float32)
    valid_r = (np.abs(gamma_r) <= psi).astype(np.float32)
    w_l = (np.cos(0.5 * np.pi * (theta / phi)) ** 2).astype(np.float32) * valid_l
    w_r = (np.cos(0.5 * np.pi * (theta / phi)) ** 2).astype(np.float32) * valid_r
    return to_xsrc(gamma_l), to_xsrc(gamma_r), ymap, w_l, w_r


@functools.lru_cache(maxsize=None)
def binocular_warp_matrix(
    in_w: int,
    out_w: int,
    fov_in_deg: float,
    per_eye_half_fov_deg: float,
    overlap_deg: float,
    out_h_probe: int = 2,
) -> np.ndarray:
    """The binocular FOV warp as an exact (W_in, W_out) column matrix.

    The warp's source x-coordinates and blend weights depend only on the
    output column (animals/animal_utils2.py:77-104: theta = u*phi varies
    along x only; ymap is the identity), so remap(left)+remap(right)+blend
    collapses to one per-column linear map:
    ``warped = clip(img01 @ M, 0, 1)``. Bilinear taps, validity masks, the
    constant-0 border and the cos^2 blend normalization are all folded in.
    This replaces two full-frame gathers (~100 ms at 1080p on TPU) with one
    matmul (~0.3 ms)."""
    ml, mr = binocular_warp_matrices(
        in_w, out_w, fov_in_deg, per_eye_half_fov_deg, overlap_deg, out_h_probe
    )
    return ml + mr


@functools.lru_cache(maxsize=None)
def binocular_warp_matrices(
    in_w: int,
    out_w: int,
    fov_in_deg: float,
    per_eye_half_fov_deg: float,
    overlap_deg: float,
    out_h_probe: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-eye (W_in, W_out) warp matrices (blend-normalized). Each eye's
    matrix is narrowly banded (2 bilinear taps per column), so applying them
    separately lets the banded-segment MXU path skip the ~half-frame gap
    between the eyes' source regions."""
    xl, xr, _ymap, w_l, w_r = _binocular_maps(
        (out_h_probe, in_w),
        (out_h_probe, out_w),
        fov_in_deg,
        per_eye_half_fov_deg,
        overlap_deg,
    )
    wsum = w_l[0] + w_r[0] + 1e-8
    out = []
    for eye_x, eye_w in ((xl[0], w_l[0]), (xr[0], w_r[0])):
        m = np.zeros((in_w, out_w), dtype=np.float64)
        for x in range(out_w):
            wn = float(eye_w[x]) / float(wsum[x])
            if wn == 0.0:
                continue
            xs = float(eye_x[x])
            x0 = int(np.floor(xs))
            fx = xs - x0
            if 0 <= x0 < in_w:
                m[x0, x] += wn * (1.0 - fx)
            if 0 <= x0 + 1 < in_w:
                m[x0 + 1, x] += wn * fx
        out.append(m.astype(np.float32))
    return out[0], out[1]


def resize_matrix(src: int, dst: int, interp: str = "linear") -> np.ndarray:
    """A 1-D resize as a dense (src, dst) matrix (for matmul-based resampling
    on the MXU instead of gathers)."""
    kind, py, px = _resize_plan((src, 2), (dst, 2), interp)
    if kind == "dense":
        return py.T.astype(np.float32)
    idx, wgt = py
    m = np.zeros((src, dst), dtype=np.float64)
    for t in range(idx.shape[0]):
        for d in range(dst):
            m[idx[t, d], d] += wgt[t, d]
    return m.astype(np.float32)


def binocular_fov_warp(
    img01: jnp.ndarray,
    fov_in_deg: float,
    per_eye_half_fov_deg: float,
    overlap_deg: float,
    out_hw: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Wide-FOV binocular blend: per-eye yaw remap (bilinear, constant black
    border) with cos^2 blend weights and validity masks, clipped to [0,1].
    Parity: animals/animal_utils2.py:52-105."""
    h, w = int(img01.shape[0]), int(img01.shape[1])
    out_hw = (h, w) if out_hw is None else tuple(out_hw)
    xl, xr, ymap, w_l, w_r = _binocular_maps(
        (h, w), out_hw, float(fov_in_deg), float(per_eye_half_fov_deg), float(overlap_deg)
    )
    left = remap_bilinear(img01, xl, ymap, 0.0)
    right = remap_bilinear(img01, xr, ymap, 0.0)
    wsum = (w_l + w_r + 1e-8)[..., None]
    out = (left * w_l[..., None] + right * w_r[..., None]) / wsum
    return jnp.clip(out, 0.0, 1.0)
