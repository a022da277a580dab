"""Generic fused Pallas Gaussian blur for float32 maps and images.

The XLA shifted-sum blur executes each tap as a separate HBM pass (~1 ms per
blur at 1080p); the UV species run 6-12 blurs per frame. This kernel fuses
the whole separable blur into one HBM pass using the same banded-matrix MXU
machinery as ops/fused_nonuv.py:

- X-blur + reflect-101 W-borders folded into per-segment banded matrices
  (channels interleaved into lanes with stride C), applied via 3-pass bf16
  hi/lo splits (~f32 accuracy);
- Y-blur + H-borders folded into per-tile matrices; row halos from
  prev/cur/next block reads; partial tiles via Pallas block masking.

Numerics match cv2.GaussianBlur(..., BORDER_REFLECT_101) like the XLA path
(golden-tested). Dispatch: core.blur routes TPU executions here; the CPU
backend keeps the XLA taps (fast eager, exercised by the parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animal_vision_tpu.core import blur as _blur
from animal_vision_tpu.ops.fused_nonuv import _dot3, _pick_tile, _y_matrices


@functools.lru_cache(maxsize=None)
def _x_segments_id(w: int, kern: tuple, channels: int, seg_px: int = 128):
    """Banded X-blur matrices on interleaved (H, W*C) lanes, reflect-101
    folded at the W edges, identity across channels. Returns
    (plan [(in_start_px, out_start_px, out_px, matrix_id)], distinct)."""
    kern = np.asarray(kern, dtype=np.float64)
    k = len(kern)
    r = k // 2
    segs = []
    out_start = 0
    while out_start < w:
        out_px = min(seg_px, w - out_start)
        a = max(0, out_start - r)
        b = min(w, out_start + out_px + r)
        m = np.zeros((channels * (b - a), channels * out_px), dtype=np.float64)
        for j in range(out_start, out_start + out_px):
            for t in range(k):
                src = int(_blur.reflect101_index(j + t - r, w))
                for c in range(channels):
                    m[channels * (src - a) + c, channels * (j - out_start) + c] += kern[t]
        segs.append((a, out_start, out_px, m.astype(np.float32)))
        out_start += out_px
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


def _blur_kernel(p_ref, a_ref, b_ref, my_ref, *refs, segs, radius, t_rows, channels, h):
    *mx_refs, o_ref = refs
    win = jnp.concatenate(
        [p_ref[t_rows - radius :, :], a_ref[...], b_ref[:radius, :]], axis=0
    )
    # Zero rows outside the image. The Y-matrices already give them zero
    # weight, but a partial tail block makes Pallas read *uninitialized*
    # VMEM there, and 0 * inf/NaN garbage = NaN (seen in production at
    # H=507: the whole last tile went NaN). f32 inputs only — the uint8
    # kernels' garbage is always finite.
    gi = pl.program_id(0) * t_rows - radius + jax.lax.broadcasted_iota(
        jnp.int32, (t_rows + 2 * radius, 1), 0
    )
    win = jnp.where((gi >= 0) & (gi < h), win, 0.0)
    my = my_ref[0]
    for a, out_start, out_px, mid in segs:
        mx_hi, mx_lo = mx_refs[2 * mid], mx_refs[2 * mid + 1]
        seg = win[:, channels * a : channels * a + mx_hi.shape[0]]
        xb = _dot3(seg, mx_hi[...], mx_lo[...])
        yb = jnp.dot(my, xb, precision=jax.lax.Precision.HIGHEST)
        o_ref[:, channels * out_start : channels * (out_start + out_px)] = yb


def fused_gaussian_blur(img: jnp.ndarray, sigma: float, ksize: int | None = None):
    """One-pass Pallas blur for f32 (H, W) or (H, W, C) arrays. ``ksize``
    None -> cv2 auto sizing; pass _blur.uv_ksize(sigma) for the UV kernel."""
    k = ksize if ksize is not None else _blur.cv2_auto_ksize(sigma)
    kern = tuple(float(v) for v in _blur.gaussian_kernel_1d(k, float(sigma)))
    radius = k // 2

    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    h, w, c = int(x.shape[0]), int(x.shape[1]), int(x.shape[2])
    t_rows = _pick_tile(h)
    n = -(-h // t_rows)

    plan, distinct = _x_segments_id(w, kern, c)
    my = _y_matrices(h, t_rows, np.asarray(kern, np.float64))

    mx_arrays = []
    for m in distinct:
        hi = m.astype(jnp.bfloat16)
        lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        mx_arrays += [jnp.asarray(hi), jnp.asarray(lo)]

    flat = x.reshape(h, w * c).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((t_rows, w * c), lambda i: (jnp.maximum(i - 1, 0), 0)),
        pl.BlockSpec((t_rows, w * c), lambda i: (i, 0)),
        pl.BlockSpec((t_rows, w * c), lambda i: (jnp.minimum(i + 1, n - 1), 0)),
        pl.BlockSpec((1, t_rows, t_rows + 2 * radius), lambda i: (i, 0, 0)),
    ] + [pl.BlockSpec(tuple(m.shape), lambda i: (0, 0)) for m in mx_arrays]

    out = pl.pallas_call(
        functools.partial(
            _blur_kernel, segs=plan, radius=radius, t_rows=t_rows, channels=c, h=h
        ),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((t_rows, w * c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(flat, flat, flat, jnp.asarray(my), *mx_arrays)
    out = out.reshape(h, w, c)
    return out[..., 0] if squeeze else out
