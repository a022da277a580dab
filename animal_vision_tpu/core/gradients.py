"""Spatial gradients: Sobel, local orientation, structure tensor.

Used by the texture-sensitive UV species: anchovy polarization orientation,
kestrel structure-tensor "trailness", morpho iridescence orientation,
dragonfly E-vector alignment, mantis shrimp polarization
(SURVEY.md §2.7). Matches cv2.Sobel(ksize=3, BORDER_REFLECT_101).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import blur as _blur

_SMOOTH = np.array([1.0, 2.0, 1.0], dtype=np.float32)
_DERIV = np.array([-1.0, 0.0, 1.0], dtype=np.float32)


def sobel_x(img2d: jnp.ndarray) -> jnp.ndarray:
    """cv2.Sobel(dx=1, dy=0, ksize=3): derivative along x, smooth along y."""
    out = _blur.conv1d_axis(img2d, _DERIV, axis=-1)
    return _blur.conv1d_axis(out, _SMOOTH, axis=-2)


def sobel_y(img2d: jnp.ndarray) -> jnp.ndarray:
    """cv2.Sobel(dx=0, dy=1, ksize=3): derivative along y, smooth along x."""
    out = _blur.conv1d_axis(img2d, _DERIV, axis=-2)
    return _blur.conv1d_axis(out, _SMOOTH, axis=-1)


def orientation(img2d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(gx, gy, theta=atan2(gy, gx)) from 3x3 Sobel."""
    gx = sobel_x(img2d)
    gy = sobel_y(img2d)
    return gx, gy, jnp.arctan2(gy, gx)


def structure_tensor(
    img2d: jnp.ndarray, sigma: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gaussian-windowed structure tensor components (Jxx, Jxy, Jyy) using the
    UV-helper blur kernel sizing."""
    gx = sobel_x(img2d)
    gy = sobel_y(img2d)
    gxy = gx * gy
    ctx = _bucket_ctx_for(img2d)
    if ctx is not None:
        # Padded-bucket exactness: under reflection gx is symmetric across a
        # row mirror and antisymmetric across a column mirror (gy the
        # transpose), so the mirror padding holds -gxy exactly where the
        # exact program's reflect-101 blur border would read +gxy. The
        # squares are sign-free; gxy needs one cheap sign flip in the
        # (row XOR col) padding region before the blur.
        rows = jnp.arange(ctx.bh, dtype=jnp.int32)[:, None] >= ctx.hr
        cols = jnp.arange(ctx.bw, dtype=jnp.int32)[None, :] >= ctx.wr
        gxy = jnp.where(rows ^ cols, -gxy, gxy)
    jxx = _blur.gaussian_blur_uv(gx * gx, sigma)
    jxy = _blur.gaussian_blur_uv(gxy, sigma)
    jyy = _blur.gaussian_blur_uv(gy * gy, sigma)
    return jxx, jxy, jyy


def _bucket_ctx_for(img2d: jnp.ndarray):
    from animal_vision_tpu.core import bucketctx

    ctx = bucketctx.current()
    if ctx is not None and (int(img2d.shape[0]), int(img2d.shape[1])) == (ctx.bh, ctx.bw):
        return ctx
    return None


def coherence_energy(
    img2d: jnp.ndarray, sigma: float, eps: float = 1e-8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvalue coherence ((l1-l2)/(l1+l2)) and energy (l1+l2) of the
    structure tensor — the kestrel ridge-"trailness" building blocks
    (animals/kestrel.py:113-136)."""
    jxx, jxy, jyy = structure_tensor(img2d, sigma)
    tr = jxx + jyy
    det_disc = jnp.sqrt(jnp.maximum((jxx - jyy) ** 2 + 4.0 * jxy * jxy, 0.0))
    l1 = 0.5 * (tr + det_disc)
    l2 = 0.5 * (tr - det_disc)
    coherence = (l1 - l2) / (l1 + l2 + eps)
    return coherence, tr
