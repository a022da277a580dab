"""Precision-controlled matmul helpers.

TPU matmuls default to bf16 (error ~4e-3 — beyond the parity budget) and
``precision=HIGHEST`` costs 6 bf16 passes. ``matmul_3pass`` gets f32-level
accuracy in 3 passes via the classic hi/lo bf16 split:
    a = a_hi + a_lo  (both bf16-representable)
    a @ b ~= a_hi@b_hi + a_hi@b_lo + a_lo@b_hi        (residual ~2^-16 rel)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_bf16_host(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side hi/lo bf16 split of a static matrix."""
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def einsum_3pass(subscripts: str, a: jnp.ndarray, b_hi, b_lo) -> jnp.ndarray:
    """einsum(a, b) with f32-level accuracy in 3 bf16 passes; ``b`` is given
    pre-split (static weights). uint8/int inputs are bf16-EXACT (integers
    <= 255), so their low half is identically zero and the third pass is
    skipped — resampling uint8 frames costs 2 MXU passes, not 3."""
    bh = jnp.asarray(b_hi)
    bl = jnp.asarray(b_lo)
    ah = a.astype(jnp.bfloat16)
    out = jnp.einsum(subscripts, ah, bh, preferred_element_type=jnp.float32)
    out = out + jnp.einsum(subscripts, ah, bl, preferred_element_type=jnp.float32)
    if jnp.issubdtype(a.dtype, jnp.integer) and a.dtype.itemsize == 1:
        return out  # 8-bit ints are exactly representable in bf16
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + jnp.einsum(subscripts, al, bh, preferred_element_type=jnp.float32)


def _band_segments(m: np.ndarray, seg: int):
    """Split a (In, Out) column-map matrix with banded support into
    [(in_start, in_stop, out_start, sub_matrix)] per output segment —
    resampling matrices (warps, zooms, blurs) have few taps per column, so
    dense application wastes In/taps x FLOPs."""
    n_in, n_out = m.shape
    plan = []
    for o in range(0, n_out, seg):
        sub = m[:, o : min(o + seg, n_out)]
        nz = np.nonzero(np.any(sub != 0, axis=1))[0]
        if len(nz) == 0:
            a, b = 0, 1
        else:
            a, b = int(nz[0]), int(nz[-1]) + 1
        plan.append((a, b, o, sub[a:b]))
    return plan


def apply_w_matrix(img: jnp.ndarray, m: np.ndarray, seg: int = 128) -> jnp.ndarray:
    """Contract an (H, W, C) image's W axis with a static (W, W_out) matrix
    at f32-level accuracy (3 bf16 MXU passes), band-segmented: each output
    column block contracts only against its nonzero input span."""
    parts = []
    for a, b, _o, sub in _band_segments(np.asarray(m), seg):
        hi, lo = split_bf16_host(sub)
        parts.append(einsum_3pass("hwc,wo->hoc", img[:, a:b, :], hi, lo))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def apply_h_matrix(img: jnp.ndarray, m: np.ndarray, seg: int = 128) -> jnp.ndarray:
    """Contract an (H, W, C) image's H axis with a static (H_out, H) matrix,
    band-segmented like apply_w_matrix."""
    mt = np.asarray(m).T  # (H_in, H_out) column map
    parts = []
    for a, b, _o, sub in _band_segments(mt, seg):
        hi, lo = split_bf16_host(sub.T)  # back to (H_out_seg, H_in_span)
        parts.append(einsum_3pass("hwc,oh->owc", img[a:b], hi, lo))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
