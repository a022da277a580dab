"""Global per-frame statistics: percentile normalization, safe min-max norm.

Percentile normalization (p95/p98/p99 via np.percentile) is pervasive in the
reference's UV mappers (uv_mappers.py:33-34,61-62,73,103,141) and several UV
species. These are data-dependent global reductions; on TPU we keep them
inside the jitted program as sort-based reductions over a statically shaped
flattened frame (jnp.percentile == np.percentile 'linear' method).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS_DEFAULT = 1e-8


def percentile(x: jnp.ndarray, q: float) -> jnp.ndarray:
    """np.percentile parity (linear interpolation between order stats)."""
    return jnp.percentile(x.astype(jnp.float32), q)


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
