"""Band weights, illuminant and chromatic adaptation (uv_helpers parity)."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

EPS_DEFAULT = 1e-8


@functools.lru_cache(maxsize=None)
def bandpass_weights(lambdas: tuple, lo: float, hi: float) -> np.ndarray:
    """Raised-cosine weights on [lo, hi], normalized to sum 1.
    Parity: uv_helpers.bandpass_weights (uv_helpers.py:125-139), computed
    host-side (static wavelengths)."""
    wl = np.asarray(lambdas, dtype=np.float32)
    w = np.zeros_like(wl, dtype=np.float32)
    mask = (wl >= lo) & (wl <= hi)
    if not np.any(mask):
        return np.ones_like(wl) / float(wl.size)
    x = (wl[mask] - lo) / (hi - lo)
    w[mask] = 0.5 * (1.0 - np.cos(2.0 * np.pi * x))
    s = float(w.sum())
    if s > 1e-12:
        w /= s
    else:
        w = np.ones_like(wl) / float(wl.size)
    return w


def integrate_band(hsi: jnp.ndarray, lambdas: np.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """tensordot(hsi, raised-cosine weights) -> (H, W).
    Parity: uv_helpers.integrate_band (uv_helpers.py:142-146)."""
    w = bandpass_weights(tuple(float(v) for v in np.asarray(lambdas)), lo, hi)
    return jnp.tensordot(hsi, jnp.asarray(w), axes=([2], [0]))


def integrate_uv(hsi: jnp.ndarray, lambdas: np.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Band integral followed by safe min-max normalization
    (uv_helpers.py:149-152)."""
    from animal_vision_tpu.core.stats import safe_norm

    return safe_norm(integrate_band(hsi, lambdas, lo, hi))


def d65_like(lambdas_nm: np.ndarray) -> np.ndarray:
    """Smooth daylight SPD, mean-normalized (uv_helpers.py:187-192).
    Host-side (static wavelengths)."""
    lam = np.asarray(lambdas_nm, dtype=np.float64)
    x = (lam - 560.0) / 50.0
    base = np.exp(-0.5 * x**2) + 0.3 * np.exp(-0.5 * ((lam - 450.0) / 35.0) ** 2)
    base = base / base.mean()
    return base.astype(np.float32)


def von_kries_white_patch(u, b, g, eps: float = EPS_DEFAULT):
    """Divide each catch map by its max (uv_helpers.py:195-199)."""
    return (
        u / jnp.maximum(jnp.max(u), eps),
        b / jnp.maximum(jnp.max(b), eps),
        g / jnp.maximum(jnp.max(g), eps),
    )


def von_kries_gray_world(u, b, g, eps: float = EPS_DEFAULT):
    """Divide each catch map by its mean (uv_helpers.py:202-206)."""
    return (
        u / jnp.maximum(jnp.mean(u), eps),
        b / jnp.maximum(jnp.mean(b), eps),
        g / jnp.maximum(jnp.mean(g), eps),
    )
