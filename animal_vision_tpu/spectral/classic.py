"""Analytic 3-lobe spectral upsampler (the reference's GPU path), TPU-first.

Parity target: ml/classic_rgb_to_hsi/classic_rgb_to_hsi.py:47-82 — three
Gaussian lobes (centers 610/545/460 nm, sigmas 60/60/55), weighted by the
*linearized* input channels and normalized by the mean total lobe response.

Channel-assignment quirk (preserved for bit parity): the reference names its
input BGR (channel 0 -> 460 nm lobe, channel 2 -> 610 nm lobe) but every
caller passes RGB without swapping (classic_rgb_to_hsi.py:51-57; e.g.
animals/goldfish.py:121 passes RGB `baseline_lin`). So red image content
populates the 460 nm end and blue populates 610 nm. We reproduce exactly
that; ``assume_bgr_names=False`` gives the physically-corrected mapping.

TPU design: the upsampler is algebraically ``HSI = linear(rgb) @ G`` for a
constant (3, B) lobe matrix, and every consumer immediately integrates the
cube against band weights ``HSI @ w``. So the cube NEVER needs materializing:
``band = linear(rgb) @ (G @ w)`` — a (3, n_bands) matmul per pixel. The
explicit-cube mode exists for parity tests and for the public
``classic_rgb_to_hsi`` API; the species pipelines use the fused path.

A second linearization quirk is also preserved at the call sites: the
converter always applies sRGB->linear itself, and most UV species feed it
already-linear input (SURVEY.md §0 "double linearization").
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_CENTERS = (610.0, 545.0, 460.0)  # R, G, B lobe centers (nm)
_SIGMAS = (60.0, 60.0, 55.0)


def _srgb_to_linear(x):
    a = 0.055
    return jnp.where(x <= 0.04045, x / 12.92, ((x + a) / (1 + a)) ** 2.4)


@functools.lru_cache(maxsize=None)
def lobe_matrix(
    wavelengths: tuple, assume_bgr_names: bool = True, dtype=np.float32
) -> np.ndarray:
    """(3, B) matrix G mapping linearized channels to the spectral cube,
    including the reference's mean-total-response normalization
    (classic_rgb_to_hsi.py:70-79)."""
    wl = np.asarray(wavelengths, dtype=np.float64)
    g_r = np.exp(-0.5 * ((wl - _CENTERS[0]) / _SIGMAS[0]) ** 2)
    g_g = np.exp(-0.5 * ((wl - _CENTERS[1]) / _SIGMAS[1]) ** 2)
    g_b = np.exp(-0.5 * ((wl - _CENTERS[2]) / _SIGMAS[2]) ** 2)
    denom = (g_r + g_g + g_b).mean() + 1e-8
    if assume_bgr_names:
        # reference: channel 0 -> 460nm lobe, 1 -> 545, 2 -> 610
        g = np.stack([g_b, g_g, g_r], axis=0)
    else:
        g = np.stack([g_r, g_g, g_b], axis=0)
    return (g / denom).astype(dtype)


def check_uniform(wavelengths: np.ndarray) -> float:
    """The reference's uniform-grid requirement (classic_rgb_to_hsi.py:43-45)."""
    if wavelengths.size < 2:
        raise ValueError("Need at least two wavelengths.")
    step = float(wavelengths[1] - wavelengths[0])
    if not np.allclose(np.diff(wavelengths), step):
        raise ValueError("`wavelengths` must be uniformly spaced.")
    return step


def classic_rgb_to_hsi(
    frame: jnp.ndarray,
    wavelengths: np.ndarray | None = None,
    linearize: bool = True,
) -> jnp.ndarray:
    """Explicit (H, W, B) cube — the public parity API.

    ``linearize=False`` supports RatUV's no-cast custom converter
    (animals/rat_uv.py:114-128 passes pre-linearized data in its own path).
    """
    if wavelengths is None:
        wavelengths = np.linspace(400.0, 700.0, 31, dtype=np.float32)
    check_uniform(np.asarray(wavelengths))
    g = lobe_matrix(tuple(float(v) for v in np.asarray(wavelengths)))
    x = frame.astype(jnp.float32)
    if linearize:
        x = _srgb_to_linear(x)
    cube = jnp.einsum("...c,cb->...b", x, jnp.asarray(g), precision="highest")
    return jnp.maximum(cube, 0.0)


def fused_band_matrix(
    wavelengths: np.ndarray, weight_vectors: np.ndarray
) -> np.ndarray:
    """Fold the lobe matrix with (B, n) band-weight columns: the returned
    (3, n) matrix integrates bands directly from linearized RGB without ever
    materializing the cube. Exact up to float association: both the upsampler
    and the band integral are linear maps."""
    check_uniform(np.asarray(wavelengths))
    g = lobe_matrix(tuple(float(v) for v in np.asarray(wavelengths)), dtype=np.float64)
    w = np.asarray(weight_vectors, dtype=np.float64)
    if w.ndim == 1:
        w = w[:, None]
    return (g @ w).astype(np.float32)
