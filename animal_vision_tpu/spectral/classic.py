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


@functools.lru_cache(maxsize=None)
def _mallett_table(source: str = "derived"):
    """(wavelengths_5nm, (3, 81) basis) from the checked-in precompute
    (tools/make_mallett_basis.py; provenance in spectral/colorimetry.py).

    ``source="published"`` loads colour-science's own tabulation from
    ``data/mallett2019_published_5nm.npz`` (keys ``wl``, ``basis`` (N, 3))
    when someone drops that file in — neither the package nor network
    egress exists in the build environment, so the re-derived basis (every
    Mallett 2019 defining constraint to <= 1e-7, PARITY.md) is the shipped
    default. Raises FileNotFoundError until the table is vendored."""
    import os

    if source == "published":
        path = os.path.join(
            os.path.dirname(__file__), "data", "mallett2019_published_5nm.npz"
        )
        with np.load(path) as z:
            return z["wl"].copy(), z["basis"].T.copy()
    path = os.path.join(os.path.dirname(__file__), "data", "mallett2019_basis_5nm.npz")
    with np.load(path) as z:
        return z["wavelengths"].copy(), z["basis"].copy()


@functools.lru_cache(maxsize=None)
def mallett_basis_matrix(wavelengths: tuple, dtype=np.float32) -> np.ndarray:
    """(3, B) Mallett 2019 basis sampled on the requested grid.

    Parity: colour.recovery.RGB_to_sd_Mallett2019 is exactly
    ``sd = r*B_r + g*B_g + b*B_b`` over the tabulated basis, then
    ``sd.interpolate(target_shape)`` resamples to the caller's grid
    (classic_rgb_to_hsi.py:104-111). Resampling here is linear interpolation
    of the 5 nm table (colour uses Sprague for uniform data; on a 5 nm table
    the difference is ~1e-4 of a basis that is itself a re-derived fit —
    see colorimetry.py's divergence note). Wavelengths outside 380-780 nm
    clamp to the table edges.

    Channel-order note: unlike the analytic/CUDA path (which binds channel 0
    to the 460 nm lobe — the "BGR naming" quirk above), the reference's CPU
    path feeds pixels to RGB_to_sd_Mallett2019 in the order given, so with
    the RGB frames every caller actually passes, channel 0 drives the RED
    basis. The two reference paths disagree about channel order; each mode
    here reproduces its own path exactly.
    """
    wl_tab, basis = _mallett_table()
    wl = np.asarray(wavelengths, dtype=np.float64)
    out = np.stack([np.interp(wl, wl_tab, basis[i]) for i in range(3)], axis=0)
    return out.astype(dtype)


def classic_rgb_to_hsi(
    frame: jnp.ndarray,
    wavelengths: np.ndarray | None = None,
    linearize: bool = True,
    mode: str = "analytic",
) -> jnp.ndarray:
    """Explicit (H, W, B) cube — the public parity API.

    ``mode="analytic"`` is the reference's CUDA/GPU 3-lobe path (the default
    the app runs, device="cuda"); ``mode="mallett"`` is the CPU
    colour-science path (classic_rgb_to_hsi.py:86-111) as a single batched
    matmul against the precomputed Mallett 2019 basis — the reference's
    per-pixel Python loop (its HOT LOOP, SURVEY.md §3) collapses to one MXU
    pass because the recovery is linear in RGB.

    ``linearize=False`` supports RatUV's no-cast custom converter
    (animals/rat_uv.py:114-128 passes pre-linearized data in its own path).
    Like the reference, the input is linearized as-is (uint8-range values
    are NOT rescaled first; classic_rgb_to_hsi.py:50-52,87-89).
    """
    if wavelengths is None:
        wavelengths = np.linspace(400.0, 700.0, 31, dtype=np.float32)
    check_uniform(np.asarray(wavelengths))
    key = tuple(float(v) for v in np.asarray(wavelengths))
    if mode == "analytic":
        g = lobe_matrix(key)
    elif mode == "mallett":
        g = mallett_basis_matrix(key)
    else:
        raise ValueError(f"mode must be 'analytic' or 'mallett', got {mode!r}")
    x = frame.astype(jnp.float32)
    if linearize:
        x = _srgb_to_linear(x)
    cube = jnp.einsum("...c,cb->...b", x, jnp.asarray(g), precision="highest")
    return jnp.maximum(cube, 0.0)


def fused_band_matrix(
    wavelengths: np.ndarray, weight_vectors: np.ndarray, mode: str = "analytic"
) -> np.ndarray:
    """Fold the upsampler matrix with (B, n) band-weight columns: the
    returned (3, n) matrix integrates bands directly from linearized RGB
    without ever materializing the cube. Exact up to float association: both
    the upsampler and the band integral are linear maps. Works for either
    upsampler ``mode`` (the Mallett recovery is equally linear)."""
    check_uniform(np.asarray(wavelengths))
    key = tuple(float(v) for v in np.asarray(wavelengths))
    if mode == "analytic":
        g = lobe_matrix(key, dtype=np.float64)
    elif mode == "mallett":
        g = mallett_basis_matrix(key, dtype=np.float64)
    else:
        raise ValueError(f"mode must be 'analytic' or 'mallett', got {mode!r}")
    w = np.asarray(weight_vectors, dtype=np.float64)
    if w.ndim == 1:
        w = w[:, None]
    return (g @ w).astype(np.float32)
