"""Vendored colorimetry for the Mallett 2019 spectral-recovery path.

The reference's CPU converter (ml/classic_rgb_to_hsi/classic_rgb_to_hsi.py:
89-111) calls colour-science's ``RGB_to_sd_Mallett2019``, which is a linear
combination of three tabulated basis spectra. colour-science is not in this
environment, so the basis is re-derived from the published method (Mallett &
Yuksel 2019, "Spectral Primary Decomposition for Rendering with sRGB
Reflectance") using the colorimetry in this module:

- CIE 1931 2-degree color matching functions via the multi-lobe piecewise
  Gaussian fits of Wyman, Sloan & Shirley 2013 ("Simple Analytic
  Approximations to the CIE XYZ Color Matching Functions", JCGT 2(2)),
  accurate to ~1% of peak.
- CIE D65 relative SPD from 20 nm anchor points (linearly interpolated),
  normalized to 100 at 560 nm.
- The sRGB primary matrix is constructed from the IEC 61966-2-1 primary
  chromaticities and THIS module's computed D65 white point, so a flat unit
  spectrum maps exactly to linear RGB (1, 1, 1) and the Mallett constraint
  system is consistent by construction.

Divergence note (PARITY.md "Mallett basis provenance"): colour-science
tabulates the basis solved against the measured 1 nm CIE data; this module's
basis solves the same optimization against the analytic fits, so individual
basis values differ at the ~1e-2 level while every defining property
(partition of unity, non-negativity, exact sRGB round trip under the
generating colorimetry, smoothness) holds to solver tolerance.
"""

from __future__ import annotations

import numpy as np

#: sRGB primary chromaticities (IEC 61966-2-1)
SRGB_PRIMARIES = np.array(
    [[0.64, 0.33], [0.30, 0.60], [0.15, 0.06]], dtype=np.float64
)

#: CIE D65 relative SPD anchors (wavelength nm, power; 100 @ 560 nm).
#: Standard published values at 20 nm spacing, 380-780 nm.
_D65_ANCHORS = np.array(
    [
        (380.0, 49.98), (400.0, 82.75), (420.0, 93.43), (440.0, 104.86),
        (460.0, 117.81), (480.0, 115.92), (500.0, 109.35), (520.0, 104.79),
        (540.0, 104.41), (560.0, 100.00), (580.0, 95.79), (600.0, 90.01),
        (620.0, 87.70), (640.0, 83.70), (660.0, 80.21), (680.0, 78.27),
        (700.0, 71.61), (720.0, 61.60), (740.0, 75.09), (760.0, 46.42),
        (780.0, 63.38),
    ],
    dtype=np.float64,
)


def _lobe(wl, peak, center, s_left, s_right):
    """One piecewise Gaussian of the Wyman et al. 2013 fit family."""
    t = (wl - center) * np.where(wl < center, s_left, s_right)
    return peak * np.exp(-0.5 * t * t)


def cie_xyz_cmf(wavelengths: np.ndarray) -> np.ndarray:
    """(3, N) CIE 1931 2-degree x̄/ȳ/z̄ via the Wyman-Sloan-Shirley multi-lobe
    fits (JCGT 2013, Table 1/3)."""
    wl = np.asarray(wavelengths, dtype=np.float64)
    x = (
        _lobe(wl, 0.362, 442.0, 0.0624, 0.0374)
        + _lobe(wl, 1.056, 599.8, 0.0264, 0.0323)
        - _lobe(wl, 0.065, 501.1, 0.0490, 0.0382)
    )
    y = _lobe(wl, 0.821, 568.8, 0.0213, 0.0247) + _lobe(
        wl, 0.286, 530.9, 0.0613, 0.0322
    )
    z = _lobe(wl, 1.217, 437.0, 0.0845, 0.0278) + _lobe(
        wl, 0.681, 459.0, 0.0385, 0.0725
    )
    return np.stack([x, y, z], axis=0)


def d65_spd(wavelengths: np.ndarray) -> np.ndarray:
    """(N,) CIE D65 relative SPD (linear interpolation of 20 nm anchors)."""
    wl = np.asarray(wavelengths, dtype=np.float64)
    return np.interp(wl, _D65_ANCHORS[:, 0], _D65_ANCHORS[:, 1])


def spectrum_to_xyz_operator(wavelengths: np.ndarray) -> np.ndarray:
    """(3, N) linear operator T: reflectance samples -> XYZ under D65,
    normalized so a flat unit reflectance has Y = 1 (the standard k
    normalization; summation quadrature like colour's sd_to_XYZ)."""
    cmf = cie_xyz_cmf(wavelengths)
    illum = d65_spd(wavelengths)
    t = cmf * illum[None, :]
    return t / t[1].sum()


def srgb_matrices(wavelengths: np.ndarray):
    """(M_xyz2rgb, T_rgb) where T_rgb = M @ T_xyz maps reflectance samples
    directly to linear sRGB, and M is built from the sRGB primaries plus the
    white point COMPUTED by this module's colorimetry — so T_rgb @ ones ==
    (1, 1, 1) exactly (flat spectrum == white)."""
    t_xyz = spectrum_to_xyz_operator(wavelengths)
    white = t_xyz.sum(axis=1)  # XYZ of the flat unit reflectance (Y == 1)
    xy = SRGB_PRIMARIES
    # columns: XYZ direction of each primary at Y=1
    p = np.stack(
        [xy[:, 0] / xy[:, 1], np.ones(3), (1.0 - xy[:, 0] - xy[:, 1]) / xy[:, 1]],
        axis=0,
    )
    scale = np.linalg.solve(p, white)
    m_rgb2xyz = p * scale[None, :]
    m_xyz2rgb = np.linalg.inv(m_rgb2xyz)
    return m_xyz2rgb, m_xyz2rgb @ t_xyz
