"""One-time precompute of the Mallett 2019 sRGB spectral basis.

Solves the Mallett & Yuksel 2019 optimization under the vendored colorimetry
in animal_vision_tpu/spectral/colorimetry.py: find three spectra B_r, B_g,
B_b on 380-780 nm @ 5 nm (81 samples) that

- partition unity:      B_r + B_g + B_b == 1 at every wavelength
- are non-negative:     B_i >= 0
- project to identity:  T_rgb @ B_i == e_i (each basis renders as a pure
                        primary under D65 + CIE 1931 + the sRGB matrix)
- maximize smoothness:  minimize the summed squared second differences

Parameterization: only B_r and B_g are free; B_b = 1 - B_r - B_g makes the
partition exact by construction, and T_rgb @ ones == (1,1,1) (guaranteed by
colorimetry.srgb_matrices) makes B_b's projection constraint automatic.

Writes animal_vision_tpu/spectral/data/mallett2019_basis_5nm.npz
(wavelengths + (3, 81) basis). Checked in; rerun only if colorimetry changes.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.optimize import LinearConstraint, minimize

from animal_vision_tpu.spectral.colorimetry import srgb_matrices

N = 81
WL = np.linspace(380.0, 780.0, N)


def second_difference_matrix(n: int) -> np.ndarray:
    d = np.zeros((n - 2, n))
    for i in range(n - 2):
        d[i, i : i + 3] = (1.0, -2.0, 1.0)
    return d


def main() -> None:
    _, t_rgb = srgb_matrices(WL)
    assert np.allclose(t_rgb @ np.ones(N), 1.0), "white point must be exact"

    d2 = second_difference_matrix(N)
    # objective over x = [B_r; B_g]: smoothness of B_r, B_g AND
    # B_b = 1 - B_r - B_g (whose second differences are -(D2 Br + D2 Bg))
    q_single = d2.T @ d2

    def objective(x):
        br, bg = x[:N], x[N:]
        db = d2 @ (br + bg)
        val = br @ q_single @ br + bg @ q_single @ bg + db @ db
        g_r = 2 * q_single @ br + 2 * d2.T @ db
        g_g = 2 * q_single @ bg + 2 * d2.T @ db
        return val, np.concatenate([g_r, g_g])

    # equality: T B_r = e_r, T B_g = e_g (6 rows)
    a_eq = np.zeros((6, 2 * N))
    a_eq[:3, :N] = t_rgb
    a_eq[3:, N:] = t_rgb
    b_eq = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    # inequality: B_r + B_g <= 1 (=> B_b >= 0)
    a_sum = np.concatenate([np.eye(N), np.eye(N)], axis=1)

    # smooth feasible-ish start: logistic splits of unity by wavelength
    s_rg = 1.0 / (1.0 + np.exp(-(WL - 570.0) / 12.0))  # red vs green
    s_gb = 1.0 / (1.0 + np.exp(-(WL - 495.0) / 12.0))  # green vs blue
    x0 = np.concatenate([s_rg, (1.0 - s_rg) * s_gb])

    res = minimize(
        lambda x: objective(x)[0],
        x0,
        jac=lambda x: objective(x)[1],
        method="SLSQP",
        bounds=[(0.0, 1.0)] * (2 * N),
        constraints=[
            LinearConstraint(a_eq, b_eq, b_eq),
            LinearConstraint(a_sum, -np.inf, np.ones(N)),
        ],
        options={"maxiter": 2000, "ftol": 1e-14},
    )
    print("converged:", res.success, res.message, "obj:", res.fun)
    br, bg = res.x[:N], res.x[N:]
    bb = 1.0 - br - bg
    basis = np.stack([br, bg, bb], axis=0)
    print("min value (should be >= ~-1e-9):", basis.min())
    print("projection residual:", np.abs(t_rgb @ basis.T - np.eye(3)).max())
    basis = np.clip(basis, 0.0, None)
    basis /= basis.sum(axis=0, keepdims=True)  # re-normalize after clip

    out = os.path.join(
        os.path.dirname(__file__), "..", "animal_vision_tpu", "spectral",
        "data", "mallett2019_basis_5nm.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, wavelengths=WL.astype(np.float64), basis=basis.astype(np.float64))
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
