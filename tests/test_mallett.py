"""Mallett 2019 CPU spectral path: basis properties, round trip, fixture.

The reference's CPU converter (classic_rgb_to_hsi.py:86-111) recovers a
reflectance spectrum per pixel via colour-science's Mallett 2019 basis.
colour-science is absent here, so the basis is re-derived from the published
optimization (tools/make_mallett_basis.py) under vendored colorimetry
(spectral/colorimetry.py); these tests verify every property that DEFINES
the method, plus a stored-fixture regression pin.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mallett_cube_4x4x31.npy")


def _basis_5nm():
    from animal_vision_tpu.spectral.classic import _mallett_table

    return _mallett_table()


def test_basis_partition_of_unity_and_nonneg():
    wl, basis = _basis_5nm()
    assert basis.shape == (3, 81) and wl[0] == 380.0 and wl[-1] == 780.0
    np.testing.assert_allclose(basis.sum(axis=0), 1.0, atol=1e-9)
    assert basis.min() >= 0.0


def test_basis_projects_to_identity():
    """Each basis function must render as a pure sRGB primary under the
    generating colorimetry — the defining Mallett constraint."""
    from animal_vision_tpu.spectral.colorimetry import srgb_matrices

    wl, basis = _basis_5nm()
    _, t_rgb = srgb_matrices(wl)
    np.testing.assert_allclose(t_rgb @ basis.T, np.eye(3), atol=1e-7)


def test_rgb_round_trip_through_spectrum():
    """linear RGB -> recovered spectrum -> sRGB projection == identity for
    arbitrary colors (linearity + the projection constraint)."""
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi
    from animal_vision_tpu.spectral.colorimetry import srgb_matrices

    wl, _ = _basis_5nm()
    _, t_rgb = srgb_matrices(wl)
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (5, 7, 3)).astype(np.float32)
    cube = np.asarray(
        classic_rgb_to_hsi(jnp.asarray(rgb), wl, linearize=False, mode="mallett")
    )
    back = cube.reshape(-1, wl.size) @ t_rgb.T
    np.testing.assert_allclose(back.reshape(rgb.shape), rgb, atol=1e-5)


def test_white_recovers_flat_spectrum():
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi

    wl, _ = _basis_5nm()
    cube = np.asarray(
        classic_rgb_to_hsi(jnp.ones((1, 1, 3)), wl, linearize=False, mode="mallett")
    )
    np.testing.assert_allclose(cube, 1.0, atol=1e-6)


def test_mallett_interpolation_consistency():
    """The default 31-band 400-700 grid (10 nm) lies exactly on the 5 nm
    table, so its cube must equal the corresponding slice of the 81-point
    380-780 cube."""
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi

    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.uniform(0, 1, (3, 4, 3)).astype(np.float32))
    wl31 = np.linspace(400.0, 700.0, 31)
    wl81 = np.linspace(380.0, 780.0, 81)
    c31 = np.asarray(classic_rgb_to_hsi(rgb, wl31, mode="mallett"))
    c81 = np.asarray(classic_rgb_to_hsi(rgb, wl81, mode="mallett"))
    # 400-700 @ 10 nm == indices 4, 6, 8, ... of the 5 nm grid
    np.testing.assert_allclose(c31, c81[..., 4:65:2], atol=1e-7)


def test_fused_band_matrix_matches_explicit_cube():
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi, fused_band_matrix

    wl = np.linspace(400.0, 700.0, 31)
    rng = np.random.default_rng(2)
    w = rng.uniform(0, 1, (31, 2)).astype(np.float64)
    rgb = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    cube = np.asarray(classic_rgb_to_hsi(jnp.asarray(rgb), wl, mode="mallett"))
    explicit = cube.reshape(-1, 31) @ w
    m = fused_band_matrix(wl, w, mode="mallett")  # (3, 2)
    from animal_vision_tpu.spectral.classic import _srgb_to_linear

    lin = np.asarray(_srgb_to_linear(jnp.asarray(rgb))).reshape(-1, 3)
    fused = lin @ m
    np.testing.assert_allclose(fused, explicit, rtol=1e-4, atol=1e-5)


def test_mallett_fixture_regression():
    """Bit-stable pin of the full path (sRGB linearization included) on the
    default 31-band grid against a stored fixture."""
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi

    rng = np.random.default_rng(42)
    rgb = jnp.asarray(rng.uniform(0, 1, (4, 4, 3)).astype(np.float32))
    cube = np.asarray(classic_rgb_to_hsi(rgb, mode="mallett"))
    if not os.path.exists(FIXTURE):
        pytest.skip("fixture not generated yet")
    want = np.load(FIXTURE)
    np.testing.assert_allclose(cube, want, atol=1e-6)


def test_invalid_mode_raises():
    import jax.numpy as jnp

    from animal_vision_tpu.spectral.classic import classic_rgb_to_hsi

    with pytest.raises(ValueError):
        classic_rgb_to_hsi(jnp.ones((1, 1, 3)), mode="nope")


def test_published_table_exact():
    """Activates when colour-science's own tabulation is vendored (see
    PARITY.md "Mallett basis provenance" — unobtainable in the build env:
    no package, no egress). Pins the re-derived basis to the published one."""
    from animal_vision_tpu.spectral import classic

    try:
        wl_pub, basis_pub = classic._mallett_table(source="published")
    except FileNotFoundError:
        pytest.skip("published Mallett 2019 table not vendored (no egress)")
    wl, basis = classic._mallett_table()
    ours = np.stack([np.interp(wl_pub, wl, basis[i]) for i in range(3)])
    assert np.abs(ours - basis_pub).max() < 1e-6
