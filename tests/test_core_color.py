"""Golden tests: core.color vs NumPy formulas / reference numerics."""

import numpy as np
import jax.numpy as jnp

from animal_vision_tpu.core import color


def _np_srgb_to_linear(x):
    a = 0.055
    return np.where(x <= 0.04045, x / 12.92, ((x + a) / (1 + a)) ** 2.4)


def _np_linear_to_srgb(x):
    a = 0.055
    return np.where(x <= 0.0031308, 12.92 * x, (1 + a) * np.clip(x, 0, None) ** (1 / 2.4) - a)


def test_srgb_round_trip(img_f32):
    lin = np.asarray(color.srgb_to_linear(jnp.asarray(img_f32)))
    np.testing.assert_allclose(lin, _np_srgb_to_linear(img_f32), atol=5e-6)
    back = np.asarray(color.linear_to_srgb(jnp.asarray(lin)))
    np.testing.assert_allclose(back, img_f32, atol=5e-6)


def test_collapse_matrix_matches_reference_construction():
    # The reference builds T = eye @ A.T @ D.T @ B.T and applies pixels @ T.T,
    # i.e. pixels @ (B @ D @ A) — note this is the TRANSPOSE of its own
    # explicit row-vector LMS chain (see core.color.collapse_lms_matrix
    # docstring). We pin the reference construction exactly.
    for alpha, s in [(0.58, 0.65), (0.84, 1.07), (0.05, 0.86), (0.3, 1.02)]:
        t = color.collapse_lms_matrix(alpha, s)
        basis = np.eye(3, dtype=np.float32)
        lms = basis @ color.M_RGB_TO_LMS.T
        d = np.array(
            [[alpha, 1 - alpha, 0.0], [alpha, 1 - alpha, 0.0], [0.0, 0.0, s]],
            dtype=np.float32,
        )
        want = ((lms @ d.T) @ color.M_LMS_TO_RGB.T).astype(np.float32)
        np.testing.assert_array_equal(t, want)
        # and T.T == B @ D @ A up to float32 association
        np.testing.assert_allclose(
            t.T, color.M_LMS_TO_RGB @ d @ color.M_RGB_TO_LMS, atol=1e-6
        )


def test_normalize_image_branches(img_u8):
    out = np.asarray(color.normalize_image(jnp.asarray(img_u8)))
    np.testing.assert_allclose(out, np.clip(img_u8.astype(np.float32) / 255.0, 0, 1), atol=1e-7)
    f = img_u8.astype(np.float32) / 255.0
    out2 = np.asarray(color.normalize_image(jnp.asarray(f)))
    np.testing.assert_allclose(out2, f, atol=1e-7)


def test_uint8_round_trip(img_f32):
    out = np.asarray(color.from_float01(jnp.asarray(img_f32), np.uint8))
    want = np.clip(img_f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_to_float01_float_over_range():
    x = np.linspace(0, 255, 30, dtype=np.float32).reshape(10, 1, 3)
    out = np.asarray(color.to_float01(jnp.asarray(x)))
    np.testing.assert_allclose(out, np.clip(x / 255.0, 0, 1), atol=1e-7)
