"""Color-space primitives (sRGB transfer curves, LMS cone space, dichromat collapse).

Behavioral parity targets in the reference (see SURVEY.md §2.3):
  - srgb_to_linear / linear_to_srgb: IEC 61966-2-1 piecewise, a=0.055,
    thresholds 0.04045 / 0.0031308 (animals/animal_utils.py:5-19,
    uv_helpers.py:33-44).
  - sRGB->LMS / LMS->RGB fixed 3x3 matrices (animals/animal_utils.py:52-77).
  - collapse_lms_matrix: single 3x3 linear-RGB->linear-RGB matrix that merges
    L/M cones with weight alpha and scales S by s_scale
    (animals/animal_utils.py:88-119).  The whole dichromat color transform is
    one matmul - ideal for the TPU MXU and for fusing with the transfer curves.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# RGB -> LMS (Hunt-Pointer-Estevez-like), row i = cone i weights.
# Parity: animals/animal_utils.py:56-63.
M_RGB_TO_LMS = np.array(
    [
        [0.31399022, 0.63951294, 0.04649755],  # L
        [0.15537241, 0.75789446, 0.08670142],  # M
        [0.01775239, 0.10944209, 0.87256922],  # S
    ],
    dtype=np.float32,
)

# LMS -> RGB inverse. Parity: animals/animal_utils.py:70-76 (float64 there).
M_LMS_TO_RGB = np.array(
    [
        [5.472213, -4.6419606, 0.16963711],
        [-1.125242, 2.2931712, -0.16789523],
        [0.02980164, -0.19318072, 1.1636479],
    ],
    dtype=np.float64,
)

_SRGB_A = 0.055


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB-encoded [0,1] -> linear light. IEC 61966-2-1 EOCF."""
    a = _SRGB_A
    return jnp.where(x <= 0.04045, x / 12.92, ((x + a) / (1 + a)) ** 2.4)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    """Linear light -> sRGB-encoded. Negative inputs are clamped before the
    fractional power (uv_helpers.py:43 clips; animal callers pre-clip)."""
    a = _SRGB_A
    safe = jnp.clip(x, 0.0, None)
    return jnp.where(x <= 0.0031308, 12.92 * x, (1 + a) * safe ** (1 / 2.4) - a)


@functools.lru_cache(maxsize=None)
def collapse_lms_matrix(alpha: float, s_scale: float) -> np.ndarray:
    """3x3 linear-RGB -> linear-RGB dichromat matrix.

    Pushes the RGB basis through LMS, collapses L/M to LM = alpha*L+(1-alpha)*M
    (both L and M outputs), scales S by s_scale, and maps back to RGB.
    Apply as ``pixels @ T.T``. Matches the float32/float64 mixing of the
    reference (animals/animal_utils.py:88-119): the forward matrix is float32,
    the inverse is float64, and the result is cast back to float32.

    Parity note: applying ``pixels @ T.T`` equals ``pixels @ (B @ D @ A)``
    (A = RGB->LMS, D = collapse, B = LMS->RGB), which is the *transpose* of
    the explicit row-vector LMS chain ``pixels @ A.T @ D.T @ B.T``. The
    reference's 19 matrix-path animals therefore apply the transposed
    transform relative to its own explicit-LMS cat path; we reproduce that
    behavior exactly (golden tests pin it).
    """
    basis = np.eye(3, dtype=np.float32)
    lms = basis @ M_RGB_TO_LMS.T  # rows are RGB basis vectors in LMS (f32)
    collapse = np.array(
        [
            [alpha, 1.0 - alpha, 0.0],
            [alpha, 1.0 - alpha, 0.0],
            [0.0, 0.0, s_scale],
        ],
        dtype=np.float32,
    )
    collapsed = lms @ collapse.T
    rgb_out = collapsed @ M_LMS_TO_RGB.T  # promotes to f64, like the reference
    return rgb_out.astype(np.float32)


def apply_color_matrix(img: jnp.ndarray, matrix: np.ndarray) -> jnp.ndarray:
    """Apply a 3x3 color matrix to an (..., 3) image as ``pixels @ M.T``.

    precision='highest' because the default TPU matmul precision (bf16) costs
    ~3e-3 absolute error — far beyond the parity budget — and a 3x3 contraction
    is free at full precision."""
    m = jnp.asarray(matrix, dtype=img.dtype)
    return jnp.einsum("...j,ij->...i", img, m, precision="highest")


def merge_l_m(lms: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Merge L and M cone channels: LM = alpha*L + (1-alpha)*M, keep S.

    Parity: animals/animal_utils.py:79-86 (used by the explicit-LMS cat path).
    Operates on (..., 3) LMS arrays.
    """
    lm = alpha * lms[..., 0] + (1.0 - alpha) * lms[..., 1]
    return jnp.stack([lm, lm, lms[..., 2]], axis=-1)


def srgb_to_lms(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB -> LMS via the fixed forward matrix."""
    return apply_color_matrix(img, M_RGB_TO_LMS)


def lms_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) LMS -> RGB via the fixed inverse matrix (float32 cast)."""
    return apply_color_matrix(img, M_LMS_TO_RGB.astype(np.float32))


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """float32 in [0,1]; divide by 255 iff max > 1 (data-dependent scale kept
    inside the program as a select). Parity: animals/animal_utils.py:41-50."""
    x = img.astype(jnp.float32)
    scale = jnp.where(jnp.max(x) > 1.0, 1.0 / 255.0, 1.0)
    return jnp.clip(x * scale, 0.0, 1.0)


def to_float01(img: jnp.ndarray) -> jnp.ndarray:
    """uint8/float -> float32 [0,1]. Parity: uv_helpers.py:15-23 (the UV-path
    convention: uint8 divides by 255 with no clip; floats divide by 255 only
    when max > 1.001 and are then clipped)."""
    if jnp.issubdtype(img.dtype, jnp.integer):
        return img.astype(jnp.float32) / 255.0
    x = img.astype(jnp.float32)
    needs = jnp.max(x) > 1.001
    return jnp.where(needs, jnp.clip(x / 255.0, 0.0, 1.0), x)


def from_float01(img01: jnp.ndarray, dtype) -> jnp.ndarray:
    """float [0,1] -> original dtype with the reference's uint8 round-trip
    ``clip(x*255+0.5, 0, 255)`` (uv_helpers.py:26-30)."""
    if np.issubdtype(np.dtype(dtype), np.integer):
        return jnp.clip(img01 * 255.0 + 0.5, 0.0, 255.0).astype(dtype)
    return img01.astype(dtype)


def encode_output(linear_img: jnp.ndarray, dtype) -> jnp.ndarray:
    """clip -> linear_to_srgb -> clip -> dtype restore (*255+0.5 for ints).

    Parity: the shared non-UV epilogue (animals/dog.py:54-59).
    """
    srgb = jnp.clip(linear_to_srgb(jnp.clip(linear_img, 0.0, 1.0)), 0.0, 1.0)
    if np.issubdtype(np.dtype(dtype), np.integer):
        return (srgb * 255.0 + 0.5).astype(dtype)
    return srgb.astype(dtype)
