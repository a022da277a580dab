"""Golden tests: core.blur vs cv2.GaussianBlur (the library the reference uses)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from animal_vision_tpu.core import blur


@pytest.mark.parametrize("sigma", [0.7, 1.2, 1.8, 2.0, 3.5])
def test_auto_ksize_blur_matches_cv2(img_f32, sigma, psnr_fn):
    want = cv2.GaussianBlur(img_f32, (0, 0), sigmaX=sigma, sigmaY=sigma)
    got = np.asarray(blur.gaussian_blur_hwc(jnp.asarray(img_f32), sigma))
    assert psnr_fn(got, want) > 80.0
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("sigma", [0.2, 0.8, 1.2, 2.4])
def test_uv_ksize_blur_matches_cv2(img_f32, sigma):
    k = int(2 * np.ceil(3 * sigma) + 1)
    want = cv2.GaussianBlur(
        img_f32, (k, k), sigmaX=sigma, sigmaY=sigma, borderType=cv2.BORDER_REFLECT101
    )
    got = np.asarray(blur.gaussian_blur_uv(jnp.asarray(img_f32), sigma))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_uv_blur_2d_matches_cv2(img_f32):
    gray = img_f32[..., 1].copy()
    sigma = 1.2
    k = int(2 * np.ceil(3 * sigma) + 1)
    want = cv2.GaussianBlur(gray, (k, k), sigmaX=sigma, sigmaY=sigma, borderType=cv2.BORDER_REFLECT101)
    got = np.asarray(blur.gaussian_blur_uv(jnp.asarray(gray), sigma))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_blur_2d_auto_matches_cv2(img_f32):
    gray = img_f32[..., 0].copy()
    want = cv2.GaussianBlur(gray, (0, 0), sigmaX=1.2, sigmaY=1.2)
    got = np.asarray(blur.gaussian_blur_hw(jnp.asarray(gray), 1.2))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_gaussian_kernel_matches_cv2():
    for k, s in [(3, 0.8), (7, 1.2), (29, 3.5), (21, 2.6)]:
        want = cv2.getGaussianKernel(k, s).ravel()
        got = blur.gaussian_kernel_1d(k, s)
        np.testing.assert_allclose(got, want, atol=1e-7)


def _reference_streak_blur(image, y_center=0.5, sigma_streak=0.8, sigma_far=2.2, falloff=6.0):
    """Oracle: the reference's exact per-row OpenCV loop
    (animals/animal_utils.py:147-172 behavior), including the (W,3)-as-image
    channel-mixing quirk."""
    h = image.shape[0]
    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    d = np.abs(yy - y_center)
    sigma_map = sigma_streak + (sigma_far - sigma_streak) * (1.0 - np.exp(-falloff * d**2))
    sigma_y = sigma_map
    sigma_x = np.maximum(0.4, 0.5 * sigma_map)
    out = image.astype(np.float32).copy()
    tmp = np.empty_like(out)
    for y in range(h):
        tmp[y] = cv2.GaussianBlur(out[y], (0, 0), sigmaX=float(sigma_x[y, 0]), sigmaY=0.0)
    for y in range(h):
        out[y] = cv2.GaussianBlur(tmp[y], (0, 0), sigmaX=1e-16, sigmaY=float(sigma_y[y, 0]))
    return out


@pytest.mark.parametrize(
    "params",
    [
        (0.5, 0.8, 2.2, 6.0),   # sheep-like
        (0.5, 0.9, 2.3, 6.5),   # cow
        (0.52, 0.9, 2.5, 5.0),  # rabbit
        (0.5, 0.8, 2.6, 8.0),   # deer
    ],
)
def test_streak_blur_matches_reference_loop(img_f32, params, psnr_fn):
    y_c, s_s, s_f, fo = params
    want = _reference_streak_blur(img_f32, y_c, s_s, s_f, fo)
    got = np.asarray(blur.streak_blur(jnp.asarray(img_f32), y_c, s_s, s_f, fo))
    assert psnr_fn(got, want) > 60.0, psnr_fn(got, want)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_reflect101_index():
    n = 3
    idx = blur.reflect101_index(np.arange(-4, 7), n)
    #         -4 -3 -2 -1  0  1  2  3  4  5  6
    want = [0, 1, 2, 1, 0, 1, 2, 1, 0, 1, 2]
    np.testing.assert_array_equal(idx, want)


def test_blur_profile_1d_matches_2d_row_constant():
    """blur_profile_1d == the full 2-D UV blur of a row-constant image
    (the x pass over constant rows is the identity): the identity behind
    the trace-time scanline fold in mantis/jumping_spider."""
    rng = np.random.default_rng(11)
    prof = rng.random(53).astype(np.float32)
    img = np.tile(prof[:, None], (1, 37))
    for sigma in (0.8, 0.9, 2.3):
        got = blur.blur_profile_1d(prof, sigma)
        want = np.asarray(blur.gaussian_blur_uv(jnp.asarray(img), sigma))
        np.testing.assert_allclose(
            np.tile(got[:, None], (1, 37)), want, atol=3e-7
        )
