"""Golden tests: core.geometry vs cv2.resize / cv2.remap."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from animal_vision_tpu.core import geometry


CASES = [
    ((64, 96), (33, 50)),   # downscale non-integer
    ((64, 96), (16, 24)),   # downscale integer
    ((64, 96), (128, 200)), # upscale
    ((33, 50), (64, 96)),   # upscale non-integer
]


@pytest.mark.parametrize("dst", [(33, 50), (16, 24), (128, 200)])
def test_resize_linear(img_f32, dst):
    want = cv2.resize(img_f32, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(geometry.resize(jnp.asarray(img_f32), dst, "linear"))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("dst", [(33, 50), (128, 200), (64, 139)])
def test_resize_cubic(img_f32, dst):
    want = cv2.resize(img_f32, (dst[1], dst[0]), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(geometry.resize(jnp.asarray(img_f32), dst, "cubic"))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize("dst", [(33, 50), (16, 24), (17, 29)])
def test_resize_area_down(img_f32, dst):
    want = cv2.resize(img_f32, (dst[1], dst[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(geometry.resize(jnp.asarray(img_f32), dst, "area"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resize_area_up(img_f32):
    dst = (128, 200)
    want = cv2.resize(img_f32, (dst[1], dst[0]), interpolation=cv2.INTER_AREA)
    got = np.asarray(geometry.resize(jnp.asarray(img_f32), dst, "area"))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("dst", [(33, 50), (128, 200)])
def test_resize_nearest(img_f32, dst):
    want = cv2.resize(img_f32, (dst[1], dst[0]), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(geometry.resize(jnp.asarray(img_f32), dst, "nearest"))
    np.testing.assert_array_equal(got, want)


def test_resize_2d(img_f32):
    gray = img_f32[..., 0].copy()
    want = cv2.resize(gray, (24, 16), interpolation=cv2.INTER_AREA)
    got = np.asarray(geometry.resize(jnp.asarray(gray), (16, 24), "area"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_remap_bilinear_constant_border(img_f32):
    h, w = img_f32.shape[:2]
    rng = np.random.default_rng(1)
    map_x = rng.uniform(-5, w + 5, size=(h, w)).astype(np.float32)
    map_y = rng.uniform(-5, h + 5, size=(h, w)).astype(np.float32)
    want = cv2.remap(
        img_f32, map_x, map_y, interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    got = np.asarray(geometry.remap_bilinear(jnp.asarray(img_f32), map_x, map_y, 0.0))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_center_zoom_matches_reference(img_f32):
    scale = 1.37
    h, w = img_f32.shape[:2]
    cw = max(1, int(round(w / scale)))
    ch = max(1, int(round(h / scale)))
    x0, y0 = (w - cw) // 2, (h - ch) // 2
    crop = img_f32[y0 : y0 + ch, x0 : x0 + cw]
    want = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(geometry.center_zoom(jnp.asarray(img_f32), scale))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # scale <= 1 is identity
    np.testing.assert_array_equal(
        np.asarray(geometry.center_zoom(jnp.asarray(img_f32), 0.9)), img_f32
    )


def test_panorama_warp_matches_reference(img_f32):
    scale_x = 1.45
    h, w = img_f32.shape[:2]
    new_w = max(2, int(round(w * scale_x)))
    widened = cv2.resize(img_f32, (new_w, h), interpolation=cv2.INTER_CUBIC)
    start = (new_w - w) // 2
    want = widened[:, start : start + w]
    got = np.asarray(geometry.panorama_warp(jnp.asarray(img_f32), scale_x))
    np.testing.assert_allclose(got, want, atol=3e-5)


def _reference_binocular_warp(img01, fov_in_deg, per_eye_half_fov_deg, overlap_deg):
    """Oracle: animals/animal_utils2.py:52-105 behavior via cv2."""
    h_in, w_in, _ = img01.shape
    out_w, out_h = w_in, h_in
    phi = np.deg2rad(per_eye_half_fov_deg)
    psi = np.deg2rad(fov_in_deg * 0.5)
    ov = np.deg2rad(overlap_deg)
    alpha = max(0.0, phi - 0.5 * ov)
    u = np.linspace(-1.0, 1.0, out_w, dtype=np.float32)
    v = np.linspace(0.0, float(out_h - 1), out_h, dtype=np.float32)
    uu, _ = np.meshgrid(u, v)
    theta = uu * phi
    gamma_l, gamma_r = theta - alpha, theta + alpha
    xs = lambda g: ((g / psi) * (w_in * 0.5) + (w_in * 0.5)).astype(np.float32)
    ymap = np.repeat(np.linspace(0, h_in - 1, out_h, dtype=np.float32)[:, None], out_w, axis=1)
    valid_l = (np.abs(gamma_l) <= psi).astype(np.float32)
    valid_r = (np.abs(gamma_r) <= psi).astype(np.float32)
    left = cv2.remap(img01, xs(gamma_l), ymap, interpolation=cv2.INTER_LINEAR,
                     borderMode=0, borderValue=0)
    right = cv2.remap(img01, xs(gamma_r), ymap, interpolation=cv2.INTER_LINEAR,
                      borderMode=0, borderValue=0)
    w_l = (np.cos(0.5 * np.pi * (theta / phi)) ** 2).astype(np.float32) * valid_l
    w_r = (np.cos(0.5 * np.pi * (theta / phi)) ** 2).astype(np.float32) * valid_r
    wsum = (w_l + w_r + 1e-8)[..., None]
    out = (left * w_l[..., None] + right * w_r[..., None]) / wsum
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def test_binocular_warp_matches_reference(img_f32, psnr_fn):
    want = _reference_binocular_warp(img_f32, 100.0, 105.0, 40.0)
    got = np.asarray(
        geometry.binocular_fov_warp(jnp.asarray(img_f32), 100.0, 105.0, 40.0)
    )
    assert psnr_fn(got, want) > 60.0
    np.testing.assert_allclose(got, want, atol=1e-4)
